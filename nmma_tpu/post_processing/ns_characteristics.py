"""Combined EOS inference across events (``combine-EOS``).

Counterpart of ``nmma/post_processing/ns_characteristics.py:17-104``:
stack per-event EOS-index posteriors into combined per-EOS weights and
report the R_14 (and MTOV) trend with event count, including the
pdet(MTOV) selection correction hook.
"""

from __future__ import annotations

import numpy as np


def eos_index_weights(eos_samples, n_eos):
    """Per-EOS posterior weights from sampled (fractional) EOS indices."""
    idx = np.floor(np.asarray(eos_samples)).astype(int)
    idx = np.clip(idx, 0, n_eos - 1)
    counts = np.bincount(idx, minlength=n_eos).astype(float)
    return counts / counts.sum()


def combine_eos_posteriors(event_eos_samples, eos_set, pdet=None):
    """Cumulative combined EOS weights + R14 credible trend.

    Returns (combined_weights [N_eos], trend list of
    (median R14, lo68, hi68) after each event).
    """
    n_eos = eos_set.n_eos
    r14 = np.asarray(eos_set.r14)
    log_w = np.log(np.asarray(eos_set.weights) + 1e-300)
    trend = []
    for samples in event_eos_samples:
        w_event = eos_index_weights(samples, n_eos)
        if pdet is not None:
            w_event = w_event / np.maximum(pdet(np.asarray(eos_set.tov_mass)),
                                           1e-10)
        log_w = log_w + np.log(w_event + 1e-300)
        weights = np.exp(log_w - log_w.max())
        weights /= weights.sum()
        order = np.argsort(r14)
        cdf = np.cumsum(weights[order])
        med = np.interp(0.5, cdf, r14[order])
        lo = np.interp(0.16, cdf, r14[order])
        hi = np.interp(0.84, cdf, r14[order])
        trend.append((med, lo, hi))
    weights = np.exp(log_w - log_w.max())
    weights /= weights.sum()
    return weights, trend
