"""Telescope observing strategies + light-curve validation.

Counterparts of ``ztf_strategy`` / ``rubin_strategy`` /
``adjust_lc_for_telescopes`` (``nmma/em/lightcurve_generation.py:899-963``)
and ``validate_lightcurve`` (``nmma/em/lightcurve_handling.py:540-581``).
The strategies resample the true (dense) light curve onto realistic
observation epochs before noise/detection-limit application.
"""

from __future__ import annotations

import numpy as np


def ztf_strategy(rng):
    """Ad hoc ZTF cadence (reference :920-926): first epoch 1-12 h after
    trigger, revisits over the first week, ~1 h jitter per epoch."""
    t0 = rng.uniform(1 / 24.0, 12.0 / 24.0)
    filts = ["ztfg", "ztfr", "ztfi"]
    times = [t0, t0 + 0.2, t0 + 0.2, t0 + 0.4, t0 + 0.4, t0 + 1.0,
             t0 + 2.0, t0 + 3.0, t0 + 5.0, t0 + 7.0]
    return [(t + rng.normal(scale=1.0 / 24.0), filts) for t in times]


def rubin_strategy(rubin_too):
    """Rubin ToO tiers (reference :928-963, Rubin 2024 workshop naming)."""
    gold_times = [1 / 24.0, 2 / 24.0, 4 / 24.0, 1.0, 2.0, 3.0]
    if rubin_too == "platinum":
        filts = ["ps1::g", "ps1::r", "ps1::i", "ps1::z", "ps1::y"]
        return [(t, filts) for t in gold_times]
    if "gold" in rubin_too:
        init = ["ps1::g", "ps1::r",
                "ps1::z" if rubin_too == "gold_z" else "ps1::i"]
        filt_lists = [init] * 3 + [["ps1::r", "ps1::i"]] * 3
        return list(zip(gold_times, filt_lists))
    if "silver" in rubin_too:
        filts = ["ps1::g", "ps1::z"] if rubin_too == "silver_z" else \
            ["ps1::g", "ps1::i"]
        return [(t, filts) for t in [1 / 24.0, 1.0, 2.0, 3.0]]
    raise ValueError("rubin_ToO_type should be platinum, gold[_z] or "
                     "silver[_z]")


def apply_strategy(true_data, strategy, trigger_time=0.0):
    """Resample dense per-filter light curves onto strategy epochs.

    true_data: {filt: {'time': [...], 'mag': [...]}} (times absolute);
    out-of-range epochs become inf magnitudes (missed detections), like
    the reference's left/right=inf interpolation (:893-897).
    """
    epochs: dict[str, list] = {}
    for obstime, filts in strategy:
        for filt in filts:
            epochs.setdefault(filt, []).append(obstime + trigger_time)
    out = {}
    for filt, times in epochs.items():
        if filt not in true_data:
            continue
        src = true_data[filt]
        times = np.asarray(sorted(times))
        mags = np.interp(times, np.asarray(src["time"]),
                         np.asarray(src["mag"]), left=np.inf, right=np.inf)
        out[filt] = {"time": times, "mag": mags}
    return out


def validate_lightcurve(data, filters=None, min_obs=3, cutoff_time=0,
                        verbose=False):
    """Minimum-detections-per-filter-within-window check
    (reference lightcurve_handling.py:540-581)."""
    from .io import load_em_observations
    if isinstance(data, (str, bytes)):
        data = load_em_observations(data)
    filters = filters.split(",") if isinstance(filters, str) else \
        (filters or list(data.keys()))

    min_time = min(np.min(d["time"]) for d in data.values())
    if cutoff_time > 0:
        max_time = min_time + cutoff_time
    else:
        max_time = max(np.max(d["time"]) for d in data.values())

    for filt in filters:
        if filt not in data:
            if verbose:
                print(f"{filt} not in data file")
            return False
        mask = np.asarray(data[filt]["time"]) <= max_time
        detections = np.sum(np.isfinite(
            np.asarray(data[filt]["mag_error"])[mask]))
        if detections < min_obs:
            if verbose:
                print(f"{filt}: only {detections} detections, "
                      f"required: {min_obs}")
            return False
    return True
