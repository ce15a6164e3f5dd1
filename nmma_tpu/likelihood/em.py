"""Photometric (EM) likelihood as a single pure, batched logL kernel.

TPU-native re-design of ``MultiFilterTransient``/``BasicEMTransient``
(``nmma/em/em_likelihood.py:140-352``). The reference iterates a dict of
ragged per-filter arrays in Python per likelihood call; here observations
are padded once into dense ``[F, N]`` masked tensors and the whole
likelihood — model evaluation, per-filter interpolation onto observation
times, composite-filter averaging, systematics, truncated-Gaussian chi^2
and upper-limit log-survival terms — is one jit-compiled function

    ``log_likelihood(params) -> f32[]``

that vmaps trivially over a live-point batch (struct-of-arrays params).

Statistical semantics matched to the reference:
  * detections: truncated-Gaussian logpdf with upper truncation at the
    detection limit (``truncated_gaussian``, reference :252-256);
  * non-detections (inf error): Gaussian log-survival-function with the
    *systematic* error as scale (reference :243-249);
  * total sigma^2 = data^2 + systematic^2 (reference :214-216);
  * any NaN / all-inf model => -inf (float-min) log likelihood
    (reference sanity checks :206-209, :306-311).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr

from ..filters import resolve_filter
from ..models.base import DetectorLightCurveModel
from .systematics import SystematicsModel

_NEG_INF = -1e30  # finite stand-in for nan_to_num(-inf); safe in f32


@jax.tree_util.register_pytree_node_class
@dataclass
class PhotometryData:
    """Dense masked photometry: [F, N] arrays padded over observations."""

    times: jnp.ndarray       # [F, N] days since trigger
    mags: jnp.ndarray        # [F, N]
    sigmas: jnp.ndarray      # [F, N]; inf marks an upper limit
    valid: jnp.ndarray       # [F, N] bool: real sample (not padding)

    def tree_flatten(self):
        return (self.times, self.mags, self.sigmas, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_dict(cls, data: dict, filters=None):
        """Pad the nmma-standard per-filter dict to dense arrays.

        Returns (PhotometryData, filters). Padding samples carry
        valid=False and are excluded from every statistic.
        """
        if filters is None:
            filters = list(data.keys())
        n_max = max(len(np.atleast_1d(data[f]["time"])) for f in filters)
        shape = (len(filters), n_max)
        times = np.zeros(shape)
        mags = np.zeros(shape)
        sigmas = np.full(shape, np.inf)
        valid = np.zeros(shape, dtype=bool)
        for i, f in enumerate(filters):
            t = np.atleast_1d(data[f]["time"])
            m = np.atleast_1d(data[f]["mag"])
            s = np.atleast_1d(data[f]["mag_error"])
            times[i, :len(t)] = t
            mags[i, :len(t)] = m
            sigmas[i, :len(t)] = s
            valid[i, :len(t)] = True
        return cls(jnp.asarray(times), jnp.asarray(mags), jnp.asarray(sigmas),
                   jnp.asarray(valid)), list(filters)


def truncated_gaussian_logpdf(x, loc, scale, upper_lim):
    """ln truncnorm.pdf(x; a=-inf, b=(lim-loc)/scale, loc, scale).

    Matches ``truncated_gaussian`` (nmma/em/em_likelihood.py:252-256):
    standard normal logpdf minus log CDF of the truncation bound.
    """
    u = (x - loc) / scale
    log_phi = -0.5 * u * u - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(scale)
    b = (upper_lim - loc) / scale
    # log Phi(b); for lim=inf this is 0
    log_cdf = jnp.where(jnp.isposinf(b), 0.0, log_ndtr(jnp.where(
        jnp.isposinf(b), 0.0, b)))
    return log_phi - log_cdf


def gaussian_logsf(x, loc, scale):
    """ln(1 - Phi((x - loc)/scale)) — upper-limit penalty (reference :243-249)."""
    return log_ndtr(-(x - loc) / scale)


class EMLikelihood:
    """Photometric likelihood bound to one detector model + dataset."""

    def __init__(self, light_curve_model: DetectorLightCurveModel,
                 data: PhotometryData, filters,
                 systematics: SystematicsModel | None = None,
                 detection_limit=None):
        self.model = light_curve_model
        self.data = data
        self.filters = list(filters)
        self.systematics = systematics or SystematicsModel(self.filters)

        # static composite-filter resolution: observed filter -> model rows
        # + averaging weights (reference update_lightcurve_reference,
        # em_likelihood.py:313-335 and utils.get_filter_name_mapping)
        model_filters = list(self.model.filters)
        k_max = 1
        rows, weights = [], []
        for f in self.filters:
            kind, payload = resolve_filter(
                f, available=self.model.source.filter_names)
            if kind == "direct":
                helper = [payload]
            else:
                helper = list(payload)
            k_max = max(k_max, len(helper))
            rows.append([model_filters.index(h) for h in helper])
            weights.append([1.0 / len(helper)] * len(helper))
        for r, w in zip(rows, weights):
            while len(r) < k_max:
                r.append(0)
                w.append(0.0)
        self._helper_rows = np.asarray(rows)          # [F, K]
        self._helper_weights = np.asarray(weights)    # [F, K]


        # detection limits per observed filter (reference :303-304)
        if detection_limit is None:
            detection_limit = np.inf
        if isinstance(detection_limit, dict):
            lim = [detection_limit.get(f, np.inf) for f in self.filters]
        elif np.isscalar(detection_limit):
            lim = [float(detection_limit)] * len(self.filters)
        else:
            lim = list(detection_limit)
        self.detection_limit = jnp.asarray(lim)[:, None]   # [F, 1]

    # -- pure pieces ---------------------------------------------------------
    def expected_mags(self, obs_times_model, model_mags):
        """Model mags at the observation times, [F_obs, N].

        Per observed filter: interpolate each helper model row onto that
        filter's observation times (inf outside the modelled range), then
        average (composite filters are magnitude means).

        Gather-free hot path: linear interpolation is a dense hat-basis
        contraction, est[f, n] = sum_t hat(t_obs[f, n]; x)_t y[f, t] with
        the piecewise-linear hat built elementwise from the (monotone)
        model time grid — one einsum on the MXU instead of four dynamic
        gathers per query (gathers dominated the likelihood cost on TPU).
        Validity uses the contiguous-finite-block assumption of model
        light curves (inf head before rise / inf tail past the grid):
        queries outside [x[first_finite], x[last_finite]] -> inf fill.
        """
        x = obs_times_model                                    # [T]
        n_grid = x.shape[0]
        rows = model_mags[self._helper_rows]                   # [F, K, T]
        wrow = self._helper_weights[:, :, None]                # [F, K, 1]
        clean = jnp.where(jnp.isfinite(rows), rows, 0.0)

        # hat weights in time space (exact linear interp on any monotone
        # grid): w_t(xq) = clip(min((xq-x_{t-1})/dx_l, (x_{t+1}-xq)/dx_r))
        xq = self.data.times[:, :, None]                       # [F, N, 1]
        x_l = jnp.concatenate([x[:1], x[:-1]])
        x_r = jnp.concatenate([x[1:], x[-1:]])
        dl = jnp.maximum(x - x_l, 1e-30)
        dr = jnp.maximum(x_r - x, 1e-30)
        up = (xq - x_l[None, None, :]) / dl[None, None, :]
        dn = (x_r[None, None, :] - xq) / dr[None, None, :]
        hat = jnp.clip(jnp.minimum(up, dn), 0.0, 1.0)          # [F, N, T]
        # Two lowerings of the same contraction (cf. the GRB kernel's
        # NMMA_TPU_GRB_CONTRACT):
        #  - "einsum": an MXU dot at HIGHEST precision (the default bf16
        #    multiplies would cost ~0.05 mag on magnitudes ~20-40). The
        #    6-pass f32 emulation forces the [B, F, N, T] hat tensor out
        #    to HBM — 28 MiB per 512-batch on the headline config.
        #  - "fused": a VPU multiply+reduce. XLA fuses the hat producer
        #    into the reduction so hat stays in registers, at native f32
        #    precision; the matrices are tiny (N ~ 16) so the MXU was
        #    idle anyway. Default stays einsum until the TPU timing is
        #    recorded in BENCHMARKS.md.
        if os.environ.get("NMMA_TPU_EM_CONTRACT", "einsum") == "fused":
            est_k = jnp.sum(hat[:, None, :, :] * clean[:, :, None, :],
                            axis=-1)                           # [F, K, N]
        else:
            est_k = jnp.einsum("fnt,fkt->fkn", hat, clean,
                               precision=jax.lax.Precision.HIGHEST)

        valid = jnp.isfinite(rows)                             # [F, K, T]
        n_valid = valid.sum(axis=2)
        first = jnp.argmax(valid, axis=2)
        last = n_grid - 1 - jnp.argmax(jnp.flip(valid, axis=2), axis=2)
        tq = self.data.times[:, None, :]                       # [F, 1, N]
        ok = (tq >= x[first][:, :, None]) & (tq <= x[last][:, :, None]) \
            & (n_valid[:, :, None] >= 2)
        est_k = jnp.where(ok, est_k, jnp.inf)
        return jnp.sum(jnp.where(wrow > 0.0, est_k * wrow, 0.0), axis=1)

    def log_likelihood(self, parameters):
        obs_times_model, model_mags = self.model(parameters)

        # sanity: a usable model must have some finite magnitude in every
        # observed band's helper rows (reference sanity_check :306-311)
        est = self.expected_mags(obs_times_model, model_mags)

        sigma_sys = self.systematics(parameters, self.data.times)   # [F, N]

        is_det = self.data.valid & jnp.isfinite(self.data.sigmas)
        is_lim = self.data.valid & ~jnp.isfinite(self.data.sigmas)

        total_sigma = jnp.sqrt(self.data.sigmas**2 + sigma_sys**2)
        safe_sigma = jnp.where(is_det, total_sigma, 1.0)
        safe_est = jnp.where(jnp.isfinite(est), est, 1e30)

        chi2_terms = truncated_gaussian_logpdf(
            self.data.mags, safe_est, safe_sigma, self.detection_limit)
        chi2 = jnp.sum(jnp.where(is_det, chi2_terms, 0.0))

        sf_terms = gaussian_logsf(self.data.mags, safe_est,
                                  jnp.maximum(sigma_sys, 1e-10))
        logsf = jnp.sum(jnp.where(is_lim, sf_terms, 0.0))

        logl = chi2 + logsf
        # model completely invalid (all-inf in any used band) => -inf
        any_finite_per_band = jnp.any(
            jnp.isfinite(est) & self.data.valid, axis=1)
        used_band = jnp.any(self.data.valid, axis=1)
        ok = jnp.all(jnp.where(used_band, any_finite_per_band, True))
        logl = jnp.where(ok, logl, _NEG_INF)
        return jnp.where(jnp.isnan(logl), _NEG_INF, jnp.maximum(logl, _NEG_INF))

    def __call__(self, parameters):
        return self.log_likelihood(parameters)
