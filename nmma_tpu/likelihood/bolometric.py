"""Bolometric-light-curve likelihood (Arnett supernova path).

Counterpart of ``BasicEMTransient`` used with
``SimpleBolometricLightCurveModel`` (``nmma/em/em_likelihood.py:140-276``,
``nmma/em/analysis.py:72-108``): chi^2 of bolometric luminosities with
Gaussian statistics and upper limits as log-survival terms. Luminosities
are carried in units of 1e40 erg/s (f32-safe; the models emit this scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr

from ..models.base import DetectorLightCurveModel
from ..ops.interp import masked_interp_sorted_fill

_NEG_INF = -1e30
L_UNIT = 1e40


class BolometricLikelihood:
    def __init__(self, light_curve_model: DetectorLightCurveModel, times,
                 lbol, lbol_err, sys_error=1e-4):
        """times [N] days since trigger; lbol, lbol_err in erg/s (host side,
        converted to the 1e40 scale here; inf err marks an upper limit)."""
        self.model = light_curve_model
        self.times = jnp.asarray(np.asarray(times, dtype=np.float64))
        self.lbol40 = jnp.asarray(np.asarray(lbol, dtype=np.float64) / L_UNIT)
        err = np.asarray(lbol_err, dtype=np.float64)
        self.sigma40 = jnp.asarray(np.where(np.isfinite(err), err / L_UNIT,
                                            np.inf))
        self.sys_error = float(sys_error)

    def log_likelihood(self, parameters):
        obs_times, lbol40_model = self.model(parameters)
        est = masked_interp_sorted_fill(self.times, obs_times, lbol40_model,
                                        jnp.inf)
        est_safe = jnp.where(jnp.isfinite(est), est, 1e30)

        is_det = jnp.isfinite(self.sigma40)
        total_sigma = jnp.sqrt(self.sigma40**2 + self.sys_error**2)
        safe_sigma = jnp.where(is_det, total_sigma, 1.0)
        u = (self.lbol40 - est_safe) / safe_sigma
        chi2_terms = (-0.5 * u * u - 0.5 * jnp.log(2.0 * jnp.pi)
                      - jnp.log(safe_sigma))
        chi2 = jnp.sum(jnp.where(is_det, chi2_terms, 0.0))

        sf_terms = log_ndtr(-(self.lbol40 - est_safe) /
                            jnp.maximum(self.sys_error, 1e-10))
        logsf = jnp.sum(jnp.where(~is_det, sf_terms, 0.0))

        logl = chi2 + logsf
        ok = jnp.any(jnp.isfinite(est))
        logl = jnp.where(ok, logl, _NEG_INF)
        return jnp.where(jnp.isnan(logl), _NEG_INF,
                         jnp.maximum(logl, _NEG_INF))

    def __call__(self, parameters):
        return self.log_likelihood(parameters)
