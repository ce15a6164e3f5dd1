"""Neutron-star mass-population likelihood (Landry & Read models).

TPU-native counterpart of ``nmma/population/pop_likelihood.py:5-28``:
flat or truncated-Gaussian ('peak') source-frame mass population plus a
``q^beta`` pairing term, written as pure jnp expressions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.stats import norm as jnorm


class NeutronStarPopulation:
    def __init__(self, model_name: str, beta: float = 0.0):
        self.beta = float(beta)
        self.model_name = model_name.lower()
        if self.model_name == "flat":
            self.m_min, self.m_max = 1.1, 2.0
            # NOTE: scipy uniform(loc, scale) spans [loc, loc+scale]; the
            # reference passes scale=m_max, reproducing its exact support
            self.support = (self.m_min, self.m_min + self.m_max)
            self._log_norm = -math.log(self.m_max)
        elif self.model_name == "peak":
            self.m_min, self.m_max = 1.1, 2.1
            self.loc, self.scale = 1.5, 1.0
            from scipy.special import ndtr
            a = (self.m_min - self.loc) / self.scale
            b = (self.m_max - self.loc) / self.scale
            self._log_z = math.log(ndtr(b) - ndtr(a))
        else:
            raise ValueError(f"unknown population model {model_name!r}")

    def _logpdf(self, m):
        if self.model_name == "flat":
            lo, hi = self.support
            return jnp.where((m >= lo) & (m <= hi), self._log_norm, -jnp.inf)
        in_range = (m >= self.m_min) & (m <= self.m_max)
        lp = jnorm.logpdf(m, self.loc, self.scale) - self._log_z
        return jnp.where(in_range, lp, -jnp.inf)

    def log_likelihood(self, parameters):
        q = jnp.asarray(parameters["mass_ratio"])
        return (self._logpdf(jnp.asarray(parameters["mass_1_source"]))
                + self._logpdf(jnp.asarray(parameters["mass_2_source"]))
                + self.beta * jnp.log(q))

    def __call__(self, parameters):
        return self.log_likelihood(parameters)
