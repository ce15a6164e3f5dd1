"""Gaussian kernel density estimation as a jittable logsumexp kernel.

The reference builds ``scipy.stats.gaussian_kde`` objects inside its
resampling likelihoods (``nmma/post_processing/resampling.py:53-171``);
here the KDE is a pure jnp function — log-density = logsumexp over kernel
centres with a Scott's-rule bandwidth — so resampling runs inside the same
vectorized nested sampler as everything else, batched on the MXU
(the kernel evaluation is one [N_samples, D] x [D] contraction per point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class GaussianKDE:
    def __init__(self, samples, weights=None, bw_factor=1.0):
        """samples: [N, D] (or [N] for 1-D)."""
        samples = np.atleast_2d(np.asarray(samples, dtype=np.float64))
        if samples.shape[0] < samples.shape[1]:
            samples = samples.T
        self.n, self.d = samples.shape
        if weights is None:
            weights = np.full(self.n, 1.0 / self.n)
        weights = np.asarray(weights, dtype=np.float64)
        weights = weights / weights.sum()

        # Scott's rule with weighted effective sample size
        neff = 1.0 / np.sum(weights**2)
        factor = bw_factor * neff ** (-1.0 / (self.d + 4))
        mean = np.average(samples, axis=0, weights=weights)
        centred = samples - mean
        cov = (centred * weights[:, None]).T @ centred / (1 - np.sum(weights**2))
        bw_cov = cov * factor**2
        self._chol = np.linalg.cholesky(bw_cov + 1e-12 * np.eye(self.d))
        self._log_norm = (np.log(weights) - 0.5 * self.d * np.log(2 * np.pi)
                          - np.sum(np.log(np.diag(self._chol))))
        self._inv_chol = np.linalg.inv(self._chol)
        self.samples = jnp.asarray(samples)
        self._log_norm = jnp.asarray(self._log_norm)
        self._inv_chol_j = jnp.asarray(self._inv_chol)

    def logpdf(self, x):
        """log density at x [D] (or scalar for 1-D). Pure + jittable."""
        x = jnp.atleast_1d(jnp.asarray(x))
        diff = x[None, :] - self.samples                  # [N, D]
        z = diff @ self._inv_chol_j.T                     # [N, D]
        sq = jnp.sum(z * z, axis=1)
        return jax.scipy.special.logsumexp(self._log_norm - 0.5 * sq)

    def __call__(self, x):
        return self.logpdf(x)
