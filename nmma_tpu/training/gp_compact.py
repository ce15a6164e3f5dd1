"""Compact-kernel Gaussian-process SVD-surrogate backend.

Counterpart of ``GPAPITrainingModel`` (``nmma/em/training.py:455-516`` +
``load_api_gp_model``, ``:854-900``): the reference fits one
gaussian-process-api ``GaussianProcess`` per SVD coefficient with a
fixed compactly-supported ``CompactKernel`` (coeffs ``[0.5]*ndim``,
``train_err=None``) and a sparse Cholesky.  The compact support exists
to make the train-train kernel matrix sparse on CPU; on TPU a dense
[N, N] Cholesky and a dense [G, N] contraction ride the MXU far faster
than any sparse path, so we keep the *kernel* (truncated Wendland C2
polynomial - same zero structure, hence the same inductive bias) and
drop the sparse storage.

Because the kernel has no trained hyperparameters (matching the
reference, which never optimizes the compact kernel), the train-train
matrix is SHARED across all (filter, coefficient) GPs: one Cholesky
factorization serves every coefficient via a single multi-RHS solve -
O(N^3 + N^2 G) instead of the stacked-exact-GP backend's per-GP
factorizations.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def compact_kernel(x1, x2, scale):
    """Wendland C2 compactly-supported kernel matrix [n1, n2].

    k(r) = (1 - r)^4 (4 r + 1) for r < 1, else 0, with
    r^2 = sum_d ((x1_d - x2_d) / scale_d)^2.  Positive definite for
    dimensions <= 3 and a standard compact covariance in higher
    dimensions at these smoothness orders (Wendland 1995).
    """
    x1 = jnp.asarray(x1, dtype=jnp.float32)
    x2 = jnp.asarray(x2, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    d2 = jnp.sum(((x1[:, None, :] - x2[None, :, :]) / scale) ** 2, axis=-1)
    r = jnp.sqrt(jnp.maximum(d2, 1e-30))
    k = jnp.maximum(1.0 - r, 0.0) ** 4 * (4.0 * r + 1.0)
    return k


@dataclass
class CompactGPSurrogate:
    """Fixed-kernel GPs sharing one train-train factorization.

    Duck-types ``GPSurrogate.predict`` so ``svd_gp_surrogate_mags``
    consumes either backend.
    """

    x_train: np.ndarray        # [N, P] normalized parameters
    alpha_vecs: np.ndarray     # [G, N] K^-1 y per GP
    scale: np.ndarray          # [P] per-dimension support radii
    shape: tuple               # (F, C)

    def predict(self, x_star):
        """Coefficients [F, C] for one normalized parameter point [P]."""
        k_star = compact_kernel(x_star[None, :], self.x_train,
                                self.scale)[0]                  # [N]
        coeffs = jnp.asarray(self.alpha_vecs) @ k_star          # [G]
        return coeffs.reshape(self.shape)


def fit_compact_gp(x, coeffs, kernel_coeff=0.5, train_err=None,
                   jitter=1e-6) -> CompactGPSurrogate:
    """Fit all (F, C) compact-kernel GPs with one shared Cholesky.

    x [N, P] normalized to [0, 1]; coeffs [N, F, C].  ``kernel_coeff``
    mirrors the reference's ``coeffs=[0.5]*nd`` CompactKernel.fit: the
    support radius per dimension is ``kernel_coeff * range`` of the
    training data (0.5 = half the hypercube).  ``train_err`` is an
    optional per-point noise standard deviation (the reference passes
    ``train_err=None`` -> interpolating GP up to the jitter).
    """
    x = np.asarray(x, dtype=np.float32)
    n, p = x.shape
    f_n, c_n = coeffs.shape[1], coeffs.shape[2]
    y_all = jnp.asarray(
        np.asarray(coeffs).reshape(n, f_n * c_n), dtype=jnp.float32)

    span = x.max(axis=0) - x.min(axis=0)
    scale = np.where(span > 0, kernel_coeff * span, 1.0).astype(np.float32)

    k = compact_kernel(x, x, scale)
    if train_err is not None:
        k = k + jnp.diag(jnp.asarray(train_err, dtype=jnp.float32) ** 2)
    k = k + jitter * jnp.eye(n, dtype=jnp.float32)
    chol = jax.scipy.linalg.cho_factor(k, lower=True)
    alpha = jax.scipy.linalg.cho_solve(chol, y_all)             # [N, G]
    return CompactGPSurrogate(
        x_train=x, alpha_vecs=np.asarray(alpha).T, scale=scale,
        shape=(f_n, c_n))


def train_svd_compact_gp_model(entries, parameter_names, filters,
                               config=None, kernel_coeff=0.5):
    """SVD + compact-GP surrogate (interpolation-type 'api_gp' analogue).

    Returns ``(meta, CompactGPSurrogate)``; evaluate with
    ``nmma_tpu.training.gp.svd_gp_surrogate_mags``.
    """
    from .gp import _svd_decompose
    meta, x, coeffs = _svd_decompose(entries, parameter_names, filters,
                                     config)
    gp = fit_compact_gp(x, coeffs, kernel_coeff=kernel_coeff)
    return meta, gp
