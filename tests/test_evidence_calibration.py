"""Evidence-error calibration study (VERDICT r2 weak #8).

The sampler's logZ uncertainty combines a recursion over the dead-point
increments with a sqrt(H/nlive) fallback; round 2 validated it only as
"within 1 sigma on three analytic cases". This is the missing
calibration: repeat runs across seeds on analytic likelihoods and
compare the EMPIRICAL scatter of logZ against the REPORTED error.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from nmma_tpu.inference import NestedSampler, NestedSamplerConfig

N_SEEDS = 8


def _run_seeds(logl_fn, ndim, analytic, nlive=128):
    cfg = NestedSamplerConfig(nlive=nlive, n_delete=nlive // 8, walks=16,
                              dlogz=0.1, chunk_size=10)
    sampler = NestedSampler(logl_fn, ndim, cfg)
    logzs, errs = [], []
    for seed in range(N_SEEDS):
        res = sampler.run(key=jax.random.PRNGKey(seed), verbose=False)
        logzs.append(res.logz)
        errs.append(res.logz_err)
    logzs, errs = np.asarray(logzs), np.asarray(errs)
    emp = logzs.std(ddof=1)
    rep = errs.mean()
    bias = logzs.mean() - analytic
    return emp, rep, bias, logzs, errs


def test_gaussian_error_calibration():
    ndim, sigma = 3, 0.1

    def logl_fn(u):
        x = 20.0 * u - 10.0
        return (-0.5 * jnp.sum((x / sigma) ** 2, axis=-1)
                - 0.5 * ndim * jnp.log(2 * jnp.pi * sigma**2))

    analytic = -ndim * np.log(20.0)
    emp, rep, bias, logzs, errs = _run_seeds(logl_fn, ndim, analytic)
    print(f"\ngaussian: empirical std(logz) {emp:.3f} vs reported "
          f"{rep:.3f} (ratio {emp / rep:.2f}); bias {bias:+.3f}")
    # the reported error must be the right SCALE: within a factor ~2.5
    # of the cross-seed scatter (dynesty-class estimators sit in this
    # band on repeated-run studies)
    assert 0.4 < emp / rep < 2.5, (emp, rep)
    # and the ensemble must cover the truth
    assert abs(bias) < 3.0 * max(rep, emp), (bias, rep)


def test_eggbox_like_multimodal_calibration():
    """A likelihood with structure (two separated Gaussian modes): the
    error report must stay calibrated when the run has to split mass
    between modes."""
    ndim, sigma = 2, 0.05

    def logl_fn(u):
        a = jnp.sum(((u - 0.25) / sigma) ** 2, axis=-1)
        b = jnp.sum(((u - 0.75) / sigma) ** 2, axis=-1)
        return jnp.logaddexp(-0.5 * a, -0.5 * b) + jnp.log(0.5) \
            - ndim * jnp.log(jnp.sqrt(2 * jnp.pi) * sigma)

    analytic = 0.0   # two half-weight Gaussians integrate to 1 in [0,1]^2
    emp, rep, bias, logzs, errs = _run_seeds(logl_fn, ndim, analytic,
                                             nlive=256)
    print(f"\nbimodal: empirical std(logz) {emp:.3f} vs reported "
          f"{rep:.3f} (ratio {emp / rep:.2f}); bias {bias:+.3f}")
    assert 0.3 < emp / rep < 3.0, (emp, rep)
    assert abs(bias) < 3.0 * max(rep, emp), (bias, rep)


def test_correlated_prior_evidence():
    """Analytic evidence with a CORRELATED prior (VERDICT r3 next #4c):
    theta ~ N(m, Sigma_p) with rho = 0.7 enters through the unit-cube
    transform theta = m + L_chol Phi^-1(u); likelihood N(theta; mu0,
    sigma_l^2 I). Then Z = integral over u of L(theta(u)) du =
    N(mu0; m, Sigma_p + sigma_l^2 I) in closed form — the Gaussian
    convolution identity. Correlation makes the likelihood's support a
    narrow diagonal ridge in u-space, the geometry uncorrelated-prior
    cases never exercise."""
    from jax.scipy.special import ndtri

    rho, sig_p, sig_l = 0.7, 1.0, 0.3
    m = np.array([0.2, -0.4])
    mu0 = np.array([0.9, 0.1])
    cov_p = sig_p**2 * np.array([[1.0, rho], [rho, 1.0]])
    chol = np.linalg.cholesky(cov_p)
    chol_j = jnp.asarray(chol)
    m_j = jnp.asarray(m)
    mu0_j = jnp.asarray(mu0)

    def logl_fn(u):
        z = ndtri(jnp.clip(u, 1e-7, 1.0 - 1e-7))
        theta = m_j + z @ chol_j.T
        r = theta - mu0_j
        return (-0.5 * jnp.sum(r * r, axis=-1) / sig_l**2
                - jnp.log(2 * jnp.pi * sig_l**2))

    cov_z = cov_p + sig_l**2 * np.eye(2)
    diff = mu0 - m
    analytic = float(
        -0.5 * diff @ np.linalg.solve(cov_z, diff)
        - 0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(cov_z)))

    emp, rep, bias, logzs, errs = _run_seeds(logl_fn, 2, analytic,
                                             nlive=256)
    print(f"\ncorrelated prior: empirical std(logz) {emp:.3f} vs "
          f"reported {rep:.3f} (ratio {emp / rep:.2f}); bias {bias:+.3f}"
          f" (analytic {analytic:+.3f})")
    assert 0.3 < emp / rep < 3.0, (emp, rep)
    assert abs(bias) < 3.0 * max(rep, emp), (bias, rep)
