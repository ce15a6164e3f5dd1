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
