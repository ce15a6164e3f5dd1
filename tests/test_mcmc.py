"""Ensemble-MCMC sampler: analytic correctness + NS cross-validation.

The stretch-move sampler shares the nested sampler's unit-cube logl
contract, so the same likelihood drives both; agreement of the two
independent samplers on moments is the cross-sampler posterior check
the reference gets from bilby's multi-backend surface.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nmma_tpu.inference import (EnsembleMCMC, EnsembleMCMCConfig,
                                NestedSampler, NestedSamplerConfig)

# correlated 2-D Gaussian inside the unit cube
_MU = np.array([0.58, 0.44])
_COV = np.array([[0.004, 0.0025], [0.0025, 0.0036]])
_PREC = np.linalg.inv(_COV)


def _logl(u):
    d = u - _MU
    return -0.5 * jnp.einsum("...i,ij,...j->...", d, _PREC, d)


def test_gaussian_moments_and_rhat():
    mcmc = EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(
        walkers=128, sweeps=1200, burn_frac=0.4, thin=2, seed=0))
    res = mcmc.run()
    assert 0.1 < res.acceptance < 0.9, res.acceptance
    assert np.nanmax(res.rhat) < 1.05, res.rhat
    mean = res.samples_u.mean(axis=0)
    cov = np.cov(res.samples_u.T)
    np.testing.assert_allclose(mean, _MU, atol=0.01)
    np.testing.assert_allclose(cov, _COV, rtol=0.25, atol=4e-4)


def test_cross_sampler_agreement():
    """NS and MCMC posteriors agree in mean/std on the same likelihood."""
    mcmc = EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(
        walkers=128, sweeps=1000, burn_frac=0.4, seed=1))
    m = mcmc.run()
    ns = NestedSampler(jax.vmap(_logl), 2, NestedSamplerConfig(
        nlive=256, n_delete=32, walks=12, dlogz=0.1, chunk_size=10,
        seed=1))
    r = ns.run(verbose=False)
    idx = r.posterior_indices()
    ns_samp = r.samples_u[idx]
    for k in range(2):
        assert abs(ns_samp[:, k].mean() - m.samples_u[:, k].mean()) < 0.012
        assert abs(ns_samp[:, k].std() - m.samples_u[:, k].std()) < 0.012


def test_validation_errors():
    import pytest
    with pytest.raises(ValueError):
        EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(walkers=31))
    with pytest.raises(ValueError):
        EnsembleMCMC(_logl, 20, EnsembleMCMCConfig(walkers=32))


def test_parallel_tempering_multimodal():
    """A well-separated bimodal target traps a plain ensemble in one
    mode; the tempering ladder recovers both with the right weights."""
    mu1, mu2 = 0.25, 0.75
    s = 0.02

    def logl(u):
        d1 = -0.5 * jnp.sum((u - mu1) ** 2, axis=-1) / s**2
        d2 = -0.5 * jnp.sum((u - mu2) ** 2, axis=-1) / s**2
        return jnp.logaddexp(d1, d2)

    pt = EnsembleMCMC(logl, 2, EnsembleMCMCConfig(
        walkers=128, sweeps=1500, burn_frac=0.4, temps=4, t_max=32.0,
        seed=3))
    res = pt.run()
    frac_hi = (res.samples_u[:, 0] > 0.5).mean()
    # equal-weight modes: each should hold 35-65% of the samples
    assert 0.35 < frac_hi < 0.65, frac_hi
    assert np.nanmax(res.rhat) < 1.2, res.rhat


def test_stepping_stone_evidence():
    """Stepping-stone ln Z from the tempering ladder matches both the
    analytic value and the nested sampler — two independent evidence
    estimators agreeing on the same likelihood."""
    # analytic: integral of exp(-chi^2/2) over the cube (mass fully
    # contained) = 2 pi sqrt(|Sigma|)
    lnz_true = np.log(2 * np.pi) + 0.5 * np.log(np.linalg.det(_COV))
    pt = EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(
        walkers=128, sweeps=1500, burn_frac=0.4, temps=8, t_max=512.0,
        evidence=True, seed=5))
    res = pt.run()
    assert np.isfinite(res.logz) and np.isfinite(res.logz_err)
    assert abs(res.logz - lnz_true) < max(3 * res.logz_err, 0.1), (
        res.logz, lnz_true, res.logz_err)
    ns = NestedSampler(jax.vmap(_logl), 2, NestedSamplerConfig(
        nlive=256, n_delete=32, walks=12, dlogz=0.1, chunk_size=10,
        seed=2))
    r = ns.run(verbose=False)
    assert abs(res.logz - r.logz) < 3 * max(res.logz_err + r.logz_err,
                                            0.05), (res.logz, r.logz)


def test_chunked_scan_matches_monolithic():
    """chunk_sweeps bounds single-dispatch runtime (remote TPU workers
    kill multi-minute executions) without changing the chain: the same
    per-sweep keys are consumed in the same order, so the trajectory is
    bitwise identical whatever the chunking — including a chunk that
    does not divide the sweep count."""
    chunked = EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(
        walkers=32, sweeps=50, chunk_sweeps=7, seed=3)).run()
    mono = EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(
        walkers=32, sweeps=50, chunk_sweeps=500, seed=3)).run()
    assert np.array_equal(chunked.chain_u, mono.chain_u)
    assert np.array_equal(chunked.logl, mono.logl)
    assert chunked.acceptance == mono.acceptance


def test_evidence_requires_ladder():
    import pytest
    with pytest.raises(ValueError):
        EnsembleMCMC(_logl, 2, EnsembleMCMCConfig(evidence=True, temps=1))
