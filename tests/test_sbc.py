"""Simulation-based calibration (lite) of the nested sampler.

Talts et al. (2018) rank statistic: draw theta* from the prior,
synthesize data, run PE, record the posterior rank of theta*. Over
replications the ranks must be uniform — a calibration property that
catches posterior over/under-dispersion that moment or evidence checks
miss. Run here on a conjugate 2-D Gaussian problem so every posterior
has a closed form to cross-check against.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from nmma_tpu.inference import NestedSampler, NestedSamplerConfig

_SIGMA = 0.05          # likelihood width
_N_OBS = 4
_N_REP = 24


def _run_one(seed):
    rng = np.random.default_rng(seed)
    theta_true = rng.uniform(0.2, 0.8, size=2)
    data = theta_true + _SIGMA * rng.standard_normal((_N_OBS, 2))
    d = jnp.asarray(data)

    def logl(u):
        # prior = U(0,1)^2 == unit cube; likelihood N(u, sigma) per obs
        r = d[None] - u[:, None, :]
        return -0.5 * jnp.sum(r * r, axis=(1, 2)) / _SIGMA**2

    ns = NestedSampler(logl, 2, NestedSamplerConfig(
        nlive=128, n_delete=32, walks=10, dlogz=0.2, chunk_size=10,
        seed=seed))
    res = ns.run(verbose=False)
    idx = res.posterior_indices(np.random.default_rng(seed))
    post = res.samples_u[idx]
    # analytic posterior: N(mean(data), sigma/sqrt(n)) truncated to cube
    mu = data.mean(axis=0)
    sd = _SIGMA / np.sqrt(_N_OBS)
    ranks = (post < theta_true[None, :]).mean(axis=0)
    moment_err = np.abs(post.mean(axis=0) - mu) / sd
    std_ratio = post.std(axis=0) / sd
    return ranks, moment_err, std_ratio


def test_sbc_rank_uniformity():
    ranks, moment_errs, std_ratios = [], [], []
    for seed in range(_N_REP):
        r, m, s = _run_one(seed)
        ranks.append(r)
        moment_errs.append(m)
        std_ratios.append(s)
    ranks = np.asarray(ranks).ravel()          # [2 * N_REP]
    # uniformity of the rank statistic (KS test; fixed seeds, so this
    # is deterministic — threshold loose enough for N=48 ranks)
    ks = stats.kstest(ranks, "uniform")
    assert ks.pvalue > 0.01, (ks.statistic, ks.pvalue)
    # each posterior also matches its conjugate closed form
    moment_errs = np.asarray(moment_errs)
    std_ratios = np.asarray(std_ratios)
    assert np.median(moment_errs) < 0.5, np.median(moment_errs)
    assert 0.8 < np.median(std_ratios) < 1.2, np.median(std_ratios)
