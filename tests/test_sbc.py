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


# ---------------------------------------------------------------------------
# SBC on a REAL light-curve model (VERDICT r3 next #4b): Me2017 PE at
# small nlive, rank uniformity on 4 physical parameters. The synthetic
# data are generated on the SAME time grid the PE model integrates on
# (then thinned): the Me2017 dynamics are integrated over the sample
# grid, so a coarser synthesis grid is a *different* forward model and
# shows up as a directional rank bias (measured: vej ranks pinned at
# ~0.9, kappa at ~0.1 with a 10-node synthesis grid) — a useful
# demonstration that SBC catches forward-model mismatch, but calibration
# of the SAMPLER requires matched grids.

_ME_PRIOR = ("log10_mej = Uniform(minimum=-2.5, maximum=-1.5)\n"
             "log10_vej = Uniform(minimum=-1.4, maximum=-0.7)\n"
             "beta = Uniform(minimum=2.0, maximum=5.0)\n"
             "log10_kappa_r = Uniform(minimum=-0.5, maximum=1.5)\n"
             "luminosity_distance = 40.0\ntimeshift = 0.0\n")
_ME_PARAMS = ("log10_mej", "log10_vej", "beta", "log10_kappa_r")
_ME_REPS = 12


def _me2017_rank_one(seed, tmp_root):
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.injections import create_light_curve_data
    from nmma_tpu.priors import parse_prior_dict

    rng = np.random.default_rng(100 + seed)
    priors = parse_prior_dict(_ME_PRIOR)
    u = rng.uniform(0.02, 0.98, priors.ndim)
    theta = {k: float(np.asarray(v))
             for k, v in priors.transform(jnp.asarray(u)).items()}
    data = create_light_curve_data(
        theta, "Me2017", ["ztfg", "ztfr"],
        sample_times=np.geomspace(0.1, 12.0, 60),
        seed=200 + seed, injection_error_budget=0.3)
    data = {f: {k: np.asarray(v)[5::6] for k, v in sub.items()}
            for f, sub in data.items()}
    cfg = EMAnalysisConfig(
        model="Me2017", trigger_time=0.0, tmin=0.1, tmax=12.0,
        n_tsteps=60, error_budget=0.0, outdir=str(tmp_root),
        label=f"sbc{seed}",
        sampler=NestedSamplerConfig(nlive=128, n_delete=32, walks=8,
                                    dlogz=0.5, chunk_size=10,
                                    seed=300 + seed))
    ana = EMAnalysis(cfg, data=data, priors=parse_prior_dict(_ME_PRIOR))
    ana.run(verbose=False, checkpoint=False)
    post = ana.posterior_samples(rng=rng)
    return [float(np.mean(post[k] < theta[k])) for k in _ME_PARAMS]


def test_sbc_me2017_pe(tmp_path):
    """Rank uniformity of a real Me2017 PE over prior replications."""
    ranks = np.asarray([_me2017_rank_one(s, tmp_path)
                        for s in range(_ME_REPS)])         # [R, 4]
    # per-parameter: no parameter may show a hard directional lock
    for j, name in enumerate(_ME_PARAMS):
        r = ranks[:, j]
        p = stats.kstest(r, "uniform").pvalue
        assert p > 5e-4, (name, r, p)
        assert 0.15 < r.mean() < 0.85, (name, r.mean())
    # pooled (4 * R values; parameters correlate within a rep, so this
    # is a screen, not an exact test)
    pooled = ranks.ravel()
    p_pool = stats.kstest(pooled, "uniform").pvalue
    assert p_pool > 1e-3, (pooled, p_pool)
