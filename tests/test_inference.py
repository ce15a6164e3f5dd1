"""Sampler correctness + end-to-end PE smoke tests.

Mirrors the reference's test strategy (SURVEY.md §4): tiny real inference
runs rather than mocks — analytic-evidence checks for the sampler, a
small Me2017 PE on synthetic data, and a trained-surrogate
injection-recovery loop.
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.inference import NestedSampler, NestedSamplerConfig


def test_gaussian_evidence():
    ndim, sigma = 3, 0.1

    def logl_fn(u):
        x = 20.0 * u - 10.0
        return (-0.5 * jnp.sum((x / sigma) ** 2, axis=-1)
                - 0.5 * ndim * jnp.log(2 * jnp.pi * sigma**2))

    analytic = -ndim * np.log(20.0)
    cfg = NestedSamplerConfig(nlive=256, n_delete=32, walks=16, dlogz=0.1,
                              chunk_size=10)
    res = NestedSampler(logl_fn, ndim, cfg).run(verbose=False)
    assert abs(res.logz - analytic) < 5 * max(res.logz_err, 0.1), \
        f"logz {res.logz} vs analytic {analytic}"

    idx = res.posterior_indices()
    x = 20 * res.samples_u[idx] - 10
    assert np.all(np.abs(x.mean(0)) < 0.05)
    assert np.all(np.abs(x.std(0) - sigma) < 0.05)


def test_me2017_pe_smoke(tmp_path):
    """End-to-end PE on a synthetic Me2017 injection (tiny nlive)."""
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.priors import parse_prior_dict

    truth = dict(log10_mej=-1.3, log10_vej=-1.1, beta=3.0,
                 log10_kappa_r=0.8, luminosity_distance=40.0, timeshift=0.0)
    filters = ["ztfg", "ztfr"]
    model = DetectorLightCurveModel("Me2017", filters)
    t_obs = np.geomspace(0.4, 10.0, 12)
    obs_times, mags = model(truth, sample_times=None)
    rng = np.random.default_rng(1)
    data = {}
    from nmma_tpu.ops.interp import masked_interp_sorted_fill
    for i, f in enumerate(filters):
        m = np.asarray(masked_interp_sorted_fill(t_obs, obs_times, mags[i],
                                                 jnp.inf))
        data[f] = {"time": t_obs, "mag": m + rng.normal(0, 0.1, len(t_obs)),
                   "mag_error": np.full(len(t_obs), 0.1)}

    priors = parse_prior_dict(
        "log10_mej = Uniform(minimum=-3., maximum=-0.5)\n"
        "log10_vej = Uniform(minimum=-2., maximum=-0.5)\n"
        "beta = Uniform(minimum=1., maximum=5.)\n"
        "log10_kappa_r = Uniform(minimum=-1., maximum=2.)\n"
        "luminosity_distance = 40.0\n"
        "timeshift = 0.0\n")
    cfg = EMAnalysisConfig(
        model="Me2017", trigger_time=0.0, error_budget=1.0,
        outdir=str(tmp_path), label="smoke",
        sampler=NestedSamplerConfig(nlive=128, n_delete=16, walks=12,
                                    dlogz=0.5, chunk_size=10, max_iter=400))
    ana = EMAnalysis(cfg, data=data, priors=priors)
    res = ana.run(verbose=False, checkpoint=False)
    assert np.isfinite(res.logz)
    post = ana.posterior_samples()
    # truth recovered within broad credible bounds
    for k in ("log10_mej", "log10_kappa_r"):
        lo, hi = np.percentile(post[k], [1, 99])
        assert lo - 0.3 < truth[k] < hi + 0.3, (k, lo, hi, truth[k])
    assert (tmp_path / "smoke_result.npz").exists()
    assert (tmp_path / "smoke_bestfit_params.json").exists()


@pytest.fixture(scope="module")
def trained_surrogate():
    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, filters = read_bulla_grid(files, model="Bu2019lm_sparse")
    cfg = SVDTrainingConfig(n_coeff=10, hidden=64, n_epochs=4000,
                            tmin=0.2, tmax=14.0, n_tsteps=80)
    svd = train_svd_model(entries, pnames, filters, cfg, verbose=False)
    return svd, entries, pnames


def test_svd_training_accuracy(trained_surrogate):
    from nmma_tpu.training import benchmark_svd_model
    svd, entries, pnames = trained_surrogate
    bench = benchmark_svd_model(svd, entries, pnames, filters=["ztfg", "ztfr"])
    for f, pct in bench.items():
        assert pct[2] < 0.5, f"median chi2/dof too high for {f}: {pct[2]}"


def test_svd_roundtrip_and_pe(trained_surrogate, tmp_path):
    """Save/load roundtrip + injection-recovery PE with the surrogate."""
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.models.svd import SVDModelData, make_svd_source_model
    from nmma_tpu.ops.interp import masked_interp_sorted_fill
    from nmma_tpu.priors import parse_prior_dict

    svd, _, _ = trained_surrogate
    path = tmp_path / "svdmodel.npz"
    svd.save(path)
    svd2 = SVDModelData.load(path)
    np.testing.assert_allclose(svd.va, svd2.va)

    source = make_svd_source_model("Bu2019lm_sparse_test", svd2)
    filters = ["ztfg", "ztfr"]
    model = DetectorLightCurveModel(source, filters)
    truth = dict(log10_mej_dyn=-2.0, log10_mej_wind=-1.3,
                 luminosity_distance=40.0, timeshift=0.0)
    obs_times, mags = model(truth)
    t_obs = np.linspace(0.5, 10.0, 15)
    rng = np.random.default_rng(7)
    data = {}
    for i, f in enumerate(filters):
        m = np.asarray(masked_interp_sorted_fill(t_obs, obs_times, mags[i],
                                                 jnp.inf))
        assert np.isfinite(m).all()
        data[f] = {"time": t_obs, "mag": m + rng.normal(0, 0.1, len(t_obs)),
                   "mag_error": np.full(len(t_obs), 0.1)}

    priors = parse_prior_dict(
        "log10_mej_dyn = Uniform(minimum=-3., maximum=-1.)\n"
        "log10_mej_wind = Uniform(minimum=-2., maximum=-0.9)\n"
        "luminosity_distance = 40.0\n"
        "timeshift = 0.0\n")
    cfg = EMAnalysisConfig(
        model="Bu2019lm_sparse_test", trigger_time=0.0, error_budget=1.0,
        tmin=0.2, tmax=14.0, outdir=str(tmp_path), label="svdpe",
        sampler=NestedSamplerConfig(nlive=128, n_delete=16, walks=12,
                                    dlogz=0.5, chunk_size=10, max_iter=300))
    ana = EMAnalysis(cfg, data=data, priors=priors)
    res = ana.run(verbose=False, checkpoint=False)
    post = ana.posterior_samples()
    for k in ("log10_mej_dyn", "log10_mej_wind"):
        med = np.median(post[k])
        assert abs(med - truth[k]) < 0.4, (k, med, truth[k])


def test_likelihood_plateau_does_not_degenerate():
    """A likelihood constant over a finite region ties live points at
    the threshold; the tie-tolerant refill must keep the live set spread
    over the plateau instead of collapsing onto one point, and the
    evidence must stay finite and roughly right."""
    import jax.numpy as jnp

    # logL = 0 inside [0.2, 0.8]^2, -50 outside: Z = 0.36*e^0 + 0.64*e^-50
    def logl(u):
        inside = jnp.all((u > 0.2) & (u < 0.8), axis=-1)
        return jnp.where(inside, 0.0, -50.0)

    s = NestedSampler(logl, 2, NestedSamplerConfig(
        nlive=256, n_delete=32, walks=10, dlogz=0.05, chunk_size=10,
        seed=0, max_iter=400))
    r = s.run(verbose=False)
    lnz_true = np.log(0.36 + 0.64 * np.exp(-50.0))
    assert np.isfinite(r.logz)
    assert abs(r.logz - lnz_true) < max(5 * r.logz_err, 0.25), (
        r.logz, lnz_true, r.logz_err)
    # the surviving live set must not have collapsed to one point
    idx = r.posterior_indices()
    spread = r.samples_u[idx].std(axis=0)
    assert (spread > 0.05).all(), spread
