"""Reference SVD-artifact interop (VERDICT r1 #8 / weak #7): parse the
shipped ``Bu2019nsbh_tf/*.h5`` keras weights and run the full ingestion +
fused evaluation path on them."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.models.svd import (SVDModelData, _read_keras_h5_dense_stack,
                                 ingest_nmma_svd_model, svd_surrogate_mags)

NSBH_DIR = "/root/reference/nmma/tests/data/Bu2019nsbh_tf"
FILTERS = ["2massks", "sdssu", "ztfr"]


def test_read_reference_keras_h5_weights():
    """The real reference artifacts parse into (P->H, H->C) dense stacks."""
    shapes = []
    for f in FILTERS:
        w1, b1, w2, b2 = _read_keras_h5_dense_stack(
            os.path.join(NSBH_DIR, f"{f}.h5"))
        assert w1.shape == (3, 2048)       # Bu2019nsbh: 3 params
        assert b1.shape == (2048,)
        assert w2.shape == (2048, 10)      # n_coeff = 10
        assert b2.shape == (10,)
        assert np.all(np.isfinite(w1)) and np.all(np.isfinite(w2))
        shapes.append(w1.shape)
    assert len(set(shapes)) == 1


def test_ingest_and_evaluate_reference_weights(tmp_path):
    """Wrap the real per-filter MLPs in a reference-layout joblib core and
    drive ingest_nmma_svd_model -> fused surrogate eval end to end."""
    joblib = pytest.importorskip("joblib")
    rng = np.random.default_rng(0)
    tt = np.linspace(0.1, 10.0, 50)
    core = {}
    for f in FILTERS:
        core[f] = {
            "tt": tt,
            "VA": rng.normal(size=(50, 10)),
            "mins": rng.uniform(-18, -16, 50),
            "maxs": rng.uniform(-15, -13, 50),
            "n_coeff": 10,
            "param_mins": np.array([-3.0, -3.0, 0.0]),
            "param_maxs": np.array([-1.0, -0.5, 90.0]),
            "model_parameters": ["log10_mej_dyn", "log10_mej_wind",
                                 "KNtheta"],
        }
    model_dir = tmp_path / "Bu2019nsbh"
    model_dir.mkdir()
    joblib.dump(core, model_dir / "Bu2019nsbh.joblib")
    for f in FILTERS:
        os.symlink(os.path.join(NSBH_DIR, f"{f}.h5"),
                   model_dir / f"{f}.h5")

    svd = ingest_nmma_svd_model(str(model_dir), "Bu2019nsbh")
    assert svd.filters == tuple(FILTERS)
    assert svd.w1.shape == (3, 3, 2048)
    assert svd.n_coeff == 10

    params = {"log10_mej_dyn": -2.0, "log10_mej_wind": -1.5,
              "KNtheta": 30.0}
    t_out = np.linspace(0.5, 8.0, 20)
    mags = np.asarray(jax.jit(
        lambda p: svd_surrogate_mags(svd, p, t_out))(params))
    assert mags.shape == (3, 20)
    assert np.all(np.isfinite(mags))
    # outside the trained time range -> inf fill
    mags_out = np.asarray(svd_surrogate_mags(svd, params,
                                             np.array([0.01, 20.0])))
    assert np.all(np.isinf(mags_out))

    # round trip through our npz format preserves the evaluation
    path = tmp_path / "roundtrip.npz"
    svd.save(str(path))
    svd2 = SVDModelData.load(str(path))
    mags2 = np.asarray(svd_surrogate_mags(svd2, params, t_out))
    np.testing.assert_allclose(mags2, mags, rtol=1e-5, atol=1e-5)


def test_fast_eval_matches_reference_formulation():
    """The fused block-diagonal operator equals the einsum formulation."""
    rng = np.random.default_rng(3)
    f, t, c, p, h = 4, 30, 6, 2, 16
    svd = SVDModelData(
        filters=tuple(f"f{i}" for i in range(f)),
        parameter_names=("a", "b"),
        tt=np.linspace(0.1, 5.0, t),
        va=rng.normal(size=(f, t, c)),
        mins=rng.uniform(-18, -16, (f, t)),
        maxs=rng.uniform(-15, -13, (f, t)),
        param_mins=np.zeros(p), param_maxs=np.ones(p),
        w1=rng.normal(size=(f, p, h)), b1=rng.normal(size=(f, h)),
        w2=rng.normal(size=(f, h, c)), b2=rng.normal(size=(f, c)))
    params = {"a": 0.3, "b": 0.7}
    tq = np.linspace(0.2, 4.8, 17)
    fast = np.asarray(svd_surrogate_mags(svd, params, tq))

    # oracle: plain per-filter einsum chain + np.interp
    x = np.array([0.3, 0.7])
    oracle = np.zeros((f, len(tq)))
    for fi in range(f):
        hidden = np.maximum(x @ svd.w1[fi] + svd.b1[fi], 0.0)
        coeff = hidden @ svd.w2[fi] + svd.b2[fi]
        m = svd.va[fi] @ coeff
        m = m * (svd.maxs[fi] - svd.mins[fi]) + svd.mins[fi]
        oracle[fi] = np.interp(tq, svd.tt, m)
    np.testing.assert_allclose(fast, oracle, rtol=1e-4, atol=1e-4)


def test_chunked_batched_logl_consistency():
    """EMAnalysis.batched_logl splits oversized batches into sequential
    dispatches (guarding the >2 GiB buffer corruption) without changing
    values."""
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.priors import parse_prior_dict

    rng = np.random.default_rng(0)
    t_obs = np.linspace(0.5, 8.0, 8)
    data = {f: {"time": t_obs, "mag": 18.0 + rng.normal(0, 0.1, 8),
                "mag_error": np.full(8, 0.1)} for f in ("ztfg", "ztfr")}
    priors = parse_prior_dict(
        "log10_mej = Uniform(minimum=-3., maximum=-0.5)\n"
        "log10_vej = Uniform(minimum=-2., maximum=-0.5)\n"
        "beta = Uniform(minimum=1., maximum=5.)\n"
        "log10_kappa_r = Uniform(minimum=-1., maximum=2.)\n"
        "luminosity_distance = 40.\ntimeshift = 0.\n")
    # default (fine) model grid: the coarse-grid Me2017 instability would
    # otherwise amplify float noise between the two dispatch paths
    ana = EMAnalysis(EMAnalysisConfig(model="Me2017", tmax=14.0,
                                      error_budget=1.0),
                     data=data, priors=priors)
    ana.MAX_DISPATCH_BATCH = 64   # force chunking at test scale
    u = rng.uniform(0.1, 0.9, (200, priors.ndim)).astype(np.float32)
    chunked = np.asarray(jax.jit(ana.batched_logl)(jnp.asarray(u)))
    direct = np.asarray(ana._batched_logl(jnp.asarray(u)))
    np.testing.assert_allclose(chunked, direct, rtol=1e-3, atol=0.05)


def test_fast_eval_modes_agree(monkeypatch):
    """dense block-diagonal vs batched per-filter output operators are
    numerically identical (the batched form skips the F x zero-block
    FLOPs at production dims; NMMA_TPU_SVD_EVAL selects)."""
    from nmma_tpu.models.svd import _SVDFastEval
    rng = np.random.default_rng(5)
    f, t, c, p, h = 3, 25, 5, 4, 32
    svd = SVDModelData(
        filters=tuple(f"f{i}" for i in range(f)),
        parameter_names=("a", "b", "c", "d"),
        tt=np.linspace(0.1, 5.0, t),
        va=rng.normal(size=(f, t, c)),
        mins=rng.uniform(-18, -16, (f, t)),
        maxs=rng.uniform(-15, -13, (f, t)),
        param_mins=np.zeros(p), param_maxs=np.ones(p),
        w1=rng.normal(size=(f, p, h)), b1=rng.normal(size=(f, h)),
        w2=rng.normal(size=(f, h, c)), b2=rng.normal(size=(f, c)))
    ev = _SVDFastEval(svd)
    params = {k: 0.2 * (i + 1) for i, k in enumerate("abcd")}
    tq = np.linspace(0.0, 5.5, 21)   # includes out-of-range fill
    monkeypatch.setenv("NMMA_TPU_SVD_EVAL", "dense")
    a = np.asarray(ev(params, tq))
    monkeypatch.setenv("NMMA_TPU_SVD_EVAL", "batched")
    b = np.asarray(ev(params, tq))
    assert np.array_equal(np.isfinite(a), np.isfinite(b))
    fin = np.isfinite(a)
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=1e-5)
