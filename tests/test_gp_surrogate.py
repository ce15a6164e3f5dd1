"""GP-backend SVD surrogate (sklearn-GP training-path parity)."""

import glob

import jax.numpy as jnp
import numpy as np


def test_gp_surrogate_accuracy():
    from nmma_tpu.ops.interp import masked_interp_linear
    from nmma_tpu.training import SVDTrainingConfig, read_bulla_grid
    from nmma_tpu.training.gp import (svd_gp_surrogate_mags,
                                      train_svd_gp_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, _ = read_bulla_grid(files, model="Bu2019lm_sparse")
    filters = ["ztfg", "ztfr"]
    meta, gp = train_svd_gp_model(
        entries, pnames, filters,
        config=SVDTrainingConfig(n_coeff=8, tmin=0.2, n_tsteps=60),
        n_steps=500, verbose=False)

    tt = meta["tt"]
    errs = []
    for e in entries:
        pred = np.asarray(svd_gp_surrogate_mags(meta, gp, e["params"],
                                                jnp.asarray(tt)))
        for j, f in enumerate(filters):
            truth = np.asarray(masked_interp_linear(
                tt, e["t"], e["mags"][f], fill_value=np.nan))
            sel = np.isfinite(truth) & np.isfinite(pred[j])
            errs.append(np.abs(pred[j][sel] - truth[sel]))
    errs = np.concatenate(errs)
    assert np.median(errs) < 0.1
    assert np.percentile(errs, 95) < 0.5


def test_compact_gp_surrogate_accuracy_and_roundtrip(tmp_path):
    """api_gp analogue: fixed compact-kernel GPs, shared factorization
    (reference GPAPITrainingModel, nmma/em/training.py:455-516)."""
    from nmma_tpu.ops.interp import masked_interp_linear
    from nmma_tpu.training import (SVDTrainingConfig, load_gp_surrogate,
                                   read_bulla_grid, save_gp_surrogate,
                                   train_svd_compact_gp_model)
    from nmma_tpu.training.gp import svd_gp_surrogate_mags
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, _ = read_bulla_grid(files, model="Bu2019lm_sparse")
    filters = ["ztfg", "ztfr"]
    meta, gp = train_svd_compact_gp_model(
        entries, pnames, filters,
        config=SVDTrainingConfig(n_coeff=8, tmin=0.2, n_tsteps=60))

    tt = meta["tt"]
    errs = []
    for e in entries:
        pred = np.asarray(svd_gp_surrogate_mags(meta, gp, e["params"],
                                                jnp.asarray(tt)))
        for j, f in enumerate(filters):
            truth = np.asarray(masked_interp_linear(
                tt, e["t"], e["mags"][f], fill_value=np.nan))
            sel = np.isfinite(truth) & np.isfinite(pred[j])
            errs.append(np.abs(pred[j][sel] - truth[sel]))
    errs = np.concatenate(errs)
    # interpolating GP (train_err=None): near-exact at the grid points
    assert np.median(errs) < 0.1
    assert np.percentile(errs, 95) < 0.5

    # save/load round trip preserves predictions exactly
    out = tmp_path / "compact.npz"
    save_gp_surrogate(out, meta, gp)
    meta2, gp2 = load_gp_surrogate(out)
    e = entries[0]
    a = np.asarray(svd_gp_surrogate_mags(meta, gp, e["params"],
                                         jnp.asarray(tt)))
    b = np.asarray(svd_gp_surrogate_mags(meta2, gp2, e["params"],
                                         jnp.asarray(tt)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_compact_kernel_properties():
    from nmma_tpu.training.gp_compact import compact_kernel
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(20, 3)).astype(np.float32)
    k = np.asarray(compact_kernel(x, x, np.full(3, 0.5, np.float32)))
    # symmetric, unit diagonal, compact support (zero beyond r >= 1)
    np.testing.assert_allclose(k, k.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-5)
    far = np.linalg.norm((x[:, None] - x[None, :]) / 0.5, axis=-1) >= 1.0
    assert np.all(k[far] == 0.0)
    # positive definite with jitter
    w = np.linalg.eigvalsh(k + 1e-6 * np.eye(20))
    assert w.min() > 0


def test_create_svdmodel_api_gp_cli(tmp_path):
    from nmma_tpu.cli.tools import create_svdmodel
    out = create_svdmodel([
        "--model", "Bu2019lm_sparse",
        "--data-path", "/root/reference/nmma/tests/data/bulla",
        "--interpolation-type", "api_gp",
        "--svd-path", str(tmp_path),
        "--svd-ncoeff", "6", "--tmin", "0.2", "--n-tsteps", "40",
        "--filters", "ztfg,ztfr",
    ])
    from nmma_tpu.training import load_gp_surrogate
    meta, gp = load_gp_surrogate(out)
    assert meta["filters"] == ("ztfg", "ztfr")
    assert gp.shape == (2, 6)
