"""create-svdmodel / svdmodel-benchmark / plot CLI + registry round trip."""

import json
import os

import numpy as np
import pytest


def test_training_cli_pipeline(tmp_path):
    from nmma_tpu.cli.tools import (create_svdmodel, plot_svdmodel_benchmarks,
                                    svdmodel_benchmark)
    svd_dir = tmp_path / "svdmodels"
    out = create_svdmodel([
        "--model", "Bu2019lm_sparse",
        "--data-path", "/root/reference/nmma/tests/data/bulla",
        "--svd-path", str(svd_dir),
        "--svd-ncoeff", "8", "--hidden", "48", "--n-epochs", "800",
        "--tmin", "0.2", "--n-tsteps", "50",
        "--filters", "ztfg,ztfr"])
    assert os.path.exists(out)

    scores = svdmodel_benchmark([
        "--model", "Bu2019lm_sparse",
        "--data-path", "/root/reference/nmma/tests/data/bulla",
        "--svd-path", str(svd_dir),
        "--outdir", str(tmp_path / "bench")])
    assert "ztfg" in scores and len(scores["ztfg"]) == 5

    png = plot_svdmodel_benchmarks([
        "--benchmark-file",
        str(tmp_path / "bench" / "Bu2019lm_sparse_benchmark.json"),
        "--outdir", str(tmp_path / "bench")])
    assert os.path.getsize(png) > 5000


def test_registry_load_registered_model(tmp_path, monkeypatch):
    import glob

    from nmma_tpu import registry
    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    monkeypatch.setenv(registry.MODELS_ENV, str(tmp_path))
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, filters = read_bulla_grid(files, model="Bu2019lm_sparse")
    svd = train_svd_model(entries, pnames, ["ztfg"],
                          SVDTrainingConfig(n_coeff=6, hidden=32,
                                            n_epochs=300, tmin=0.2,
                                            n_tsteps=40), verbose=False)
    svd.save(tmp_path / "MyModel.npz")
    source = registry.load_registered_model("MyModel")
    assert source.name == "MyModel"
    from nmma_tpu.models import DetectorLightCurveModel
    m = DetectorLightCurveModel("MyModel", ["ztfg"])
    _, mags = m(dict(log10_mej_dyn=-2.0, log10_mej_wind=-1.3,
                     luminosity_distance=40.0))
    assert np.isfinite(np.asarray(mags)).any()


def test_axial_symmetry_augmentation():
    """KNtheta mirror augmentation (reference em/training.py:764-779)."""
    import numpy as np
    import pytest

    from nmma_tpu.training.svd import axial_symmetry
    t = np.linspace(0.1, 5, 10)
    e = {"params": {"KNtheta": 30.0, "log10_mej_dyn": -2.0},
         "t": t, "mags": {"ztfg": np.linspace(18, 22, 10)}}
    out = axial_symmetry([e])
    assert len(out) == 3
    thetas = sorted(x["params"]["KNtheta"] for x in out)
    assert thetas == [-30.0, 30.0, 150.0]
    # photometry shared, other params copied
    for x in out:
        np.testing.assert_array_equal(x["mags"]["ztfg"], e["mags"]["ztfg"])
        assert x["params"]["log10_mej_dyn"] == -2.0
    with pytest.raises(ValueError):
        axial_symmetry([{"params": {"a": 1.0}, "t": t, "mags": {}}])


def test_continue_training_and_spline_cli(tmp_path):
    """--continue-training resumes from the saved surrogate (same basis,
    lower/equal loss) and --use-UnivariateSpline smooths the grid
    (reference em/training.py:127-159)."""
    import numpy as np

    from nmma_tpu.cli.tools import create_svdmodel
    from nmma_tpu.models.svd import SVDModelData
    base = ["--model", "Bu2019lm_sparse",
            "--data-path", "/root/reference/nmma/tests/data/bulla",
            "--svd-path", str(tmp_path), "--svd-ncoeff", "4",
            "--n-epochs", "80", "--tmin", "0.2", "--n-tsteps", "30",
            "--filters", "ztfg"]
    out = create_svdmodel(base)
    first = SVDModelData.load(out)
    out2 = create_svdmodel(base + ["--continue-training"])
    second = SVDModelData.load(out2)
    # the basis is reused, the weights moved on
    np.testing.assert_array_equal(first.va, second.va)
    np.testing.assert_array_equal(first.mins, second.mins)
    assert not np.array_equal(first.w1, second.w1)

    # spline-smoothed training also runs end to end
    out3 = create_svdmodel([
        "--model", "Bu2019lm_sparse",
        "--data-path", "/root/reference/nmma/tests/data/bulla",
        "--svd-path", str(tmp_path / "sp"), "--svd-ncoeff", "4",
        "--n-epochs", "40", "--tmin", "0.2", "--n-tsteps", "30",
        "--filters", "ztfg", "--use-UnivariateSpline",
        "--UnivariateSpline-s", "4.0"])
    assert SVDModelData.load(out3).va.shape[2] == 4


def test_training_nan_coverage_and_constant_param():
    """Two training robustness regressions: (a) grid entries with NaN
    bins (no time coverage) must not poison the saved normalisation;
    (b) a parameter constant across the grid (LANL KNtheta=0 default)
    must not produce 0/0 NaN inputs."""
    import glob

    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, filters = read_bulla_grid(files,
                                               model="Bu2019lm_sparse")
    # (a) truncate one entry's time span so the surrogate grid's tail
    # bins interpolate to NaN for it
    e0 = dict(entries[0])
    keep = e0["t"] < 6.0
    e0 = {"params": e0["params"], "t": e0["t"][keep],
          "mags": {k: v[keep] for k, v in e0["mags"].items()}}
    # spline mode fills out-of-span with NaN
    cfg = SVDTrainingConfig(n_coeff=4, hidden=16, n_epochs=150,
                            tmin=0.2, tmax=10.0, n_tsteps=30,
                            univariate_spline=True)
    # (b) add a constant extra parameter
    entries_c = [dict(e, params=dict(e["params"], KNtheta=0.0))
                 for e in [e0] + entries[1:]]
    svd = train_svd_model(entries_c, pnames + ["KNtheta"], ["ztfg"],
                          cfg, verbose=False)
    assert np.isfinite(svd.mins).all() and np.isfinite(svd.maxs).all()
    assert np.isfinite(svd.w1).all() and np.isfinite(svd.w2).all()
    # the surrogate evaluates finite
    from nmma_tpu.models.svd import svd_surrogate_mags
    import jax.numpy as jnp
    mags = np.asarray(svd_surrogate_mags(
        svd, {p: jnp.asarray(v) for p, v in
              zip(svd.parameter_names, [-2.0, -1.3, 0.0])},
        np.linspace(0.5, 8.0, 10)))
    assert np.isfinite(mags).all()


def test_holdout_fraction_zero_trains_on_full_grid(capsys):
    import glob

    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, _ = read_bulla_grid(files, model="Bu2019lm_sparse")
    train_svd_model(entries, pnames, ["ztfg"],
                    SVDTrainingConfig(n_coeff=4, hidden=16, n_epochs=50,
                                      holdout_fraction=0.0, tmin=0.2,
                                      n_tsteps=20), verbose=True)
    out = capsys.readouterr().out
    assert "holdout" not in out


def test_read_bulla_grid_empty_list_errors():
    import pytest

    from nmma_tpu.training import read_bulla_grid
    with pytest.raises(FileNotFoundError, match="matched nothing"):
        read_bulla_grid([], model="Bu2019lm_sparse")
