"""Observing strategies, LC validation, grid tools, posterior columns."""

import numpy as np
import pytest


def test_rubin_strategies():
    from nmma_tpu.strategies import rubin_strategy
    plat = rubin_strategy("platinum")
    assert len(plat) == 6 and len(plat[0][1]) == 5
    gold = rubin_strategy("gold")
    assert gold[0][1] == ["ps1::g", "ps1::r", "ps1::i"]
    assert gold[3][1] == ["ps1::r", "ps1::i"]
    silver_z = rubin_strategy("silver_z")
    assert silver_z[0][1] == ["ps1::g", "ps1::z"]
    with pytest.raises(ValueError):
        rubin_strategy("bronze")


def test_injection_with_rubin_cadence():
    from nmma_tpu.injections import create_light_curve_data
    entry = dict(log10_mej=-1.3, log10_vej=-1.0, beta=3.0, log10_kappa_r=0.5,
                 luminosity_distance=40.0, timeshift=0.0)
    data = create_light_curve_data(
        entry, model="Me2017",
        filters=["ps1::g", "ps1::r", "ps1::i", "ps1::z", "ps1::y"],
        rubin_too_type="platinum", detection_limit=24.8, seed=5)
    # platinum: 6 epochs per filter
    assert set(data) <= {"ps1::g", "ps1::r", "ps1::i", "ps1::z", "ps1::y"}
    for sub in data.values():
        assert len(sub["time"]) <= 6
        assert np.all(np.diff(sub["time"]) >= 0)


def test_ztf_cadence(rng):
    from nmma_tpu.strategies import ztf_strategy
    strat = ztf_strategy(rng)
    assert len(strat) == 10
    assert all(set(f) == {"ztfg", "ztfr", "ztfi"} for _, f in strat)


def test_validate_lightcurve():
    from nmma_tpu.strategies import validate_lightcurve
    t = np.linspace(0.5, 5.0, 6)
    good = {"ztfg": {"time": t, "mag": np.full(6, 19.0),
                     "mag_error": np.full(6, 0.1)}}
    assert validate_lightcurve(good, min_obs=3)
    sparse = {"ztfg": {"time": t, "mag": np.full(6, 19.0),
                       "mag_error": np.array([0.1, np.inf, np.inf, np.inf,
                                              np.inf, np.inf])}}
    assert not validate_lightcurve(sparse, min_obs=3)
    assert not validate_lightcurve(good, filters=["ztfr"])
    # window cut: only 2 detections within 1.5 days of first epoch
    assert not validate_lightcurve(good, min_obs=3, cutoff_time=1.5)


def test_hdf5_grid_roundtrip(tmp_path):
    import h5py
    from nmma_tpu.training.grids import Grid, read_hdf5_grid
    path = tmp_path / "grid.h5"
    with h5py.File(path, "w") as f:
        for i in range(10):
            g = f.create_group(f"lc_{i:02d}")
            g.create_dataset("time", data=np.linspace(0.1, 10, 20))
            g.create_dataset("ZTF_g", data=np.full(20, -15.0 + i * 0.1))
    data = read_hdf5_grid(path)
    assert len(data) == 10
    assert "t" in data["lc_00"] and "ztfg" in data["lc_00"]

    grid = Grid(str(path), base_dirname=str(tmp_path / "out"))
    down = grid.downsample(factor=2)
    with h5py.File(down) as f:
        assert len(f.keys()) == 5
    frags = grid.fragment(factor=3)
    total = 0
    for frag in frags:
        with h5py.File(frag) as f:
            total += len(f.keys())
    assert total == 10


def test_standard_grid_reader(tmp_path):
    from nmma_tpu.training.grids import read_standard_grid_file
    arr = np.column_stack([np.linspace(0.1, 5, 8)] +
                          [np.full(8, -15.0 + i) for i in range(9)])
    path = tmp_path / "lc_standard.dat"
    np.savetxt(path, arr)
    data = read_standard_grid_file(path)
    assert list(data)[:4] == ["t", "u", "g", "r"]
    np.testing.assert_allclose(data["g"], -14.0)


def test_posterior_columns():
    from nmma_tpu.conversion import generate_posterior_parameters
    rng = np.random.default_rng(0)
    post = dict(mass_1=rng.uniform(1.4, 1.6, 50),
                mass_2=rng.uniform(1.2, 1.4, 50),
                chi_1=rng.uniform(-0.05, 0.05, 50),
                chi_2=rng.uniform(-0.05, 0.05, 50),
                lambda_1=rng.uniform(100, 500, 50),
                lambda_2=rng.uniform(100, 800, 50))
    out = generate_posterior_parameters(post)
    for k in ("chi_eff", "lambda_tilde", "mass_ratio", "chirp_mass"):
        assert k in out and len(np.asarray(out[k])) == 50
    assert np.all(np.asarray(out["lambda_tilde"]) > 0)


def test_ztf_apply_without_uncertainties_passes_raw_mags():
    """ztf_sampling only (uncertainties off): epochs resample the model
    but mags/errors pass through UNCENSORED — the reference applies
    limit-censoring only under ztf_uncertainties
    (lightcurve_generation.py:1073-1087)."""
    from nmma_tpu.strategies import ZTFObservingModel
    try:
        model = ZTFObservingModel()
    except FileNotFoundError:
        import pytest
        pytest.skip("ztf observing artifact absent")
    t = np.linspace(0.1, 10.0, 60)
    data = {f: {"time": 59000.0 + t, "mag": np.full_like(t, 30.0),
                "mag_error": np.full_like(t, 0.1)}
            for f in ("ztfg", "ztfr", "ztfi")}
    rng = np.random.default_rng(0)
    out = model.apply(data, ["ztfg", "ztfr", "ztfi"], rng, 10.0,
                      trigger_time=59000.0, uncertainties=False)
    # mag 30 is far below any ZTF limit, yet must NOT be censored
    for f, d in out.items():
        inside = np.isfinite(d["mag"])
        assert np.all(d["mag"][inside] == 30.0)
        assert np.all(d["mag_error"][inside] == 0.1)
    # with uncertainties on, the same epochs become non-detections
    out2 = model.apply(data, ["ztfg", "ztfr", "ztfi"],
                       np.random.default_rng(0), 10.0,
                       trigger_time=59000.0, uncertainties=True)
    any_censored = any(np.isinf(d["mag_error"][np.isfinite(d["mag"])]).any()
                       for d in out2.values() if len(d["mag"]))
    assert any_censored
