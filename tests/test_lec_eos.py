"""LEC chiral-EFT emulator parameterizations on synthetic targets
(VERDICT r2 missing #4): parameter layouts, split mass-grid
decompression, conversion-chain integration, sklearn ingestion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.eos import (LEC7_PARAMETERS, LEC13_PARAMETERS,
                          LECEmulatorSet, ingest_reference_lec)
from nmma_tpu.eos.lec import decompose_masses


def test_parameter_layouts():
    assert LEC7_PARAMETERS == ("d11", "d22", "d3", "d4", "d6", "d7")
    assert len(LEC13_PARAMETERS) == 13
    assert LEC13_PARAMETERS[6:] == ("ksat", "qsat", "zsat", "cssq1",
                                    "cssq2", "cssq3", "cssq4")


def _oracle_disjoint(mtov, n_low, n_high, m_split=2.0):
    """f64 numpy oracle of the reference's properly_disjoint_masses
    (eos_processing.py:151-167)."""
    low = np.linspace(1.0, m_split, n_low)
    high = np.linspace(mtov, m_split, n_high, endpoint=False)[::-1]
    return np.concatenate([low, high])


def test_mass_grid_decompression_matches_reference_semantics():
    # equal spacing
    grid = np.asarray(decompose_masses(jnp.asarray(2.2), 30))
    np.testing.assert_allclose(grid, np.linspace(1.0, 2.2, 30), rtol=1e-6)
    # split grid
    got = np.asarray(decompose_masses(jnp.asarray(2.4), split=(10, 8)))
    want = _oracle_disjoint(2.4, 10, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert np.all(np.diff(got) > 0)
    # graceful fallback below the split value -> equal grid
    got_lo = np.asarray(decompose_masses(jnp.asarray(1.8), split=(10, 8)))
    np.testing.assert_allclose(got_lo, np.linspace(1.0, 1.8, 18),
                               rtol=1e-6)


def _synthetic_set(params=LEC7_PARAMETERS, n_mass=24, split=None):
    """Linear 'emulators' with known closed-form targets: mtov and
    radii/lambdas depend analytically on the first two constants."""
    p = len(params)
    feat_loc = np.zeros(p)
    feat_scale = np.ones(p)
    # mtov = 2.0 + 0.3 * d11 - 0.1 * d22
    w_m = np.zeros((p, 1)); w_m[0, 0] = 0.3; w_m[1, 0] = -0.1
    mass_layers = ((w_m.astype(np.float32), np.array([2.0], np.float32)),)
    # scaled radii: r_scaled = d11 * ones; scaler maps to 12 + d11
    w_r = np.zeros((p, n_mass)); w_r[0] = 1.0
    radius_layers = ((w_r.astype(np.float32),
                      np.zeros(n_mass, np.float32)),)
    # scaled log-lambdas: constant log10 lambda = 2.5 + 0.5 d22
    w_l = np.zeros((p, n_mass)); w_l[1] = 0.5
    lambda_layers = ((w_l.astype(np.float32),
                      np.full(n_mass, 2.5, np.float32)),)
    return LECEmulatorSet(
        parameter_names=tuple(params),
        feat_loc=feat_loc, feat_scale=feat_scale,
        mass_layers=mass_layers, radius_layers=radius_layers,
        lambda_layers=lambda_layers,
        radius_loc=np.full(n_mass, 12.0), radius_scale=np.ones(n_mass),
        lambda_loc=np.zeros(n_mass), lambda_scale=np.ones(n_mass),
        n_mass_samples=n_mass, split=split)


def test_forward_and_conversion_chain(tmp_path):
    emu = _synthetic_set()
    theta = {k: jnp.asarray(0.0) for k in LEC7_PARAMETERS}
    theta["d11"] = jnp.asarray(0.5)
    theta["d22"] = jnp.asarray(-1.0)
    masses, radii, lams = emu.forward(
        jnp.stack([theta[k] for k in LEC7_PARAMETERS]))
    np.testing.assert_allclose(float(masses[-1]), 2.25, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(radii), 12.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lams), 10**2.0, rtol=1e-4)

    p = emu({**theta, "mass_1_source": jnp.asarray(1.4),
             "mass_2_source": jnp.asarray(3.0)})
    np.testing.assert_allclose(float(p["TOV_mass"]), 2.25, rtol=1e-5)
    np.testing.assert_allclose(float(p["R_14"]), 12.5, rtol=1e-5)
    np.testing.assert_allclose(float(p["radius_1"]), 12.5, rtol=1e-5)
    assert float(p["radius_2"]) == 0.0       # above MTOV -> BH
    assert float(p["lambda_2"]) == 0.0

    # roundtrip + jit/vmap discipline
    path = tmp_path / "lec.npz"
    emu.save(path)
    back = LECEmulatorSet.load(path)
    assert back.parameter_names == LEC7_PARAMETERS

    def r14(d11):
        q = back({**theta, "d11": d11})
        return q["R_14"]
    np.testing.assert_allclose(float(jax.jit(r14)(jnp.asarray(0.5))),
                               12.5, rtol=1e-5)
    batch = jax.vmap(r14)(jnp.asarray([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(batch), [12.0, 12.5, 13.0],
                               rtol=1e-5)


def test_nan_below_mass_grid():
    emu = _synthetic_set()
    theta = {k: jnp.asarray(0.0) for k in LEC7_PARAMETERS}
    theta["d11"] = jnp.asarray(-3.0)       # mtov = 2.0 - 0.9 = 1.1 < 1.4
    p = emu(theta)
    assert np.isnan(float(p["R_14"])) and np.isnan(float(p["R_16"]))


def test_sklearn_ingestion_parity():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.neural_network import MLPRegressor
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(0)
    n, p, m = 400, len(LEC13_PARAMETERS), 12
    x = rng.normal(0, 1, (n, p))
    mtov = 2.0 + 0.2 * x[:, 0:1]
    radii = 12.0 + 0.5 * x[:, :m] if p >= m else None
    lams = 2.5 + 0.1 * x[:, :m]

    fs = StandardScaler().fit(x)
    rs = StandardScaler().fit(radii)
    ls = StandardScaler().fit(lams)
    xm = fs.transform(x)
    m_emu = MLPRegressor(hidden_layer_sizes=(16,), max_iter=400,
                         random_state=0).fit(
        xm, mtov.ravel())
    r_emu = MLPRegressor(hidden_layer_sizes=(16,), max_iter=400,
                         random_state=0).fit(
        xm, rs.transform(radii))
    l_emu = MLPRegressor(hidden_layer_sizes=(16,), max_iter=400,
                         random_state=0).fit(
        xm, ls.transform(lams))

    emu = ingest_reference_lec(
        dict(feature_scaler=fs, radius_scaler=rs, lambda_scaler=ls,
             mass_emulator=m_emu, radius_emulator=r_emu,
             lambda_emulator=l_emu),
        parameters=LEC13_PARAMETERS, n_mass_samples=m)
    theta = x[7]
    masses, r_j, lam_j = emu.forward(jnp.asarray(theta, jnp.float32))
    # parity with the sklearn predict path (the reference's LEC predict,
    # eos_processing.py:201-212)
    want_mtov = m_emu.predict(fs.transform(theta[None]))[0]
    want_r = rs.inverse_transform(
        r_emu.predict(fs.transform(theta[None])))[0]
    want_lam = 10 ** ls.inverse_transform(
        l_emu.predict(fs.transform(theta[None])))[0]
    np.testing.assert_allclose(float(masses[-1]), want_mtov, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r_j), want_r, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lam_j), want_lam, rtol=1e-3)


def test_minmax_scaler_nondefault_feature_range():
    """MinMaxScaler(feature_range=(-1, 1)) must reconstruct via the
    fitted min_/scale_ attributes — (x - data_min_)/(data_max_ -
    data_min_) is only the (0, 1) special case."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.preprocessing import MinMaxScaler

    from nmma_tpu.eos.lec import _scaler_affine

    rng = np.random.default_rng(1)
    x = rng.uniform(-3, 5, (200, 4))
    for fr in ((0.0, 1.0), (-1.0, 1.0), (2.0, 7.0)):
        sc = MinMaxScaler(feature_range=fr).fit(x)
        loc, scale = _scaler_affine(sc)
        np.testing.assert_allclose((x - loc) / scale, sc.transform(x),
                                   rtol=1e-10, atol=1e-12)
