import numpy as np

from nmma_tpu.constants import D, c_cgs, h, kb
from nmma_tpu.ops.photometry import blackbody_ab_mag, flux_to_ab_mag, log_expm1


def _bb_mag_oracle(nu, temp, radius):
    """Direct f64 Planck-law AB magnitude at the 10 pc reference distance."""
    x = h * nu * (1.0 / temp) / kb
    flux = 2.0 * h / c_cgs**2 * nu**3 / np.expm1(x) * radius**2 / D**2
    return -2.5 * np.log10(flux) - 48.6


def test_log_expm1_stable():
    x = np.array([1e-6, 0.1, 1.0, 19.0, 21.0, 100.0, 700.0])
    got = np.asarray(log_expm1(x))
    want = np.where(x < 30, np.log(np.expm1(np.minimum(x, 30.0))), x)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_blackbody_mag_matches_planck_law():
    nu = np.array([6e14, 3e14, 1.5e14])   # optical/NIR
    temps = np.array([3000.0, 5000.0, 10000.0, 2.0e4])
    radius = np.full_like(temps, 1e15)
    got = np.asarray(blackbody_ab_mag(nu, 1.0 / temps, radius))
    for fi in range(len(nu)):
        want = _bb_mag_oracle(nu[fi], temps, radius)
        np.testing.assert_allclose(got[fi], want, rtol=0, atol=2e-3)


def test_blackbody_invalid_photosphere_is_inf():
    nu = np.array([6e14])
    inv_t = np.array([np.inf, 1e-4])
    radius = np.array([1e15, 0.0])
    got = np.asarray(blackbody_ab_mag(nu, inv_t, radius))
    assert np.isinf(got).all()


def test_flux_to_ab_mag_units():
    # 3631 Jy == AB mag 0
    np.testing.assert_allclose(float(flux_to_ab_mag(3631.0, unit="Jy")), 0.0,
                               atol=1e-3)
    np.testing.assert_allclose(float(flux_to_ab_mag(3.631e6, unit="mJy")), 0.0,
                               atol=1e-3)
    assert np.isinf(float(flux_to_ab_mag(0.0)))


def test_model_aware_filter_resolution():
    """Surrogate-aware resolution (reference getFilteredMag semantics,
    utils.py:549-585): direct when trained, synonym/composite against
    survey-prefixed trained names otherwise; analytic models keep the
    direct generic evaluation."""
    from nmma_tpu.filters import resolve_filter
    avail = ("sdssu", "ztfg", "ztfr", "ztfi", "ps1::z", "ps1::y")
    assert resolve_filter("ztfg", available=avail) == ("direct", "ztfg")
    assert resolve_filter("V", available=avail) == (
        "average", ("ztfg", "ztfr"))
    assert resolve_filter("I", available=avail) == (
        "average", ("ps1::z", "ps1::y"))
    assert resolve_filter("B", available=avail) == ("direct", "ztfg")
    assert resolve_filter("R", available=avail) == ("direct", "ps1::z")
    import pytest
    with pytest.raises(KeyError, match="not resolvable"):
        resolve_filter("2massks", available=("ztfg",))
    # analytic kernels evaluate any band at its own wavelength
    assert resolve_filter("V") == ("direct", "V")


def test_composite_v_band_against_surrogate():
    """Observed V data fits a ztf-trained surrogate via the (g, r)
    average; the detector model auto-appends the helper rows."""
    import jax
    import jax.numpy as jnp

    from nmma_tpu.likelihood import (EMLikelihood, PhotometryData,
                                     SystematicsModel)
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.models.svd import SVDModelData, make_svd_source_model
    z = SVDModelData.load("artifacts/Bu2019lm_production_svd.npz")
    make_svd_source_model("BuVTest", z)
    m = DetectorLightCurveModel("BuVTest", ["V"])
    assert m.filters == ["V", "ztfg", "ztfr"]
    theta = dict(log10_mej_dyn=-2.0, log10_mej_wind=-1.0, KNphi=45.0,
                 KNtheta=30.0, luminosity_distance=40.0)
    t, mags = m(theta)
    mags = np.asarray(mags)
    v_avg = 0.5 * (mags[1] + mags[2])
    data = {"V": {"time": np.array([2.0, 4.0]),
                  "mag": np.interp([2.0, 4.0], np.asarray(t), v_avg),
                  "mag_error": np.array([0.1, 0.1])}}
    photo, filters = PhotometryData.from_dict(data, ["V"])
    lk = EMLikelihood(m, photo, filters,
                      SystematicsModel(filters, error_budget=0.2))
    ll = float(jax.jit(lk.log_likelihood)(theta))
    # data generated from the model's own (g+r)/2: near-perfect fit
    assert ll > -3.0, ll
