import numpy as np
import pytest


def test_gps_mjd_roundtrip():
    from nmma_tpu.io.photometry import gps_to_mjd, mjd_to_gps, \
        read_trigger_time
    # GW170817: gps 1187008882.4 == MJD 57982.5285236896 (astropy value)
    mjd = gps_to_mjd(1187008882.4)
    assert abs(mjd - 57982.5285236896) < 2e-6
    assert abs(mjd_to_gps(mjd) - 1187008882.4) < 1e-4
    assert read_trigger_time({"geocent_time": 1187008882.4}) == mjd
    assert read_trigger_time(trigger_time="2017-08-17T12:41:04.4") == \
        pytest.approx(mjd, abs=2e-6)
    assert read_trigger_time(trigger_time=57982.5) == 57982.5
    assert read_trigger_time() is None


def test_marginalised_lightcurve_expectation(rng):
    from nmma_tpu.eos import load_macro_eos_set
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.post_processing.marginalisation import \
        marginalised_lightcurve_expectation
    gw = dict(chirp_mass=rng.normal(1.1977, 0.001, 300),
              mass_ratio=rng.uniform(0.8, 1.0, 300),
              luminosity_distance=rng.normal(40, 3, 300).clip(10),
              theta_jn=rng.uniform(0.1, 0.6, 300))
    eos_set = load_macro_eos_set(
        "/root/reference/nmma/tests/data/eos_macro")
    model = DetectorLightCurveModel(
        "Me2017", ["ztfg", "ztfr"], sample_times=np.geomspace(0.1, 10, 40))
    bands = marginalised_lightcurve_expectation(
        gw, eos_set, model,
        extra_parameters=dict(ratio_zeta=0.3, alpha=5e-5, log10_vej=-1.2,
                              beta=3.0, log10_kappa_r=0.5),
        max_samples=150)
    assert bands.shape == (3, 2, 40)
    sel = np.isfinite(bands[0]) & np.isfinite(bands[2])
    assert sel.mean() > 0.5
    assert (bands[0] <= bands[2])[sel].all()
    # predicted apparent mags at 40 Mpc in a plausible kilonova range
    med = bands[1][np.isfinite(bands[1])]
    assert 15.0 < np.nanmin(med) < 24.0
