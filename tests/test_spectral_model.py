"""Spectral time-series SN model (the sncosmo architecture, VERDICT row
13): synthetic blackbody template -> registered source model -> detector
assembly, with K-correction and peak anchoring semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.models import DetectorLightCurveModel
from nmma_tpu.models.spectral import (M_REF, load_sncosmo_ascii_template,
                                      make_spectral_source_model)

C_AA = 2.99792458e18   # c in Angstrom/s


def _blackbody_template(t_peak=3.0, t_max=30.0):
    """Cooling blackbody with a rise/decline in bolometric output."""
    phase = np.linspace(0.5, t_max, 40)
    wave = np.geomspace(2000.0, 12000.0, 80)
    temp = 12000.0 * (phase / t_peak) ** -0.4
    lum = np.exp(-0.5 * ((phase - t_peak) / 6.0) ** 2)
    h, c, kb = 6.626e-27, 2.998e10, 1.381e-16
    lam_cm = wave * 1e-8
    flam = np.zeros((len(phase), len(wave)))
    for i, (tt, ll) in enumerate(zip(temp, lum)):
        bb = 1.0 / (lam_cm ** 5 * np.expm1(h * c / (lam_cm * kb * tt)))
        flam[i] = ll * bb / bb.max()
    return phase, wave, flam


@pytest.fixture(scope="module")
def model():
    phase, wave, flam = _blackbody_template()
    source = make_spectral_source_model("bb_template_test", phase, wave,
                                        flam)
    return DetectorLightCurveModel(source, ["ztfg", "ztfr", "2massj"])


def test_peak_anchoring(model):
    """Rest-frame peak near the anchor wavelength sits at M_REF."""
    params = dict(supernova_mag_boost=0.0, luminosity_distance=1e-5,
                  timeshift=0.0)
    _, mags = model(params)
    mags = np.asarray(mags)
    assert abs(np.nanmin(mags[0]) - M_REF) < 1.0   # g band ~ anchor band


def test_mag_boost_shifts_everything(model):
    p0 = dict(supernova_mag_boost=0.0, luminosity_distance=40.0,
              timeshift=0.0)
    p1 = dict(p0, supernova_mag_boost=1.5)
    _, m0 = model(p0)
    _, m1 = model(p1)
    d = np.asarray(m1) - np.asarray(m0)
    np.testing.assert_allclose(d[np.isfinite(d)], 1.5, atol=1e-5)


def test_k_correction_uses_spectrum(model):
    """At higher z the host-frame band samples bluer template flux: the
    color between bands changes — impossible with an effective-wavelength
    approximation of a fixed spectrum."""
    near = dict(supernova_mag_boost=0.0, luminosity_distance=40.0,
                timeshift=0.0)
    far = dict(near, luminosity_distance=2000.0)
    _, m_near = model(near)
    _, m_far = model(far)
    # color g - J at peak epoch
    def color(m):
        m = np.asarray(m)
        i = np.nanargmin(m[0])
        return m[0, i] - m[2, i]
    assert abs(color(m_far) - color(m_near)) > 0.02


def test_template_phase_range_is_inf_masked(model):
    params = dict(supernova_mag_boost=0.0, luminosity_distance=40.0,
                  timeshift=0.0)
    t = np.array([0.1, 3.0, 5.0, 8.0, 100.0])
    _, mags = model(params, sample_times=jnp.asarray(t))
    mags = np.asarray(mags)[:2]          # optical rows (2massj is outside
    #                                      the template wavelength range)
    assert np.isinf(mags[:, 0]).all()     # before template start
    assert np.isfinite(mags[:, 1:4]).all()
    assert np.isinf(mags[:, 4]).all()     # past template end


def test_sncosmo_ascii_roundtrip(tmp_path):
    phase, wave, flam = _blackbody_template()
    rows = []
    for i, p in enumerate(phase):
        for j, w in enumerate(wave):
            rows.append(f"{p} {w} {flam[i, j]:.6e}")
    f = tmp_path / "template.dat"
    f.write_text("\n".join(rows) + "\n")
    p2, w2, f2 = load_sncosmo_ascii_template(str(f))
    np.testing.assert_allclose(p2, phase)
    np.testing.assert_allclose(w2, wave)
    np.testing.assert_allclose(f2, flam, rtol=1e-5)
