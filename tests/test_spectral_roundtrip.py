"""sncosmo-path round trip on a vendored spectral-template fixture.

Replicates the reference's injection round-trip test for its sncosmo
models (nmma/tests/injections.py:176-216, run for nugent-hyper and
salt2): create an injection from the shipped prior via the CLI,
generate the light curve via the CLI, generate it again via the library
function, and require the magnitudes to agree — plus the reference's SN
conventions (peak-mag anchoring to M_REF = -19.35, SALT2
distance-modulus exemption, source-frame time stretch;
nmma/em/model.py:1061-1227). The template *data* (sncosmo downloads)
are gated offline, so the fixture is a synthetic blackbody-photosphere
time series (tests/data/synthetic_sn_template.dat) exercising the same
architecture.
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "synthetic_sn_template.dat")


@pytest.fixture()
def template_home(tmp_path, monkeypatch):
    """Expose the fixture under the sncosmo name 'nugent-hyper' through
    the gated-template resolution dir, plus a synthetic SALT2 surface
    under 'salt2'."""
    import shutil

    home = tmp_path / "templates"
    home.mkdir()
    shutil.copy(FIXTURE, home / "nugent-hyper.dat")

    # synthetic SALT2 component surfaces: M0 = the fixture SED, M1 = a
    # phase-antisymmetric perturbation, CL = a smooth color law
    raw = np.loadtxt(FIXTURE)
    phase = np.unique(raw[:, 0])
    wave = np.unique(raw[:, 1])
    m0 = raw[:, 2].reshape(len(phase), len(wave))
    pk = phase[np.argmax(m0.sum(axis=1))]
    m1 = m0 * 0.3 * np.tanh((phase[:, None] - pk) / 10.0)
    salt = home / "salt2"
    salt.mkdir()

    def dump(path, grid):
        rows = [(p, w, grid[i, j]) for i, p in enumerate(phase)
                for j, w in enumerate(wave)]
        np.savetxt(path, np.asarray(rows), fmt="%.6g")

    dump(salt / "salt2_template_0.dat", m0)
    dump(salt / "salt2_template_1.dat", m1)
    cl = np.column_stack([wave, 0.4 * np.log(wave / 5500.0)])
    np.savetxt(salt / "salt2_color_law.dat", cl, fmt="%.6g")

    monkeypatch.setenv("NMMA_SPECTRAL_TEMPLATES", str(home))
    # the resolver registers into a process-global registry; drop any
    # stale entries so each test run re-resolves from this tmp home
    from nmma_tpu.models import base
    for name in ("nugent-hyper", "salt2"):
        base._SOURCE_MODELS.pop(name, None)
    return home


def test_nugent_roundtrip_cli_vs_function(template_home, tmp_path):
    """CLI create-injection -> CLI lightcurve-generation == library
    function, the reference's lightcurveInjectionTest contract."""
    from nmma_tpu.cli.tools import create_injection, lightcurve_generation
    from nmma_tpu.injections import create_light_curve_data

    inj = tmp_path / "inj.json"
    create_injection([
        "--prior-file", "/root/reference/priors/sncosmo-generic.prior",
        "--n-injection", "1", "--generation-seed", "7",
        "--filename", str(inj)])
    outdir = tmp_path / "lcs"
    lightcurve_generation([
        "--model", "nugent-hyper", "--injection", str(inj),
        "--filters", "ztfg,ztfr,ztfi", "--outdir", str(outdir),
        "--label", "rt", "--tmin", "0.5", "--tmax", "30.0",
        "--injection-error-budget", "0"])
    with open(outdir / "rt_0.json") as fh:
        cli_lc = json.load(fh)

    with open(inj) as fh:
        table = json.load(fh)
    content = table.get("injections", table)
    content = content.get("content", content)
    entry = {k: float(np.asarray(v).ravel()[0]) for k, v in content.items()
             if np.ndim(v) and np.asarray(v).dtype.kind in "fiu"}
    fn_lc = create_light_curve_data(
        entry, model="nugent-hyper", filters=["ztfg", "ztfr", "ztfi"],
        tmin=0.5, tmax=30.0, seed=42, injection_error_budget=0)

    assert sorted(cli_lc.keys()) == sorted(fn_lc.keys())
    for filt in fn_lc:
        a = np.asarray(cli_lc[filt]["mag"], dtype=float)
        b = np.asarray(fn_lc[filt]["mag"], dtype=float)
        ok = np.isfinite(a) & np.isfinite(b)
        assert ok.any(), filt
        np.testing.assert_allclose(a[ok], b[ok], rtol=1e-3)


def test_anchoring_and_boost(template_home):
    """Peak-mag anchoring: at d_L = 10 pc and boost = 0 the brightest
    anchor-band magnitude is M_REF; supernova_mag_boost shifts 1:1."""
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.models.spectral import M_REF

    model = DetectorLightCurveModel(
        "nugent-hyper", ["ztfg"],
        sample_times=np.linspace(0.5, 59.0, 120))
    base_params = dict(luminosity_distance=1e-5, supernova_mag_boost=0.0,
                       timeshift=0.0, Ebv=0.0, redshift=0.0)
    _, mags0 = model(base_params)
    peak = float(np.nanmin(np.asarray(mags0)[0]))
    # ztfg is near the 4380 AA anchor; the residual is the color term
    # between the anchor wavelength and the band's effective wavelength
    assert peak == pytest.approx(M_REF, abs=0.4)
    _, mags1 = model({**base_params, "supernova_mag_boost": 1.5})
    np.testing.assert_allclose(np.asarray(mags1), np.asarray(mags0) + 1.5,
                               rtol=1e-6)


def test_salt2_conventions(template_home):
    """x0 is the sampled APPARENT amplitude: mags scale as
    -2.5 log10(x0) and the detector map adds NO distance modulus
    (reference model.py:1216-1222); c couples through the color law."""
    from nmma_tpu.models import DetectorLightCurveModel

    model = DetectorLightCurveModel(
        "salt2", ["ztfg", "ztfr"],
        sample_times=np.linspace(0.5, 50.0, 60))
    p0 = dict(x0=1.0, x1=0.0, c=0.0, luminosity_distance=40.0,
              timeshift=0.0, Ebv=0.0, redshift=0.0)
    _, m_a = model(p0)
    _, m_b = model({**p0, "x0": 10.0})
    d = np.asarray(m_b) - np.asarray(m_a)
    ok = np.isfinite(d)
    np.testing.assert_allclose(d[ok], -2.5, atol=1e-4)

    # distance-modulus exemption: moving d_L 40 -> 400 Mpc at PINNED
    # redshift changes nothing (x0 encodes the distance)
    _, m_far = model({**p0, "luminosity_distance": 400.0})
    diff = np.asarray(m_far) - np.asarray(m_a)
    np.testing.assert_allclose(diff[np.isfinite(diff)], 0.0, atol=1e-5)

    # color: c > 0 suppresses blue relative to red through CL(lambda)
    _, m_c = model({**p0, "c": 0.5})
    dc = np.asarray(m_c) - np.asarray(m_a)
    dg = np.nanmedian(dc[0][np.isfinite(dc[0])])
    dr = np.nanmedian(dc[1][np.isfinite(dc[1])])
    assert dg != pytest.approx(dr, abs=1e-3)   # color law is chromatic


def test_source_frame_time_stretch(template_home):
    """Detector times are source phases stretched by (1+z) — the
    reference's time-frame correction (model.py:1199-1202)."""
    from nmma_tpu.models import DetectorLightCurveModel

    t_src = np.linspace(0.5, 40.0, 30)
    model = DetectorLightCurveModel("nugent-hyper", ["ztfr"],
                                    sample_times=t_src)
    obs_t, _ = model(dict(luminosity_distance=40.0, redshift=0.25,
                          supernova_mag_boost=0.0, timeshift=2.0,
                          Ebv=0.0))
    np.testing.assert_allclose(np.asarray(obs_t), t_src * 1.25 + 2.0,
                               rtol=1e-6)
