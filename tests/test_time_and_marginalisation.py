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


def test_marginalised_expectation_honours_weights(rng):
    """Weighted template inputs must importance-resample with p=weight
    (the reference's idys draw, marginalisation.py:70-71): put all the
    weight on the near-distance half of the posterior and the predicted
    median band must brighten relative to the uniform-weight draw."""
    from nmma_tpu.eos import load_macro_eos_set
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.post_processing.marginalisation import \
        marginalised_lightcurve_expectation
    n = 400
    dist = np.concatenate([rng.normal(25, 1, n // 2),
                           rng.normal(120, 2, n // 2)])
    gw = dict(chirp_mass=rng.normal(1.1977, 0.001, n),
              mass_ratio=rng.uniform(0.8, 1.0, n),
              luminosity_distance=dist,
              theta_jn=rng.uniform(0.1, 0.6, n))
    eos_set = load_macro_eos_set(
        "/root/reference/nmma/tests/data/eos_macro")
    model = DetectorLightCurveModel(
        "Me2017", ["ztfg"], sample_times=np.geomspace(0.5, 8, 20))
    extra = dict(ratio_zeta=0.3, alpha=5e-5, log10_vej=-1.2,
                 beta=3.0, log10_kappa_r=0.5)
    w_near = np.where(dist < 70, 1.0, 1e-12)
    near = marginalised_lightcurve_expectation(
        dict(gw, weight=w_near), eos_set, model, extra_parameters=extra,
        max_samples=100)
    uniform = marginalised_lightcurve_expectation(
        gw, eos_set, model, extra_parameters=extra, max_samples=100)
    med_near = np.nanmedian(near[1])
    med_uni = np.nanmedian(uniform[1])
    # the 25-vs-120 Mpc split is ~3.4 mag of distance modulus; the
    # weighted draw must land decisively on the bright side
    assert med_near < med_uni - 1.0, (med_near, med_uni)


def _write_coinc_xml(path, m1s, m2s):
    cols = ["event_id", "mass1", "mass2", "spin1z", "spin2z"]
    col_xml = "\n".join(
        f'      <Column Name="sngl_inspiral:{c}" Type="real_8"/>'
        if c != "event_id" else
        f'      <Column Name="sngl_inspiral:{c}" Type="ilwd:char"/>'
        for c in cols)
    body = ",\n      ".join(
        f'"sngl_inspiral:event_id:{i}",{m1!r},{m2!r},0.02,-0.01'
        for i, (m1, m2) in enumerate(zip(m1s, m2s)))
    path.write_text(f"""<?xml version='1.0' encoding='utf-8'?>
<LIGO_LW>
  <Table Name="sngl_inspiral:table">
{col_xml}
      <Stream Name="sngl_inspiral:table" Type="Local" Delimiter=",">
      {body}
      </Stream>
  </Table>
</LIGO_LW>
""")


def test_load_gw_samples_formats(tmp_path, rng):
    """The reference's three marginalisation input formats + bilby
    posteriors (ref post_processing/marginalisation.py:35-77)."""
    from nmma_tpu.io.fits import write_bintable
    from nmma_tpu.post_processing.marginalisation import (
        load_gw_samples, skymap_distance_moments)

    # 1) template ascii (8-column layout)
    tpl = tmp_path / "template.dat"
    rows = np.column_stack([
        np.zeros(5), np.zeros(5), np.ones(5),          # SNRdiff, erf, w
        rng.uniform(1.3, 1.6, 5), rng.uniform(1.1, 1.3, 5),
        rng.uniform(-0.05, 0.05, 5), rng.uniform(-0.05, 0.05, 5),
        rng.uniform(30, 50, 5)])
    np.savetxt(tpl, rows)
    d = load_gw_samples(template_file=str(tpl))
    assert set(d) >= {"mass_1", "mass_2", "chirp_mass", "mass_ratio",
                      "luminosity_distance", "a_1", "a_2", "weight"}
    assert np.allclose(d["mass_1"], rows[:, 3])
    assert np.allclose(d["weight"].sum(), 1.0)

    # 2) bilby posterior csv (chirp-mass parameterization)
    csv = tmp_path / "posterior.csv"
    with open(csv, "w") as fh:
        fh.write("chirp_mass,mass_ratio,luminosity_distance,theta_jn\n")
        for _ in range(6):
            fh.write(f"{rng.normal(1.1977, 1e-3)},{rng.uniform(0.7, 1)},"
                     f"{rng.uniform(30, 50)},{rng.uniform(0, 1)}\n")
    d = load_gw_samples(posterior_file=str(csv))
    assert (d["mass_1"] >= d["mass_2"] - 1e-12).all()
    mc = (d["mass_1"] * d["mass_2"]) ** 0.6 / \
        (d["mass_1"] + d["mass_2"]) ** 0.2
    assert np.allclose(mc, d["chirp_mass"], rtol=1e-10)

    # 3) bilby json result
    import json as _json
    js = tmp_path / "result.json"
    js.write_text(_json.dumps({"posterior": {"content": {
        "chirp_mass": [1.197, 1.198], "mass_ratio": [0.9, 0.85],
        "luminosity_distance": [40.0, 42.0], "theta_jn": [0.3, 0.4]}}}))
    d = load_gw_samples(posterior_file=str(js))
    assert len(d["mass_1"]) == 2

    # 4) lalinference-layout hdf5
    import h5py
    h5 = tmp_path / "post.hdf5"
    post = np.zeros(4, dtype=[("m1", "f8"), ("m2", "f8"), ("dist", "f8"),
                              ("theta_jn", "f8"), ("t0", "f8")])
    post["m1"] = rng.uniform(1.3, 1.6, 4)
    post["m2"] = rng.uniform(1.1, 1.3, 4)
    post["dist"] = rng.uniform(30, 50, 4)
    with h5py.File(h5, "w") as f:
        f.create_dataset("lalinference/lalinference_mcmc/"
                         "posterior_samples", data=post)
    d = load_gw_samples(hdf5_file=str(h5))
    assert np.allclose(d["luminosity_distance"], post["dist"])

    # 5) coinc.xml + skymap FITS: flat map with the BAYESTAR distance
    # ansatz rho(r) = N r^2 Normal(r; mu, sigma) per pixel
    coinc = tmp_path / "coinc.xml"
    _write_coinc_xml(coinc, [1.5, 1.45], [1.25, 1.3])
    npix = 48
    mu = np.full(npix, 40.0)
    sigma = np.full(npix, 8.0)
    norm = 1.0 / (mu ** 2 + sigma ** 2)
    sky = tmp_path / "skymap.fits"
    write_bintable(str(sky), {
        "PROB": np.full(npix, 1.0 / npix), "DISTMU": mu,
        "DISTSIGMA": sigma, "DISTNORM": norm})
    mean, std = skymap_distance_moments(str(sky))
    # analytic check: E[r] = N(mu^3 + 3 mu s^2)
    assert mean == pytest.approx(
        norm[0] * (mu[0] ** 3 + 3 * mu[0] * sigma[0] ** 2), rel=1e-6)
    assert 0 < std < 20
    d = load_gw_samples(coinc_file=str(coinc), skymap=str(sky), seed=1)
    assert len(d["mass_1"]) == 2
    assert np.isfinite(d["luminosity_distance"]).all()
    assert d["a_1"][0] == pytest.approx(0.02)
