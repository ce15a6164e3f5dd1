"""Registry, web service, cluster tooling, max-mass resampling tests."""

import json
import os
import urllib.request

import numpy as np
import pytest


def test_registry_resolution(tmp_path, monkeypatch):
    from nmma_tpu.registry import MODELS_ENV, get_model, get_models_home
    monkeypatch.setenv(MODELS_ENV, str(tmp_path))
    assert get_models_home() == str(tmp_path)
    (tmp_path / "FakeModel.npz").write_bytes(b"x")
    assert get_model("FakeModel") == str(tmp_path / "FakeModel.npz")
    with pytest.raises(FileNotFoundError, match="Missing.npz"):
        get_model("Missing")


def test_registry_download_hook(tmp_path, monkeypatch):
    from nmma_tpu import registry
    monkeypatch.setenv(registry.MODELS_ENV, str(tmp_path))
    calls = []

    def hook(name, dest):
        calls.append(name)
        (tmp_path / f"{name}.npz").write_bytes(b"y")

    registry.set_download_hook(hook)
    try:
        path = registry.get_model("Hooked")
        assert calls == ["Hooked"] and os.path.exists(path)
    finally:
        registry.set_download_hook(None)


def test_analysis_web_service():
    from nmma_tpu.api import AnalysisService
    from nmma_tpu.injections import create_light_curve_data
    truth = dict(log10_mej=-1.4, log10_vej=-1.1, beta=3.0, log10_kappa_r=0.7,
                 luminosity_distance=40.0, timeshift=0.0)
    data = create_light_curve_data(truth, "Me2017", ["ztfg", "ztfr"], seed=2,
                                   sample_times=np.geomspace(0.4, 8.0, 10))
    payload = {
        "model": "Me2017",
        "prior": ("log10_mej = Uniform(minimum=-3., maximum=-0.5)\n"
                  "log10_vej = -1.1\nbeta = 3.0\nlog10_kappa_r = 0.7\n"
                  "luminosity_distance = 40.0\ntimeshift = 0.0\n"),
        "photometry": {f: {k: np.asarray(v).tolist() for k, v in sub.items()}
                       for f, sub in data.items()},
        "nlive": 64, "walks": 8, "dlogz": 1.0, "max_iter": 150,
        "outdir": "/tmp/api_test",
    }
    service = AnalysisService(port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{service.port}/analysis",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert out["status"] == "success"
        assert np.isfinite(out["log_evidence"])
        med = out["posterior_quantiles"]["log10_mej"]["p50"]
        assert abs(med - truth["log10_mej"]) < 0.5

        # full-depth analysis block (reference app.py:256-266 shape):
        # the inference-data container must decode to the complete
        # posterior draw arrays, the results blob to the summary json
        import base64
        import io
        blk = out["analysis"]
        assert blk["inference_data"]["format"] == "npz"
        draws = np.load(io.BytesIO(base64.b64decode(
            blk["inference_data"]["data"])))
        assert "log10_mej" in draws.files
        assert len(draws["log10_mej"]) > 50
        res = json.loads(base64.b64decode(blk["results"]["data"]))
        assert res["log_evidence"] == out["log_evidence"]

        # whitelist enforcement
        bad = dict(payload, model="NotAModel")
        req = urllib.request.Request(
            f"http://127.0.0.1:{service.port}/analysis",
            data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=60)
    finally:
        service.stop()


def test_slurm_script_generation(tmp_path):
    from nmma_tpu.cluster import slurm_analysis_script
    path = slurm_analysis_script(
        "--model $MODEL --trigger-time $TT --light-curve-data $DATA",
        outdir=str(tmp_path), job_name="kn_run", tpu_type="v5e-8",
        n_array=10)
    text = open(path).read()
    assert "#SBATCH --array=0-9" in text
    assert "tpu:v5e-8" in text
    assert "lightcurve-analysis --model $MODEL" in text


def test_multi_config_dry_run(tmp_path):
    from nmma_tpu.cluster import multi_config_analysis
    cfg = tmp_path / "runs.yaml"
    cfg.write_text(
        "runA:\n  model: Me2017\n  nlive: 64\n"
        "runB:\n  model: HoNa2020\n  plot: true\n")
    commands = multi_config_analysis(str(cfg), dry_run=True)
    assert len(commands) == 2
    labels = [c[0] for c in commands]
    assert labels == ["runA", "runB"]
    assert "--model" in commands[0][1] and "--plot" in commands[1][1]


def test_maximum_mass_resampler(rng):
    from nmma_tpu.post_processing.maximum_mass import MaximumMassResampler
    post = dict(
        chirp_mass=rng.normal(1.1977, 0.001, 1500),
        eta_star=np.log(0.25 - rng.uniform(0.2401, 0.2499, 1500)),
        EOS=rng.uniform(0, 10, 1500),
        log10_mdisk=rng.normal(-1.5, 0.2, 1500),
        log10_mej_dyn=rng.normal(-2.2, 0.2, 1500),
    )
    rs = MaximumMassResampler(
        post, "/root/reference/nmma/tests/data/eos_macro",
        "/root/reference/nmma/tests/data/eos_micro")
    res, samples = rs.run(nlive=32, walks=8, dlogz=1.0, chunk_size=5,
                          max_iter=60)
    assert np.isfinite(res.logz)
    assert len(samples["EOS"]) > 10


def test_skyportal_bridge(tmp_path):
    """SkyPortal payload -> argv -> analysis -> result pointers."""
    import pandas as pd

    from nmma_tpu.skyportal import run_from_skyportal_inputs

    # synthetic SkyPortal photometry csv (mjd, filter, mag, magerr)
    rng = np.random.default_rng(0)
    mjd = 58000.0 + np.linspace(0.6, 6.0, 10)
    rows = []
    for f in ("ztfg", "ztfr"):
        for t in mjd:
            rows.append({"mjd": t, "filter": f,
                         "mag": 19.0 + 0.5 * (t - 58000.0),
                         "magerr": 0.1})
    photo_csv = tmp_path / "phot.csv"
    pd.DataFrame(rows).to_csv(photo_csv, index=False)
    z_csv = tmp_path / "z.csv"
    pd.DataFrame([{"redshift": 0.01}]).to_csv(z_csv, index=False)

    calls = {}

    def fake_invoke(argv):
        calls["argv"] = argv
        return None

    out = run_from_skyportal_inputs(
        {"photometry": str(photo_csv), "redshift": str(z_csv),
         "prior": "/root/reference/priors/Me2017.prior",
         "analysis_parameters": {"nlive": 32, "fix_z": True}},
        outdir=tmp_path / "osg", invoke=fake_invoke)
    assert out["status"] == "success", out["message"]
    argv = calls["argv"]
    assert "--model" in argv and "Me2017" in argv
    # fix_z pinned the distance in the rewritten prior
    prior_text = (tmp_path / "osg" / "Me2017.prior").read_text()
    assert "luminosity_distance = " in prior_text
    dl = float(prior_text.rsplit("luminosity_distance = ", 1)[1].split()[0])
    assert 40.0 < dl < 50.0                 # z=0.01 -> ~44 Mpc
    # trigger time is the first photometry epoch
    t0 = float(argv[argv.index("--trigger-time") + 1])
    assert abs(t0 - 58000.6) < 1e-6
    # data file is readable by the standard loader
    from nmma_tpu.io import load_em_observations
    data = load_em_observations(str(tmp_path / "osg" / "data.dat"))
    assert set(data.keys()) == {"g", "r"}   # last-char filter convention

    # failure contract: bad prior -> status failure, no raise
    bad = run_from_skyportal_inputs(
        {"photometry": str(photo_csv), "prior": "/nonexistent.prior"},
        outdir=tmp_path / "osg2", invoke=fake_invoke)
    assert bad["status"] == "failure" and "not found" in bad["message"]


def test_skyportal_isot_fractional_seconds(tmp_path):
    """_write_data_file emits fractional-second ISO timestamps that
    round-trip through mjd_from_isot (real SkyPortal payloads carry
    sub-second mjds; the integer-second formatter lost up to 0.5 s)."""
    import pandas as pd

    from nmma_tpu.io.photometry import mjd_from_isot
    from nmma_tpu.skyportal import _write_data_file

    mjds = [58000.123456789, 58001.000011574, 58002.999988426]
    rows = [{"mjd": t, "filter": "ztfg", "mag": 20.0, "magerr": 0.1}
            for t in mjds]
    csv = tmp_path / "p.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    path, tmin = _write_data_file({"photometry": str(csv)}, tmp_path)
    stamps = [line.split()[0] for line in path.read_text().splitlines()]
    back = [mjd_from_isot(s) for s in stamps]
    # millisecond precision: |dt| < 1e-3 s = 1.2e-8 d
    np.testing.assert_allclose(back, mjds, atol=2e-8)
    assert tmin == pytest.approx(min(mjds))
