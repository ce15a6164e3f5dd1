"""CLI + injection + post-processing tests: tiny real runs through the
console-script entry points (reference test strategy, SURVEY.md §4)."""

import glob
import json
import os

import numpy as np
import pytest


def test_config_file_first_convention(tmp_path):
    from nmma_tpu.cli.parsing import (apply_config, base_analysis_parser,
                                      check_for_config)
    cfg = tmp_path / "run.yaml"
    cfg.write_text("model: Me2017\nnlive: 64\ntrigger-time: 123.5\n")
    config, argv = check_for_config([str(cfg), "--label", "fromcli"])
    args = apply_config(base_analysis_parser(), config, argv)
    assert args.model == "Me2017"
    assert int(args.nlive) == 64
    assert args.trigger_time == 123.5
    assert args.label == "fromcli"     # explicit flag wins


def test_injection_roundtrip(tmp_path):
    from nmma_tpu.injections import (read_injection_entry,
                                     read_injection_file,
                                     write_injection_file)
    path = tmp_path / "inj.json"
    write_injection_file(path, {"log10_mej": [-1.5, -2.0],
                                "luminosity_distance": [40.0, 80.0]})
    table = read_injection_file(path)
    assert len(table["simulation_id"]) == 2
    entry = read_injection_entry(path, 1)
    assert entry["luminosity_distance"] == 80.0


def test_reference_injection_file_reads():
    from nmma_tpu.injections import read_injection_entry
    entry = read_injection_entry(
        "/root/reference/nmma/tests/data/Me2017_injection.json", 0)
    for key in ("log10_mej", "log10_vej", "luminosity_distance"):
        assert key in entry


def test_create_light_curve_data_nondetections():
    from nmma_tpu.injections import create_light_curve_data
    entry = dict(log10_mej=-1.5, log10_vej=-1.0, beta=3.0, log10_kappa_r=0.5,
                 luminosity_distance=40.0, timeshift=0.0)
    data = create_light_curve_data(entry, model="Me2017",
                                   filters=["ztfg", "ztfr"],
                                   detection_limit=20.5, seed=3)
    for f, sub in data.items():
        uplim = ~np.isfinite(sub["mag_error"])
        assert np.all(sub["mag"][uplim] == 20.5)
        assert np.isfinite(sub["mag"][~uplim]).all()
        assert len(sub["time"]) > 10


def test_create_injection_cli(tmp_path):
    from nmma_tpu.cli.tools import create_injection
    out = tmp_path / "inj.json"
    create_injection([
        "--prior-file", "/root/reference/priors/Me2017.prior",
        "--n-injection", "5", "--filename", str(out),
    ])
    from nmma_tpu.injections import read_injection_file
    table = read_injection_file(out)
    assert len(table["log10_mej"]) == 5
    assert np.all(table["log10_mej"] >= -3.0)


def test_joint_two_stage_cli(tmp_path):
    """nmma-generation -> nmma-analysis on a tiny injected BNS."""
    from nmma_tpu.cli.joint_main import nmma_analysis, nmma_generation
    from nmma_tpu.injections import write_injection_file
    inj = tmp_path / "inj.json"
    write_injection_file(inj, {
        "chirp_mass": [1.1977], "mass_ratio": [0.9],
        "luminosity_distance": [40.0], "EOS": [4.2], "ratio_zeta": [0.3],
        "alpha": [5e-5], "theta_jn": [0.4], "phase": [1.3], "psi": [1.5],
        "ra": [3.446], "dec": [-0.408], "geocent_time": [0.0],
        "timeshift": [0.0],
    })
    prior = tmp_path / "joint.prior"
    prior.write_text(
        "chirp_mass = Uniform(minimum=1.19, maximum=1.21)\n"
        "mass_ratio = Uniform(minimum=0.75, maximum=1.0)\n"
        "luminosity_distance = Uniform(minimum=20., maximum=80.)\n"
        "EOS = Uniform(minimum=0., maximum=10.)\n"
        "ratio_zeta = 0.3\nalpha = 5e-5\ntheta_jn = 0.4\nphase = 1.3\n"
        "psi = 1.5\nra = 3.446\ndec = -0.408\ngeocent_time = 0.0\n"
        "timeshift = 0.0\n")
    dump = nmma_generation([
        "--outdir", str(tmp_path), "--label", "smoke",
        "--prior-file", str(prior), "--injection-file", str(inj),
        "--eos-data", "/root/reference/nmma/tests/data/eos_macro",
        "--duration", "16.0", "--minimum-frequency", "30.0",
        "--maximum-frequency", "512.0", "--gw-detectors", "H1,L1",
    ])
    assert os.path.exists(dump)
    result = nmma_analysis([
        "--data-dump", dump, "--outdir", str(tmp_path), "--label", "smoke",
        "--nlive", "64", "--walks", "8", "--dlogz", "1.0",
        "--max-iter", "120",
    ])
    assert np.isfinite(result.logz)
    out = np.load(tmp_path / "smoke_result.npz")
    mc = out["posterior_chirp_mass"]
    assert abs(np.median(mc) - 1.1977) < 5e-3


def test_hubble_estimate(rng):
    from nmma_tpu.post_processing import (
        combine_hubble_posteriors, hubble_posterior_from_distance_samples)
    # three synthetic events at known z with 10% distance posteriors
    events = []
    for z in (0.01, 0.02, 0.035):
        from nmma_tpu.cosmology import PLANCK18
        d_true = float(np.asarray(PLANCK18.luminosity_distance(z)))
        d_samples = d_true * (1 + rng.normal(0, 0.08, 4000))
        events.append(hubble_posterior_from_distance_samples(d_samples, z))
    grid, pdf, (med, lo, hi) = combine_hubble_posteriors(events)
    assert lo < 67.66 < hi, (lo, med, hi)
    assert hi - lo < 20.0


def test_combine_eos(rng):
    from nmma_tpu.eos import load_macro_eos_set
    from nmma_tpu.post_processing import combine_eos_posteriors
    eos_set = load_macro_eos_set("/root/reference/nmma/tests/data/eos_macro")
    # two events whose posteriors prefer EOS index 4
    samples = [rng.normal(4.5, 1.0, 2000).clip(0, 9.99) for _ in range(2)]
    weights, trend = combine_eos_posteriors(samples, eos_set)
    assert np.argmax(weights) in (3, 4, 5)
    assert len(trend) == 2


def test_gwem_resampling(rng):
    from nmma_tpu.eos import load_macro_eos_set
    from nmma_tpu.post_processing import GWEMResampler
    eos_set = load_macro_eos_set("/root/reference/nmma/tests/data/eos_macro")
    gw = dict(chirp_mass=rng.normal(1.1977, 0.001, 3000),
              mass_ratio=rng.uniform(0.8, 1.0, 3000),
              lambda_tilde=rng.normal(400, 100, 3000).clip(10))
    em = dict(log10_mej_dyn=rng.normal(-2.2, 0.2, 3000),
              log10_mej_wind=rng.normal(-1.6, 0.2, 3000))
    rs = GWEMResampler(gw, em, eos_set)
    result, post = rs.run(nlive=96, walks=8, dlogz=1.0, chunk_size=5,
                          max_iter=150)
    assert np.isfinite(result.logz)
    assert abs(np.median(post["chirp_mass"]) - 1.1977) < 0.003
