"""Joint CLI breadth (VERDICT r1 #4/#5): real-strain generation without
an injection file, and the full GW+EM+EOS+population+systematics assembly
through the public two-stage CLI."""

import os

import h5py
import jax
import numpy as np
import pytest

MACRO_DIR = "/root/reference/nmma/tests/data/eos_macro"
SYS_YAML = "/root/reference/nmma/tests/data/systematics_without_time.yaml"
FS = 1024.0
T0 = 1000000000.0
TRIGGER = T0 + 34.0

INJ = dict(mass_1=36.0, mass_2=29.0, chi_1=0.0, chi_2=0.0,
           luminosity_distance=600.0, theta_jn=0.4, phase=1.0,
           ra=1.3, dec=-0.5, psi=0.7, geocent_time=0.0)


@pytest.fixture(scope="module")
def strain_files(tmp_path_factory):
    """White-noise strain + injected IMRPhenomD BBH written as GWOSC-style
    HDF5 files for H1/L1."""
    from nmma_tpu.gw import get_detector, imrphenomd
    from nmma_tpu.gw.likelihood import project_signal

    tmp = tmp_path_factory.mktemp("strain")
    duration, sigma = 8.0, 4.0e-23
    paths = {}
    for k, name in enumerate(("H1", "L1")):
        rng = np.random.default_rng(20 + k)
        data = rng.normal(0.0, sigma, int(38.0 * FS))
        seg_start = TRIGGER + 2.0 - duration
        n = int(duration * FS)
        freqs = np.fft.rfftfreq(n, d=1.0 / FS)
        h_f = np.asarray(jax.jit(
            lambda f, det=get_detector(name): project_signal(
                det, imrphenomd, f, INJ, TRIGGER))(freqs[1:]))
        h_full = np.zeros(len(freqs), dtype=np.complex128)
        h_full[1:] = h_f
        h_full *= np.exp(-2j * np.pi * freqs * (duration - 2.0))
        h_t = np.fft.irfft(h_full * FS, n=n)
        i0 = int(round((seg_start - T0) * FS))
        data[i0:i0 + n] += h_t
        p = tmp / f"{name}.hdf5"
        with h5py.File(p, "w") as f:
            ds = f.create_dataset("strain/Strain", data=data)
            ds.attrs["Xspacing"] = 1.0 / FS
            f.create_dataset("meta/GPSstart", data=T0)
        paths[name] = str(p)
    return paths


def test_generation_real_strain_no_injection(strain_files, tmp_path):
    """nmma-generation on local strain files: Welch PSD + ML fiducial +
    relative-binning likelihood, no --injection-file (VERDICT #4)."""
    from nmma_tpu.cli.joint_main import nmma_analysis, nmma_generation

    prior = tmp_path / "bbh.prior"
    prior.write_text(
        "mass_1 = Uniform(minimum=30., maximum=42.)\n"
        "mass_2 = Uniform(minimum=24., maximum=34.)\n"
        "luminosity_distance = Uniform(minimum=200., maximum=1200.)\n"
        "chi_1 = 0.0\nchi_2 = 0.0\ntheta_jn = 0.4\nphase = 1.0\n"
        "ra = 1.3\ndec = -0.5\npsi = 0.7\ngeocent_time = 0.0\n")
    dump = nmma_generation([
        "--outdir", str(tmp_path), "--label", "realdata",
        "--prior-file", str(prior),
        "--strain-files", ",".join(f"{k}:{v}"
                                   for k, v in strain_files.items()),
        "--trigger-time", str(TRIGGER),
        "--duration", "8.0", "--post-trigger-duration", "2.0",
        "--minimum-frequency", "20.0", "--maximum-frequency", "500.0",
        "--waveform", "IMRPhenomD",
        "--fiducial-rounds", "3", "--fiducial-batch", "128",
    ])
    assert os.path.exists(dump)

    import pickle
    with open(dump, "rb") as f:
        payload = pickle.load(f)
    fid = payload["fiducial"]
    mc = (fid["mass_1"] * fid["mass_2"]) ** 0.6 / \
        (fid["mass_1"] + fid["mass_2"]) ** 0.2
    mc_true = (36.0 * 29.0) ** 0.6 / 65.0 ** 0.2
    assert abs(mc - mc_true) < 2.0, (mc, mc_true)

    result = nmma_analysis([
        "--data-dump", dump, "--outdir", str(tmp_path),
        "--label", "realdata", "--nlive", "64", "--walks", "8",
        "--dlogz", "1.0", "--max-iter", "150",
    ])
    assert np.isfinite(result.logz)
    post = np.load(tmp_path / "realdata_result.npz")
    m1 = post["posterior_mass_1"]
    m2 = post["posterior_mass_2"]
    mc_post = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    assert abs(np.median(mc_post) - mc_true) < 1.5, np.median(mc_post)


def test_time_marginalized_joint_cli(strain_files, tmp_path):
    """--time-marginalization routes to the dense likelihood and stays
    finite through the dump's one-evaluation test build."""
    from nmma_tpu.cli.joint_main import build_joint_likelihood, \
        nmma_generation
    prior = tmp_path / "bbh.prior"
    prior.write_text(
        "mass_1 = Uniform(minimum=30., maximum=42.)\n"
        "mass_2 = Uniform(minimum=24., maximum=34.)\n"
        "luminosity_distance = Uniform(minimum=200., maximum=1200.)\n"
        "chi_1 = 0.0\nchi_2 = 0.0\ntheta_jn = 0.4\nphase = 1.0\n"
        "ra = 1.3\ndec = -0.5\npsi = 0.7\ngeocent_time = 0.0\n")
    dump = nmma_generation([
        "--outdir", str(tmp_path), "--label", "tmarg",
        "--prior-file", str(prior),
        "--strain-files", ",".join(f"{k}:{v}"
                                   for k, v in strain_files.items()),
        "--trigger-time", str(TRIGGER),
        "--duration", "8.0", "--minimum-frequency", "20.0",
        "--maximum-frequency", "500.0", "--waveform", "IMRPhenomD",
        "--time-marginalization", "--phase-marginalization",
        "--fiducial-rounds", "2", "--fiducial-batch", "64",
    ])
    import pickle
    with open(dump, "rb") as f:
        payload = pickle.load(f)
    lk, priors = build_joint_likelihood(payload)
    from nmma_tpu.gw import GWTransientLikelihood
    assert isinstance(lk.likelihoods[0], GWTransientLikelihood)
    assert lk.likelihoods[0].time_marginalization


def test_full_breadth_joint_assembly(tmp_path):
    """EOS constraints + reweighting + population + systematics + Hubble
    prior, all reachable from the two-stage CLI (VERDICT #5)."""
    from nmma_tpu.cli.joint_main import build_joint_likelihood, \
        nmma_generation
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
    # tiny Bu2019lm-family surrogate so the EM messenger consumes the
    # ejecta-conversion outputs directly (the reference's joint EM model)
    import glob

    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, filters = read_bulla_grid(files,
                                               model="Bu2019lm_sparse")
    svd = train_svd_model(entries, pnames, filters,
                          SVDTrainingConfig(n_coeff=6, hidden=32,
                                            n_epochs=800, tmin=0.2,
                                            n_tsteps=60),
                          verbose=False)
    svd_path = tmp_path / "svdmodel.npz"
    svd.save(str(svd_path))

    dump = nmma_generation([
        "--outdir", str(tmp_path), "--label", "breadth",
        "--prior-file", str(prior), "--injection-file", str(inj),
        "--eos-data", MACRO_DIR,
        "--duration", "16.0", "--minimum-frequency", "30.0",
        "--maximum-frequency", "512.0", "--gw-detectors", "H1,L1",
        "--em-model", "Bu2019lm_sparse", "--svd-path", str(svd_path),
        "--filters", "ztfg,ztfr",
        "--systematics-file", SYS_YAML,
        "--lower-mtov", "2.0,0.05",
        "--population-model", "peak",
        "--hubble-prior", "planck",
        "--eos-reweight",
    ])
    import pickle
    with open(dump, "rb") as f:
        payload = pickle.load(f)
    # reweighting produced the sorted table + weights
    assert payload["eos_weights"] and os.path.exists(payload["eos_weights"])
    assert os.path.isdir(payload["eos_data"])
    assert payload["eos_constraints"] == []   # folded into the weights

    likelihood, priors = build_joint_likelihood(payload)
    # prior surgery: Hubble + systematics + weighted-categorical EOS
    assert "Hubble_constant" in priors.keys()
    from nmma_tpu.priors.core import WeightedCategorical
    assert isinstance(priors["EOS"], WeightedCategorical)
    sys_names = [k for k in priors.keys() if k.startswith("em_syserr")]
    assert sys_names, list(priors.keys())
    # population term present
    from nmma_tpu.population import NeutronStarPopulation
    assert any(isinstance(l, NeutronStarPopulation)
               for l in likelihood.likelihoods)

    # one full evaluation through the assembled stack
    from nmma_tpu.cli.joint_main import _fill_from_priors
    point = _fill_from_priors(dict(payload["fiducial"]), priors)
    logl = float(jax.jit(likelihood.log_likelihood)(point))
    assert np.isfinite(logl) and logl > -1e29


def test_joint_result_has_derived_columns(tmp_path):
    """nmma-analysis writes conversion-derived posterior columns
    (reference posterior_conversion: source-frame masses, tidal
    deformabilities, EOS macro quantities, ejecta masses)."""
    from nmma_tpu.cli.joint_main import nmma_analysis, nmma_generation
    from nmma_tpu.injections import write_injection_file

    inj = tmp_path / "inj.json"
    write_injection_file(inj, {
        "chirp_mass": [1.1977], "mass_ratio": [0.9],
        "luminosity_distance": [40.0], "EOS": [4.2], "ratio_zeta": [0.3],
        "alpha": [5e-5], "theta_jn": [0.4], "phase": [1.3], "psi": [1.5],
        "ra": [3.446], "dec": [-0.408], "geocent_time": [0.0],
        "timeshift": [0.0]})
    prior = tmp_path / "p.prior"
    prior.write_text(
        "chirp_mass = Uniform(minimum=1.19, maximum=1.21)\n"
        "mass_ratio = Uniform(minimum=0.75, maximum=1.0)\n"
        "luminosity_distance = Uniform(minimum=20., maximum=80.)\n"
        "EOS = Uniform(minimum=0., maximum=10.)\n"
        "ratio_zeta = 0.3\nalpha = 5e-5\ntheta_jn = 0.4\nphase = 1.3\n"
        "psi = 1.5\nra = 3.446\ndec = -0.408\ngeocent_time = 0.0\n"
        "timeshift = 0.0\n")
    dump = nmma_generation([
        "--outdir", str(tmp_path), "--label", "dc",
        "--prior-file", str(prior), "--injection-file", str(inj),
        "--eos-data", MACRO_DIR, "--duration", "16.0",
        "--minimum-frequency", "30.0", "--maximum-frequency", "512.0",
        "--gw-detectors", "H1,L1"])
    nmma_analysis(["--data-dump", dump, "--outdir", str(tmp_path),
                   "--label", "dc", "--nlive", "64", "--walks", "8",
                   "--dlogz", "2.0", "--max-iter", "60"])
    z = np.load(tmp_path / "dc_result.npz")
    cols = {k for k in z.files if k.startswith("posterior_")}
    for needed in ("posterior_mass_1_source", "posterior_lambda_1",
                   "posterior_TOV_mass", "posterior_R_14",
                   "posterior_log10_mej_dyn"):
        assert needed in cols, needed
    assert np.isfinite(z["posterior_TOV_mass"]).all()
