"""Reference quick-start compatibility (VERDICT r1 #10): the doc's
example commands parse unmodified, and the ZTF observing-statistics
strategy (un-gated in round 2) drives realistic injections."""

import shlex

import numpy as np
import pytest

from nmma_tpu.cli.parsing import apply_config, base_analysis_parser

# doc/quick-start-guide.rst:20 and :33, argv verbatim (minus the program)
QS_ME2017 = (
    "--model Me2017 --outdir {out} --label injection --prior "
    "/root/reference/priors/Me2017.prior --tmin 0.1 --tmax 20 --dt 0.5 "
    "--error-budget 1 --nlive 512 --Ebv-max 0 --injection {inj} "
    "--injection-num 0 --injection-outfile {out}/lc.csv "
    "--generation-seed 42 --filters u,g,r,i,z,y,J,H,K --plot "
    "--remove-nondetections")
QS_BU2019LM = (
    "--model Bu2019lm --svd-path ./svdmodels --outdir {out} --label "
    "injection --prior /root/reference/priors/Bu2019lm.prior --tmin 0.1 "
    "--tmax 20 --dt 0.5 --error-budget 1 --nlive 512 --Ebv-max 0 "
    "--injection {inj} --injection-num 0 --injection-outfile {out}/lc.csv "
    "--generation-seed 42 --filters ztfg,ztfr,ztfi --plot "
    "--remove-nondetections --ztf-uncertainties --ztf-sampling "
    "--ztf-ToO 180")


@pytest.mark.parametrize("argv", [QS_ME2017, QS_BU2019LM])
def test_quickstart_commands_parse(argv, tmp_path):
    args = apply_config(
        base_analysis_parser(), {},
        shlex.split(argv.format(out=tmp_path, inj=tmp_path / "inj.json")))
    assert args.tstep == 0.5
    assert args.em_error_budget == 1.0
    assert args.ebv_max == 0.0
    assert args.nlive == 512
    assert args.injection_outfile.endswith("lc.csv")
    if "ztf-ToO" in argv:
        assert args.ztf_too == "180"
        assert args.ztf_sampling and args.ztf_uncertainties


def test_ztf_observing_model_statistics():
    """KDE-drawn epochs / limits / uncertainties behave like the ZTF
    survey: day-scale cadence, ~20.5 mag public limits, deeper ToO."""
    from nmma_tpu.strategies import ZTFObservingModel
    m = ZTFObservingModel()
    rng = np.random.default_rng(1)
    mjd, bands, is_too = m.simulate_epochs(rng, 100.0, trigger_time=0.0)
    assert len(mjd) > 20
    assert set(bands) <= {"ztfg", "ztfr", "ztfi"}
    gaps = np.diff(np.unique(np.round(mjd[np.asarray(bands) != "ztfi"], 3)))
    assert 0.5 < np.median(gaps[gaps > 0.2]) < 6.0

    lims_pub = [m._limiting_mag(rng, "ztfg", None) for _ in range(200)]
    lims_too = [m._limiting_mag(rng, "ztfg", "180") for _ in range(200)]
    assert 19.5 < np.median(lims_pub) < 21.5
    assert np.median(lims_too) > np.median(lims_pub) + 0.5   # deeper

    errs = [m._mag_error(rng, "ztfr", 20.0) for _ in range(200)]
    assert 0.0 < np.median(errs) < 0.5


def test_ztf_kde_injection_end_to_end():
    """Injection synthesis with the survey simulation: detections with
    skew-normal errors plus (limit, inf) non-detections."""
    from nmma_tpu.injections import create_light_curve_data
    params = dict(log10_mej=-1.3, log10_vej=-0.8, beta=3.0,
                  log10_kappa_r=0.8, luminosity_distance=40.0,
                  timeshift=0.0)
    data = create_light_curve_data(
        params, "Me2017", ["ztfg", "ztfr", "ztfi"], tmin=0.1, tmax=14.0,
        seed=7, ztf_sampling=True, ztf_uncertainties=True, ztf_too="180",
        keep_infinite_data=True)
    n_det = n_lim = 0
    for f, d in data.items():
        err = np.asarray(d["mag_error"])
        mag = np.asarray(d["mag"])
        finite = np.isfinite(mag)
        n_det += int(np.sum(np.isfinite(err) & finite))
        n_lim += int(np.sum(~np.isfinite(err) & finite))
        errs = err[np.isfinite(err)]
        if len(errs):
            assert np.all((errs > 0) & (errs < 1.5))
    assert n_det >= 3, (n_det, n_lim)
    assert n_det + n_lim > 6


def test_extended_flag_surface_assembles(tmp_path):
    """Round-2 flag-breadth additions wire through a real (skip-sampling)
    assembly: conditional iota prior, Ebv prior, linear timescale,
    MW extinction law, ignore-timeshift."""
    from nmma_tpu.cli.lightcurve_analysis import main

    lc = tmp_path / "lc.dat"
    t = np.linspace(0.5, 8.0, 10)
    rows = []
    for f in ("ztfg", "ztfr"):
        rows += [f"{59000 + ti} {f} {19 + 0.2 * ti:.3f} 0.1" for ti in t]
    lc.write_text("\n".join(rows) + "\n")
    prior = tmp_path / "p.prior"
    prior.write_text(
        "log10_E0 = Uniform(minimum=49., maximum=54.)\n"
        "thetaCore = Uniform(minimum=0.01, maximum=0.3)\n"
        "thetaWing = 0.4\nlog10_n0 = -2.\np = 2.3\n"
        "log10_epsilon_e = -1.\nlog10_epsilon_B = -3.\nxi_N = 1.0\n"
        "inclination_EM = Uniform(minimum=0., maximum=1.0)\n"
        "luminosity_distance = 40.\ntimeshift = "
        "Uniform(minimum=-1., maximum=1.)\n")
    ana = main([
        "--model", "TrPi2018", "--outdir", str(tmp_path), "--label", "x",
        "--prior", str(prior), "--light-curve-data", str(lc),
        "--trigger-time", "59000", "--tmin", "0.1", "--tmax", "20",
        "--em-timescale", "linear", "--em-extinction-law", "G23_MW",
        "--Ebv-max", "0.3", "--conditional-gaussian-prior-thetaObs",
        "--ignore-timeshift", "--skip-sampling",
    ])
    assert "Ebv" in ana.priors.keys()
    from nmma_tpu.priors.core import (ConditionalGaussianIotaGivenThetaCore,
                                      DeltaFunction)
    assert isinstance(ana.priors["inclination_EM"],
                      ConditionalGaussianIotaGivenThetaCore)
    assert isinstance(ana.priors["timeshift"], DeltaFunction)
    assert ana.model.extinction_law == "G23_MW"
    dt = np.diff(np.asarray(ana.model.sample_times))
    np.testing.assert_allclose(dt, dt[0], rtol=1e-5)   # linear grid
