"""``--sampler mcmc`` CLI surface: artifacts, plots, --skip-sampling.

Pins the review fixes from round 3: --skip-sampling must short-circuit
before any MCMC sweeps run; --plot/--bestfit must produce the same
artifact set the nested path writes; the bestfit json must be strict
JSON (no bare NaN) even though the plain ensemble carries no evidence.
"""

import json
import os

import numpy as np


def _run(tmp_path, extra):
    from nmma_tpu.cli.lightcurve_analysis import main
    return main([
        "--model", "Me2017",
        "--prior", "/root/reference/priors/Me2017.prior",
        "--light-curve-data",
        "/root/reference/example_files/lightcurves/AT2017gfo.dat",
        "--trigger-time", "57982.5285236896",
        "--data-tmax", "12.0",
        "--filters", "ps1::g,ps1::r",
        "--sampler", "mcmc",
        "--mcmc-walkers", "64", "--mcmc-sweeps", "120",
        "--outdir", str(tmp_path), "--label", "mc",
    ] + extra)


def test_mcmc_cli_skip_sampling_short_circuits(tmp_path):
    analysis = _run(tmp_path, ["--skip-sampling"])
    assert not hasattr(analysis, "mcmc_result")
    assert not (tmp_path / "mc_mcmc_result.npz").exists()


def test_mcmc_cli_plots_and_bestfit(tmp_path):
    analysis = _run(tmp_path, ["--plot", "--bestfit"])
    res = analysis.mcmc_result
    assert np.isfinite(res.acceptance)
    art = np.load(tmp_path / "mc_mcmc_result.npz")
    # evidence fields persisted (nan for a plain, untempered ensemble)
    assert "logz" in art and "logz_err" in art
    assert (tmp_path / "mc_lightcurves.png").stat().st_size > 10000
    assert (tmp_path / "mc_corner.png").stat().st_size > 10000
    bestfit = json.loads((tmp_path / "mc_bestfit.json").read_text())
    assert bestfit["log_evidence"] is None
    assert "chi2_per_dof" in bestfit
    # posterior csv mirrors the nested path's artifact
    assert (tmp_path / "mc_mcmc_posterior_samples.csv").exists()
