"""Full lightcurve-analysis CLI on the real AT2017gfo file, with plots."""

import json
import os

import numpy as np


def test_lightcurve_analysis_cli_end_to_end(tmp_path):
    from nmma_tpu.cli.lightcurve_analysis import main
    analysis = main([
        "--model", "Me2017",
        "--prior", "/root/reference/priors/Me2017.prior",
        "--light-curve-data",
        "/root/reference/example_files/lightcurves/AT2017gfo.dat",
        "--trigger-time", "57982.5285236896",
        "--data-tmax", "12.0",
        "--filters", "ps1::g,ps1::r,ps1::i",
        "--nlive", "96", "--walks", "10", "--dlogz", "1.0",
        "--outdir", str(tmp_path), "--label", "cli",
        "--plot",
    ])
    assert np.isfinite(analysis.result.logz)
    assert (tmp_path / "cli_result.npz").exists()
    assert (tmp_path / "cli_result_meta.json").exists()
    assert (tmp_path / "cli_bestfit.json").exists()
    assert (tmp_path / "cli_lightcurves.png").stat().st_size > 10000
    assert (tmp_path / "cli_corner.png").stat().st_size > 10000
    meta = json.loads((tmp_path / "cli_result_meta.json").read_text())
    assert meta["num_likelihood_evaluations"] > 1000
    bestfit = json.loads((tmp_path / "cli_bestfit.json").read_text())
    assert "chi2_per_dof" in bestfit and "ps1::g" in bestfit["chi2_per_dof"]
