"""Post-processing console scripts end-to-end on synthetic posterior files."""

import numpy as np
import pytest


def test_hubble_cli(tmp_path, rng):
    from nmma_tpu.cli.tools import gwem_hubble_estimate
    from nmma_tpu.cosmology import PLANCK18
    from nmma_tpu.io.results import save_posterior_csv
    files, zs = [], []
    for i, z in enumerate((0.01, 0.03)):
        d_true = float(np.asarray(PLANCK18.luminosity_distance(z)))
        post = {"luminosity_distance":
                d_true * (1 + rng.normal(0, 0.1, 3000))}
        path = tmp_path / f"event{i}.csv"
        save_posterior_csv(path, post)
        files.append(str(path))
        zs.append(str(z))
    med, lo, hi = gwem_hubble_estimate([
        "--posterior-files", ",".join(files), "--redshifts", ",".join(zs),
        "--outdir", str(tmp_path)])
    assert lo < 67.66 < hi
    assert (tmp_path / "hubble_H0.npz").exists()


def test_combine_eos_cli(tmp_path, rng):
    from nmma_tpu.cli.tools import combine_eos
    from nmma_tpu.io.results import save_posterior_csv
    files = []
    for i in range(2):
        path = tmp_path / f"eos{i}.csv"
        save_posterior_csv(path, {"EOS": rng.normal(4.5, 1.2,
                                                    2000).clip(0, 9.99)})
        files.append(str(path))
    weights, trend = combine_eos([
        "--posterior-files", ",".join(files),
        "--eos-data", "/root/reference/nmma/tests/data/eos_macro",
        "--outdir", str(tmp_path)])
    assert len(weights) == 10 and abs(weights.sum() - 1) < 1e-6
    assert (tmp_path / "combined_eos.npz").exists()


def test_gwem_resampling_cli(tmp_path, rng):
    from nmma_tpu.cli.tools import gwem_resampling
    from nmma_tpu.io.results import save_posterior_csv
    gw = tmp_path / "gw.csv"
    save_posterior_csv(gw, dict(
        chirp_mass=rng.normal(1.1977, 0.001, 2000),
        mass_ratio=rng.uniform(0.8, 1.0, 2000),
        lambda_tilde=rng.normal(400, 100, 2000).clip(10)))
    em = tmp_path / "em.csv"
    save_posterior_csv(em, dict(
        log10_mej_dyn=rng.normal(-2.2, 0.2, 2000),
        log10_mej_wind=rng.normal(-1.6, 0.2, 2000)))
    result, post = gwem_resampling([
        "--GWsamples", str(gw), "--EMsamples", str(em),
        "--EOS-data", "/root/reference/nmma/tests/data/eos_macro",
        "--outdir", str(tmp_path), "--nlive", "96"])
    assert np.isfinite(result.logz)
    assert (tmp_path / "gwem_resampling_posterior_samples.csv").exists()


def test_plot_multi_corner_cli(tmp_path, rng):
    """Overlay corner + histogram plots from result files (reference
    plotting_routines plot_multi_corner / plot_histograms_only)."""
    import numpy as np

    from nmma_tpu.post_processing.plotting_routines import main

    for i in range(2):
        np.savez(tmp_path / f"r{i}.npz",
                 posterior_a=rng.normal(i, 1.0, 400),
                 posterior_b=rng.normal(0, 2.0, 400))
    out = main([str(tmp_path / "r0.npz"), str(tmp_path / "r1.npz"),
                "--labels", "one,two",
                "--outfile", str(tmp_path / "mc.png")])
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 5000
    out2 = main([str(tmp_path / "r0.npz"), str(tmp_path / "r1.npz"),
                 "--histograms-only",
                 "--outfile", str(tmp_path / "hist.png")])
    assert os.path.exists(out2)


def test_plotting_utils():
    from nmma_tpu.plotting_utils import (fading_cmap, fig_setup,
                                         latex_label, setup_multi_axes)
    import matplotlib.pyplot as plt
    fig, ax = fig_setup()
    plt.close(fig)
    fig, axes = setup_multi_axes(5)
    assert len(axes) == 5
    plt.close(fig)
    cmap = fading_cmap("#1f77b4")
    assert cmap(0.0) != cmap(1.0)
    assert "Lambda" in latex_label("lambda_tilde")
    assert latex_label("not_a_param") == r"not\_a\_param"
