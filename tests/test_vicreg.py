"""VICReg similarity pre-training (reference: nmma/mlmodel/embedding.py).

Checks the loss term semantics against the Bardes+22 definitions, that
pre-training actually trains (loss falls, no collapse), and that the
frozen representation is invariant to the augmentations relative to
between-event spread.
"""

import jax.numpy as jnp
import numpy as np

from nmma_tpu.mlmodel import (augment_lightcurves,
                              pretrain_similarity_embedding, vicreg_loss)


def test_vicreg_loss_terms():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 10)).astype(np.float32)

    # identical views: zero invariance loss
    total, r, c, s = vicreg_loss(x, x.copy())
    assert float(r) == 0.0

    # collapsed batch: std hinge saturates near 1 (std ~ 0 per dim)
    z = np.ones((64, 10), dtype=np.float32)
    _, _, _, s_collapsed = vicreg_loss(z, z)
    assert float(s_collapsed) > 0.9

    # well-spread standardized gaussian: hinge ~ small, cov ~ small
    big = 3.0 * x
    _, _, c_g, s_g = vicreg_loss(big, big)
    assert float(s_g) < 0.05
    assert float(c_g) < 1.0

    # covariance term: perfectly correlated dims are penalized hard
    corr = np.repeat(rng.normal(size=(64, 1)), 10, axis=1).astype(np.float32)
    corr = corr * 3.0
    _, _, c_corr, _ = vicreg_loss(corr, corr)
    # off-diag of the normalized covariance ~ 1 -> sum ~ D*(D-1)/D = D-1
    assert float(c_corr) > 10.0

    # oracle: recompute from the published formula in f64 numpy
    y = rng.normal(size=(64, 10)).astype(np.float32)
    total, r, c, s = vicreg_loss(x, y)
    xd, yd = x.astype(np.float64), y.astype(np.float64)
    r0 = np.mean((xd - yd) ** 2)
    xc = xd - xd.mean(0)
    yc = yd - yd.mean(0)
    sx = np.sqrt(xc.var(0) + 1e-4)
    sy = np.sqrt(yc.var(0) + 1e-4)
    s0 = np.mean(np.maximum(1 - sx, 0)) / 2 + np.mean(
        np.maximum(1 - sy, 0)) / 2
    xn, yn = xc / sx, yc / sy
    cx = xn.T @ xn / 63
    cy = yn.T @ yn / 63
    off = 1 - np.eye(10)
    c0 = np.sum((cx * off) ** 2) / 10 + np.sum((cy * off) ** 2) / 10
    np.testing.assert_allclose(float(r), r0, rtol=1e-5)
    np.testing.assert_allclose(float(s), s0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(c), c0, rtol=1e-3)
    np.testing.assert_allclose(float(total), r0 + c0 + s0, rtol=1e-3)


def _toy_lightcurves(n, rng):
    """Two-band fake kilonova curves parameterized by (peak, decay)."""
    t = np.linspace(0.0, 1.0, 48)
    peak = rng.uniform(18.0, 22.0, size=(n, 1))
    decay = rng.uniform(1.0, 6.0, size=(n, 1))
    band0 = peak + decay * t[None]
    band1 = peak + 0.5 + 0.8 * decay * t[None]
    lcs = np.stack([band0, band1], axis=1).astype(np.float32)
    return lcs, np.concatenate([peak, decay], axis=1)


def test_augment_preserves_shape_and_padding():
    rng = np.random.default_rng(1)
    lcs, _ = _toy_lightcurves(8, rng)
    lcs[:, :, -5:] = np.nan
    aug = augment_lightcurves(rng, lcs, max_shift=3, mag_jitter=0.05)
    assert aug.shape == lcs.shape
    # padding stays non-finite (shifted, but never fabricated)
    assert np.isnan(aug).sum() >= np.isnan(lcs).sum() - 8 * 2 * 3


def test_pretrain_trains_and_is_invariant():
    rng = np.random.default_rng(2)
    lcs, _ = _toy_lightcurves(256, rng)
    embedder, params, history = pretrain_similarity_embedding(
        lcs, num_dim=4, n_epochs=40, batch_size=64, seed=3, verbose=False)
    # loss decreases
    assert history[-1] < history[0]

    _, rep = embedder.apply(params, jnp.asarray(lcs))
    rep = np.asarray(rep)
    # no collapse: the representation keeps spread (the VICReg hinge
    # acts on the expander output; a 4-dim representation of a 2-param
    # family legitimately has low-variance residual dims)
    assert rep.std(axis=0).max() > 0.1
    assert rep.std(axis=0).mean() > 0.02

    # invariance: augmented views land closer than different events
    aug = augment_lightcurves(np.random.default_rng(4), lcs, max_shift=3,
                              mag_jitter=0.05)
    _, rep_aug = embedder.apply(params, jnp.asarray(aug))
    rep_aug = np.asarray(rep_aug)
    d_pair = np.linalg.norm(rep - rep_aug, axis=1).mean()
    d_cross = np.linalg.norm(rep - np.roll(rep, 1, axis=0), axis=1).mean()
    assert d_pair < d_cross


def test_neuralnet_vicreg_cli(tmp_path):
    """--sampler neuralnet --lfi-vicreg-pretrain end to end: the flow
    conditioned on the frozen VICReg representation recovers the
    injected parameter region (reference two-stage embedding.py -> flow
    pipeline)."""
    import numpy as np

    from nmma_tpu.cli.lightcurve_analysis import main
    from nmma_tpu.injections import create_light_curve_data

    truth = dict(log10_mej=-1.4, log10_vej=-1.0, beta=3.0,
                 log10_kappa_r=0.5, luminosity_distance=40.0,
                 timeshift=0.0)
    data = create_light_curve_data(
        truth, "Me2017", ["ztfg", "ztfr"],
        sample_times=np.linspace(0.5, 8.0, 12), seed=3,
        injection_error_budget=0.1)
    lines = []
    for f, d in data.items():
        for t, m, e in zip(d["time"], d["mag"], d["mag_error"]):
            if np.isfinite(m) and np.isfinite(e):
                lines.append(f"{59000 + t} {f} {m:.4f} {e:.3f}")
    (tmp_path / "lc.dat").write_text("\n".join(lines) + "\n")
    prior = tmp_path / "p.prior"
    prior.write_text(
        "log10_mej = Uniform(minimum=-2.5, maximum=-0.8)\n"
        "log10_vej = -1.\nbeta = 3.\nlog10_kappa_r = 0.5\n"
        "luminosity_distance = 40.\ntimeshift = 0.\n")
    main([
        "--model", "Me2017", "--outdir", str(tmp_path), "--label", "vr",
        "--prior", str(prior), "--light-curve-data",
        str(tmp_path / "lc.dat"), "--trigger-time", "59000",
        "--tmin", "0.1", "--tmax", "10", "--em-nsteps", "48",
        "--sampler", "neuralnet", "--lfi-vicreg-pretrain",
        "--lfi-vicreg-epochs", "30",
    ])
    out = np.load(tmp_path / "vr_result.npz")
    mej = out["posterior_log10_mej"]
    assert len(mej) == 20000
    assert abs(np.median(mej) - truth["log10_mej"]) < 0.5, np.median(mej)
