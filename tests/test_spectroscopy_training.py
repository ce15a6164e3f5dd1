"""Spectroscopy SVD-surrogate training (flux grids over time x lambda)."""

import jax.numpy as jnp
import numpy as np


def test_spectral_surrogate_training(rng):
    from nmma_tpu.models.svd import svd_surrogate_mags
    from nmma_tpu.training import SVDTrainingConfig, train_svd_model

    lam = np.linspace(4000, 9000, 12)
    t = np.linspace(0.2, 10.0, 25)

    def spectra(temp0, tau):
        temp = np.maximum(temp0 * np.exp(-t / tau)[:, None], 2000.0)
        return (1e-16 * (lam[None, :] / 5000.0) ** -2
                / np.expm1(1.44e8 / (lam[None, :] * temp)))

    entries = []
    for _ in range(60):
        temp0 = rng.uniform(4000, 8000)
        tau = rng.uniform(3, 8)
        entries.append({"params": {"temp0": temp0, "tau": tau}, "t": t,
                        "fnu": spectra(temp0, tau), "lambdas": lam})
    svd = train_svd_model(
        entries, ["temp0", "tau"],
        config=SVDTrainingConfig(n_coeff=10, hidden=64, n_epochs=4000,
                                 tmin=0.2, tmax=10.0, n_tsteps=40),
        verbose=False, data_type="spectroscopy")
    assert len(svd.filters) == 12 and svd.filters[0].startswith("lambda_")

    pred = np.asarray(svd_surrogate_mags(
        svd, {"temp0": 5000.0, "tau": 5.0}, jnp.asarray(t[::3])))
    truth = np.log10(spectra(5000.0, 5.0))[::3]
    err = np.abs(pred - truth.T)
    assert np.median(err[np.isfinite(err)]) < 0.05
