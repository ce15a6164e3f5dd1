"""Arnett bolometric path: golden quadrature test + PE smoke + JS parity."""

import numpy as np
import pytest
import scipy.integrate


def test_arnett_integral_vs_quad():
    import jax.numpy as jnp
    from nmma_tpu.models.supernova import _arnett_integral
    y, s = 0.6, 0.2
    for x in (0.3, 1.0, 2.5):
        want, _ = scipy.integrate.quad(
            lambda z: 2 * z * np.exp(-2 * z * y + 2 * z * s + z**2), 0, x)
        got = float(_arnett_integral(jnp.asarray([x]), y, s)[0])
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_arnett_lbol_shape():
    from nmma_tpu.models.supernova import arnett_lbol40
    import jax.numpy as jnp
    t = jnp.asarray(np.linspace(0.5, 20.0, 40))
    lbol = np.asarray(arnett_lbol40(
        {"tau_m": 10.0, "log10_mni": -1.0}, t))
    assert np.all(lbol > 0)
    i_peak = np.argmax(lbol)
    assert 0 < i_peak < len(lbol) - 1          # rises then falls
    # peak luminosity ~ 1e42-43 erg/s for 0.1 Msun of Ni
    assert 20.0 < lbol[i_peak] < 5000.0        # in 1e40 units


def test_bolometric_pe_smoke(tmp_path):
    import jax
    import jax.numpy as jnp
    from nmma_tpu.inference import NestedSampler, NestedSamplerConfig
    from nmma_tpu.likelihood.bolometric import BolometricLikelihood
    from nmma_tpu.models import DetectorLightCurveModel
    from nmma_tpu.priors import parse_prior_dict

    truth = dict(tau_m=9.0, log10_mni=-0.9, luminosity_distance=1e-5,
                 timeshift=0.0)
    model = DetectorLightCurveModel("Arnett", [])
    times = np.linspace(1.0, 18.0, 12)
    obs_t, lbol40 = model(truth, sample_times=None)
    lbol = np.interp(times, np.asarray(obs_t), np.asarray(lbol40)) * 1e40
    rng = np.random.default_rng(0)
    lbol_obs = lbol * (1 + rng.normal(0, 0.05, len(times)))
    lk = BolometricLikelihood(model, times, lbol_obs, 0.05 * lbol)

    priors = parse_prior_dict(
        "tau_m = Uniform(minimum=2., maximum=20.)\n"
        "log10_mni = Uniform(minimum=-2., maximum=0.)\n"
        "luminosity_distance = 1e-5\ntimeshift = 0.0\n")

    def unit_logl(u):
        return lk(priors.transform(u))

    sampler = NestedSampler(jax.vmap(unit_logl), priors.ndim,
                            NestedSamplerConfig(nlive=128, n_delete=16,
                                                walks=10, dlogz=0.5,
                                                chunk_size=5, max_iter=200))
    res = sampler.run(verbose=False)
    idx = res.posterior_indices()
    post = priors.transform(jnp.asarray(res.samples_u[idx]))
    assert abs(float(np.median(np.asarray(post["tau_m"]))) - 9.0) < 1.5
    assert abs(float(np.median(np.asarray(post["log10_mni"]))) + 0.9) < 0.15


def test_js_divergence_metric(rng):
    from nmma_tpu.post_processing.parity import (js_divergence_1d,
                                                 posterior_js_divergences)
    a = rng.normal(0, 1, 20000)
    b = rng.normal(0, 1, 20000)
    c = rng.normal(1.0, 1, 20000)
    assert js_divergence_1d(a, b) < 0.01      # same distribution
    assert js_divergence_1d(a, c) > 0.05      # shifted
    out = posterior_js_divergences({"x": a}, {"x": b})
    assert out["x"] < 0.01
