"""GW likelihood tests: self-consistency + relative-binning parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.gw import (GWTransientLikelihood, InterferometerData,
                         RelativeBinningGWLikelihood)

INJ = dict(mass_1=1.48, mass_2=1.26, lambda_1=300.0, lambda_2=500.0,
           luminosity_distance=40.0, theta_jn=0.4, phase=1.3,
           ra=3.446, dec=-0.408, psi=1.5, geocent_time=0.0)
TRIGGER = 1187008882.4


@pytest.fixture(scope="module")
def ifos():
    return [InterferometerData.zero_noise_injection(
        n, INJ, duration=32.0, f_min=25.0, f_max=512.0,
        trigger_time=TRIGGER) for n in ("H1", "L1")]


def test_zero_noise_logl_is_half_snr_squared(ifos):
    lk = GWTransientLikelihood(ifos, trigger_time=TRIGGER)
    snr = float(lk.optimal_snr(INJ))
    logl = float(lk.log_likelihood_ratio(INJ))
    np.testing.assert_allclose(logl, snr**2 / 2.0, rtol=2e-3)
    # perturbations strictly reduce the likelihood
    assert float(lk.log_likelihood_ratio(
        {**INJ, "mass_1": 1.4805})) < logl
    assert float(lk.log_likelihood_ratio(
        {**INJ, "luminosity_distance": 60.0})) < logl


def test_relative_binning_matches_full(ifos):
    full = GWTransientLikelihood(ifos, trigger_time=TRIGGER)
    rb = RelativeBinningGWLikelihood(ifos, INJ, trigger_time=TRIGGER)
    n_bins = len(np.asarray(rb._summary[0]["edges"])) - 1
    assert n_bins < 200 < len(ifos[0].frequencies)
    for p in (INJ,
              {**INJ, "mass_1": 1.4802},
              {**INJ, "luminosity_distance": 44.0},
              {**INJ, "lambda_1": 600.0},
              {**INJ, "theta_jn": 0.5}):
        a = float(full.log_likelihood_ratio(p))
        b = float(rb.log_likelihood_ratio(p))
        assert abs(a - b) < 1.0, (a, b)


def test_antenna_patterns_normalized():
    from nmma_tpu.gw.detectors import get_detector
    det = get_detector("H1")
    rng = np.random.default_rng(0)
    vals = []
    for _ in range(200):
        ra = rng.uniform(0, 2 * np.pi)
        dec = np.arcsin(rng.uniform(-1, 1))
        psi = rng.uniform(0, np.pi)
        fp, fc = det.antenna_pattern(ra, dec, psi, 0.0)
        vals.append(float(fp) ** 2 + float(fc) ** 2)
    vals = np.asarray(vals)
    # |F|^2 <= 1 everywhere; sky average of Fp^2+Fc^2 = 2/5 for an ifo
    assert vals.max() <= 1.0 + 1e-6
    assert 0.25 < vals.mean() < 0.55


def test_distance_marginalization(ifos):
    dm = GWTransientLikelihood(ifos, trigger_time=TRIGGER,
                               distance_marginalization=True,
                               distance_bounds=(10.0, 200.0))
    l40 = float(dm.log_likelihood_ratio(INJ))
    l80 = float(dm.log_likelihood_ratio(
        {**INJ, "luminosity_distance": 80.0}))
    # the sampled distance cancels exactly (only sets the template scale)
    assert abs(l40 - l80) < 1e-2
    full = GWTransientLikelihood(ifos, trigger_time=TRIGGER)
    assert l40 < float(full.log_likelihood_ratio(INJ))
