"""Multibanded likelihood accuracy + the RB-vs-MB comparison
(VERDICT r2 missing #3 / next-round #10)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.gw import GWTransientLikelihood, InterferometerData
from nmma_tpu.gw.multibanding import (MBGWLikelihood, build_bands,
                                      remaining_duration)
from nmma_tpu.gw.relative_binning import RelativeBinningGWLikelihood

INJ = dict(mass_1=1.45, mass_2=1.35, lambda_1=300.0, lambda_2=450.0,
           luminosity_distance=120.0, theta_jn=0.6, phase=1.0,
           ra=1.2, dec=-0.3, psi=0.7, geocent_time=0.0)


@pytest.fixture(scope="module")
def ifos():
    return [InterferometerData.zero_noise_injection(
        n, INJ, duration=64.0, f_min=25.0, f_max=1024.0,
        trigger_time=1187008882.4)
        for n in ("H1", "L1")]


def test_band_construction_compresses():
    f = np.arange(25.0, 1024.0, 1.0 / 64.0)
    starts, counts, decs = build_bands(f, 64.0, chirp_mass_min=1.1)
    assert len(starts) < len(f) / 5       # a real compression
    # the strides tile the grid exactly: every bin summed exactly once
    ends = starts + counts
    np.testing.assert_array_equal(
        np.concatenate([starts[1:], [len(f)]]), ends)
    assert counts.sum() == len(f)
    # high-frequency bands use the longest strides
    assert counts.max() > 10
    # a band-edge leftover stride keeps its band's NOMINAL decimation
    # (it governs the alias-safe window width), never a wider one
    assert np.all(counts <= decs)
    assert remaining_duration(25.0, 1.1) > remaining_duration(100.0, 1.1)


def test_mb_matches_dense_likelihood(ifos):
    dense = GWTransientLikelihood(ifos, trigger_time=1187008882.4)
    mb = MBGWLikelihood(ifos, chirp_mass_min=1.15,
                        trigger_time=1187008882.4)
    logl_d = float(dense.log_likelihood_ratio(INJ))
    logl_m = float(mb.log_likelihood_ratio(INJ))
    assert abs(logl_m - logl_d) < 0.5, (logl_m, logl_d)

    rng = np.random.default_rng(0)
    errs = []
    for _ in range(10):
        p = dict(INJ)
        p["mass_1"] = INJ["mass_1"] + rng.uniform(-0.005, 0.005)
        p["mass_2"] = INJ["mass_2"] + rng.uniform(-0.005, 0.005)
        p["luminosity_distance"] = INJ["luminosity_distance"] * \
            rng.uniform(0.8, 1.3)
        p["lambda_1"] = rng.uniform(100.0, 600.0)
        errs.append(abs(float(dense.log_likelihood_ratio(p))
                        - float(mb.log_likelihood_ratio(p))))
    # accuracy bound on prior-typical draws: well under the dlogz=0.1
    # stopping scale relative to the logL dynamic range
    assert np.median(errs) < 0.5, errs
    assert max(errs) < 2.0, errs


def test_rb_vs_mb_accuracy_and_cost(ifos):
    """The round-2 drop-multibanding claim, now measured — and REVERSED:
    on this 64 s BNS config with prior-wide tidal variation, the banded
    decimation holds |dlnL| ~ 0.04 while relative binning (fixed fiducial,
    f32) degrades to ~1-6 as the draws dephase from the fiducial. RB
    stays cheaper per node; MB is the robust default for wide priors.
    Recorded in BENCHMARKS.md."""
    dense = GWTransientLikelihood(ifos, trigger_time=1187008882.4)
    mb = MBGWLikelihood(ifos, chirp_mass_min=1.15,
                        trigger_time=1187008882.4)
    rb = RelativeBinningGWLikelihood(ifos, fiducial_parameters=dict(INJ),
                                     trigger_time=1187008882.4)

    rng = np.random.default_rng(1)
    draws = []
    for _ in range(8):
        p = dict(INJ)
        p["mass_1"] = INJ["mass_1"] + rng.uniform(-0.003, 0.003)
        p["lambda_2"] = rng.uniform(200.0, 700.0)
        draws.append(p)

    err_mb = [abs(float(dense.log_likelihood_ratio(p))
                  - float(mb.log_likelihood_ratio(p))) for p in draws]
    err_rb = [abs(float(dense.log_likelihood_ratio(p))
                  - float(rb.log_likelihood_ratio(p))) for p in draws]
    nodes_mb = mb.n_kept
    nodes_rb = sum(len(np.atleast_1d(b)) for b in
                   getattr(rb, "_bin_freqs", [0] * 1)) or "n/a"
    print(f"\nRB-vs-MB on 64 s BNS: median |dlnL| RB "
          f"{np.median(err_rb):.3g} vs MB {np.median(err_mb):.3g}; "
          f"MB nodes {nodes_mb}, RB nodes {nodes_rb}, dense "
          f"{sum(len(i.frequencies) for i in ifos)}")
    # MB: accurate well below the sampler's dlogz scale on wide draws
    assert np.median(err_mb) < 0.1, err_mb
    # RB: usable near its fiducial but degrades on wide tidal draws —
    # the measured reason MB is now implemented rather than argued away
    assert np.median(err_rb) < 10.0, err_rb
    assert nodes_mb < sum(len(i.frequencies) for i in ifos) / 5


def test_mb_jit_and_phase_marginalization(ifos):
    mb = MBGWLikelihood(ifos, chirp_mass_min=1.15,
                        trigger_time=1187008882.4,
                        phase_marginalization=True)
    f = jax.jit(mb.log_likelihood_ratio)
    a = float(f(INJ))
    b = float(mb.log_likelihood_ratio(INJ))
    np.testing.assert_allclose(a, b, rtol=1e-3)   # f32 op-reorder jitter
    assert np.isfinite(a)


def test_mb_correct_with_noisy_data():
    """The coarse-grained inner products must stay accurate on data with
    an actual NOISE realization — the regime where subsampled decimation
    (the round-3 first attempt) inflates the <n|h> variance by the
    stride length (code-review finding)."""
    rng = np.random.default_rng(7)
    noisy = []
    for ifo in [InterferometerData.zero_noise_injection(
            n, INJ, duration=64.0, f_min=25.0, f_max=1024.0,
            trigger_time=1187008882.4) for n in ("H1", "L1")]:
        # whitened-unit Gaussian frequency-domain noise at the PSD level
        sigma = np.sqrt(np.asarray(ifo.psd) * ifo.duration / 4.0)
        noise = sigma * (rng.normal(size=len(ifo.frequencies))
                         + 1j * rng.normal(size=len(ifo.frequencies))) \
            / np.sqrt(2.0)
        noisy.append(InterferometerData(
            name=ifo.name, frequencies=ifo.frequencies,
            strain=np.asarray(ifo.strain) + noise, psd=ifo.psd,
            duration=ifo.duration))
    dense = GWTransientLikelihood(noisy, trigger_time=1187008882.4)
    mb = MBGWLikelihood(noisy, chirp_mass_min=1.15,
                        trigger_time=1187008882.4)
    errs = []
    for _ in range(6):
        p = dict(INJ)
        p["mass_1"] = INJ["mass_1"] + rng.uniform(-0.004, 0.004)
        p["lambda_1"] = rng.uniform(100.0, 600.0)
        errs.append(abs(float(dense.log_likelihood_ratio(p))
                        - float(mb.log_likelihood_ratio(p))))
    # subsampling would give O(sqrt(stride) * SNR) ~ tens here
    assert np.median(errs) < 1.0, errs
    assert max(errs) < 3.0, errs
