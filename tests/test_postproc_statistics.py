"""Post-processing statistics closures (VERDICT r2 missing #5/#8,
next-round #7): flat-mass-prior reweighting, per-ordering cumulative
H0/R14 trends with HDI intervals, and the gwem-resampling NSBH spin
variant."""

import numpy as np
import pytest


def test_reweight_to_flat_mass_prior_statistics():
    """The reweighting must enrich high-m1 samples by the m1^2/Mc
    Jacobian (reference core/conversion.py:176-183)."""
    from nmma_tpu.conversion import reweight_to_flat_mass_prior

    rng = np.random.default_rng(0)
    n = 40000
    samples = {
        "chirp_mass": rng.uniform(1.1, 1.4, n),
        "mass_ratio": rng.uniform(0.5, 1.0, n),
        "luminosity_distance": rng.uniform(30, 50, n),
    }
    out = reweight_to_flat_mass_prior(samples, rng=1)
    assert set(out) == set(samples)
    assert len(out["chirp_mass"]) == int(round(0.3 * n))
    # the Jacobian ~ m1^2/Mc grows with Mc and falls with q: reweighted
    # samples shift toward higher chirp mass and lower mass ratio
    assert out["chirp_mass"].mean() > samples["chirp_mass"].mean()
    assert out["mass_ratio"].mean() < samples["mass_ratio"].mean()
    # without replacement: all indices unique
    assert len(np.unique(out["luminosity_distance"])) == len(
        out["luminosity_distance"])


def test_hdi_matches_known_interval():
    from nmma_tpu.post_processing import hdi

    rng = np.random.default_rng(2)
    x = rng.normal(10.0, 2.0, 200000)
    lo, hi = hdi(x, 0.95)
    np.testing.assert_allclose([lo, hi], [10 - 1.96 * 2, 10 + 1.96 * 2],
                               atol=0.1)
    # skewed distribution: HDI is NOT the equal-tail interval
    y = rng.lognormal(0.0, 0.75, 200000)
    lo, hi = hdi(y, 0.9)
    eq_lo, eq_hi = np.quantile(y, [0.05, 0.95])
    assert hi - lo < eq_hi - eq_lo
    assert lo < np.exp(-0.75**2)  # HDI contains the mode


def test_h0_trend_converges_to_truth():
    """End-to-end per-ordering machinery: events generated at H0=70 must
    produce a tightening trend centered near 70."""
    from nmma_tpu.post_processing import event_h0_kdes, h0_trend_from_kdes

    rng = np.random.default_rng(3)
    c_kms = 299792.458
    h0_true = 70.0
    em_kdes, gw_kdes = [], []
    for _ in range(6):
        d_true = rng.uniform(35, 80)
        z_true = h0_true * d_true / c_kms
        n = 3000
        d_em = d_true * (1 + rng.normal(0, 0.08, n))
        gw = {
            "luminosity_distance": d_true * (1 + rng.normal(0, 0.15, n)),
            "chirp_mass": rng.uniform(1.1, 1.4, n),
            "mass_ratio": rng.uniform(0.6, 1.0, n),
        }
        em_kde, gw_kde = event_h0_kdes(d_em, gw, z_true, rng=rng)
        em_kdes.append(em_kde)
        gw_kdes.append(gw_kde)

    h0_prior = rng.uniform(5.0, 120.0, 1500)
    trend = h0_trend_from_kdes(gw_kdes, em_kdes, h0_prior,
                               np.arange(6), n_reordering=4,
                               n_posterior_samples=1500, rng=rng)
    for key in ("GW", "EM", "total"):
        med, up, low = trend[key]
        assert med.shape == (6,)
        assert np.all(up >= med) and np.all(med >= low)
    med, up, low = trend["total"]
    assert abs(med[-1] - h0_true) < 8.0, med
    # credible interval tightens with more events
    assert (up[-1] - low[-1]) < (up[0] - low[0])


def test_h0_event_p_value_cut():
    from nmma_tpu.post_processing import event_h0_kdes

    rng = np.random.default_rng(4)
    n = 2000
    gw = {
        "luminosity_distance": rng.normal(40.0, 2.0, n),
        "chirp_mass": rng.uniform(1.1, 1.4, n),
        "mass_ratio": rng.uniform(0.6, 1.0, n),
    }
    # injected distance far outside the posterior -> rejected
    out = event_h0_kdes(rng.normal(40, 2, n), gw, 0.01, rng=rng,
                        p_value_threshold=0.05, injected_distance=90.0)
    assert out is None
    ok = event_h0_kdes(rng.normal(40, 2, n), gw, 0.01, rng=rng,
                       p_value_threshold=0.05, injected_distance=40.5)
    assert ok is not None


def test_eos_trend_per_ordering():
    from nmma_tpu.post_processing import (eos_probs_from_posterior,
                                          estimate_observable_trend)

    rng = np.random.default_rng(5)
    n_eos = 30
    r14_prior = np.linspace(10.0, 14.0, n_eos)
    true_idx = 12
    probs = []
    for _ in range(5):
        # posterior concentrated near the true EOS, with mass columns so
        # the flat-mass reweighting path is exercised
        idx = np.clip(rng.normal(true_idx, 3.0, 4000), 0, n_eos - 1)
        post = {"EOS": idx,
                "chirp_mass": rng.uniform(1.1, 1.4, 4000),
                "mass_ratio": rng.uniform(0.6, 1.0, 4000)}
        probs.append(eos_probs_from_posterior(post, n_eos, rng=rng))
    for p in probs:
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-12)
    med, up, low = estimate_observable_trend(
        r14_prior, probs, np.full(n_eos, 1.0 / n_eos),
        n_reordering=4, n_posterior_samples=2000, rng=rng)
    assert abs(med[-1] - r14_prior[true_idx]) < 0.5
    assert (up[-1] - low[-1]) < (up[0] - low[0])


def test_gwem_resampler_nsbh_variant():
    """NSBH spin variant: chi_1/chi_2 sampled with KDE priors; posterior
    carries the spin columns (reference resampling.py withNSBH)."""
    from nmma_tpu.eos import TabulatedEOSSet
    from nmma_tpu.post_processing import GWEMResampler

    rng = np.random.default_rng(6)
    n = 1500
    gw = {
        "chirp_mass": rng.normal(1.7, 0.01, n),
        "mass_ratio": rng.uniform(0.18, 0.30, n),
        "chi_1": rng.normal(0.3, 0.05, n),
        "chi_2": rng.normal(0.0, 0.02, n),
    }
    em = {
        "log10_mej_dyn": rng.normal(-2.0, 0.2, n),
        "log10_mej_wind": rng.normal(-1.5, 0.2, n),
    }
    # small synthetic EOS family
    masses = np.linspace(0.8, 2.2, 40)
    radii_list, masses_list, lambdas_list = [], [], []
    for stiff in np.linspace(11.0, 13.0, 8):
        radii_list.append(np.full_like(masses, stiff))
        masses_list.append(masses)
        lambdas_list.append(3000.0 * (masses / 1.4) ** -5
                            * (stiff / 12.0) ** 5)
    eos_set = TabulatedEOSSet(radii_list, masses_list, lambdas_list)
    rs = GWEMResampler(gw, em, eos_set, with_nsbh=True)
    assert "chi_1" in rs.priors.keys() and "chi_2" in rs.priors.keys()
    result, post = rs.run(nlive=128, dlogz=2.0)
    assert np.isfinite(result.logz)
    assert "chi_1" in post and "chi_2" in post
    # spins recovered near their KDE priors
    assert abs(np.median(post["chi_1"]) - 0.3) < 0.1
    assert abs(np.median(post["chi_2"])) < 0.1


def test_combine_eos_divides_out_per_event_prior():
    """Combining N events must give prior x product(likelihoods), not
    prior^(N+1) x product — with a sharply non-uniform prior the two
    differ visibly (the trend machinery already divides per event)."""
    from nmma_tpu.post_processing.ns_characteristics import (
        combine_eos_posteriors, eos_index_weights)

    class FakeEOSSet:
        n_eos = 50
        r14 = np.linspace(10.0, 14.0, 50)
        weights = np.exp(-0.5 * ((np.arange(50) - 10.0) / 5.0) ** 2)
        tov_mass = np.full(50, 2.2)

    eos_set = FakeEOSSet()
    rng = np.random.default_rng(0)
    # three events whose likelihoods all peak at EOS ~ 35
    events = [rng.normal(35.0, 4.0, 4000).clip(0, 49.99) for _ in range(3)]
    weights, trend = combine_eos_posteriors(events, eos_set)
    # manual: prior * prod(event_prob / prior)
    pw = eos_set.weights / eos_set.weights.sum()
    expect = np.log(pw + 1e-300).copy()
    for e in events:
        expect += np.log(eos_index_weights(e, 50) + 1e-300) \
            - np.log(pw + 1e-300)
    expect = np.exp(expect - expect.max())
    expect /= expect.sum()
    np.testing.assert_allclose(weights, expect, atol=1e-12)
    # the data peak must win against the prior peak at EOS 10
    assert np.argmax(weights) > 25


def test_resampler_source_frame_and_linear_kde():
    """The resampler KDEs detector-frame chirp masses in the SOURCE
    frame (divided by 1+z(d_L)) and evaluates the EM KDE in LINEAR
    masses (reference resampling.py:96-108, construct_EM_KDE)."""
    from nmma_tpu.post_processing.resampling import (GWEMResampler,
                                                     _linear_em_samples)
    rng = np.random.default_rng(1)
    em = {"log10_mej_dyn": rng.normal(-2, 0.1, 500),
          "log10_mej_wind": rng.normal(-1.5, 0.1, 500)}
    lin = _linear_em_samples(em, False)
    np.testing.assert_allclose(lin[:, 0], 10.0 ** em["log10_mej_dyn"])
    # total mode without a log10_mej column sums the components
    tot = _linear_em_samples(em, True)
    np.testing.assert_allclose(
        tot, 10.0 ** em["log10_mej_dyn"] + 10.0 ** em["log10_mej_wind"])

    class FakeEOS:
        n_eos = 10

    gw = {"chirp_mass": np.full(300, 1.20),
          "mass_ratio": rng.uniform(0.6, 1.0, 300),
          "lambda_tilde": rng.uniform(100, 500, 300),
          "luminosity_distance": np.full(300, 400.0)}   # z ~ 0.085
    rs = GWEMResampler(gw, em, FakeEOS())
    # the stored KDE peaks at the SOURCE-frame value ~ 1.20/(1.085)
    grid = np.linspace(1.0, 1.3, 400)
    dens = np.asarray([float(rs.mc_kde.logpdf(g)) for g in grid[::40]])
    peak = grid[::40][np.argmax(dens)]
    assert abs(peak - 1.20 / 1.085) < 0.02, peak
    # and the prior range follows the GW q range, not a hardcoded 0.5
    assert rs.priors.priors["mass_ratio"].minimum >= 0.59
