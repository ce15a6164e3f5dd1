"""Ebv/Hubble priors, conditional inclination, detector filter sets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_extinction_prior_linear_decay():
    from nmma_tpu.priors import extinction_prior
    priors = {}
    extinction_prior(priors, Ebv_max=0.6, use_Ebv=True)
    p = priors["Ebv"]
    u = jnp.linspace(0.001, 0.999, 2001)
    x = np.asarray(p.transform(u))
    assert 0 <= x.min() and x.max() <= 0.6
    # linear-decay density: median well below the midpoint
    assert np.interp(0.5, np.linspace(0, 1, len(x)), np.sort(x)) < 0.3


def test_hubble_conversion_exact_invariance():
    from nmma_tpu import conversion as C
    from nmma_tpu.cosmology import PLANCK18
    # with H0' = 1.1 H0, a source at z should appear at dL/1.1
    z_true = 0.05
    dl_fid = float(np.asarray(PLANCK18.luminosity_distance(z_true)))
    p = C.cosmology_to_distance({
        "Hubble_constant": PLANCK18.H0 * 1.1,
        "luminosity_distance": dl_fid / 1.1})
    np.testing.assert_allclose(float(np.asarray(p["redshift"])), z_true,
                               rtol=1e-4)


def test_conditional_iota_given_thetacore():
    from nmma_tpu.priors import PriorDict, Uniform
    from nmma_tpu.priors.core import ConditionalGaussianIotaGivenThetaCore
    priors = PriorDict({
        "thetaCore": Uniform(minimum=0.02, maximum=0.2),
        "inclination_EM": ConditionalGaussianIotaGivenThetaCore(
            N_sigma=1.0, minimum=0.0, maximum=np.pi / 2),
    })
    u = jax.random.uniform(jax.random.PRNGKey(0), (4000, 2))
    params = priors.transform(u)
    iota = np.asarray(params["inclination_EM"])
    theta_c = np.asarray(params["thetaCore"])
    assert np.all(iota >= 0) and np.all(iota <= np.pi / 2)
    # half-gaussian width ~ N_sigma * thetaCore: iota concentrates near 0
    assert np.median(iota) < 0.25
    # wider cores permit wider inclinations
    wide = iota[theta_c > 0.15]
    narrow = iota[theta_c < 0.05]
    assert wide.mean() > narrow.mean()


def test_create_prior_from_args(tmp_path):
    from nmma_tpu.priors import create_prior_from_args
    pf = tmp_path / "test.prior"
    pf.write_text(
        "thetaCore = Uniform(name='thetaCore', minimum=0.01, maximum=0.1)\n"
        "inclination_EM = Sine(minimum=0., maximum=np.pi/2.)\n"
        "luminosity_distance = Uniform(minimum=1., maximum=200.)\n")
    priors = create_prior_from_args(
        str(pf), use_Ebv=True, Ebv_max=0.5,
        conditional_gaussian_prior_thetaObs=True, sample_hubble=True,
        hubble_kind="planck")
    assert "Ebv" in priors.priors
    assert "Hubble_constant" in priors.priors
    # transform works (conditional resolved after its parent)
    u = jax.random.uniform(jax.random.PRNGKey(1), (16, priors.ndim))
    params = priors.transform(u)
    assert np.all(np.asarray(params["inclination_EM"]) <= np.pi / 2)
    assert 64 < float(np.mean(np.asarray(params["Hubble_constant"]))) < 70


def test_detector_filter_sets():
    from nmma_tpu.em_detectors import create_detection_limit, set_filters
    assert set_filters(em_detectors="ztf") == ["ztfg", "ztfr", "ztfi"]
    assert set_filters(rubin_too_type="silver") == ["ps1::g", "ps1::i"]
    assert set_filters(filters="ztfg, ztfr") == ["ztfg", "ztfr"]
    limits = create_detection_limit(["ztfg", "ztfr"], em_detectors="ztf")
    assert limits == {"ztfg": 21.7, "ztfr": 21.4}
    limits2 = create_detection_limit(["ztfg"], detection_limit=22.0)
    assert limits2 == {"ztfg": 22.0}


def test_multivariate_gaussian_prior_block(rng):
    """Correlated Gaussian block samples the exact joint distribution
    through the sequential unit-cube transform."""
    import jax
    import jax.numpy as jnp

    from nmma_tpu.priors import PriorDict, multivariate_gaussian_priors
    mean = np.array([1.0, -2.0, 0.5])
    a = rng.normal(size=(3, 3))
    cov = a @ a.T + 0.5 * np.eye(3)
    priors = PriorDict(multivariate_gaussian_priors(["x", "y", "z"],
                                                    mean=mean, cov=cov))
    assert priors.ndim == 3
    u = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, (20000, 3)))
    out = priors.transform(u)
    samples = np.column_stack([np.asarray(out[k]) for k in ("x", "y", "z")])
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples, rowvar=False), cov,
                               atol=0.12)


def test_h5_dummy_prior_surgery(tmp_path, rng):
    """NMMADummyPrior placeholders in a .prior file are replaced by the
    fitted multivariate block / Hubble Interped prior (reference
    adjust_priors_for_nmma, nmma/core/base.py:198-231)."""
    import h5py
    import jax.numpy as jnp

    from nmma_tpu.priors import (adjust_priors_for_nmma, parse_prior_dict)

    h5 = tmp_path / "gw_samples.h5"
    draws = rng.multivariate_normal([1.19, 0.9], [[1e-4, 5e-5],
                                                  [5e-5, 4e-3]], 3000)
    with h5py.File(h5, "w") as f:
        f["chirp_mass"] = draws[:, 0]
        f["mass_ratio"] = draws[:, 1]
    hubble = tmp_path / "hubble.dat"
    hh = np.linspace(50, 100, 40)
    np.savetxt(hubble, np.column_stack([hh, np.exp(-0.5 * ((hh - 70) / 5) ** 2)]))

    priors = parse_prior_dict(
        f"gw_h5_prior = NMMADummyPrior('{h5}')\n"
        f"hubble_weights = NMMADummyPrior('{hubble}')\n"
        "luminosity_distance = Uniform(minimum=10., maximum=100.)\n")
    full = adjust_priors_for_nmma(priors)
    assert "chirp_mass" in full.sampled_names
    assert "Hubble_constant" in full.sampled_names
    assert "gw_h5_prior" not in full.keys()
    u = jnp.asarray(rng.uniform(0.05, 0.95, (5000, full.ndim)))
    out = full.transform(u)
    np.testing.assert_allclose(np.mean(np.asarray(out["chirp_mass"])),
                               1.19, atol=2e-3)
    h0 = np.asarray(out["Hubble_constant"])
    assert abs(np.median(h0) - 70.0) < 2.0


def test_uniform_comoving_volume_prior():
    """bilby.gw.prior.UniformComovingVolume in reference prior files parses
    and inverts to ~dL^2 at low redshift (median of p ~ x^2 on [1, 75] is
    75 / 2^(1/3) ~ 59.5)."""
    from nmma_tpu.priors.parser import parse_prior_dict

    pd = parse_prior_dict(
        "luminosity_distance = bilby.gw.prior.UniformComovingVolume("
        "name='luminosity_distance', minimum=1, maximum=75, unit='Mpc', "
        "boundary='reflective')\n")
    p = pd["luminosity_distance"]
    med = float(p.transform(jnp.asarray(0.5)))
    assert abs(med - 59.5) < 1.0
    lo = float(p.transform(jnp.asarray(0.0)))
    hi = float(p.transform(jnp.asarray(1.0)))
    assert lo >= 1.0 - 1e-6 and hi <= 75.0 + 1e-6


def test_reference_joint_grb_prior_file_loads():
    pd_full = __import__("nmma_tpu.priors", fromlist=["load_prior_file"]) \
        .load_prior_file(
            "/root/reference/example_files/prior/"
            "GW170817_AT2017gfo_GRB170817A.prior")
    assert "luminosity_distance" in pd_full.sampled_names
    assert pd_full.ndim == 22
