import jax.numpy as jnp
import numpy as np
import scipy.special
from scipy.integrate import quad

from nmma_tpu import conversion as C


def test_mass_parameter_completion():
    p = C.generate_mass_parameters({"chirp_mass": 1.186, "mass_ratio": 0.9})
    m1, m2 = float(p["mass_1"]), float(p["mass_2"])
    assert m1 >= m2
    np.testing.assert_allclose(
        float(C.component_masses_to_chirp_mass(m1, m2)), 1.186, rtol=1e-5)
    np.testing.assert_allclose(m2 / m1, 0.9, rtol=1e-5)

    p2 = C.generate_mass_parameters({"mass_1": 1.6, "mass_2": 1.2})
    np.testing.assert_allclose(float(p2["mass_ratio"]), 0.75, rtol=1e-6)


def test_source_frame_masses():
    p = C.source_frame_masses({"mass_1": 1.5, "mass_2": 1.3,
                               "luminosity_distance": 40.0})
    z = float(p["redshift"])
    assert 0.006 < z < 0.012
    np.testing.assert_allclose(float(p["mass_1_source"]), 1.5 / (1 + z),
                               rtol=1e-6)


def test_lambda_tilde_equal_masses():
    # equal masses, equal lambdas: lambdaT == lambda (Favata convention)
    lam_t = float(C.lambda_1_lambda_2_to_lambda_tilde(400.0, 400.0, 1.4, 1.4))
    np.testing.assert_allclose(lam_t, 400.0, rtol=1e-6)


def test_gaussian_jet_eiso_vs_analytic():
    """Quadrature form vs the reference's closed-form complex-erf expression
    (conversion.py:276-297)."""
    e_jet, theta_core, alpha_wing = 1e50, 0.1, 3.0

    prefactor = (np.sqrt(np.pi) * 1.0j * theta_core
                 * np.exp(-theta_core**2 / 2) / 2**1.5)
    first = scipy.special.erf(0.5 * (np.sqrt(2) * 1.0j * theta_core
                                     + np.sqrt(2) * alpha_wing))
    second = scipy.special.erf(0.5 * (np.sqrt(2) * 1.0j * theta_core
                                      - np.sqrt(2) * alpha_wing))
    third = 2 * scipy.special.erf(1.0j * theta_core / np.sqrt(2))
    integral = (prefactor * (first + second - third)).real
    want = np.log10(4 * np.pi * e_jet / (2 * np.pi * integral))

    got = float(C.gaussian_jet_log10_eiso(np.log10(e_jet), theta_core,
                                          alpha_wing))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_powerlaw_jet_eiso_vs_quad():
    e_jet, theta_core, alpha_wing, b = 1e50, 0.08, 4.0, 6.0
    integral, _ = quad(
        lambda x: np.sin(x) * (1 + (x / theta_core) ** 2 / b) ** (-b / 2),
        0, alpha_wing * theta_core)
    want = np.log10(4 * np.pi * e_jet / (2 * np.pi * integral))
    got = float(C.powerlaw_jet_log10_eiso(np.log10(e_jet), theta_core,
                                          alpha_wing, b))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_risco_limits():
    # Schwarzschild: 6M; extremal prograde: 1M; extremal retrograde: 9M
    np.testing.assert_allclose(float(C.chibh_to_risco(0.0)), 6.0, rtol=1e-6)
    np.testing.assert_allclose(float(C.chibh_to_risco(0.9999)), 1.0, atol=0.1)
    np.testing.assert_allclose(float(C.chibh_to_risco(-0.9999)), 9.0, atol=0.1)


def _bns_params(radius_1=12.0, radius_2=12.5):
    return {
        "mass_1_source": jnp.asarray(1.5), "mass_2_source": jnp.asarray(1.3),
        "radius_1": jnp.asarray(radius_1), "radius_2": jnp.asarray(radius_2),
        "TOV_mass": jnp.asarray(2.2), "R_16": jnp.asarray(12.0 * 1.476),
        "alpha": jnp.asarray(1e-4), "ratio_zeta": jnp.asarray(0.3),
        "lambda_1": jnp.asarray(300.0), "lambda_2": jnp.asarray(500.0),
    }


def test_kilonova_ejecta_fitting_branches():
    fit = C.KilonovaEjectaFitting()

    bns = fit(_bns_params())
    assert -4 < float(bns["log10_mej_dyn"]) < -1
    assert -4 < float(bns["log10_mej_wind"]) < -0.5
    assert 40 < float(bns["log10_E0"]) < 54

    # heavier object a BH -> NSBH branch; needs spin info
    nsbh = fit({**_bns_params(radius_1=0.0), "chi_1": jnp.asarray(0.3)})
    assert np.isfinite(float(nsbh["log10_mej_dyn"])) or \
        float(nsbh["log10_mej_dyn"]) <= -1e29

    # both BHs -> no ejecta
    bbh = fit({**_bns_params(radius_1=0.0, radius_2=0.0),
               "chi_1": jnp.asarray(0.3)})
    assert float(bbh["log10_mej"]) <= -1e29


def test_explicitly_sampled_ejecta_wins():
    fit = C.KilonovaEjectaFitting()
    p = fit({**_bns_params(), "log10_mej_dyn": jnp.asarray(-2.5)})
    np.testing.assert_allclose(float(p["log10_mej_dyn"]), -2.5)


def test_qur_radii():
    p = C.radii_from_qur({"mass_1_source": 1.5, "mass_2_source": 1.3,
                          "lambda_1": 300.0, "lambda_2": 500.0})
    assert 9.0 < float(p["radius_1"]) < 15.0
    assert 9.0 < float(p["radius_2"]) < 15.0
    assert float(p["R_16"]) > 8.0


def test_jet_integral_batched_and_exact():
    """The jet-energy quadrature is batch-safe (the node axis is a
    TRAILING axis — batch 100/101 previously aliased it) and Simpson
    weights are exact on the 101-node grid."""
    import jax.numpy as jnp

    from nmma_tpu.conversion import (_jet_integral, gaussian_jet_log10_eiso,
                                     powerlaw_jet_log10_eiso)
    v = float(_jet_integral(jnp.asarray(1.0), jnp.asarray(1.0),
                            lambda x: jnp.ones_like(x)))
    assert abs(v - (1 - np.cos(1.0))) < 1e-6
    g1 = float(gaussian_jet_log10_eiso(jnp.asarray(0.0),
                                       jnp.asarray(0.1), jnp.asarray(3.0)))
    for b in (5, 100, 101):
        tc = jnp.full(b, 0.1)
        aw = jnp.full(b, 3.0)
        g = gaussian_jet_log10_eiso(jnp.zeros(b), tc, aw)
        p = powerlaw_jet_log10_eiso(jnp.zeros(b), tc, aw, jnp.full(b, 6.0))
        assert g.shape == (b,) and p.shape == (b,)
        np.testing.assert_allclose(np.asarray(g), g1, atol=1e-6)


def test_cosmology_to_distance_sampled_omega_matter():
    """A sampled Omega_matter rebuilds the d_L(z) relation (previously
    silently ignored); parity vs an exactly-rebuilt cosmology."""
    import jax.numpy as jnp

    from nmma_tpu.conversion import cosmology_to_distance
    from nmma_tpu.cosmology import Cosmology
    p = cosmology_to_distance({
        "Omega_matter": jnp.asarray([0.25, 0.35]),
        "Hubble_constant": jnp.asarray([67.66, 73.0]),
        "luminosity_distance": jnp.asarray([100.0, 400.0])})
    z = np.asarray(p["redshift"])
    for i, (om, h0, dl) in enumerate([(0.25, 67.66, 100.0),
                                      (0.35, 73.0, 400.0)]):
        z_ref = float(Cosmology(Om0=om, H0=h0).redshift_at_dl(
            jnp.asarray(dl)))
        assert abs(z[i] - z_ref) < 3e-5, (z[i], z_ref)


def test_pulsar_timing_conversions():
    """Pulsar-timing helpers (reference conversion.py:194-216).

    Round-trip identity: sin(i) recovered from the binary mass function;
    Shapiro h3 at edge-on equals the full range T_sun m_c; Einstein
    delay for PSR B1913+16-like parameters lands at the known ~4.3 ms
    scale (Weisberg & Taylor class system: m_p=1.438, m_c=1.390,
    P_b=27906.98 s, e=0.617).
    """
    m_p, m_c, s = 1.438, 1.390, 0.95
    f_m = float(C.binary_mass_function(m_p, m_c, s))
    np.testing.assert_allclose(
        float(C.mass_parameters_to_sini(m_p + m_c, f_m, m_c)), s, rtol=1e-6)

    # edge-on: orthometric ratio -> 1, h3 -> full range = T_sun m_c [us]
    from nmma_tpu.constants import msun_mus
    np.testing.assert_allclose(float(C.shapiro_delay(m_c, 1.0)),
                               msun_mus * m_c, rtol=1e-6)
    # inclination suppression is cubic in the orthometric ratio
    assert float(C.shapiro_delay(m_c, 0.7)) < 0.1 * msun_mus * m_c

    gamma = float(C.einstein_delay(m_p, m_c, 27906.98, 0.6171334))
    np.testing.assert_allclose(gamma, 4.29e-3, rtol=0.03)  # observed gamma
    np.testing.assert_allclose(
        gamma,
        float(C.simplified_einstein_delay(
            m_p, m_c,
            C.einstein_delay_orbital_factor(27906.98, 0.6171334))),
        rtol=1e-6)
