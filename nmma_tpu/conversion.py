"""Multimessenger parameter-conversion chain, fully vectorized.

TPU-native re-implementation of ``nmma/core/conversion.py``: the chain
cosmology -> GW source frame -> EOS(M, R, Lambda) -> ejecta fitting -> EM
parameters, written as pure jnp functions over a parameter dict (scalars or
batched arrays — every formula is elementwise, so a vmapped likelihood gets
the whole chain for free). Branching (BNS vs NSBH vs BBH) is ``jnp.where``
masks, which is exactly the reference's own vectorized fallback
(``KilonovaEjectaFitting``, conversion.py:744-766).

Every fitting formula cites the same papers as the reference:
  * BNS disk mass: Eq. (22) of arXiv:2205.08513 (+1908.05442 threshold)
  * BNS dynamical mass: Kruger & Foucart, arXiv:2002.07728
  * prompt-collapse fits: arXiv:2411.02342
  * NSBH remnant disk: arXiv:1807.00011; dynamical: arXiv:2002.07728
  * risco(chi): arXiv:2011.08948; baryonic mass: arXiv:2002.07728 Eq. (7)
  * structured-jet isotropic-equivalent energy integrals
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (einstein_factor, geom_msun_km, msun_mus,
                        msun_to_ergs)
from .cosmology import get_cosmology

NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# mass conversions (bilby-compatible relations)
# ---------------------------------------------------------------------------
def component_masses_to_chirp_mass(m1, m2):
    return (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2


def component_masses_to_symmetric_mass_ratio(m1, m2):
    return m1 * m2 / (m1 + m2) ** 2


def chirp_mass_and_mass_ratio_to_total_mass(mc, q):
    return mc * (1 + q) ** 1.2 / q**0.6


def chirp_mass_and_eta_to_component_masses(mc, eta):
    total = mc / jnp.power(eta, 3.0 / 5.0)
    q = (1 - jnp.sqrt(1.0 - 4.0 * eta) - 2 * eta) / (2.0 * eta)
    m1 = total / (1.0 + q)
    return m1, total * q / (1.0 + q)


def generate_mass_parameters(parameters):
    """Complete m1/m2/chirp/q/total/eta from whatever subset is present.

    Vectorized analogue of bilby's ``generate_mass_parameters`` as used in
    ``bns_source_frame`` (conversion.py:135-139). Masses are detector frame.
    """
    p = dict(parameters)
    if "mass_1" not in p or "mass_2" not in p:
        if "chirp_mass" in p and "mass_ratio" in p:
            mc, q = jnp.asarray(p["chirp_mass"]), jnp.asarray(p["mass_ratio"])
            total = chirp_mass_and_mass_ratio_to_total_mass(mc, q)
            p["mass_1"] = total / (1 + q)
            p["mass_2"] = total * q / (1 + q)
        elif "chirp_mass" in p and "symmetric_mass_ratio" in p:
            m1, m2 = chirp_mass_and_eta_to_component_masses(
                jnp.asarray(p["chirp_mass"]),
                jnp.asarray(p["symmetric_mass_ratio"]))
            p["mass_1"], p["mass_2"] = m1, m2
        elif "total_mass" in p and "mass_ratio" in p:
            total, q = jnp.asarray(p["total_mass"]), jnp.asarray(p["mass_ratio"])
            p["mass_1"] = total / (1 + q)
            p["mass_2"] = total * q / (1 + q)
    m1, m2 = jnp.asarray(p["mass_1"]), jnp.asarray(p["mass_2"])
    p.setdefault("mass_ratio", m2 / m1)
    p.setdefault("chirp_mass", component_masses_to_chirp_mass(m1, m2))
    p.setdefault("total_mass", m1 + m2)
    p.setdefault("symmetric_mass_ratio",
                 component_masses_to_symmetric_mass_ratio(m1, m2))
    return p


def _dl_grid_for_om0(cosmo, om0):
    """Traced-Om0 d_L(z) grid [..., N] on the fiducial z grid.

    Radiation stays at the fiducial density (O(1e-5) of the budget at PE
    redshifts); dark energy closes the budget, matching astropy's
    ``clone(Om0=...)`` convention the reference uses
    (conversion.py:66-102). d_L carries the FIDUCIAL H0 — callers apply
    the exact 1/H0 scaling separately.
    """
    zg = cosmo.z_grid                                      # [N] host
    or_grid = cosmo.Ogamma0 * (1.0 + cosmo._nu_relative_density(zg))
    zp1 = 1.0 + zg
    om0 = jnp.asarray(om0)[..., None]
    ode0 = 1.0 - om0 - cosmo.Ogamma0 - cosmo.Onu0
    e2 = om0 * zp1**3 + ode0 + or_grid * zp1**4            # [..., N]
    inv_e = 1.0 / jnp.sqrt(e2)
    dz = np.diff(zg)
    dc = jnp.concatenate([
        jnp.zeros(inv_e.shape[:-1] + (1,)),
        jnp.cumsum(0.5 * (inv_e[..., 1:] + inv_e[..., :-1]) * dz,
                   axis=-1)], axis=-1) * cosmo.hubble_distance
    return zp1 * dc


def cosmology_to_distance(parameters, cosmology=None):
    """Cosmology-aware distance <-> redshift conversion.

    Counterpart of ``cosmology_to_distance`` (conversion.py:66-102): when
    'Hubble_constant' (and/or 'Omega_matter') is sampled, z(d_L) is
    evaluated under the modified cosmology. At fixed density parameters
    d_L(z) H0 is exactly H0-invariant, so the fiducial interpolation grid
    serves every sample: z = z_fid(d_L * H0 / H0_fid). A sampled
    Omega_matter changes the shape of d_L(z), so its grid is rebuilt
    per sample (a 1-D cumulative trapezoid — jit/vmap safe).
    """
    p = dict(parameters)
    if "Hubble_constant" not in p and "Omega_matter" not in p:
        return p
    cosmo = cosmology or get_cosmology()
    h_ratio = jnp.asarray(p.get("Hubble_constant", cosmo.H0)) / cosmo.H0
    if "Omega_matter" in p:
        dl_grid = _dl_grid_for_om0(cosmo, p["Omega_matter"])  # [..., N]
        zg = jnp.asarray(cosmo.z_grid)
        if "luminosity_distance" in p:
            dl_q = jnp.asarray(p["luminosity_distance"]) * h_ratio
            interp = jnp.vectorize(jnp.interp,
                                   signature="(),(n),(n)->()")
            p["redshift"] = interp(dl_q, dl_grid, zg)
        elif "redshift" in p:
            interp = jnp.vectorize(jnp.interp,
                                   signature="(),(n),(n)->()")
            p["luminosity_distance"] = interp(
                jnp.asarray(p["redshift"]), zg, dl_grid) / h_ratio
        return p
    if "luminosity_distance" in p:
        p["redshift"] = cosmo.redshift_at_dl(
            jnp.asarray(p["luminosity_distance"]) * h_ratio)
    elif "redshift" in p:
        p["luminosity_distance"] = cosmo.luminosity_distance(
            jnp.asarray(p["redshift"])) / h_ratio
    return p


def source_frame_masses(parameters, cosmology=None):
    """Detector-frame -> source-frame masses via z(d_L).

    (reference ``source_frame_masses``, conversion.py:105-117)
    """
    p = generate_mass_parameters(parameters)
    if "redshift" not in p:
        cosmo = cosmology or get_cosmology()
        p["redshift"] = cosmo.redshift_at_dl(
            jnp.asarray(p["luminosity_distance"]))
    z = jnp.asarray(p["redshift"])
    p.setdefault("mass_1_source", jnp.asarray(p["mass_1"]) / (1 + z))
    p.setdefault("mass_2_source", jnp.asarray(p["mass_2"]) / (1 + z))
    return p


def bns_source_frame(parameters, cosmology=None):
    return source_frame_masses(parameters, cosmology)


bbh_source_frame = bns_source_frame


def lambda_1_lambda_2_to_lambda_tilde(lambda_1, lambda_2, m1, m2):
    """Favata (2014) effective tidal deformability (bilby formula)."""
    eta = component_masses_to_symmetric_mass_ratio(m1, m2)
    q = m2 / m1
    lam_plus = lambda_1 + lambda_2
    lam_minus = lambda_1 - lambda_2
    root = jnp.sqrt(jnp.maximum(1.0 - 4.0 * eta, 0.0))
    return (8.0 / 13.0) * ((1.0 + 7.0 * eta - 31.0 * eta**2) * lam_plus
                           + root * (1.0 + 9.0 * eta - 11.0 * eta**2)
                           * lam_minus)


def tidal_deformabilities_and_mass_ratio_to_eff_tidal_deformabilities(
        lambda_1, lambda_2, q):
    """(lambdaT, dlambdaT) from component lambdas (conversion.py:163-172)."""
    eta = q / (1.0 + q) ** 2
    eta2, eta3 = eta * eta, eta**3
    root = jnp.sqrt(jnp.maximum(1.0 - 4 * eta, 0.0))
    lam_t = (8.0 / 13.0) * ((1.0 + 7 * eta - 31 * eta2) * (lambda_1 + lambda_2)
                            + root * (1.0 + 9 * eta - 11.0 * eta2)
                            * (lambda_1 - lambda_2))
    dlam_t = 0.5 * (root * (1.0 - 13272.0 * eta / 1319.0
                            + 8944.0 * eta2 / 1319.0) * (lambda_1 + lambda_2)
                    + (1.0 - 15910.0 * eta / 1319.0 + 32850.0 * eta2 / 1319.0
                       + 3380.0 * eta3 / 1319.0) * (lambda_1 - lambda_2))
    return lam_t, dlam_t


def chi_eff(m1, m2, chi_1, chi_2):
    return (m1 * chi_1 + m2 * chi_2) / (m1 + m2)


# ---------------------------------------------------------------------------
# EOS-related conversions (conversion.py:222-270)
# ---------------------------------------------------------------------------
def lambda_to_compactness(lambda_i):
    """Quasi-universal relation C(Lambda) (conversion.py:264-267)."""
    loglam = jnp.log(lambda_i)
    return 0.371 - 0.0391 * loglam + 0.001056 * loglam * loglam


def mass_and_compactness_to_radius(mass, comp):
    return jnp.where(comp < 0.5, mass / comp * geom_msun_km, 0.0)


def radii_from_qur(parameters):
    """Radii + R_16 from tidal deformabilities via quasi-universal relations
    (conversion.py:239-262)."""
    p = dict(parameters)
    m1s, m2s = jnp.asarray(p["mass_1_source"]), jnp.asarray(p["mass_2_source"])
    lam1, lam2 = jnp.asarray(p["lambda_1"]), jnp.asarray(p["lambda_2"])
    p["radius_1"] = mass_and_compactness_to_radius(
        m1s, lambda_to_compactness(lam1))
    p["radius_2"] = mass_and_compactness_to_radius(
        m2s, lambda_to_compactness(lam2))
    mc_source = component_masses_to_chirp_mass(m1s, m2s)
    lam_t = lambda_1_lambda_2_to_lambda_tilde(lam1, lam2, m1s, m2s)
    p["R_16"] = mc_source * jnp.power(lam_t / 0.0042, 1.0 / 6.0) * geom_msun_km
    return p


def eos_to_ns_parameters(radii, masses):
    """(TOV_mass, TOV_radius, R_14, R_16) from an (R, M) curve
    (conversion.py:224-229)."""
    tov_mass = jnp.max(masses, axis=-1)
    tov_radius = radii[jnp.argmax(masses, axis=-1)]
    r_14 = jnp.interp(1.4, masses, radii, left=0.0, right=0.0)
    r_16 = jnp.interp(1.6, masses, radii, left=0.0, right=0.0)
    return tov_mass, tov_radius, r_14, r_16


def eos_to_system_parameters(radii, masses, lambdas, m1_source, m2_source):
    """(lambda_1/2, radius_1/2) by mass interpolation on the EOS curve
    (conversion.py:231-237); beyond MTOV: lambda -> 0, radius -> 0 (BH)."""
    log_lam = jnp.log(jnp.maximum(lambdas, 1e-30))
    lam_1 = jnp.exp(jnp.interp(m1_source, masses, log_lam,
                               left=-jnp.inf, right=-jnp.inf))
    lam_2 = jnp.exp(jnp.interp(m2_source, masses, log_lam,
                               left=-jnp.inf, right=-jnp.inf))
    rad_1 = jnp.interp(m1_source, masses, radii, left=0.0, right=0.0)
    rad_2 = jnp.interp(m2_source, masses, radii, left=0.0, right=0.0)
    return lam_1, lam_2, rad_1, rad_2


# ---------------------------------------------------------------------------
# pulsar-timing conversions (conversion.py:194-216)
# ---------------------------------------------------------------------------


def binary_mass_function(m_obs, m_comp, sin_i):
    """f(M) = (m_c sin i)^3 / (m_p + m_c)^2 [Msun] (conversion.py:195-196)."""
    return (m_comp * sin_i) ** 3 / (m_obs + m_comp) ** 2


def shapiro_delay(m_comp, sin_i):
    """Orthometric Shapiro-delay amplitude h3 [microseconds]
    (conversion.py:198-202; Freire & Wex 2010, arXiv:1007.0933): range
    r = T_sun m_c times the cube of the orthometric ratio
    s/(1 + sqrt(1 - s^2))."""
    shapiro_range = msun_mus * m_comp
    # epsilon floor (not 0): d/dx sqrt(x) -> inf at 0, so an exactly
    # edge-on sin_i = 1 would poison gradients if this feeds an
    # HMC/gradient sampler (ADVICE r3)
    ratio = sin_i / (1.0 + jnp.sqrt(jnp.maximum(1.0 - sin_i**2, 1e-30)))
    return shapiro_range * ratio**3


def einstein_delay_orbital_factor(orbital_period, eccentricity):
    """Orbital prefactor of the Einstein-delay amplitude
    (conversion.py:204-206): T_sun^{2/3} e (P_b / 2 pi)^{1/3}, P_b in
    seconds."""
    return (einstein_factor * eccentricity
            * jnp.cbrt(orbital_period / (2.0 * jnp.pi)))


def simplified_einstein_delay(m_psr, m_comp, einstein_delay_factor):
    """gamma [s] given the orbital prefactor (conversion.py:207-209):
    factor * m_c (m_p + 2 m_c) / (m_p + m_c)^{4/3}, masses in Msun."""
    return (einstein_delay_factor * m_comp * (m_psr + 2.0 * m_comp)
            / (m_psr + m_comp) ** (4.0 / 3.0))


def einstein_delay(m_psr, m_comp, orbital_period, eccentricity):
    """Einstein-delay amplitude gamma [s] (conversion.py:211-214)."""
    return simplified_einstein_delay(
        m_psr, m_comp,
        einstein_delay_orbital_factor(orbital_period, eccentricity))


def mass_parameters_to_sini(total_mass, mass_function, m_comp):
    """Invert the binary mass function for sin(i) (conversion.py:215-216)."""
    return jnp.cbrt(mass_function * total_mass**2) / m_comp


# ---------------------------------------------------------------------------
# structured-jet energy conversions (conversion.py:274-316)
# ---------------------------------------------------------------------------
_JET_QUAD_N = 101   # ODD sample count: classic composite Simpson is exact


def _jet_integral(theta_core, alpha_wing, profile):
    """int_0^{alphaWing*thetaCore} sin(x) * profile(x) dx, composite
    Simpson over an odd node count (exact weights; an even count needs
    scipy's corrected last-interval rule, and the previous 100-node
    (1,4,2,...) weights integrated a constant to 0.9966). Batch-safe:
    the quadrature axis is a new TRAILING axis, so [B]-shaped parameters
    broadcast instead of colliding with the node axis.

    ``profile`` receives x shaped [..., N]; closures over per-sample
    parameters must broadcast with a trailing [..., None]."""
    theta_max = jnp.asarray(alpha_wing) * jnp.asarray(theta_core)
    frac = jnp.linspace(0.0, 1.0, _JET_QUAD_N)
    x = theta_max[..., None] * frac                      # [..., N]
    y = jnp.sin(x) * profile(x)
    h = theta_max / (_JET_QUAD_N - 1)
    w = np.ones(_JET_QUAD_N)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return h / 3.0 * jnp.sum(w * y, axis=-1)


def gaussian_jet_log10_eiso(log10_ejet, theta_core, alpha_wing):
    """log10 on-axis isotropic-equivalent energy of a gaussian jet.

    Kept in log space: jet energies (~1e50 erg) overflow float32.
    E_iso = E_jet * 2 / integral (reference conversion.py:276-297).
    """
    tc = jnp.asarray(theta_core)[..., None]
    integral = _jet_integral(theta_core, alpha_wing,
                             lambda x: jnp.exp(-0.5 * (x / tc) ** 2))
    return log10_ejet + jnp.log10(2.0) - jnp.log10(integral)


def powerlaw_jet_log10_eiso(log10_ejet, theta_core, alpha_wing, b):
    tc = jnp.asarray(theta_core)[..., None]
    b_ = jnp.asarray(b)[..., None]
    integral = _jet_integral(
        theta_core, alpha_wing,
        lambda x: jnp.power(1.0 + (x / tc) ** 2 / b_, -b_ / 2.0))
    return log10_ejet + jnp.log10(2.0) - jnp.log10(integral)


# ---------------------------------------------------------------------------
# ejecta fitting (conversion.py:332-766)
# ---------------------------------------------------------------------------
def chibh_to_risco(chi_bh):
    """ISCO radius / M_BH as a function of spin (arXiv:2011.08948 eq. 2-4)."""
    z1 = 1.0 + jnp.cbrt(1.0 - chi_bh**2) * (
        jnp.cbrt(1 + chi_bh) + jnp.cbrt(1 - chi_bh))
    z2 = jnp.sqrt(3.0 * chi_bh**2 + z1**2)
    return 3.0 + z2 - jnp.sign(chi_bh) * jnp.sqrt(
        jnp.maximum((3.0 - z1) * (3.0 + z1 + 2.0 * z2), 0.0))


def baryon_mass_ns(source_mass, compactness):
    return source_mass * (1.0 + 0.6 * compactness / (1.0 - 0.5 * compactness))


def nsbh_remnant_disk_mass(m1s, m2s, comp2, chi_bh, a=0.40642158,
                           b=0.13885773, c=0.25512517, d=0.761250847):
    q = m2s / m1s
    eta = q / (1.0 + q) ** 2
    risco = chibh_to_risco(chi_bh)
    mb2 = baryon_mass_ns(m2s, comp2)
    remnant = a * jnp.power(eta, -1.0 / 3.0) * (1.0 - 2.0 * comp2)
    remnant = remnant - b * risco / eta * comp2 + c
    remnant = jnp.maximum(remnant, 0.0)
    return jnp.power(remnant, 1.0 + d) * mb2


def nsbh_dynamic_mass(m1s, m2s, comp2, chi_bh, a1=7.11595154e-03,
                      a2=1.43636803e-03, a4=-2.76202990e-02,
                      n1=-8.63604211e-01, n2=-1.68399507):
    q = m2s / m1s
    risco = chibh_to_risco(chi_bh)
    mb2 = baryon_mass_ns(m2s, comp2)
    mdyn = a1 * q**n1 * (1.0 - 2.0 * comp2) / comp2
    mdyn = mdyn - a2 * q**n2 * risco + a4
    return jnp.maximum(mdyn * mb2, 0.0)


def bns_log10_disk_mass(total_mass, mass_ratio, mtov, r16,
                        a0=-1.725, delta_a=-2.337, b0=-0.564, delta_b=-0.437,
                        c=0.958, d=0.057, beta=5.879, q_trans=0.886):
    k = -3.606 * mtov / r16 + 2.38
    threshold_mass = k * mtov
    xi = 0.5 * jnp.tanh(beta * (mass_ratio - q_trans))
    a = a0 + delta_a * xi
    b = b0 + delta_b * xi
    log10_mdisk = a * (1 + b * jnp.tanh((c - total_mass / threshold_mass) / d))
    return jnp.maximum(-3.0, log10_mdisk)


def bns_dynamic_mass_krfo(m1, m2, comp1, comp2, a=-9.3335, b=114.17,
                          c=-337.56, n=1.5465):
    mdyn = m1 * (a / comp1 + b * jnp.power(m2 / m1, n) + c * comp1)
    mdyn = mdyn + m2 * (a / comp2 + b * jnp.power(m1 / m2, n) + c * comp2)
    return jnp.maximum(mdyn * 1e-3, 0.0)


def bns_dynamic_vel_radice2018(m1, m2, comp1, comp2, a=-0.287, b=0.494,
                               c=-3.000):
    return (a * m1 / m2 * (1 + c * comp1) + a * m2 / m1 * (1 + c * comp2) + b)


def bns_prompt_collapse_dynamic_mass(m1, m2, lam1, lam2, a=1.25e-4,
                                     b=9.82e-1, c=-2.44):
    q = m2 / m1
    lam_t = lambda_1_lambda_2_to_lambda_tilde(lam1, lam2, m1, m2)
    return a * lam_t * (1.0 / q - b) * jnp.exp(c / q)


def bns_prompt_collapse_dynamic_vel(m1, m2, comp1, comp2, a=-0.395,
                                    b=0.798, c=-1.627):
    return (a * m1 / m2 * (1 + c * comp1) + a * m2 / m1 * (1 + c * comp2) + b)


def bns_prompt_collapse_log10_disk_mass(m1, m2, lam1, lam2, a=7.70,
                                        b=-13.4, c=8.16e-3):
    q = m2 / m1
    lam_t = lambda_1_lambda_2_to_lambda_tilde(lam1, lam2, m1, m2)
    return jnp.minimum(a + b * q + c * lam_t * q**2, -1.0)


def chibh_fitting(m1, m2, lam1, lam2, a=0.537, b=-0.185, c=-0.514):
    """BNS remnant BH spin (arXiv:1812.04803 Eq. D7)."""
    lam_t = lambda_1_lambda_2_to_lambda_tilde(lam1, lam2, m1, m2)
    total = m1 + m2
    nu = component_masses_to_symmetric_mass_ratio(m1, m2)
    return jnp.tanh(a * (nu / 0.25) ** 2 * (total + b * lam_t / 400.0) + c)


def _safe_log10(x):
    return jnp.where(x > 0, jnp.log10(jnp.maximum(x, 1e-300)), NEG_INF)


class KilonovaEjectaFitting:
    """BNS / NSBH / BBH ejecta conversion with jnp.where branching.

    Pure-function analogue of ``KilonovaEjectaFitting``
    (conversion.py:744-766): radius_1 > 0 selects the BNS branch,
    radius_1 == 0 < radius_2 the NSBH branch, both zero -> no ejecta.
    Explicitly sampled ejecta parameters always win (EjectaFitting.__call__
    semantics, :320-327).
    """

    mass_fitting_keys = ("log10_mej_dyn", "log10_mej_wind", "log10_mej",
                         "log10_E0")

    def _bns(self, p):
        m1s, m2s = p["mass_1_source"], p["mass_2_source"]
        total, q = m1s + m2s, m2s / m1s
        r1 = jnp.maximum(jnp.asarray(p["radius_1"]), 1e-6)
        r2 = jnp.maximum(jnp.asarray(p["radius_2"]), 1e-6)
        comp1 = m1s * geom_msun_km / r1
        comp2 = m2s * geom_msun_km / r2
        mdyn = bns_dynamic_mass_krfo(m1s, m2s, comp1, comp2)
        log10_mdisk = bns_log10_disk_mass(
            total, q, p["TOV_mass"], p["R_16"] / geom_msun_km)
        log10_mej_dyn = _safe_log10(mdyn + p.get("alpha", 0.0))
        log10_mej_wind = _safe_log10(jnp.asarray(p["ratio_zeta"])) + log10_mdisk
        log10_mej = _safe_log10(10.0**log10_mej_dyn + 10.0**log10_mej_wind)

        if "log10_E0" in p:
            log10_e0 = jnp.asarray(p["log10_E0"])
        else:
            log10_e0 = self._grb_energy(p, log10_mdisk)
        return jnp.stack([log10_mej_dyn, log10_mej_wind, log10_mej, log10_e0])

    def _grb_energy(self, p, log10_mdisk):
        """(conversion.py:699-726)"""
        log10_ejet = (_safe_log10(jnp.asarray(p.get("ratio_epsilon", 2e-4)))
                      + _safe_log10(1.0 - jnp.asarray(p["ratio_zeta"]))
                      + log10_mdisk + np.log10(msun_to_ergs))
        theta_core = jnp.asarray(p.get("thetaCore", 0.105))
        if not any(k in p for k in ("thetaWing", "alphaWing", "b")):
            return log10_ejet - _safe_log10(jnp.sin(theta_core / 2.0) ** 2)
        if "alphaWing" in p:
            alpha_wing = jnp.asarray(p["alphaWing"])
        else:
            alpha_wing = jnp.asarray(p["thetaWing"]) / theta_core
        if "b" in p:
            return powerlaw_jet_log10_eiso(log10_ejet, theta_core,
                                           alpha_wing, jnp.asarray(p["b"]))
        return gaussian_jet_log10_eiso(log10_ejet, theta_core, alpha_wing)

    def _nsbh(self, p):
        """(conversion.py:421-466)"""
        m1s, m2s = p["mass_1_source"], p["mass_2_source"]
        r2 = jnp.maximum(jnp.asarray(p["radius_2"]), 1e-6)
        comp2 = m2s * geom_msun_km / r2
        if "chi_1" in p:
            chi_1 = jnp.asarray(p["chi_1"])
        elif "cos_tilt_1" in p or "tilt_1" in p:
            cos_tilt = jnp.asarray(p.get("cos_tilt_1",
                                         jnp.cos(jnp.asarray(p.get("tilt_1", 0.0)))))
            chi_1 = jnp.asarray(p["a_1"]) * cos_tilt
        else:
            chi_1 = jnp.zeros_like(jnp.asarray(m1s))
        mdyn_fit = nsbh_dynamic_mass(m1s, m2s, comp2, chi_1)
        remnant = nsbh_remnant_disk_mass(m1s, m2s, comp2, chi_1)
        mdisk = remnant - mdyn_fit
        mej_dyn = mdyn_fit + p.get("alpha", 0.0)
        disk_ok = mdisk > 0.0
        log10_mej_dyn = jnp.where(disk_ok, _safe_log10(mej_dyn), NEG_INF)
        log10_mej_wind = jnp.where(
            disk_ok,
            _safe_log10(mdisk) + _safe_log10(jnp.asarray(p["ratio_zeta"])),
            NEG_INF)
        log10_mej = _safe_log10(10.0**log10_mej_dyn + 10.0**log10_mej_wind)
        neg = jnp.full_like(jnp.asarray(log10_mej), NEG_INF)
        return jnp.stack([log10_mej_dyn, log10_mej_wind, log10_mej, neg])

    def __call__(self, parameters):
        p = dict(parameters)
        r1 = jnp.asarray(p["radius_1"])
        r2 = jnp.asarray(p["radius_2"])
        bns = self._bns(p)
        nsbh = self._nsbh(p)
        bbh = jnp.full_like(bns, NEG_INF)
        out = jnp.where(r1 > 0.0, bns, jnp.where(r2 > 0.0, nsbh, bbh))
        out = jnp.where(jnp.isfinite(out), out, NEG_INF)
        for i, key in enumerate(self.mass_fitting_keys):
            p[key] = p.get(key, out[i])
        return p


def convert_mtot_mni(parameters):
    """AnBa2022 supernova conversions (conversion.py:185-193): linear
    masses from log10 sampling + derived mni_c / mrp_c combinations."""
    p = dict(parameters)
    for par in ("mni", "mtot", "mrp"):
        if par not in p and f"log10_{par}" in p:
            p[par] = 10.0 ** jnp.asarray(p[f"log10_{par}"])
    p["mni_c"] = jnp.asarray(p["mni"]) / jnp.asarray(p["mtot"])
    p["mrp_c"] = (jnp.asarray(p["xmix"])
                  * (jnp.asarray(p["mtot"]) - jnp.asarray(p["mni"]))
                  - jnp.asarray(p["mrp"]))
    return p


def generate_posterior_parameters(posterior):
    """Add derived columns to a posterior dict.

    Counterpart of the reference's posterior conversion
    (``nmma/gw/gw_likelihood.py:214-235``): chi_eff, lambda_tilde, source
    masses, mass ratio.
    """
    p = dict(posterior)
    if "mass_1" in p and "mass_2" in p:
        m1, m2 = jnp.asarray(p["mass_1"]), jnp.asarray(p["mass_2"])
        p.setdefault("mass_ratio", m2 / m1)
        p.setdefault("chirp_mass", component_masses_to_chirp_mass(m1, m2))
        if "chi_1" in p and "chi_2" in p:
            p.setdefault("chi_eff", chi_eff(m1, m2, jnp.asarray(p["chi_1"]),
                                            jnp.asarray(p["chi_2"])))
        if "lambda_1" in p and "lambda_2" in p:
            p.setdefault("lambda_tilde", lambda_1_lambda_2_to_lambda_tilde(
                jnp.asarray(p["lambda_1"]), jnp.asarray(p["lambda_2"]),
                m1, m2))
    return p


class MultimessengerConversion:
    """Ordered conversion pipeline (conversion.py:768-824)."""

    def __init__(self, *conversions):
        self._conversions = conversions

    @classmethod
    def from_dict(cls, instruction_dict):
        conversions = []
        if "cosmo" in instruction_dict:
            from .cosmology import set_cosmology
            set_cosmology(instruction_dict["cosmo"])
        if "gw" in instruction_dict:
            conversions.append(instruction_dict["gw"])
        if "eos" in instruction_dict:
            conversions.append(instruction_dict["eos"])
        if "ejecta" in instruction_dict:
            conversions.append(KilonovaEjectaFitting())
        if "em" in instruction_dict:
            conversions.append(instruction_dict["em"])
        if "custom" in instruction_dict:
            conversions.append(instruction_dict["custom"])
        return cls(*conversions)

    @classmethod
    def basic_cbc(cls, eos_conversion, em_conversion):
        return cls(bbh_source_frame, eos_conversion, KilonovaEjectaFitting(),
                   em_conversion)

    def __call__(self, parameters):
        for conv in self._conversions:
            parameters = conv(parameters)
        return parameters


def reweight_to_flat_mass_prior(samples, frac=0.3, rng=None):
    """Resample a posterior to a flat-in-component-mass prior.

    The sampling prior is flat in (chirp_mass, mass_ratio); converting to
    flat in (m1, m2) needs the Jacobian m1^2 / Mc. Mirrors
    ``reweight_to_flat_mass_prior`` (nmma/core/conversion.py:176-183):
    draw ``frac`` of the samples without replacement, weighted by the
    Jacobian (the reference's ``df.sample(frac=0.3, weights=...)``).

    ``samples``: dict of equal-length arrays (or a DataFrame-like with
    ``chirp_mass``/``mass_ratio`` columns). Returns the same mapping type
    with subsampled rows.
    """
    rng = np.random.default_rng(rng)
    get = samples.get if hasattr(samples, "get") else \
        lambda k: samples[k]
    mc = np.asarray(get("chirp_mass"), dtype=np.float64)
    q = np.asarray(get("mass_ratio"), dtype=np.float64)
    total = chirp_mass_and_mass_ratio_to_total_mass(mc, q)
    m1 = total / (1.0 + q)
    weights = m1 * m1 / mc
    weights = weights / weights.sum()
    n = len(mc)
    n_out = max(int(round(frac * n)), 1)
    idx = rng.choice(n, size=n_out, replace=False, p=weights)
    keys = samples.keys() if hasattr(samples, "keys") else None
    if keys is None:
        raise TypeError("samples must be a mapping of arrays")
    return {k: np.asarray(samples[k])[idx] for k in keys}
