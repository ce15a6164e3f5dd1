"""Frequency-domain BNS waveforms in JAX.

TPU-native replacement for the reference's LALSuite dependency (SURVEY.md
§2.7 R2: ``lalsimulation`` C waveforms called through bilby,
``nmma/gw/gw_likelihood.py:164-207``). The first family implemented is
TaylorF2 with 5PN+6PN tidal phasing — the standard post-Newtonian
inspiral model adequate for BNS signals — written as a closed-form
vectorized function of the frequency grid: one fused elementwise block,
batched over live points via vmap. (IMRPhenomD/NRTidal amplitude models
can be layered on the same interface.)

Conventions: SPA waveform
  h+(f) = A(f) (1 + cos^2 i)/2 exp(i Psi),  hx = A cos(i) exp(i(Psi + pi/2))
with the 3.5PN point-particle phase (nonspinning + aligned-spin 1.5/2PN
terms) and the Wade et al. (2014) tidal terms in lambda_tilde /
delta_lambda_tilde.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# geometric solar mass in seconds and metres
MSUN_S = 4.925490947641267e-06
MSUN_M = 1476.6250380501248
MPC_M = 3.0856775814913673e22
_EULER_GAMMA = 0.5772156649015329


def taylorf2_tidal(frequencies, params):
    """(h_plus, h_cross) on ``frequencies`` [Hz] for a BNS system.

    params: dict with mass_1, mass_2 [Msun, detector frame], lambda_1,
    lambda_2, luminosity_distance [Mpc], theta_jn, phase; optional chi_1,
    chi_2 (aligned spins).
    Amplitude is zeroed above the ISCO frequency of the total mass.
    """
    f = jnp.asarray(frequencies)
    m1 = jnp.asarray(params["mass_1"])
    m2 = jnp.asarray(params["mass_2"])
    chi1 = jnp.asarray(params.get("chi_1", 0.0))
    chi2 = jnp.asarray(params.get("chi_2", 0.0))
    lam1 = jnp.asarray(params.get("lambda_1", 0.0))
    lam2 = jnp.asarray(params.get("lambda_2", 0.0))
    d_l = jnp.asarray(params["luminosity_distance"]) * MPC_M
    iota = jnp.asarray(params.get("theta_jn", 0.0))
    phase_c = jnp.asarray(params.get("phase", 0.0))

    total = m1 + m2
    eta = m1 * m2 / total**2
    mc = total * jnp.power(eta, 3.0 / 5.0)
    m_sec = total * MSUN_S

    v = jnp.power(jnp.pi * m_sec * jnp.maximum(f, 1e-3), 1.0 / 3.0)
    v2, v3, v4, v5 = v * v, v**3, v**4, v**5
    v6, v7, v10, v12 = v**6, v**7, v**10, v**12
    log_v = jnp.log(v)

    # 3.5PN point-particle phasing (TaylorF2, nonspinning)
    phi2 = 3715.0 / 756.0 + 55.0 / 9.0 * eta
    phi3 = -16.0 * jnp.pi
    phi4 = (15293365.0 / 508032.0 + 27145.0 / 504.0 * eta
            + 3085.0 / 72.0 * eta * eta)
    phi5_coeff = jnp.pi * (38645.0 / 756.0 - 65.0 / 9.0 * eta)
    # log term is -6848/63*ln(64 v^3) = -6848/21*(ln 4 + ln v)
    # (LAL XLALSimInspiralPNPhasing_F2 pfa->v[6]/vlogv[6])
    phi6 = (11583231236531.0 / 4694215680.0 - 640.0 / 3.0 * jnp.pi**2
            - 6848.0 / 21.0 * _EULER_GAMMA
            + eta * (-15737765635.0 / 3048192.0 + 2255.0 / 12.0 * jnp.pi**2)
            + 76055.0 / 1728.0 * eta**2 - 127825.0 / 1296.0 * eta**3
            - 6848.0 / 21.0 * jnp.log(4.0))
    phi6_log = -6848.0 / 21.0
    phi7 = jnp.pi * (77096675.0 / 254016.0 + 378515.0 / 1512.0 * eta
                     - 74045.0 / 756.0 * eta**2)

    # leading aligned-spin terms (1.5PN beta, 2PN sigma; Poisson & Will)
    delta = (m1 - m2) / total
    chi_s = 0.5 * (chi1 + chi2)
    chi_a = 0.5 * (chi1 - chi2)
    beta = (113.0 / 12.0 - 19.0 / 3.0 * eta) * chi_s + \
        113.0 / 12.0 * delta * chi_a
    sigma = eta * (721.0 / 48.0 - 247.0 / 48.0) * (chi1 * chi2)

    psi_pp = (1.0
              + phi2 * v2
              + (phi3 + 4.0 * beta) * v3
              + (phi4 - 10.0 * sigma) * v4
              + phi5_coeff * (1.0 + 3.0 * log_v) * v5
              + (phi6 + phi6_log * log_v) * v6
              + phi7 * v7)

    # tidal phase (Wade et al. 2014 eq. 14-15)
    lam_t, dlam_t = _tidal_combinations(lam1, lam2, m1, m2)
    root = jnp.sqrt(jnp.maximum(1.0 - 4.0 * eta, 0.0))
    psi_tidal = (-39.0 / 2.0 * lam_t) * v10 + \
        (-3115.0 / 64.0 * lam_t + 6595.0 / 364.0 * root * dlam_t) * v12

    psi = (2.0 * jnp.pi * f * jnp.asarray(params.get("geocent_time_offset", 0.0))
           - phase_c - jnp.pi / 4.0
           + 3.0 / (128.0 * eta * v5) * (psi_pp + psi_tidal))

    # SPA amplitude
    amp = (jnp.sqrt(5.0 / 24.0) * jnp.power(jnp.pi, -2.0 / 3.0)
           * jnp.power(mc * MSUN_S, 5.0 / 6.0)
           * jnp.power(jnp.maximum(f, 1e-3), -7.0 / 6.0)
           * 299792458.0 / d_l)

    f_isco = 1.0 / (6.0**1.5 * jnp.pi * m_sec)
    in_band = (f > 0.0) & (f < f_isco)
    amp = jnp.where(in_band, amp, 0.0)

    h = amp * jnp.exp(-1j * psi)
    cos_i = jnp.cos(iota)
    h_plus = h * (1.0 + cos_i * cos_i) / 2.0
    h_cross = h * cos_i * jnp.exp(-1j * jnp.pi / 2.0)
    return h_plus, h_cross


def _tidal_combinations(lam1, lam2, m1, m2):
    total = m1 + m2
    eta = m1 * m2 / total**2
    eta2, eta3 = eta * eta, eta**3
    root = jnp.sqrt(jnp.maximum(1.0 - 4 * eta, 0.0))
    lam_p, lam_m = lam1 + lam2, lam1 - lam2
    lam_t = (8.0 / 13.0) * ((1.0 + 7 * eta - 31 * eta2) * lam_p
                            + root * (1.0 + 9 * eta - 11 * eta2) * lam_m)
    dlam_t = 0.5 * (root * (1.0 - 13272.0 / 1319.0 * eta
                            + 8944.0 / 1319.0 * eta2) * lam_p
                    + (1.0 - 15910.0 / 1319.0 * eta
                       + 32850.0 / 1319.0 * eta2
                       + 3380.0 / 1319.0 * eta3) * lam_m)
    return lam_t, dlam_t


def aligo_design_psd(frequencies):
    """Analytic approximation to the aLIGO design PSD (zero-det high-P).

    Standard fitting formula (Ajith & Bose 2009-style); used when no PSD
    file is provided (reference default: bilby's aLIGO PSD files).
    """
    f = np.asarray(frequencies, dtype=np.float64)
    x = f / 245.4
    with np.errstate(divide="ignore"):
        psd = 1e-48 * (0.0152 * x**-4 + 0.2935 * x**(9.0 / 4.0)
                       + 2.7951 * x**(3.0 / 2.0) - 6.5080 * x**(3.0 / 4.0)
                       + 17.7622)
    psd[f < 10.0] = np.inf
    return psd
