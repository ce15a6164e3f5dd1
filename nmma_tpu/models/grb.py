"""Structured-jet GRB afterglow (TrPi2018-style) as a fused JAX kernel.

TPU-native replacement for the reference's afterglowpy C extension
(``nmma/em/lightcurve_generation.py:221-280``, SURVEY.md §2.7 R3),
implementing the standard semi-analytic model of Ryan et al. (2020) /
Sari-Piran-Narayan (1998) synchrotron theory from the published physics:

* jet structure: tophat / Gaussian / power-law energy profiles E_iso(theta)
  (afterglowpy jet types -1, 0, 4);
* each angular ring decelerates as an adiabatic blast wave with
  (Gamma beta)^2 = E_iso(theta) / (M_sw(R) c^2), which interpolates the
  Blandford-McKee and Sedov-Taylor limits;
* equal-arrival-time-surface integration over a (theta, phi) grid: each
  surface element's observer-time map t_obs = (1+z)(t_b - mu R / c) is
  monotone in R, so dynamical quantities are resampled per element with
  the sort-free masked interpolation kernel;
* synchrotron emission with nu_m / nu_c breaks (slow and fast cooling),
  relativistic Doppler boosting (delta^2 volume form), and flux in mJy.

Everything is static-shape: [n_theta x n_phi] surface elements times a
log R grid, vmappable over live-point batches. Lateral spreading follows
the sound-speed conical-expansion rate (Huang et al. 2000) with the
trumpet treatment (material moves to wider angles; emission geometry,
Doppler pattern and arrival times follow) and is ON by default, matching
afterglowpy's spread=True default in the reference's TrPi2018 calls;
pass spread=False (parameter or kwarg) to disable, trumpet=False for the
in-place energy-dilution approximation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import c_cgs, seconds_a_day
from ..ops.interp import masked_interp_sorted_fill
from ..ops.photometry import flux_to_ab_mag
from .base import SourceModel, register_source_model

# cgs constants for synchrotron theory
_QE = 4.80320425e-10          # esu
_ME = 9.1093837015e-28        # g
_MP = 1.67262192369e-24       # g
_SIGMA_T = 6.6524587321e-25   # cm^2
_MPC_CM = 3.0856775814913673e24
_MJY = 1e-26                  # erg/s/cm^2/Hz

# default resolutions: doubling any axis moves magnitudes < 0.01 on the
# GW170817 benchmark config; see tests/test_grb.py (round 3: n_theta
# 32 -> 48 after the EATS/shock-speed fixes sharpened the off-axis
# theta sensitivity to 0.015 mag at 32 rings; round 4: n_phi 24 -> 16
# by switching the phi quadrature from midpoint to Gauss-Legendre —
# GL-16 matches midpoint-24 to <= 0.002 mag at every observable point
# across the on/off-axis + tophat validation configs)
N_THETA = 48
N_PHI = 16
N_R = 256

def _contract_mode():
    """Hat-contraction lowering for the XLA path (read at trace time):
    "fused" keeps the [T, R] hat basis in registers via a VPU
    multiply+reduce; "einsum" lowers to an MXU dot that round-trips
    every hat matrix through HBM. einsum stays the default until the
    fused path's TPU timing is in (parity verified). The batched TPU
    path bypasses both via the Pallas kernel (ops/pallas_grb.py)."""
    mode = os.environ.get("NMMA_TPU_GRB_CONTRACT", "einsum")
    if mode not in ("einsum", "fused"):
        raise ValueError(
            f"NMMA_TPU_GRB_CONTRACT={mode!r}: use 'einsum' or 'fused'")
    return mode

JET_TOPHAT = -1
JET_GAUSSIAN = 0
JET_POWERLAW = 4


def _energy_profile(theta, e0, theta_core, theta_wing, b, jet_type):
    if jet_type == JET_TOPHAT:
        return jnp.where(theta <= theta_core, e0, 0.0)
    if jet_type == JET_GAUSSIAN:
        prof = jnp.exp(-0.5 * jnp.minimum((theta / theta_core) ** 2, 80.0))
        return jnp.where(theta <= theta_wing, e0 * prof, 0.0)
    if jet_type == JET_POWERLAW:
        prof = jnp.power(1.0 + (theta / theta_core) ** 2 / b, -b / 2.0)
        return jnp.where(theta <= theta_wing, e0 * prof, 0.0)
    raise ValueError(f"unknown jet type {jet_type}")


def grb_afterglow_flux_density(t_obs_day, nu_obs, params,
                               jet_type=JET_GAUSSIAN, n_theta=N_THETA,
                               n_phi=N_PHI, n_r=N_R, spread=None,
                               trumpet=None,
                               _exact_omega=False, _cum_mass=False,
                               _emit_spread=False, _spread_boost=1.0,
                               _gate_frac=1.0, stage2_stride=None,
                               phi_quad="gl"):
    """Observed flux density [mJy] on a (time, frequency) grid.

    Parameters (afterglowpy naming, nmma/em/model.py:39-53): log10_E0
    [erg, on-axis isotropic equivalent], thetaCore, thetaWing,
    inclination_EM (viewing angle), log10_n0 [cm^-3], p,
    log10_epsilon_e, log10_epsilon_B, xi_N, luminosity_distance [Mpc],
    b (power-law jets), redshift.

    ``spread`` toggles sound-speed lateral spreading (default True, the
    afterglowpy default); ``n_theta``/``n_phi``/``n_r`` set the surface /
    radial grids (doubling them is the convergence check, see
    tests/test_grb.py).

    Returns [F, T] flux densities.
    """
    # log-space ingestion clamps: the reference SHIPS priors this wide
    # (priors/TrPi2018.prior: log10_E0 in [0, 99], log10_n0 in [0, 15])
    # and its f64 afterglowpy returns (absurd but) finite fluxes there;
    # unclamped, 10^(lE0-50) overflows f32 above lE0 ~ 88 and a third
    # of the wide prior evaluated to NaN (measured 2026-08-19). The
    # clamps never bind within +-20 dex of the physical range, and
    # points beyond them stay astronomically disfavoured but FINITE,
    # so nested-sampling ordering works from anywhere in the prior.
    e0 = 10.0 ** jnp.clip(jnp.asarray(params["log10_E0"]) - 50.0,
                          -20.0, 20.0)                   # units of 1e50 erg
    theta_core = jnp.asarray(params["thetaCore"])
    theta_wing = jnp.asarray(params.get("thetaWing", 4.0 * theta_core))
    theta_v = jnp.asarray(params.get("inclination_EM", 0.0))
    n0 = 10.0 ** jnp.clip(jnp.asarray(params["log10_n0"]), -20.0, 20.0)
    p = jnp.asarray(params["p"])
    eps_e = 10.0 ** jnp.clip(jnp.asarray(params["log10_epsilon_e"]),
                             -20.0, 0.0)
    eps_b = 10.0 ** jnp.clip(jnp.asarray(params["log10_epsilon_B"]),
                             -20.0, 0.0)
    xi_n = jnp.asarray(params.get("xi_N", 1.0))
    # afterglowpy convention: explicit d_L in cm wins (the reference fixes
    # d_L = 3.086e19 cm = 10 pc so the flux is an absolute magnitude and
    # the detector assembly adds the distance modulus; model.py:933-936)
    # carried as inv_dl26 = 1e26/d_L [cm]: the obvious d_l26 = d_L*1e-26
    # is UNSAFE under jit — XLA reassociates (d_L*1e-26)*(d_L*1e-26)
    # into d_L^2 * 1e-52 and d_L^2 (~1e39 cm^2 at 10 pc) overflows f32
    # to inf (observed: all-NaN fluxes for the reference's pinned
    # d_L=3.09e19 configs under jit while eager was fine). Every
    # association order of inv_dl26 stays in f32 range for
    # d_L in [10 pc, 100 Gpc].
    if "d_L" in params:
        inv_dl26 = 1e26 / jnp.asarray(params["d_L"])
    else:
        inv_dl26 = (1e26 / _MPC_CM) / jnp.asarray(
            params["luminosity_distance"])
    z = jnp.asarray(params.get("redshift", 0.0))
    b_pl = jnp.asarray(params.get("b", 6.0))

    if jet_type == JET_TOPHAT:
        theta_max = theta_core
    else:
        theta_max = theta_wing

    # ring grid (cell centres) and energy profile
    theta_edges = jnp.linspace(0.0, 1.0, n_theta + 1) ** 1.3 * theta_max
    theta = 0.5 * (theta_edges[1:] + theta_edges[:-1])             # [Th]
    d_cos = -jnp.diff(jnp.cos(theta_edges))                        # [Th]
    e_iso50 = _energy_profile(theta, e0, theta_core, theta_wing, b_pl,
                              jet_type)                            # [Th]
    e_iso50 = jnp.maximum(e_iso50, 1e-12)

    # blast-wave dynamics per ring on a shared log-R grid --------------------
    # deceleration radius of the most energetic ring sets the scale
    # R_dec: u = u0 ~ 300; span R to cover Sedov times beyond t_obs max
    e_ref = jnp.max(e_iso50)
    # R_dec in r17 = R/1e17 units; the 1e50 scale folds into a host float
    _RDEC_COEF = 3.0 * 1e50 / (4.0 * np.pi * _MP * c_cgs**2 * 1e4 * 1e51)
    r_dec = 1e17 * jnp.cbrt(e_ref * _RDEC_COEF / n0)
    # The on-axis equal-arrival-time surface reaches R ~ 16 Gamma^2 c t:
    # inverting t ~ R / (16 Gamma^2 c) with Gamma^2 = E/(M_sw c^2) gives
    # r17^4 = 16 E c t / (MSW_COEF n0 1e17). (Round-3 fix: the previous
    # bound r_max = 200 c t only covered Gamma <~ 3.5 — relativistic
    # epochs had their EATS truncated, suppressing and distorting the
    # early spectrum; caught by the SPN98 F_max time-constancy test.)
    _MSW_COEF_HOST = (4.0 * np.pi / 3.0) * _MP * c_cgs**2 * 1e51 / 1e50
    t_max_obs = jnp.max(jnp.asarray(t_obs_day)) * seconds_a_day
    r17_rel = jnp.power(16.0 * e_ref * c_cgs * t_max_obs
                        / (_MSW_COEF_HOST * n0 * 1e17), 0.25)
    r_max = 4.0 * jnp.maximum(c_cgs * t_max_obs, r17_rel * 1e17)
    r_min = r_dec * 1e-3
    frac = jnp.arange(n_r) / (n_r - 1)
    r_grid = r_min * jnp.power(r_max / r_min, frac)                # [R]

    # (Gamma beta)^2 = E_iso / (M_sw c^2), M_sw = 4 pi/3 n mp R^3.
    # R^3 (~1e60 cm^3) overflows f32: carry radius as r17 = R/1e17 cm and
    # fold the 1e51 into a Python-float coefficient.
    r17 = r_grid * 1e-17
    _MSW_COEF = (4.0 * np.pi / 3.0) * _MP * c_cgs**2 * 1e51 / 1e50
    m_sw_c2_50 = _MSW_COEF * n0 * r17**3                           # [R]

    # magnetar-style energy injection (afterglowpy L0/q/ts convention:
    # L(t) = L0 (t/ts)^-q for t > ts, integrated into the blast energy).
    # L0 (~1e47 erg/s) overflows f32, so it is carried as L0/1e50: sampled
    # runs should provide 'log10_L0'; a concrete float 'L0' is rescaled
    # host-side.
    if "log10_L0" in params:
        l0_50 = 10.0 ** (jnp.asarray(params["log10_L0"]) - 50.0)
    else:
        l0_raw = params.get("L0", 0.0)
        l0_50 = (float(l0_raw) / 1e50 if isinstance(l0_raw, (int, float))
                 else jnp.asarray(l0_raw) * 1e-25 * 1e-25)
    q_inj = jnp.asarray(params.get("q", 0.0))
    ts_inj = jnp.maximum(jnp.asarray(params.get("ts", 0.0)), 1.0)

    u2 = e_iso50[:, None] / m_sw_c2_50[None, :]                    # [Th, R]
    u2 = jnp.minimum(u2, 1e8)
    gamma = jnp.sqrt(1.0 + u2)
    beta = jnp.sqrt(u2 / (1.0 + u2))

    # burster time t_b(R) = int dR / (beta c), cumulative trapezoid
    inv_bc = 1.0 / (beta * c_cgs)                                  # [Th, R]
    dr = jnp.diff(r_grid)
    t_b = jnp.concatenate([
        (r_grid[0] * inv_bc[:, :1]),
        r_grid[0] * inv_bc[:, :1] + jnp.cumsum(
            0.5 * (inv_bc[:, 1:] + inv_bc[:, :-1]) * dr[None, :], axis=1),
    ], axis=1)                                                     # [Th, R]

    # apply energy injection and lateral spreading as corrections over the
    # first-pass dynamics, then recompute (Gamma, beta, t_b) once.
    # 1) injected energy up to t_b:
    #    int_ts^t L dt = L0 ts ((t/ts)^{1-q} - 1)/(1-q)   (q != 1)
    #                  = L0 ts ln(t/ts)                    (q == 1)
    t_ratio = jnp.maximum(t_b / ts_inj, 1.0)
    one_m_q = 1.0 - q_inj
    safe_denom = jnp.where(jnp.abs(one_m_q) > 1e-3, one_m_q, 1.0)
    powerlaw = (jnp.power(t_ratio, one_m_q) - 1.0) / safe_denom
    log_case = jnp.log(t_ratio)
    integral = jnp.where(jnp.abs(one_m_q) > 1e-3, powerlaw, log_case)
    e_inj50 = jnp.maximum(
        jnp.where(l0_50 > 0.0, l0_50 * ts_inj * integral, 0.0), 0.0)
    # 2) lateral spreading (default ON, matching afterglowpy's spread=True
    #    default in the reference's TrPi2018 calls): sound-speed conical
    #    expansion after Huang, Gou, Dai & Lu (2000) —
    #        dtheta/dlnR = c_s / (Gamma beta c),
    #    with the relativistic-gas sound speed
    #        c_s^2/c^2 = ghat(ghat-1)(Gamma-1) / (1 + ghat(Gamma-1)),
    #        ghat = (4 Gamma + 1)/(3 Gamma),
    #    so spreading is 1/Gamma-suppressed while ultrarelativistic and
    #    freezes in the non-relativistic limit. The widened ring dilutes
    #    its energy over the swept solid angle, inflating the effective
    #    swept mass by (1 - cos theta_eff)/(1 - cos theta) — the origin
    #    of the post-jet-break steepening. Emission stays on the original
    #    ring geometry (energy-dilution approximation).
    spread_on = spread if spread is not None else params.get("spread", True)
    # trumpet mode (afterglowpy's spreading treatment, Ryan et al. 2020
    # §3.1): the shocked material physically MOVES to wider angles as the
    # jet spreads — the emission geometry, Doppler pattern, and arrival
    # times all follow the widened cone, instead of only diluting the
    # ring's energy in place. Implied bookkeeping: causal cumulative swept
    # mass, emission from ALL swept electrons, exact solid angles.
    # Default ON (round 3): on the GW170817 Gaussian-jet config it lands
    # rise/peak-time/post-peak-decay on the observed morphology
    # (+0.98/164 d/-2.34 vs observed +0.84/~160 d/-2.2) where the
    # in-place energy-dilution approximation over-steepens the decay to
    # -3.0; trumpet=False recovers the dilution treatment.
    if trumpet is None:
        t_par = params.get("trumpet", True)
        if isinstance(t_par, jax.core.Tracer):
            # a sampled/traced 'trumpet' column cannot steer Python
            # control flow under jit; use the default
            trumpet = True
        else:
            # honor any concrete value (python bool, 0/1, numpy/jnp
            # scalar from a DeltaFunction prior) like 'spread' does
            trumpet = bool(t_par)
    if trumpet and not spread_on:
        trumpet = False
    if trumpet:
        _exact_omega = True
        _cum_mass = True
        _emit_spread = True
    if spread_on:
        ghat = (4.0 * gamma + 1.0) / (3.0 * gamma)
        cs2 = (ghat * (ghat - 1.0) * (gamma - 1.0)) / \
            (1.0 + ghat * (gamma - 1.0))
        cs = jnp.sqrt(jnp.clip(cs2, 0.0, 1.0 / 3.0))
        dlnr = jnp.log(r_grid[1] / r_grid[0])
        # causal gate (van Eerten & MacFadyen 2012 prescription): the jet
        # starts spreading once Gamma < 1/theta_jet. The relevant opening
        # angle is the energetic CORE's (for structured jets the wings
        # are causally irrelevant to the bright core; for tophats
        # theta_core == theta_max so nothing changes). Round 3: gating on
        # theta_wing deferred core spreading to Gamma < ~2, leaving the
        # GW170817 off-axis peak 2.7x bright and 13% late; the core gate
        # lands the peak time on the observed ~160 d and halves the flux
        # residual (see BENCHMARKS.md).
        gate = (gamma * theta_core < _gate_frac)
        integrand = jnp.where(gate, _spread_boost * cs
                              / jnp.maximum(gamma * beta, 1e-6),
                              0.0)                         # dtheta/dlnR
        dtheta = jnp.concatenate([
            jnp.zeros((n_theta, 1)),
            jnp.cumsum(0.5 * (integrand[:, 1:] + integrand[:, :-1]),
                       axis=1) * dlnr], axis=1)
        edge_eff = jnp.minimum(theta_max + dtheta, jnp.pi / 2.0)
        if _exact_omega:
            spread_factor = ((1.0 - jnp.cos(edge_eff))
                             / (1.0 - jnp.cos(theta_max)))
        else:
            spread_factor = (edge_eff / theta_max) ** 2
        # self-similar stretch of the ring geometry: ring i rides at
        # theta_i(R) = theta_i0 * edge_eff_i(R)/theta_max (<= pi/2 since
        # edge_eff is clipped there and theta_i0 <= theta_max); only the
        # trumpet treatment moves the emission geometry — the
        # energy-dilution variant keeps the rings in place.
        # (Round-4 negative result: normalizing each ring's stretch to
        # its OWN cone scale max(theta_i0, theta_core) — Rhoads-style
        # per-ring dilution — was tried together with the GS02 volume
        # emission and moved the GW170817 off-axis peak to 101 d at
        # decay -2.58 vs the observed ~160 d / -2.2, while this
        # wing-normalized form lands 172 d / 107 uJy / rise +0.97 /
        # decay -2.32 on the same config. Keep the wing form.)
        if trumpet:
            theta_dyn = theta[:, None] * (edge_eff / theta_max)    # [Th, R]
        else:
            theta_dyn = jnp.broadcast_to(theta[:, None],
                                         (n_theta, n_r))
    else:
        spread_factor = jnp.ones((n_theta, n_r))
        theta_dyn = jnp.broadcast_to(theta[:, None], (n_theta, n_r))

    if _cum_mass:
        # causal accounting: mass is swept at the instantaneous solid
        # angle, M_eff(R) = int_0^R rho omega(r) r^2 dr, rather than
        # retroactively inflating everything already swept
        r3 = r17 ** 3
        dr3 = jnp.diff(r3)
        integ = jnp.concatenate([
            spread_factor[:, :1] * r3[:1],
            jnp.cumsum(0.5 * (spread_factor[:, 1:] + spread_factor[:, :-1])
                       * dr3[None, :], axis=1) + spread_factor[:, :1]
            * r3[:1]], axis=1)
        mass_factor = integ / r3[None, :]
    else:
        mass_factor = spread_factor

    u2 = (e_iso50[:, None] + e_inj50) / (m_sw_c2_50[None, :]
                                         * mass_factor)
    u2 = jnp.minimum(u2, 1e8)
    gamma = jnp.sqrt(1.0 + u2)
    beta = jnp.sqrt(u2 / (1.0 + u2))

    # The radius advances at the SHOCK speed, not the fluid speed
    # (afterglowpy convention; Ryan et al. 2020 §2 — the single shell
    # rides just behind the forward shock):
    #   beta_sh = 4 u sqrt(u^2+1) / (4 u^2 + 3),
    # which ultrarelativistically gives 1 - beta_sh = (1 - beta_f)/2 —
    # using the fluid speed here put every light-curve feature ~2x late
    # in observer time deep in the relativistic phase (the round-2
    # GW170817 195 d vs observed ~160 d peak; VERDICT r2 weak #5).
    # f32-stable form: with s = sqrt(1 + 1/u^2),
    #   1 - beta_sh = (3 - 4/(s + 1)) / (4 u^2 + 3)
    # (exact algebra; numerator -> 1 as u -> inf, 3 as u -> 0).
    inv_u2 = 1.0 / jnp.maximum(u2, 1e-12)
    s_sh = jnp.sqrt(1.0 + inv_u2)
    one_m_beta_sh = (3.0 - 4.0 / (s_sh + 1.0)) / (4.0 * u2 + 3.0)
    beta_sh = jnp.clip(1.0 - one_m_beta_sh, 1e-6, 1.0)
    inv_bc = 1.0 / (beta_sh * c_cgs)
    t_b = jnp.concatenate([
        (r_grid[0] * inv_bc[:, :1]),
        r_grid[0] * inv_bc[:, :1] + jnp.cumsum(
            0.5 * (inv_bc[:, 1:] + inv_bc[:, :-1]) * dr[None, :], axis=1),
    ], axis=1)

    # geometric delay without catastrophic cancellation: the EATS time is
    #   t_obs = t_b - mu R/c = t_delay + (1 - mu) R/c,
    #   t_delay = t_b - R/c = int (1 - beta_sh)/(beta_sh c) dR,
    # and the stable 1 - beta_sh above is f32-exact even at Gamma ~ 1e4,
    # where t_b - mu R/c loses all significant digits for on-axis
    # elements (this error reached 0.2 mag near light-curve peak)
    inv_bc_del = one_m_beta_sh * inv_bc           # (1-b_sh)/(b_sh c)
    t_delay = jnp.concatenate([
        (r_grid[0] * inv_bc_del[:, :1]),
        r_grid[0] * inv_bc_del[:, :1] + jnp.cumsum(
            0.5 * (inv_bc_del[:, 1:] + inv_bc_del[:, :-1]) * dr[None, :],
            axis=1),
    ], axis=1)                                         # [Th, R]

    # synchrotron quantities on the R grid ----------------------------------
    # Local shock-jump conditions (afterglowpy's emission bookkeeping,
    # Ryan et al. 2020 §2.3): comoving density n' = 4 Gamma n0, thermal
    # energy density e_th = (Gamma - 1) n' mp c^2, B = sqrt(8 pi eps_B
    # e_th) — algebraically identical to the form below.
    b_field = jnp.sqrt(32.0 * jnp.pi * eps_b * gamma * (gamma - 1.0 + 1e-12)
                       * n0 * _MP) * c_cgs                         # [Th, R]
    gamma_m = jnp.maximum(
        1.0, eps_e * (p - 2.0) / (p - 1.0) * (_MP / _ME)
        * (gamma - 1.0) / xi_n)
    gamma_c = 6.0 * jnp.pi * _ME * c_cgs * gamma / (
        _SIGMA_T * b_field**2 * t_b + 1e-30)
    nu_m_prime = 3.0 / (4.0 * jnp.pi) * gamma_m**2 * _QE * b_field / (
        _ME * c_cgs)
    nu_c_prime = 3.0 / (4.0 * jnp.pi) * gamma_c**2 * _QE * b_field / (
        _ME * c_cgs)
    # Angle-integrated PEAK VOLUME emissivity of the power-law electron
    # population (Granot & Sari 2002 class normalization, the one
    # afterglowpy/boxfit use; van Eerten et al. 2010 eq. 2):
    #   eps'_peak = (p-1)/2 * sqrt(3) qe^3 / (me c^2) * xi_N n' B,
    # folded with the lab-frame shocked-shell width
    #   DR = R / (12 Gamma^2)
    # (total swept column n0 R/3 at lab compression 4 Gamma^2) into the
    # per-steradian emission integral
    #   em = eps'_peak R^2 DR = EM_C (p-1) xi_N n0 B R^3 / (3 Gamma),
    # carried / 1e50 for f32 headroom.  The EATS width stretch
    # 1/(1 - mu beta_sh) and the delta^2 boost are applied per element
    # after resampling.  (Round 4: this replaces the round-1..3
    # delta^3 P'_max N_e point-source form — the SPN98 per-electron
    # peak power sigma_T me c^2 B/(3 qe) is 2.8x the GS02-class
    # coefficient at p=2.17, the measured ~2.4-2.7x off-axis flux
    # excess vs afterglowpy; VERDICT r3 next #1.)
    _EM_C = np.sqrt(3.0) * _QE**3 / (2.0 * _ME * c_cgs**2)
    em50 = (_EM_C * (p - 1.0) * xi_n * n0 * b_field
            * (1e51 / 3.0 / 1e50) * r17**3 / gamma)                # [Th, R]

    # EATS: per (ring, phi) element resample dynamics at the burster time
    # solving t_obs = (1+z)(t_b - mu R / c). The phi integral over
    # [0, pi] (mirror symmetry doubles it) has a SMOOTH integrand — flux
    # depends on phi only through 1 - mu — so both rules converge fast;
    # Gauss-Legendre's spectral edge shows at very low order (measured on
    # the GW170817 off-axis config vs midpoint-96: GL-4 0.21 mag where
    # midpoint-4 errs 0.48; by n=8 both are < 0.008 and GL-12, the
    # default, matches midpoint-48 to < 0.001 — pinned by
    # tests/test_grb.py::test_phi_quadrature). GL is kept as default for
    # the low-order safety margin at equal cost. Weights are carried
    # normalized to the caller's 2 pi / n_phi convention.
    if phi_quad == "gl":
        x_gl, w_gl = np.polynomial.legendre.leggauss(n_phi)
        phi = jnp.asarray((x_gl + 1.0) * (np.pi / 2.0))            # [Ph]
        w_phi = jnp.asarray(w_gl * (n_phi / 2.0))                  # [Ph]
    else:
        phi = (jnp.arange(n_phi) + 0.5) / n_phi * jnp.pi           # [Ph]
        w_phi = jnp.ones((n_phi,))

    t_obs = jnp.asarray(t_obs_day) * seconds_a_day                 # [T]
    nu_obs = jnp.atleast_1d(jnp.asarray(nu_obs))                   # [F]

    # log-space dynamical tracks, shared across surface elements
    if _emit_spread:
        # the widened ring's swept column per ORIGINAL steradian grows
        # with the same factor that inflates its swept mass; the solid-
        # angle stretch of the ring cancels against the thinner local
        # column, so the emission lane carries mass_factor directly
        em_track = jnp.log(jnp.maximum(em50 * mass_factor, 1e-38))
    else:
        em_track = jnp.log(jnp.maximum(em50, 1e-38))
    # 5th lane: the ring's instantaneous polar angle, resampled onto
    # observer time like the dynamics so the Doppler pattern follows the
    # laterally moving material (with trumpet=False theta_dyn is constant
    # in R, so the resampled angle — and hence mu — is the static ring
    # angle and the arrival-time cummax is an identity: the unified
    # 5-lane form reproduces the fixed-geometry result exactly)
    log_tracks = jnp.stack([
        jnp.log(gamma),
        jnp.log(jnp.maximum(nu_m_prime, 1e-30)),
        jnp.log(jnp.maximum(nu_c_prime, 1e-30)),
        em_track,
        jnp.log(jnp.maximum(theta_dyn, 1e-6)),
    ])                                                          # [5, Th, R]
    # the hat contraction touches every lane (0 * inf = nan), so any
    # non-finite track value must be clamped; exp(+-88) spans f32
    log_tracks = jnp.clip(jnp.nan_to_num(log_tracks, nan=-88.0,
                                         posinf=88.0, neginf=-88.0),
                          -88.0, 88.0)
    log_q = jnp.log(t_obs)                                         # [T]

    # EATS resampling + synchrotron flux, summed over phi: dispatched
    # through a custom-vmap primitive — the XLA hat-contraction form
    # below by default (measured fastest on the v5e); the VMEM-resident
    # Pallas kernel (ops/pallas_grb.py) is opt-in via
    # NMMA_TPU_GRB_PALLAS=1.
    scal = jnp.stack([jnp.asarray(z, jnp.float32) * jnp.ones(()),
                      jnp.cos(theta_v), jnp.sin(theta_v),
                      jnp.asarray(p) * jnp.ones(()),
                      jnp.asarray(theta_v) * jnp.ones(()),
                      jnp.zeros(()), jnp.zeros(()),
                      jnp.zeros(())])                               # [8]
    # stage-2 radial coarsening: the dynamics CUMULATIVE integrals (t_b,
    # t_delay, spreading angle, swept mass) need the fine log-R grid for
    # trapezoid accuracy, but the per-element EATS stage is pure hat-basis
    # INTERPOLATION of smooth log-log tracks (no quadrature over R — the
    # radial integral is analytic in em50), so it can run on a strided
    # subgrid with O(stride^2 h^2) interpolation error. Measured on the
    # GW170817 / on-axis / tophat configs: stride 2 moves magnitudes by
    # < 0.01; it cuts the dominant [B*Th*Ph, T, R] hat work + HBM traffic
    # by 2x (the kernel's wall-clock bottleneck, VERDICT r3 next #2).
    if stage2_stride is None:
        stage2_stride = 2 if n_r >= 256 else 1
    if stage2_stride > 1:
        t_delay = t_delay[:, ::stage2_stride]
        log_tracks = log_tracks[:, :, ::stage2_stride]
        r_grid = r_grid[::stage2_stride]
    flux_elems = _eats_stage2(t_delay, log_tracks, r_grid, scal,
                              log_q, jnp.cos(phi), w_phi,
                              nu_obs)                               # [Th, F, T]
    flux50 = flux_elems * ((2.0 * jnp.pi / n_phi)
                           * d_cos[:, None, None])                 # [Th, F, T]
    # F[mJy] = sum * 1e50 / (4 pi dL^2) / 1e-26; dL^2 (~1e53 cm^2)
    # overflows f32, so the distance rides as inv_dl26 = 1e26/dL (see
    # the parameter block: the product form is reassociation-safe)
    coef = (1e50 / 1e52 / (4.0 * np.pi)) / _MJY   # == 1e24 / 4pi
    return (jnp.sum(flux50, axis=0) * coef
            * (inv_dl26 * inv_dl26))                               # [F, T] mJy


def _eats_stage2_xla(t_delay, log_tracks, r_grid, scal, log_q, cphi,
                     wphi, nu_obs):
    """Per-sample XLA EATS stage: [Th, F, T] flux elements (x dOmega),
    summed over phi, unweighted (ring solid angles applied by the
    caller). log_tracks[4] is log theta_dyn: the arrival-time map, the
    Doppler pattern and the in-range mask all follow the (possibly
    laterally moving) ring geometry."""
    z, cos_tv, sin_tv, p = scal[0], scal[1], scal[2], scal[3]
    theta_v = scal[4]
    n_theta = t_delay.shape[0]
    theta_dyn = jnp.exp(log_tracks[4])                           # [Th, R]

    def one_minus_mu(th, cphi_el):
        """1 - mu without catastrophic cancellation near mu = 1:
        1 - cos(tv)cos(th) - sin(tv)sin(th)cos(phi)
          = 2 sin^2((tv - th)/2) + sin(tv) sin(th) (1 - cos(phi)),
        both terms non-negative and f32-exact for on-axis elements at
        high Gamma (the naive form loses every significant digit at
        Gamma ~ 1e3 where 1 - mu ~ 1e-7)."""
        return (2.0 * jnp.sin(0.5 * (theta_v - th)) ** 2
                + sin_tv * jnp.sin(th) * (1.0 - cphi_el))

    def element_flux(th_idx, cphi_el):
        """[F, T] flux contribution of one surface element (x dOmega).

        t_obs(R) = (1+z)(t_b - mu R/c) is strictly increasing in R for
        fixed geometry (dt_obs/dR ∝ 1/beta - mu > 0 for beta < 1,
        |mu| <= 1); material moving TOWARD the line of sight (trumpet
        spreading) can compress arrival times, which the cummax
        restores to monotone (plateau nodes become a convex combination
        via the hat normalization). The resampling of all five dynamical
        tracks is one hat-basis contraction in log t — gather-free
        (dynamic gathers dominated this kernel on TPU, same as the EM
        likelihood)."""
        # arrival time follows the (possibly moving) material
        th_r = theta_dyn[th_idx]                                    # [R]
        t_obs_grid = (1.0 + z) * (
            t_delay[th_idx]
            + one_minus_mu(th_r, cphi_el) * r_grid / c_cgs)
        log_t = jnp.log(jnp.maximum(t_obs_grid, 1e-10))             # [R]
        log_t = jax.lax.cummax(log_t)
        # deep-Sedov tail lanes can still push t to inf (beta underflow);
        # a finite ceiling keeps the hat diffs NaN-free (e^60 s is beyond
        # any observation, so those lanes carry zero weight)
        log_t = jnp.minimum(log_t, 60.0)

        x_l = jnp.concatenate([log_t[:1], log_t[:-1]])
        x_r = jnp.concatenate([log_t[1:], log_t[-1:]])
        dl = jnp.maximum(log_t - x_l, 1e-12)
        drr = jnp.maximum(x_r - log_t, 1e-12)
        up = (log_q[:, None] - x_l[None, :]) / dl[None, :]
        dn = (x_r[None, :] - log_q[:, None]) / drr[None, :]
        hat = jnp.clip(jnp.minimum(up, dn), 0.0, 1.0)               # [T, R]
        tr = log_tracks[:, th_idx]                                  # [5, R]
        if _contract_mode() == "einsum":
            # The [T, R] hat is materialized to HBM as the MXU operand —
            # the kernel's dominant traffic. Weights are CONVEX
            # coefficients in [0, 1], so bf16 storage costs only
            # ~0.2% x (local segment delta in the log tracks) ~ 0.003
            # mag while halving that traffic; the TRACKS stay f32 (bf16
            # there would round absolute log values of magnitude 30-88
            # by ~0.35 — the reason precision=HIGHEST is kept for the
            # f32 operand's MXU pass decomposition). Normalization
            # (duplicate cummax-plateau nodes each claim weight 1) rides
            # as a ones lane so the hat has exactly ONE consumer and no
            # second materialization for the row sums.
            tr1 = jnp.concatenate(
                [tr, jnp.ones((1, tr.shape[1]), tr.dtype)])    # [K+1, R]
            raw = jnp.einsum("tr,kr->kt", hat.astype(jnp.bfloat16), tr1,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
            k_lanes = tr.shape[0]
            # epsilon clamp, NOT 1.0: bf16 row sums land at 1 +- 0.4%,
            # and clamping a 0.996 sum to 1 breaks the normalization's
            # exact cancellation of the ABSOLUTE track value (log
            # magnitudes ~40 -> 0.17 mag errors); out-of-range rows
            # (raw identically 0) still come out as exp(0/eps) = 1,
            # masked by in_range below exactly as before
            denom = jnp.maximum(raw[k_lanes], 1e-3)            # [T]
            vals = jnp.exp(raw[:k_lanes] / denom)
        else:
            # fused multiply+reduce: with K=5 output lanes the MXU is 96%
            # idle, and lowering to a dot forces the [T, R] hat operand out
            # to HBM (~19 GB per 256-theta batch, the kernel's measured
            # bottleneck).  A single VPU reduce fuses with the hat
            # producer, so hats live only in registers; f32 accumulate
            # natively.  The hat normalization (duplicate grid nodes each
            # claim weight 1) is folded in as a ones-row so hat has
            # exactly ONE reduce consumer — a separate hat.sum() forces
            # XLA to materialize the [.., T, R] hat tensor to HBM.
            k_lanes = tr.shape[0]
            tr1 = jnp.concatenate([tr, jnp.ones((1, tr.shape[1]),
                                                tr.dtype)])       # [K+1, R]
            raw = jnp.sum(hat[None, :, :] * tr1[:, None, :], axis=-1)
            denom = jnp.maximum(raw[k_lanes], 1.0)                  # [T]
            vals = jnp.exp(raw[:k_lanes] / denom)
        in_range = (log_q >= log_t[0]) & (log_q <= log_t[-1])
        g, num, nuc, em50 = vals[:4]
        em50 = jnp.where(in_range, em50, 0.0)   # outside grid: no emission

        # Doppler pattern follows the resampled (moving) ring angle
        th_t = vals[4]                                              # [T]
        omm = one_minus_mu(th_t, cphi_el)                           # [T]
        u2 = jnp.maximum(g * g - 1.0, 1e-12)
        u = jnp.sqrt(u2)
        be = u / g
        # 1 - beta = 1 / (Gamma^2 (1 + beta)) — exact, no cancellation
        one_m_be = 1.0 / (g * g * (1.0 + be))
        a_fac = one_m_be + be * omm                   # 1 - beta mu   [T]
        doppler = 1.0 / (g * a_fac)                                 # [T]
        # shock-front speed from the resampled fluid u (f32-stable):
        # 1 - beta_sh = (3 - 4/(s+1)) / (4u^2+3), s = sqrt(1 + 1/u^2)
        s_sh = jnp.sqrt(1.0 + 1.0 / u2)
        one_m_bs = (3.0 - 4.0 / (s_sh + 1.0)) / (4.0 * u2 + 3.0)
        ashock = one_m_bs + (1.0 - one_m_bs) * omm    # 1 - beta_sh mu
        nu_prime = (nu_obs[:, None] * (1.0 + z)
                    * (g * a_fac)[None, :])           # nu (1+z) / delta
        shape = _synchrotron_shape(nu_prime, num[None, :], nuc[None, :], p)
        # F_nu = (1+z)/(4 pi dL^2) * delta^2 * eps'_peak shape * R^2 *
        #        DR / (1 - mu beta_sh) * dOmega  — the optically-thin
        # EATS volume integral (j_nu/nu^2 Lorentz invariance; Granot,
        # Piran & Sari 1999 eq. 3), with em50 = eps'_peak R^2 DR / 1e50
        # resampled per element and the 1/(1 - mu beta_sh) stretch the
        # radial span the shell occupies on the fixed-t_obs surface
        return ((1.0 + z) * (doppler * doppler / ashock)[None, :]
                * em50[None, :] * shape)

    def ring(th_idx):
        def one_phi(cphi_el, w_el):
            return w_el * element_flux(th_idx, cphi_el)
        return jnp.sum(jax.vmap(one_phi)(cphi, wphi), axis=0)      # [F, T]

    # each phi sample covers dphi = pi/n_phi, doubled by the [0, pi]
    # mirror symmetry: dOmega = d_cos * 2 pi / n_phi (weights applied by
    # the caller; round-3 fix: this weight was 1/n_phi — a missing 2 pi
    # that suppressed every flux by 6.28x, caught by the SPN98
    # absolute-normalization tests, VERDICT r2 weak #5)
    return jax.vmap(ring)(jnp.arange(n_theta))                     # [Th, F, T]


@jax.custom_batching.custom_vmap
def _eats_stage2(t_delay, log_tracks, r_grid, scal, log_q, cphi, wphi,
                 nu_obs):
    return _eats_stage2_xla(t_delay, log_tracks, r_grid, scal, log_q,
                            cphi, wphi, nu_obs)


@_eats_stage2.def_vmap
def _eats_stage2_vmap(axis_size, in_batched, t_delay, log_tracks, r_grid,
                      scal, log_q, cphi, wphi, nu_obs):
    """Batched rule: NMMA_TPU_GRB_PALLAS=1 routes a live-point batch on
    TPU through the Pallas EATS kernel (VMEM-resident hat matrices);
    default is the vmapped XLA hat contraction — measured 2.5x faster
    on the v5e despite its ~19 GB HBM hat traffic per 256-theta batch
    (69.7 ms vs 177 ms, B=256; see ops/pallas_grb.py)."""
    batched = in_batched[:4]
    aux = in_batched[4:]
    ranks_ok = (t_delay.ndim == 3 if in_batched[0] else t_delay.ndim == 2)
    use_pallas = (any(batched) and not any(aux)
                  and ranks_ok
                  and t_delay.shape[-1] % 128 == 0
                  and log_q.shape[0] % 8 == 0
                  and jax.default_backend() == "tpu"
                  and os.environ.get("NMMA_TPU_GRB_PALLAS")
                  and not os.environ.get("NMMA_TPU_DISABLE_PALLAS"))
    if use_pallas:
        from ..ops.pallas_grb import eats_flux_pallas
        # fixed parameters (DeltaFunction priors for e.g. inclination,
        # p, z) arrive unbatched; broadcast them so the kernel still
        # fires — requiring all-batched silently dropped such runs back
        # to the HBM-bound XLA path
        ops = [t_delay, log_tracks, r_grid, scal]
        ops = [op if bb else jnp.broadcast_to(op[None],
                                              (axis_size,) + op.shape)
               for op, bb in zip(ops, batched)]
        out = eats_flux_pallas(*ops, log_q, cphi, wphi, nu_obs)
        return out, True
    mapped = jax.vmap(
        _eats_stage2_xla,
        in_axes=tuple(0 if bb else None for bb in in_batched))
    return mapped(t_delay, log_tracks, r_grid, scal, log_q, cphi,
                  wphi, nu_obs), True


def _synchrotron_shape(nu, nu_m, nu_c, p):
    """Broken power-law synchrotron spectrum (SPN98), slow + fast cooling."""
    # slow cooling: nu_m < nu_c
    slow = jnp.where(
        nu < nu_m,
        jnp.power(nu / nu_m, 1.0 / 3.0),
        jnp.where(nu < nu_c,
                  jnp.power(nu / nu_m, -(p - 1.0) / 2.0),
                  jnp.power(nu_c / nu_m, -(p - 1.0) / 2.0)
                  * jnp.power(nu / nu_c, -p / 2.0)))
    # fast cooling: nu_c < nu_m
    fast = jnp.where(
        nu < nu_c,
        jnp.power(nu / nu_c, 1.0 / 3.0),
        jnp.where(nu < nu_m,
                  jnp.power(nu / nu_c, -0.5),
                  jnp.power(nu_m / nu_c, -0.5)
                  * jnp.power(nu / nu_m, -p / 2.0)))
    return jnp.where(nu_m <= nu_c, slow, fast)


_E0_RAMP_KEYS = ("energy_exponential", "log10_Eend", "t_start",
                 "injection_duration")


def _e0_ramp_flux(t_grid_days, nu_obs, p, **kw):
    """Quasi-static energy-injection variant: E0 ramps with observer time.

    Reference semantics (``flux_density_on_E0_array``,
    nmma/em/lightcurve_generation.py:230-256, selected by
    ``GRBLightCurveModel.em_parameter_setup`` when all four injection
    parameters are sampled, model.py:960-968): each observer-time node
    is evaluated with the blast-wave energy
    log10 E0(t) = log10_Eend + energy_exponential * log10(t / t_end),
    clamped to its t <= t_start value before injection starts and to
    log10_Eend after t_end = injection_duration (both in seconds, like
    the reference's ``default_time``). Per node the kernel runs with a
    single observer time, so the total cost matches one standard call.
    """
    a = jnp.asarray(p["energy_exponential"])
    le = jnp.asarray(p["log10_Eend"])
    ts = jnp.asarray(p["t_start"])
    te = jnp.asarray(p["injection_duration"])
    t_sec = t_grid_days * seconds_a_day
    l_start = le + a * jnp.log10(ts / te)
    ramp = le + a * jnp.log10(t_sec / te)
    log10_e0 = jnp.where(t_sec <= ts, l_start,
                         jnp.where(t_sec >= te, le, ramp))       # [Tg]

    def one(ti, e0i):
        q = dict(p)
        q["log10_E0"] = e0i
        return grb_afterglow_flux_density(ti[None], nu_obs, q, **kw)[:, 0]

    return jax.vmap(one, in_axes=(0, 0), out_axes=1)(
        t_grid_days, log10_e0)                                   # [F, Tg]


def trpi2018_mags(params, t_days, nu_host, filters=None, jet_type=JET_GAUSSIAN,
                  grb_resolution=12.0, n_theta=N_THETA, n_phi=N_PHI,
                  n_r=N_R, spread=None, trumpet=None):
    """TrPi2018 absolute-magnitude rows [F, T].

    Matches the reference's flux path (``afterglowpy_lc``,
    lightcurve_generation.py:260-280): flux on a coarse internal geomspace
    grid at d_L = 10 pc (absolute magnitudes; the detector assembly adds
    the distance modulus), observer-frame filter frequencies, mJy -> AB
    mag, interpolation onto the sample times. GRBMixin sanity checks
    (model.py:833-843) become an all-inf mask.
    """
    p = dict(params)
    # reference prior files use ksiN / dL spellings (priors/TrPi2018.prior)
    if "ksiN" in p and "xi_N" not in p:
        p["xi_N"] = p["ksiN"]
    if "dL" in p and "d_L" not in p:
        p["d_L"] = p["dL"]
    p.setdefault("d_L", 3.086e19)    # 10 pc in cm (reference default)
    # sampling the wing-to-core ratio (GRBMixin, model.py:810-819)
    if "alphaWing" in p:
        p["thetaWing"] = (jnp.asarray(p["alphaWing"])
                          * jnp.asarray(p["thetaCore"]))
    theta_wing = jnp.asarray(p.get("thetaWing",
                                   4.0 * jnp.asarray(p["thetaCore"])))
    p["thetaWing"] = theta_wing
    eps_tot = (10.0 ** jnp.asarray(p["log10_epsilon_e"])
               + 10.0 ** jnp.asarray(p["log10_epsilon_B"]))
    # when alphaWing is sampled directly, the wing/core ratio is already
    # bounded by its prior (reference sets resolution = alphaWing then,
    # model.py:813-816); otherwise apply the static --grb-resolution bound
    if "alphaWing" in p:
        res_ok = True
    else:
        res_ok = (theta_wing / jnp.asarray(p["thetaCore"])) <= grb_resolution
    ok = ((theta_wing <= jnp.pi / 2)
          & (jnp.asarray(p["thetaCore"]) > jnp.pi / 1800.0)
          & (eps_tot <= 1.0) & res_ok)

    # afterglowpy receives observer-frame frequencies (nu_0s); undo the
    # host-frame factor the assembly applied
    nu_obs = jnp.asarray(nu_host) / (1.0 + jnp.asarray(p.get("redshift", 0.0)))

    t_start = jnp.maximum(1e-5, jnp.min(t_days))
    t_end = jnp.max(t_days) + 1.0
    n_node = 64
    frac = jnp.arange(n_node) / (n_node - 1)
    t_grid = t_start * jnp.power(t_end / t_start, frac)

    kern_kw = dict(jet_type=jet_type, n_theta=n_theta, n_phi=n_phi,
                   n_r=n_r, spread=spread, trumpet=trumpet)
    if all(k in p for k in _E0_RAMP_KEYS):
        mjys = _e0_ramp_flux(t_grid, nu_obs, p, **kern_kw)         # [F, Tg]
    else:
        mjys = grb_afterglow_flux_density(t_grid, nu_obs, p,
                                          **kern_kw)               # [F, Tg]
    mags_grid = flux_to_ab_mag(mjys, unit="mJy")
    log_tq = jnp.log(t_days)
    log_tg = jnp.log(t_grid)

    def interp_row(row):
        return masked_interp_sorted_fill(log_tq, log_tg, row, jnp.inf)

    mags = jax.vmap(interp_row)(mags_grid)
    return jnp.where(ok, mags, jnp.inf)


register_source_model(SourceModel(
    name="TrPi2018",
    parameter_names=("inclination_EM", "log10_E0", "thetaCore", "thetaWing",
                     "b", "L0", "q", "ts", "log10_n0", "p",
                     "log10_epsilon_e", "log10_epsilon_B", "xi_N", "d_L"),
    mags_fn=trpi2018_mags,
    default_time_grid=lambda: np.geomspace(0.01, 300.0, 150),
    citation="Troja et al. (2018); model: Ryan et al. (2020) semi-analytic",
))
