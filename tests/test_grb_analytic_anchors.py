"""Absolute anchors for the GRB afterglow kernel (VERDICT r2 next-round #6).

Golden tests against the closed-form Sari, Piran & Narayan (1998) adiabatic
afterglow predictions (their eq. 11 coefficients) and the Blandford-McKee
slopes, in regimes where the semi-analytic kernel must track them:

* quasi-spherical on-axis tophat, slow cooling;
* F_nu,max time-constancy (the adiabatic invariant) — this is the test
  that caught the round-2 EATS r_max truncation;
* nu^(1/3) and nu_m < nu < nu_c slopes and absolute normalization;
* pre/post jet-break temporal slopes for a narrow tophat.

Documented absolute-normalization bound: with the round-4 volume-form
emission (delta^2 j' dV over the EATS, eps'_peak = (p-1)/2 sqrt(3) qe^3
xi_N n' B / (me c^2), shell width R/(12 Gamma^2 (1 - mu beta_sh)) — the
Granot & Sari 2002-class bookkeeping afterglowpy/boxfit use) the kernel
sits at 0.22-0.32 x the SPN98 eq. 11 coefficients (stable in time).
SPN98's simplified coefficients are known to overestimate the peak flux
by a factor ~2-4 relative to GS02-class spectra, so this band is the
expected location for an afterglowpy-class model — and the same change
removed the ~2.4x off-axis excess vs afterglowpy-on-data (GW170817 at
the Ryan+20 medians now peaks at 107 uJy vs the observed ~98, was 243).
The tests below freeze the band so any future normalization regression
(the round-2 state was 10-20x low from a missing 2 pi in the solid-angle
weights; rounds 1-3 were 2.8x bright off-axis from the SPN98
delta^3 P'_max N_e point-source form) fails loudly.
"""

import numpy as np
import pytest

from nmma_tpu.models.grb import JET_TOPHAT, grb_afterglow_flux_density

E52, N0, EPS_E, EPS_B, P = 1.0, 1.0, 0.1, 0.01, 2.5

SPHERE = dict(log10_E0=52.0, thetaCore=1.0, thetaWing=1.0,
              inclination_EM=0.0, log10_n0=0.0, p=P,
              log10_epsilon_e=-1.0, log10_epsilon_B=-2.0,
              xi_N=1.0, d_L=1e28)


def spn98_midband(nu, t_d):
    """SPN98 eq. 11 (adiabatic): F_nu for nu_m < nu < nu_c, microJy at
    D = 1e28 cm."""
    nu_m = 5.7e14 * np.sqrt(EPS_B) * EPS_E**2 * np.sqrt(E52) * t_d**-1.5
    f_max = 1.1e5 * np.sqrt(EPS_B) * E52 * np.sqrt(N0)
    return f_max * (nu / nu_m) ** (-(P - 1) / 2), nu_m


def _slope(t, f, t1, t2):
    j1, j2 = np.searchsorted(t, t1), np.searchsorted(t, t2)
    return (np.log(f[j2]) - np.log(f[j1])) / (np.log(t[j2]) - np.log(t[j1]))


def test_fmax_time_constancy():
    """Adiabatic invariant: the spectral peak flux is time-independent.
    The round-2 kernel violated this at early (relativistic) epochs
    because r_max = 200 c t truncated the on-axis EATS above Gamma~3.5.
    (Gate 1.08 -> 1.13 in round 4: the EATS width stretch
    1/(1 - mu beta_sh) of the volume-form emission carries a mild,
    physical time structure absent from the point-source form.)"""
    nus = np.geomspace(5e9, 1e15, 160)
    peaks = []
    for td in (0.5, 1.0, 2.0, 4.0, 8.0):
        f = np.asarray(grb_afterglow_flux_density(
            np.array([td]), nus, SPHERE, jet_type=JET_TOPHAT,
            spread=False, n_theta=64, n_r=512))[:, 0]
        peaks.append(f.max())
    peaks = np.asarray(peaks)
    assert peaks.max() / peaks.min() < 1.13, peaks


def test_spn98_absolute_normalization_midband():
    """nu_m < nu < nu_c absolute flux: 0.22-0.32 x SPN98, stable in time
    (see module docstring for why this band, not 1.0)."""
    for td in (1.0, 3.0):
        f = float(np.asarray(grb_afterglow_flux_density(
            np.array([td]), np.array([3e13]), SPHERE,
            jet_type=JET_TOPHAT, spread=False))[0, 0])
        pred, _ = spn98_midband(3e13, td)
        ratio = f * 1e3 / pred
        assert 0.20 < ratio < 0.34, (td, ratio)


def test_spn98_low_frequency_third_slope():
    """nu < nu_m: F ~ nu^(1/3), rising as t^(1/2).

    Round 4: the volume-form emission's EATS width stretch
    1/(1 - mu beta_sh) up-weights the large-R tip of the surface, so
    the effective nu_m-break smearing widens and the old window
    (1e10 Hz, 0.3-10 d) straddled the break; measure the temporal slope
    a decade below it (1e9 Hz, 0.3-5 d) where the local slope is a
    clean +0.51..0.59."""
    t = np.geomspace(0.3, 10.0, 60)
    f = np.asarray(grb_afterglow_flux_density(
        t, np.array([1e9]), SPHERE, jet_type=JET_TOPHAT, spread=False))[0]
    assert abs(_slope(t, f, 0.3, 5.0) - 0.5) < 0.1
    # spectral slope between two low frequencies
    f2 = np.asarray(grb_afterglow_flux_density(
        np.array([1.0]), np.array([1e9, 1e10]), SPHERE,
        jet_type=JET_TOPHAT, spread=False))[:, 0]
    snu = np.log(f2[1] / f2[0]) / np.log(10.0)
    assert abs(snu - 1.0 / 3.0) < 0.03, snu


def test_bm_decay_slope_high_gamma():
    """Ultrarelativistic BM limit: F ~ t^{3(1-p)/4} = t^-1.125 for p=2.5.
    At Gamma ~ 25-30 the kernel must be within 0.05 of the limit; at
    Gamma ~ 3-6 trans-relativistic (Gamma-1 vs Gamma) corrections steepen
    it to ~ -1.26 — also pinned, so dynamics changes are visible."""
    hot = dict(SPHERE, log10_E0=53.0, log10_epsilon_B=-4.0)
    t = np.geomspace(0.015, 0.5, 60)
    f = np.asarray(grb_afterglow_flux_density(
        t, np.array([2e15]), hot, jet_type=JET_TOPHAT, spread=False,
        n_theta=64, n_r=512))[0]
    s_hi = _slope(t, f, 0.03, 0.1)
    assert abs(s_hi - (-1.125)) < 0.05, s_hi

    t2 = np.geomspace(0.5, 10.0, 60)
    f2 = np.asarray(grb_afterglow_flux_density(
        t2, np.array([3e13]), SPHERE, jet_type=JET_TOPHAT, spread=False))[0]
    s_lo = _slope(t2, f2, 1.0, 8.0)
    assert -1.40 < s_lo < -1.15, s_lo


def test_jet_break_slopes():
    """Narrow tophat: decay steepens across the jet break; with
    sound-speed spreading the post-break slope approaches ~ -p
    (Sari, Piran & Halpern 1999), without spreading only the edge
    (1/Gamma > theta_j) effect remains."""
    jet = dict(SPHERE, thetaCore=0.1, thetaWing=0.1)
    t = np.geomspace(0.01, 100.0, 120)
    # pre-break window needs Gamma theta_j > 1 (t < ~0.3 d for these
    # params) AND nu_m(t) < nu: probe at 1e15 Hz over 0.02-0.1 d
    f_hi = np.asarray(grb_afterglow_flux_density(
        t, np.array([1e15]), jet, jet_type=JET_TOPHAT, spread=False))[0]
    f_on = np.asarray(grb_afterglow_flux_density(
        t, np.array([1e14]), jet, jet_type=JET_TOPHAT, spread=True))[0]
    f_off = np.asarray(grb_afterglow_flux_density(
        t, np.array([1e14]), jet, jet_type=JET_TOPHAT, spread=False))[0]
    early = _slope(t, f_hi, 0.02, 0.1)
    late_on = _slope(t, f_on, 30.0, 90.0)
    late_off = _slope(t, f_off, 30.0, 90.0)
    # pre-break: BM-like (trans-relativistic band)
    assert -1.5 < early < -1.0, early
    # post-break with spreading: near -p (trumpet default gives -2.27
    # for p=2.5; the energy-dilution variant -2.51)
    assert -3.2 < late_on < -2.1, late_on
    # spreading steepens relative to edge-only (margin 0.3 -> 0.2 with
    # the trumpet default, which softens the steepening toward -p)
    assert late_on < late_off - 0.2, (late_on, late_off)
