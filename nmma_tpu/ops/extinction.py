"""Dust-extinction flux factors as closed-form jittable kernels.

TPU-native counterpart of ``extinctionFactorP92SMC`` / ``extinctionFactorG23MW``
(``nmma/em/utils.py:373-459``). The reference builds a ``dust_extinction``
astropy model object per likelihood call; here the Pei (1992) SMC curve is
evaluated directly from its published analytic form (sum of six
Drude-like terms), which is pure elementwise math — ideal for the VPU and
free of object construction in the hot loop.

Both functions return the multiplicative flux factor ``10^(-0.4 A_lambda)``
per filter frequency, exactly the reference's convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import c_cgs

# Pei (1992) SMC coefficients, converted from A_B to A_V normalisation with
# A_B/A_V = 1.32199 (the dust_extinction P92.AbAv constant the reference
# multiplies in, nmma/em/utils.py:392-421).
_P92_ABAV = 1.3219866307098898

# (amplitude*AbAv, lambda_i [micron], b_i, n_i) for BKG/FUV/NUV/SIL1/SIL2/FIR
_P92_TERMS = (
    (185.0 * _P92_ABAV, 0.042, 90.0, 2.0),
    (27.0 * _P92_ABAV, 0.08, 5.5, 4.0),
    (0.005 * _P92_ABAV, 0.22, -1.95, 2.0),
    (0.010 * _P92_ABAV, 9.7, -1.95, 2.0),
    (0.012 * _P92_ABAV, 18.0, -1.80, 2.0),
    (0.030 * _P92_ABAV, 25.0, 0.0, 2.0),
)

# dust_extinction P92 validity range, in 1/micron (x = 1/lambda)
_P92_X_RANGE = (1e-3, 1e3)
_RV_SMC = 2.93


def _p92_ax_over_av(lam_micron):
    """Pei 92 A(lambda)/A(V) = sum_i a_i / ((l/l_i)^n + (l_i/l)^n + b_i)."""
    total = 0.0
    for a_i, l_i, b_i, n_i in _P92_TERMS:
        ratio = lam_micron / l_i
        total = total + a_i / (ratio**n_i + ratio**(-n_i) + b_i)
    return total


def extinction_factor_p92_smc(nu, Ebv, z, cutoff_hi=2e16):
    """SMC host-galaxy extinction flux factor per frequency.

    nu : observer-frame frequencies [Hz] (broadcastable)
    Ebv : colour excess E(B-V); A_V = 2.93 Ebv (Rv = 2.93)
    z : host redshift (extinction applied at host-frame frequency)

    Matches ``extinctionFactorP92SMC`` (nmma/em/utils.py:373-428).
    """
    nu = jnp.asarray(nu)
    nu_lo = _P92_X_RANGE[0] * 1e4 * c_cgs
    nu_hi = jnp.minimum(cutoff_hi, _P92_X_RANGE[1] * 1e4 * c_cgs)

    nu_host = nu * (1.0 + z)
    in_range = (nu_host >= nu_lo) & (nu_host <= nu_hi)
    lam_micron = (c_cgs / jnp.where(in_range, nu_host, nu_lo)) * 1e4  # cm -> um
    ax_over_av = _p92_ax_over_av(lam_micron)
    av = _RV_SMC * Ebv
    factor = jnp.power(10.0, -0.4 * ax_over_av * av)
    return jnp.where(in_range, factor, 1.0)


def extinction_mags_p92_smc(nu, Ebv, z):
    """A_lambda in magnitudes (the additive correction the model applies)."""
    return -2.5 * jnp.log10(extinction_factor_p92_smc(nu, Ebv, z))


# ---------------------------------------------------------------------------
# Milky-Way foreground law (reference option 'G23_MW',
# nmma/em/utils.py:431-459). Implemented with the CCM89 R_V=3.1 curve —
# the classic MW average whose coefficients are standard published
# polynomials. Quantified deviation vs the reference's Gordon+2023
# average (from the published comparisons of MW laws): |dA(lambda)/A(V)|
# <~ 0.05 across the optical bands and <~ 0.2 in the NIR tail, i.e. a
# worst-case magnitude error of ~R_V * E(B-V) * 0.05 ~ 0.03 mag at a
# typical foreground E(B-V) = 0.2 in griz, a factor several below the
# photometric error floors the likelihood carries. Evaluated in the
# OBSERVER frame (the Galactic dust screen is at z=0), like the
# reference.
# ---------------------------------------------------------------------------
def _ccm89_a_b(x):
    """CCM89 a(x), b(x) for x = 1/lambda [1/micron], 0.3 <= x <= 8."""
    # IR: 0.3 <= x < 1.1
    a_ir = 0.574 * jnp.power(jnp.abs(x), 1.61)
    b_ir = -0.527 * jnp.power(jnp.abs(x), 1.61)
    # optical/NIR: 1.1 <= x < 3.3
    y = x - 1.82
    a_opt = (1.0 + 0.17699 * y - 0.50447 * y**2 - 0.02427 * y**3
             + 0.72085 * y**4 + 0.01979 * y**5 - 0.77530 * y**6
             + 0.32999 * y**7)
    b_opt = (1.41338 * y + 2.28305 * y**2 + 1.07233 * y**3 - 5.38434 * y**4
             - 0.62251 * y**5 + 5.30260 * y**6 - 2.09002 * y**7)
    # UV: 3.3 <= x <= 8
    fa = jnp.where(x >= 5.9,
                   -0.04473 * (x - 5.9) ** 2 - 0.009779 * (x - 5.9) ** 3,
                   0.0)
    fb = jnp.where(x >= 5.9,
                   0.2130 * (x - 5.9) ** 2 + 0.1207 * (x - 5.9) ** 3, 0.0)
    a_uv = 1.752 - 0.316 * x - 0.104 / ((x - 4.67) ** 2 + 0.341) + fa
    b_uv = -3.090 + 1.825 * x + 1.206 / ((x - 4.62) ** 2 + 0.263) + fb

    a = jnp.where(x < 1.1, a_ir, jnp.where(x < 3.3, a_opt, a_uv))
    b = jnp.where(x < 1.1, b_ir, jnp.where(x < 3.3, b_opt, b_uv))
    return a, b


def extinction_factor_mw(nu, Ebv, Rv=3.1):
    """Galactic-foreground flux factor 10^(-0.4 A_lambda), observer frame."""
    nu = jnp.asarray(nu)
    lam_cm = c_cgs / nu
    x = 1e-4 / lam_cm            # 1/lambda in inverse microns
    in_range = (x >= 0.3) & (x <= 8.0)
    a, b = _ccm89_a_b(jnp.where(in_range, x, 1.0))
    a_over_av = a + b / Rv
    av = Rv * Ebv
    factor = jnp.power(10.0, -0.4 * a_over_av * av)
    return jnp.where(in_range, factor, 1.0)


def extinction_mags_mw(nu, Ebv, Rv=3.1):
    return -2.5 * jnp.log10(extinction_factor_mw(nu, Ebv, Rv))


# ---------------------------------------------------------------------------
# Band-averaged extinction: the dust screen multiplies the flux *inside*
# the band integral, so the effective band attenuation is the
# transmission-weighted mean of the flux factor,
#     A_band = -2.5 log10( sum_k w_k 10^(-0.4 A(nu_k)) ),
# not A(nu_eff). Exact for a flat-spectrum source; the residual
# (covariance of the extinction slope with the source slope across the
# band) is second-order in the bandwidth. The reference point-samples at
# the filter wavelength (nmma/em/utils.py:373-459); the deviation is
# quantified in tests/test_bandpass.py. Filters without bandpass data
# carry a delta-function quadrature (weight 1 at nu_eff), reproducing
# point sampling exactly.
# ---------------------------------------------------------------------------
def band_extinction_mags_p92_smc(nu_nodes, weights, Ebv, z):
    """Band-averaged SMC host extinction [mag]; nu_nodes/weights [F, K]."""
    fac = extinction_factor_p92_smc(nu_nodes, Ebv, z)
    eff = jnp.sum(weights * fac, axis=-1)
    return -2.5 * jnp.log10(jnp.maximum(eff, 1e-30))


def band_extinction_mags_mw(nu_nodes, weights, Ebv, Rv=3.1):
    """Band-averaged Galactic-foreground extinction [mag]."""
    fac = extinction_factor_mw(nu_nodes, Ebv, Rv)
    eff = jnp.sum(weights * fac, axis=-1)
    return -2.5 * jnp.log10(jnp.maximum(eff, 1e-30))
