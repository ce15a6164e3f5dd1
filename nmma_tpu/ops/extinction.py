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
