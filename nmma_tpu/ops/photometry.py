"""Flux -> AB magnitude and blackbody photometry kernels.

TPU-native re-design of the reference's blackbody/magnitude helpers
(``nmma/em/lightcurve_generation.py:40-58``, ``nmma/em/utils.py:793-811``).
Two key departures from the NumPy reference, both driven by float32 TPU
arithmetic:

1. Magnitudes are computed in *log space* end-to-end: the reference forms
   the physical flux (values like 1e-18 erg/s/cm^2/Hz, with ``exp(700)``
   intermediates) and then takes ``log10``; in f32 that under/overflows, so
   here ``log F`` is assembled from ``log`` terms and ``log(expm1(x))`` is
   evaluated with the stable branch ``x + log1p(-exp(-x))``.
2. The per-filter Python loop becomes a broadcast over a static filter axis:
   mags come back as ``[F, T]`` arrays, never dicts of ragged arrays.

Invalid photospheres (``1/T = inf`` in the reference) produce ``inf``
magnitudes, matching the reference's convention for "no detectable flux".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (AB_ZP_CGS, AB_ZP_JY, AB_ZP_MJY, LN10, abs_mag_dist_factor,
                         c_cgs, h, kb)

import math

# python-float constants: abs_mag_dist_factor (~9.5e38) overflows float32,
# so its log must never touch device arithmetic
_LOG_BB_FACTOR = math.log(2.0) + math.log(h) - 2.0 * math.log(c_cgs)
_LOG_DIST2 = math.log(abs_mag_dist_factor)


def log_expm1(x):
    """log(e^x - 1), stable for all x > 0 (no exp overflow)."""
    x = jnp.maximum(x, 1e-30)
    small = jnp.log(jnp.expm1(jnp.minimum(x, 20.0)))
    large = x + jnp.log1p(-jnp.exp(-jnp.minimum(x, 80.0)))
    return jnp.where(x < 20.0, small, large)


def ab_mag_from_log_flux(log_flux_cgs):
    """AB magnitude from ln(F_nu [erg s^-1 cm^-2 Hz^-1])."""
    return -2.5 / LN10 * log_flux_cgs + AB_ZP_CGS


def flux_to_ab_mag(flux, unit="cgs", residual_mag=None):
    """AB magnitude from linear flux; non-positive flux maps to +inf.

    Matches ``flux_to_ABmag`` (nmma/em/utils.py:793-811) except that the
    reference's "fewer than 2 positive fluxes => all NaN" early-exit becomes
    a pure where-mask (NaN rows are equivalent to -inf logL downstream and
    the all-inf case is caught by the likelihood's sanity mask).
    """
    zp = {"cgs": AB_ZP_CGS, "Jy": AB_ZP_JY, "mJy": AB_ZP_MJY}[unit]
    if residual_mag is not None:
        zp = residual_mag
    flux = jnp.asarray(flux)
    good = flux > 0.0
    safe = jnp.where(good, flux, 1.0)
    return jnp.where(good, -2.5 * jnp.log10(safe) + zp, jnp.inf)


def banded_ab_mag_from_log_flux(log_flux, weights):
    """Band AB magnitudes from per-node log fluxes.

    ``log_flux``: [F, K, T] natural-log F_nu [cgs] at the quadrature nodes
    (``-inf`` marks no flux); ``weights``: [F, K] normalized band weights
    (``filters_to_quadrature``). The band magnitude is the AB
    transmission-weighted mean flux, computed in log space:
    ``m = -2.5/ln10 * logsumexp_k(ln w_k + ln F_k) + ZP`` — the
    counterpart of the reference's sncosmo ``bandmag`` integral
    (nmma/em/model.py:1121-1180).
    """
    from jax.scipy.special import logsumexp
    logw = jnp.log(jnp.maximum(jnp.asarray(weights), 1e-30))
    log_mean = logsumexp(log_flux + logw[:, :, None], axis=1)
    return ab_mag_from_log_flux(log_mean)


def blackbody_ab_mag_banded(nu_nodes, weights, inv_temp, radius,
                            log_dist2=_LOG_DIST2):
    """Bandpass-integrated blackbody AB magnitudes, [F, T].

    Same physics as :func:`blackbody_ab_mag` but the Planck spectrum is
    evaluated at the ``[F, K]`` quadrature nodes and averaged with the
    band weights instead of point-sampled at the effective frequency.
    """
    nu = jnp.asarray(nu_nodes)[:, :, None]           # [F, K, 1]
    inv_temp = jnp.asarray(inv_temp)[None, None, :]  # [1, 1, T]
    radius = jnp.asarray(radius)[None, None, :]

    x = h * nu * inv_temp / kb                       # [F, K, T]
    good = jnp.isfinite(x) & (x > 0.0) & (radius > 0.0)
    x_safe = jnp.where(good, x, 1.0)
    r_safe = jnp.where(radius > 0.0, radius, 1.0)
    log_flux = (_LOG_BB_FACTOR + 3.0 * jnp.log(nu)
                - log_expm1(x_safe)
                + 2.0 * jnp.log(r_safe) - log_dist2)
    log_flux = jnp.where(good, log_flux, -jnp.inf)
    mag = banded_ab_mag_from_log_flux(log_flux, weights)
    return jnp.where(jnp.all(good, axis=1), mag, jnp.inf)


def blackbody_ab_mag(nu, inv_temp, radius, log_dist2=_LOG_DIST2):
    """AB magnitudes of a blackbody photosphere, broadcast over filters/time.

    Parameters
    ----------
    nu : ``[F]`` or ``[F, 1]`` host-frame frequencies [Hz]
    inv_temp : ``[T]`` inverse temperature [1/K]; ``inf`` => no flux
    radius : ``[T]`` photospheric radius [cm]
    log_dist2 : ln(d^2 [cm^2]); default is the 10 pc absolute-mag reference

    Returns ``[F, T]`` AB magnitudes (``inf`` where the photosphere is
    invalid). Equivalent math: ``bb_flux_from_inv_temp`` + ``flux_to_ABmag``
    (nmma/em/lightcurve_generation.py:43-58), in log space.
    """
    nu = jnp.asarray(nu)
    if nu.ndim == 1:
        nu = nu[:, None]
    inv_temp = jnp.asarray(inv_temp)[None, :]
    radius = jnp.asarray(radius)[None, :]

    x = h * nu * inv_temp / kb                       # [F, T]
    good = jnp.isfinite(x) & (x > 0.0) & (radius > 0.0)
    x_safe = jnp.where(good, x, 1.0)
    r_safe = jnp.where(radius > 0.0, radius, 1.0)
    log_flux = (_LOG_BB_FACTOR + 3.0 * jnp.log(nu)
                - log_expm1(x_safe)
                + 2.0 * jnp.log(r_safe) - log_dist2)
    mag = ab_mag_from_log_flux(log_flux)
    return jnp.where(good, mag, jnp.inf)
