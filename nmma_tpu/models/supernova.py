"""Supernova-family kernels: Arnett bolometric model, host-galaxy power law.

TPU-native re-implementations of ``arnett_lc``/``arnett_modified_lc`` and
``host_lc`` (``nmma/em/lightcurve_generation.py:64-140, 284-294``). The
reference evaluates the Arnett energy-deposition integrals with
``np.vectorize(scipy.quad)`` — one adaptive quadrature per time sample; here
they become a fixed-order Gauss-Legendre quadrature batched over the whole
time grid (one fused elementwise block + reduction, ideal for the VPU).

sncosmo spectral-template models (nugent-hyper, salt2, ...) require band
integration over tabulated spectra and are handled separately by the
surrogate/spectral pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import msun_cgs
from ..ops.photometry import flux_to_ab_mag
from .base import SourceModel, register_source_model

# Arnett constants (reference :85-91)
_EPS_NI = 3.9e10      # erg/s/g
_EPS_CO = 6.78e9      # erg/s/g
_TAU_NI = 8.8         # days
_TAU_CO = 111.3       # days
_Y_SCALE = 2.0 * _TAU_NI
_S_SCALE = (2.0 * _TAU_CO * _TAU_NI) / (_TAU_CO - _TAU_NI)

_QUAD_ORDER = 64
_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(_QUAD_ORDER)


def _arnett_integral(x, y, s=0.0):
    """int_0^x 2 z exp(-2 z y + 2 z s + z^2) dz, batched over x.

    Gauss-Legendre replacement for ``arnett_lc_get_int_A/B``
    (nmma/em/lightcurve_generation.py:65-84).
    """
    x = jnp.asarray(x)[..., None]                       # [T, 1]
    z = 0.5 * x * (_GL_NODES + 1.0)                     # [T, Q]
    w = 0.5 * x * _GL_WEIGHTS
    integrand = 2.0 * z * jnp.exp(-2.0 * z * y + 2.0 * z * s + z * z)
    return jnp.sum(w * integrand, axis=-1)


def arnett_lbol40(params, t_days):
    """Arnett bolometric light curve in units of 1e40 erg/s (f32-safe).

    Physics identical to ``arnett_lc`` (reference :93-122).
    """
    tau_m = params["tau_m"]
    mni40 = 10.0 ** params["log10_mni"] * (msun_cgs / 1e40)

    y = tau_m / _Y_SCALE
    s = tau_m / _S_SCALE
    x = t_days / tau_m

    int_a = _arnett_integral(x, y)
    int_b = _arnett_integral(x, y, s)
    return mni40 * jnp.exp(-x * x) * (
        (_EPS_NI - _EPS_CO) * int_a + _EPS_CO * int_b
    )


def arnett_modified_lbol40(params, t_days):
    """Arnett with a leakage time-delay factor (reference :125-140)."""
    lbol = arnett_lbol40(params, t_days)
    return lbol * (1.0 - jnp.exp(-((params["t_0"] / t_days) ** 2)))


def _arnett_mags(params, t_days, nu_host):
    # bolometric container: "mags" slot carries lbol / 1e40
    return arnett_lbol40(params, t_days)


def _arnett_modified_mags(params, t_days, nu_host):
    return arnett_modified_lbol40(params, t_days)


def host_galaxy_mags(params, t_days, nu_host, filters=None):
    """Sr2023 host+afterglow power law (reference ``host_lc`` :284-294).

    Per filter: F = a_AG * t^-alpha + f_nu [muJy], converted with the
    filter's host magnitude as the AB zero-point residual.
    """
    alpha = params["alpha_AG"]
    rows = []
    for i, filt in enumerate(filters):
        key = filt.replace(":", "_")
        a_ag = params[f"a_AG_{key}"]
        f_nu = params[f"f_nu_{key}"]
        host_mag = params[f"host_mag_{key}"]
        flux = a_ag * jnp.power(t_days, -alpha) + f_nu
        rows.append(flux_to_ab_mag(flux, residual_mag=host_mag))
    return jnp.stack(rows)


register_source_model(SourceModel(
    name="Arnett",
    parameter_names=("tau_m", "log10_mni"),
    mags_fn=_arnett_mags,
    default_time_grid=lambda: np.linspace(0.005, 20.0, 40),
    bolometric=True,
    citation="Arnett (1982), ApJ 253, 785",
))
register_source_model(SourceModel(
    name="Arnett_modified",
    parameter_names=("tau_m", "log10_mni", "t_0"),
    mags_fn=_arnett_modified_mags,
    default_time_grid=lambda: np.linspace(0.005, 20.0, 40),
    bolometric=True,
))
register_source_model(SourceModel(
    name="Sr2023",
    parameter_names=("a_AG", "alpha_AG", "f_nu_host"),
    mags_fn=host_galaxy_mags,
    needs_filters=True,
    citation="Srinivasaragavan et al. (2023)",
))
