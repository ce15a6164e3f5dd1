"""Piro (2021) shock-cooling light-curve kernel.

TPU-native re-implementation of ``sc_bol_lc``/``sc_lc``
(``nmma/em/lightcurve_generation.py:314-363``): extended-envelope shock
cooling with an early power-law and late exponential regime, stitched with
``where`` masks instead of boolean assignment. Pure, jittable, vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import c_cgs, msun_cgs, seconds_a_day, sigSB
from ..ops.photometry import blackbody_ab_mag
from .base import SourceModel, register_source_model


def piro2021_bolometric(params, t_days):
    """(lbol / 1e40 [erg/s], Rs [cm]) on the sample times. Reference :314-355.

    Luminosity is returned in units of 1e40 erg/s so every intermediate
    stays within float32 range on TPU.
    """
    t = t_days * seconds_a_day
    menv = 10.0 ** params["log10_Menv"] * msun_cgs
    renv = 10.0 ** params["log10_Renv"]
    # exponent arithmetic keeps 10^log10_Ee (~1e51) out of f32 range
    ee40 = 10.0 ** (params["log10_Ee"] - 40.0)
    menv40 = 10.0 ** params["log10_Menv"] * (msun_cgs * 1e-40)

    n, delta = 10.0, 1.1
    big_k = (n - 3.0) * (3.0 - delta) / (4.0 * jnp.pi * (n - delta))  # 0.119
    kappa = 0.2
    vt = jnp.sqrt(((n - 5.0) * (5.0 - delta) / ((n - 3.0) * (3.0 - delta)))
                  * (2.0 * ee40 / menv40))
    td = jnp.sqrt((3.0 * kappa * big_k * menv) / ((n - 1.0) * vt * c_cgs))

    prefactor40 = (jnp.pi * (n - 1.0) / (3.0 * (n - 5.0))
                   * (c_cgs * 1e-20) * renv * vt * vt / kappa * 1e-20)
    l40_early = prefactor40 * jnp.power(td / t, 4.0 / (n - 2.0))
    l40_late = prefactor40 * jnp.exp(-0.5 * (t * t / (td * td) - 1.0))
    lbol40 = jnp.where(t < td, l40_early, l40_late)

    tph = jnp.sqrt(3.0 * kappa * big_k * menv / (2.0 * (n - 1.0) * vt * vt))
    r_early = jnp.power(tph / t, 2.0 / (n - 1.0)) * vt * t
    r_late = (jnp.power(1.0 + (delta - 1.0) / (n - 1.0) * ((t / tph) ** 2 - 1.0),
                        -1.0 / (delta - 1.0)) * vt * t)
    rs = jnp.where(t < tph, r_early, r_late)
    return lbol40, rs


def piro2021_mags(params, t_days, nu_host, nu_nodes=None, nu_weights=None):
    lbol40, rs = piro2021_bolometric(params, t_days)
    # T^4 = L / (4 pi R^2 sigma), assembled with f32-safe scaling
    q = (lbol40 * 1e20) / (4.0 * jnp.pi * sigSB) / ((rs * 1e-10) ** 2)
    good = (q > 0.0) & jnp.isfinite(q)
    t_eff = jnp.where(good, jnp.power(jnp.where(good, q, 1.0), 0.25), jnp.nan)
    inv_t = jnp.where(jnp.isfinite(t_eff) & (t_eff > 0.0), 1.0 / t_eff, jnp.inf)
    if nu_nodes is not None:
        from ..ops.photometry import blackbody_ab_mag_banded
        return blackbody_ab_mag_banded(nu_nodes, nu_weights, inv_t, rs)
    return blackbody_ab_mag(nu_host, inv_t, rs)


register_source_model(SourceModel(
    name="Piro2021",
    parameter_names=("log10_Menv", "log10_Renv", "log10_Ee"),
    mags_fn=piro2021_mags,
    default_time_grid=lambda: np.geomspace(1.0 / 24.0, 3.5, 100),
    citation="Piro et al. (2021), ApJ 909, 209",
))
