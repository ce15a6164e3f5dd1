"""Marginalised light-curve prediction from GW posterior samples.

Counterpart of ``marginalised_lightcurve_expectation_from_gw_samples``
(``nmma/post_processing/marginalisation.py:16-70``): push a GW posterior
(chirp mass, mass ratio, distance, inclination, ...) through the
EOS-marginalized conversion chain and a kilonova model, returning
percentile bands of the predicted detector-frame magnitudes — one vmapped
call over the whole posterior set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import conversion as C


def marginalised_lightcurve_expectation(gw_samples, eos_set, lc_model,
                                        percentiles=(5, 50, 95),
                                        extra_parameters=None,
                                        max_samples=2000, seed=0):
    """Percentile magnitude bands [len(percentiles), F, T].

    gw_samples: dict of posterior arrays (chirp_mass, mass_ratio,
    luminosity_distance, theta_jn, ...). extra_parameters: fixed nuisance
    values merged into every sample (e.g. ratio_zeta, alpha). EOS is
    marginalized by drawing an index per sample if not present.
    """
    rng = np.random.default_rng(seed)
    n = len(np.asarray(next(iter(gw_samples.values()))))
    take = rng.choice(n, size=min(max_samples, n), replace=False)
    params = {k: jnp.asarray(np.asarray(v)[take]) for k, v in
              gw_samples.items()}
    n_used = len(take)
    if "EOS" not in params:
        params["EOS"] = jnp.asarray(
            rng.choice(eos_set.n_eos, size=n_used,
                       p=np.asarray(eos_set.weights)) + rng.uniform(
                0, 1, n_used))
    for key, val in (extra_parameters or {}).items():
        params[key] = jnp.broadcast_to(jnp.asarray(val), (n_used,))

    conversion = C.MultimessengerConversion(
        C.bns_source_frame, eos_set, C.KilonovaEjectaFitting())

    def one(p_single):
        converted = conversion(p_single)
        _, mags = lc_model(converted)
        return mags

    mags = jax.vmap(one)(params)                       # [N, F, T]
    mags = np.asarray(mags)
    mags = np.where(np.isfinite(mags), mags, np.nan)
    bands = np.nanpercentile(mags, percentiles, axis=0)
    return bands
