"""Combined light-curve models: flux-sum stacking of sub-models.

TPU-native counterpart of ``CombinedLightCurveModelContainer`` /
``stack_magnitudes`` (``nmma/em/model.py:1342-1510``): sub-model
magnitudes are combined as fluxes,
    m_total = -2.5 log10( sum_i 10^(-0.4 m_i) ),
evaluated as a logsumexp so inf (no-flux) rows contribute exactly zero.
All sub-models are evaluated on the shared sample-time grid (the
reference's union grid collapses to this in the dense representation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import SourceModel, register_source_model

_LN10_04 = 0.4 * np.log(10.0)


def stack_magnitudes(mag_rows):
    """Flux-sum a list of [F, T] magnitude tensors (logsumexp form)."""
    stacked = jnp.stack(mag_rows)                     # [N, F, T]
    return -jax.scipy.special.logsumexp(
        -_LN10_04 * stacked, axis=0) / _LN10_04


def make_combined_source_model(name, sub_models, register=True):
    """Compose SourceModels into one flux-summed model.

    Parameter names are the union; each sub-model reads its own keys from
    the shared dict (the reference's per-model parameter_conversion
    composition, model.py:1372-1400).
    """
    sub_models = list(sub_models)
    param_names = []
    for sub in sub_models:
        for key in sub.parameter_names:
            if key not in param_names:
                param_names.append(key)

    def mags_fn(params, t_days, nu_host, filters=None, **model_kwargs):
        from .base import _filter_kwargs
        rows = []
        for sub in sub_models:
            kw = _filter_kwargs(sub.mags_fn, model_kwargs)
            if sub.needs_filters:
                m = sub.mags_fn(params, t_days, nu_host, filters=filters,
                                **kw)
            else:
                m = sub.mags_fn(params, t_days, nu_host, **kw)
            if sub.filter_names is not None and filters is not None:
                src = list(sub.filter_names)
                aligned = [m[src.index(f)] if f in src
                           else jnp.full(t_days.shape, jnp.inf)
                           for f in filters]
                m = jnp.stack(aligned)
            rows.append(m)
        return stack_magnitudes(rows)

    model = SourceModel(
        name=name,
        parameter_names=tuple(param_names),
        mags_fn=mags_fn,
        needs_filters=True,
        default_time_grid=sub_models[0].default_time_grid,
        citation=" + ".join(s.name for s in sub_models),
    )
    if register:
        register_source_model(model)
    return model
