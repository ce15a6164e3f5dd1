"""Gaussian-process SVD-surrogate backend.

Counterpart of ``SklearnGPTrainingModel`` (``nmma/em/training.py:412-453``):
the reference fits one sklearn RationalQuadratic GP per SVD coefficient per
filter, serially with a process pool. Here every (filter, coefficient) GP
is an exact-GP block fitted *simultaneously* — hyperparameters are a
[G, ...] stacked pytree optimized by one adam loop over vmapped marginal
likelihoods, and prediction is a single batched kernel contraction,
matching the stacked-einsum shape of the MLP backend.

Kernel: RationalQuadratic with per-dimension length scales + white noise.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _rq_kernel(x1, x2, log_amp, log_length, log_alpha):
    """RationalQuadratic kernel matrix [n1, n2]."""
    length = jnp.exp(log_length)                      # [P]
    alpha = jnp.exp(log_alpha)
    d2 = jnp.sum(((x1[:, None, :] - x2[None, :, :]) / length) ** 2, axis=-1)
    return jnp.exp(log_amp) * jnp.power(1.0 + d2 / (2.0 * alpha), -alpha)


def _gp_nll(params, x, y):
    k = _rq_kernel(x, x, params["log_amp"], params["log_length"],
                   params["log_alpha"])
    k = k + (jnp.exp(params["log_noise"]) + 1e-6) * jnp.eye(x.shape[0])
    chol = jnp.linalg.cholesky(k)
    alpha_vec = jax.scipy.linalg.cho_solve((chol, True), y)
    return (0.5 * y @ alpha_vec
            + jnp.sum(jnp.log(jnp.diagonal(chol)))
            + 0.5 * x.shape[0] * jnp.log(2.0 * jnp.pi))


@dataclass
class GPSurrogate:
    """Stacked exact GPs: one per (filter, coefficient)."""

    x_train: np.ndarray        # [N, P] normalized parameters
    alpha_vecs: np.ndarray     # [G, N] K^-1 y per GP
    log_amp: np.ndarray        # [G]
    log_length: np.ndarray     # [G, P]
    log_alpha: np.ndarray      # [G]
    shape: tuple               # (F, C)

    def predict(self, x_star):
        """Coefficients [F, C] for one normalized parameter point [P]."""
        length = jnp.exp(self.log_length)                     # [G, P]
        alpha = jnp.exp(self.log_alpha)[:, None]              # [G, 1]
        diff = (x_star[None, None, :] - self.x_train[None, :, :]) / \
            length[:, None, :]                                # [G, N, P]
        d2 = jnp.sum(diff * diff, axis=-1)                    # [G, N]
        k_star = jnp.exp(self.log_amp)[:, None] * jnp.power(
            1.0 + d2 / (2.0 * alpha), -alpha)
        coeffs = jnp.sum(k_star * self.alpha_vecs, axis=-1)   # [G]
        return coeffs.reshape(self.shape)


def fit_gp_coefficients(x, coeffs, n_steps=400, learning_rate=0.05,
                        seed=0, verbose=False) -> GPSurrogate:
    """Fit all (F, C) GPs jointly. x [N, P]; coeffs [N, F, C]."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n, p = x.shape
    f_n, c_n = coeffs.shape[1], coeffs.shape[2]
    y_all = jnp.asarray(coeffs.reshape(n, f_n * c_n).T)       # [G, N]
    g = f_n * c_n

    y_std = jnp.std(y_all, axis=1) + 1e-6
    params = {
        "log_amp": 2.0 * jnp.log(y_std),
        "log_length": jnp.zeros((g, p)),
        "log_alpha": jnp.zeros(g),
        "log_noise": 2.0 * jnp.log(y_std) - 6.0,
    }

    def total_nll(params):
        def one(i):
            sub = {k: v[i] for k, v in params.items()}
            return _gp_nll(sub, x, y_all[i])
        return jnp.sum(jax.vmap(one)(jnp.arange(g)))

    opt = optax.adam(learning_rate)
    state = opt.init(params)

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(total_nll)(params)
        updates, state = opt.update(grads, state)
        return (optax.apply_updates(params, updates), state), loss

    # scan a block of steps per dispatch (remote-backend round trips);
    # the final block runs the exact remainder so the step count matches
    # n_steps exactly
    import functools
    block = max(1, n_steps // (5 if verbose else 1))

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_block(params, state, length):
        (params, state), losses = jax.lax.scan(step, (params, state), None,
                                               length=length)
        return params, state, losses[-1]

    done = 0
    while done < n_steps:
        k = min(block, n_steps - done)
        params, state, loss = run_block(params, state, k)
        done += k
        if verbose:
            print(f"gp step {done:4d} nll {float(loss):.3f}")

    # precompute K^-1 y per GP with the fitted hyperparameters
    def alpha_one(i):
        k = _rq_kernel(x, x, params["log_amp"][i], params["log_length"][i],
                       params["log_alpha"][i])
        k = k + (jnp.exp(params["log_noise"][i]) + 1e-6) * jnp.eye(n)
        chol = jnp.linalg.cholesky(k)
        return jax.scipy.linalg.cho_solve((chol, True), y_all[i])

    alpha_vecs = jax.vmap(alpha_one)(jnp.arange(g))
    return GPSurrogate(
        x_train=np.asarray(x), alpha_vecs=np.asarray(alpha_vecs),
        log_amp=np.asarray(params["log_amp"]),
        log_length=np.asarray(params["log_length"]),
        log_alpha=np.asarray(params["log_alpha"]),
        shape=(f_n, c_n))


def _svd_decompose(entries, parameter_names, filters, config=None):
    """Shared grid -> (meta, normalized params x, SVD coefficients).

    The per-filter SVD basis + min-max normalisation common to every GP
    backend (the reference's ``BaseTrainingModel.generate_svd_model``,
    nmma/em/training.py:118-176).
    """
    from .svd import SVDTrainingConfig, _interp_grid, _normalize_and_decompose
    cfg = config or SVDTrainingConfig()
    tt = np.linspace(cfg.tmin, cfg.tmax, cfg.n_tsteps)
    # honor the spline options like the MLP trainer (previously the GP
    # backends silently trained on plain linear interpolation under
    # --use-UnivariateSpline)
    data = _interp_grid(entries, filters, tt,
                        spline=cfg.univariate_spline,
                        spline_s=cfg.univariate_spline_s)
    params = np.asarray([[e["params"][p] for p in parameter_names]
                         for e in entries])
    (p_mins, p_maxs, x, mins, maxs, va,
     coeffs) = _normalize_and_decompose(data, params, cfg.n_coeff)
    meta = dict(filters=tuple(filters), parameter_names=tuple(parameter_names),
                tt=tt, va=va, mins=mins, maxs=maxs, param_mins=p_mins,
                param_maxs=p_maxs)
    return meta, x, coeffs


def train_svd_gp_model(entries, parameter_names, filters, config=None,
                       n_steps=400, verbose=True):
    """SVD + GP-backend surrogate (interpolation-type 'sklearn_gp' analogue).

    Returns (SVDModelData-compatible pieces, GPSurrogate); the eval path is
    ``svd_gp_surrogate_mags``.
    """
    meta, x, coeffs = _svd_decompose(entries, parameter_names, filters,
                                     config)
    gp = fit_gp_coefficients(x, coeffs, n_steps=n_steps, verbose=verbose)
    return meta, gp


def save_gp_surrogate(path, meta, gp):
    """One-file npz for either GP backend (counterpart of the reference's
    joblib dump of ``svd_model``, nmma/em/training.py:425-427,466-468)."""
    from .gp_compact import CompactGPSurrogate
    payload = {f"meta_{k}": np.asarray(v) for k, v in meta.items()}
    if isinstance(gp, CompactGPSurrogate):
        payload.update(backend="api_gp", x_train=gp.x_train,
                       alpha_vecs=gp.alpha_vecs, scale=gp.scale,
                       shape=np.asarray(gp.shape))
    else:
        payload.update(backend="sklearn_gp", x_train=gp.x_train,
                       alpha_vecs=gp.alpha_vecs, log_amp=gp.log_amp,
                       log_length=gp.log_length, log_alpha=gp.log_alpha,
                       shape=np.asarray(gp.shape))
    np.savez_compressed(path, **payload)


def load_gp_surrogate(path):
    """Inverse of ``save_gp_surrogate`` -> (meta, surrogate)."""
    from .gp_compact import CompactGPSurrogate
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    meta = {k[5:]: data[k] for k in data if k.startswith("meta_")}
    meta["filters"] = tuple(str(f) for f in meta["filters"])
    meta["parameter_names"] = tuple(str(p)
                                    for p in meta["parameter_names"])
    shape = tuple(int(s) for s in data["shape"])
    if str(data["backend"]) == "api_gp":
        gp = CompactGPSurrogate(x_train=data["x_train"],
                                alpha_vecs=data["alpha_vecs"],
                                scale=data["scale"], shape=shape)
    else:
        gp = GPSurrogate(x_train=data["x_train"],
                         alpha_vecs=data["alpha_vecs"],
                         log_amp=data["log_amp"],
                         log_length=data["log_length"],
                         log_alpha=data["log_alpha"], shape=shape)
    return meta, gp


def svd_gp_surrogate_mags(meta, gp, params, t_days):
    """[F, T_out] magnitudes through the GP backend."""
    from ..ops.interp import masked_interp_sorted_fill
    theta = jnp.stack([jnp.asarray(params[p])
                       for p in meta["parameter_names"]])
    x = (theta - meta["param_mins"]) / (
        meta["param_maxs"] - meta["param_mins"])
    c = gp.predict(x)                                       # [F, C]
    m = jnp.einsum("ftc,fc->ft", jnp.asarray(meta["va"]), c)
    m = m * (meta["maxs"] - meta["mins"]) + meta["mins"]

    def interp_one(row):
        return masked_interp_sorted_fill(t_days, jnp.asarray(meta["tt"]),
                                         row, jnp.inf)
    return jax.vmap(interp_one)(m)
