"""TOV emulator: NEP parameters -> macroscopic NS curves via a small MLP.

Counterpart of the reference's ``EoSGenerator`` keras emulators
(``nmma/eos/eos_processing.py:41-233``, the ``EoSConverter('emulated')``
mode backed by shipped NEP5/LEC keras models). Those model files are not
available offline, so this module provides the full loop: generate
training EOS with the NEP meta-model + crust, solve TOV with the
fixed-grid RK4 kernel, and fit a flax-free MLP (plain jnp matmuls) that
maps nuclear parameters directly to (M_TOV, R(x), log Lambda(x)) on a
*relative* mass grid x = m / M_TOV — smooth in the parameters, unlike
fixed-mass-grid targets that jump at the maximum mass (the reference's
split low/high grids work around the same problem,
eos_processing.py:115-233).

At sampling time the emulator is a pure two-matmul jnp function — the
conversion step costs microseconds per live-point batch instead of a TOV
solve per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_X_GRID = np.linspace(0.35, 1.0, 24)    # m / M_TOV grid


class TOVEmulator:
    """MLP emulator + the conversion step consuming it."""

    def __init__(self, param_names, p_mins, p_maxs, x_grid, out_mean,
                 out_std, w1, b1, w2, b2):
        self.param_names = tuple(param_names)
        self.p_mins = np.asarray(p_mins, dtype=np.float32)
        self.p_maxs = np.asarray(p_maxs, dtype=np.float32)
        self.x_grid = np.asarray(x_grid, dtype=np.float32)
        self.out_mean = np.asarray(out_mean, dtype=np.float32)
        self.out_std = np.asarray(out_std, dtype=np.float32)
        self.w1 = np.asarray(w1, dtype=np.float32)
        self.b1 = np.asarray(b1, dtype=np.float32)
        self.w2 = np.asarray(w2, dtype=np.float32)
        self.b2 = np.asarray(b2, dtype=np.float32)

    # -- raw forward: params vector -> (mtov, R(x) [km], loglam(x)) ---------
    def forward(self, theta):
        x = (jnp.asarray(theta) - self.p_mins) / (self.p_maxs - self.p_mins)
        h = jnp.tanh(x @ self.w1 + self.b1)
        out = h @ self.w2 + self.b2
        out = out * self.out_std + self.out_mean
        n_x = len(self.x_grid)
        return out[0], out[1:1 + n_x], out[1 + n_x:]

    # -- conversion step (drop-in beside TabulatedEOSSet) -------------------
    def __call__(self, parameters):
        """Add TOV_mass / R_14 / radius_i / lambda_i from the sampled
        nuclear parameters (reference ``EoSConverter('emulated')``)."""
        p = dict(parameters)
        theta = jnp.stack([jnp.asarray(p[k]) for k in self.param_names])
        mtov, radii, loglam = self.forward(theta)
        p["TOV_mass"] = mtov
        grid = jnp.asarray(self.x_grid)
        # no NS of that mass exists when MTOV < 1.4 (1.6): 0.0, the
        # SAME convention as TabulatedEOSSet / the reference's
        # np.interp(..., right=0) — a NaN here flows through
        # bns_log10_disk_mass into NaN light curves and auto-rejects
        # configurations the reference evaluates finitely
        p["R_14"] = jnp.where(mtov >= 1.4,
                              jnp.interp(1.4 / mtov, grid, radii), 0.0)
        p["R_16"] = jnp.where(mtov >= 1.6,
                              jnp.interp(1.6 / mtov, grid, radii), 0.0)
        p["TOV_radius"] = radii[-1]
        if "mass_1_source" in p:
            for i in (1, 2):
                m = jnp.asarray(p[f"mass_{i}_source"])
                x = m / mtov
                ns = x <= 1.0
                r = jnp.interp(jnp.clip(x, grid[0], 1.0), grid, radii)
                lam = jnp.exp(jnp.interp(jnp.clip(x, grid[0], 1.0), grid,
                                         loglam))
                # beyond MTOV the object is a BH
                p.setdefault(f"radius_{i}", jnp.where(ns, r, 0.0))
                p.setdefault(f"lambda_{i}", jnp.where(ns, lam, 0.0))
        return p

    def save(self, path):
        np.savez_compressed(
            path, param_names=np.asarray(self.param_names),
            p_mins=self.p_mins, p_maxs=self.p_maxs, x_grid=self.x_grid,
            out_mean=self.out_mean, out_std=self.out_std, w1=self.w1,
            b1=self.b1, w2=self.w2, b2=self.b2)

    @classmethod
    def load(cls, path):
        z = np.load(path)
        return cls([str(s) for s in z["param_names"]], z["p_mins"],
                   z["p_maxs"], z["x_grid"], z["out_mean"], z["out_std"],
                   z["w1"], z["b1"], z["w2"], z["b2"])


def _macro_targets(s0, l_sym, crust_table, x_grid, **nep_kwargs):
    """One EOS -> (mtov, R(x), loglam(x)) via the real TOV kernel."""
    from .generation import nep_eos_table
    from .tov import construct_family

    eos = nep_eos_table(s0, l_sym, crust_table, **nep_kwargs)
    r, m, lam, _ = construct_family(eos, n_points=48)
    r, m, lam = map(np.asarray, (r, m, lam))
    # stable NS branch only
    good = (r > 6.0) & (r < 25.0) & (m > 0.1)
    r, m, lam = r[good], m[good], lam[good]
    imax = int(np.argmax(m))
    r, m, lam = r[:imax + 1], m[:imax + 1], lam[:imax + 1]
    order = np.argsort(m)
    r, m, lam = r[order], m[order], lam[order]
    mtov = m[-1]
    x = m / mtov
    radii = np.interp(x_grid, x, r)
    loglam = np.interp(x_grid, x, np.log(np.maximum(lam, 1e-8)))
    return mtov, radii, loglam


def train_tov_emulator(crust_table, param_ranges=None, n_train=128,
                       hidden=64, n_epochs=4000, learning_rate=2e-3,
                       seed=0, x_grid=_X_GRID, verbose=False,
                       **nep_kwargs):
    """Fit a :class:`TOVEmulator` on NEP-generated EOS solved with the
    real TOV kernel. ``param_ranges``: {name: (lo, hi)} over the NEP
    parameters (default: S0 in [28, 36] MeV, L in [30, 90] MeV)."""
    if param_ranges is None:
        param_ranges = {"S0": (28.0, 36.0), "L": (30.0, 90.0)}
    names = list(param_ranges)
    lows = np.array([param_ranges[k][0] for k in names])
    highs = np.array([param_ranges[k][1] for k in names])

    if "S0" not in param_ranges or "L" not in param_ranges:
        raise ValueError(
            f"param_ranges must include 'S0' and 'L' (got "
            f"{sorted(param_ranges)})")
    # any further sampled parameters are forwarded BY NAME to the NEP
    # expansion (positional *th unpacking silently swapped S0/L for
    # differently-ordered dicts and dropped extra parameters entirely)
    from inspect import signature

    from .generation import eos_from_nep
    extra_names = [k for k in names if k not in ("S0", "L")]
    allowed = set(signature(eos_from_nep).parameters)
    unknown = [k for k in extra_names if k not in allowed]
    if unknown:
        raise ValueError(
            f"unknown NEP parameter(s) {unknown}; eos_from_nep accepts "
            f"{sorted(allowed)}")

    rng = np.random.default_rng(seed)
    thetas = rng.uniform(lows, highs, (n_train, len(names)))
    targets = []
    keep = []
    for i, th in enumerate(thetas):
        sampled = dict(zip(names, th))
        kw = dict(nep_kwargs)
        kw.update({k: sampled[k] for k in extra_names})
        try:
            mtov, radii, loglam = _macro_targets(
                sampled["S0"], sampled["L"], crust_table, x_grid, **kw)
        except Exception:
            continue
        if not (1.2 < mtov < 3.5) or not np.all(np.isfinite(radii)):
            continue
        targets.append(np.concatenate([[mtov], radii, loglam]))
        keep.append(i)
    thetas = thetas[keep]
    targets = np.asarray(targets, dtype=np.float64)
    if len(targets) < 16:
        raise RuntimeError("too few physical training EOS")

    t_mean = targets.mean(axis=0)
    t_std = targets.std(axis=0) + 1e-8
    y = jnp.asarray((targets - t_mean) / t_std, dtype=jnp.float32)
    x_in = jnp.asarray((thetas - lows) / (highs - lows), dtype=jnp.float32)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    dim_in, dim_out = x_in.shape[1], y.shape[1]
    params = {
        "w1": jax.random.normal(k1, (dim_in, hidden)) / np.sqrt(dim_in),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, dim_out)) / np.sqrt(hidden),
        "b2": jnp.zeros(dim_out),
    }

    import optax
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def loss_fn(p):
        h = jnp.tanh(x_in @ p["w1"] + p["b1"])
        pred = h @ p["w2"] + p["b2"]
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def run_block(params, opt_state):
        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=500)
        return params, opt_state, losses[-1]

    done = 0
    while done < n_epochs:
        params, opt_state, loss = run_block(params, opt_state)
        done += 500
        if verbose:
            print(f"emulator epoch {done:5d} mse {float(loss):.5f}")

    return TOVEmulator(names, lows, highs, x_grid, t_mean, t_std,
                       np.asarray(params["w1"]), np.asarray(params["b1"]),
                       np.asarray(params["w2"]), np.asarray(params["b2"]))
