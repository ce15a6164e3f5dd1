"""Speed-of-sound (CSE) high-density EOS extension.

Counterpart of ``EOS_with_CSE`` (``nmma/eos/eos_gen.py:68-262``): a
low-density (n, p, e) table is extended from ``n_connect`` to ``n_lim``
by drawing a piecewise-linear speed-of-sound curve cs2(n) and integrating

    dlog p / dlog n = cs2(n) (e/p + 1)
    dlog e / dlog n = 1 + p/e

in log-space. The reference integrates each draw with an adaptive DOP853
``solve_ivp`` in a Python loop; here the integrator is a fixed-grid RK4
``lax.scan`` that is jitted once and ``vmap``-ed over a whole batch of
cs2 draws, so an EOS *family* is produced in one XLA program.

Node-draw semantics follow the reference's 'peter' scheme
(eos_gen.py:140-166): sequential uniform node positions with spacing
capped at 1.5 * range / N_seg, uniform cs2 values in (0, cs2_limit),
first node pinned to (n_connect, cs2 at the connection point of the
low-density table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def connection_state(n_low, p_low, e_low, n_connect):
    """(p, e, cs2) of the low-density table at ``n_connect``.

    Log-log linear interpolation; cs2 = dp/de from the local log-slope
    (the reference uses a cubic-spline derivative, eos_gen.py:118-124).
    """
    if not (n_low[0] <= n_connect <= n_low[-1]):
        raise ValueError(
            f"n_connect={n_connect} outside the low-density table range "
            f"[{n_low[0]:.3g}, {n_low[-1]:.3g}] fm^-3")
    ln_n, ln_p, ln_e = np.log(n_low), np.log(p_low), np.log(e_low)
    x = np.log(n_connect)
    p_c = np.exp(np.interp(x, ln_n, ln_p))
    e_c = np.exp(np.interp(x, ln_n, ln_e))
    # local dlogp/dloge around the connection density
    i = np.clip(np.searchsorted(ln_n, x), 1, len(ln_n) - 1)
    dlogp_dloge = (ln_p[i] - ln_p[i - 1]) / (ln_e[i] - ln_e[i - 1])
    cs2_c = p_c / e_c * dlogp_dloge
    return float(p_c), float(e_c), float(cs2_c)


def draw_cs2_nodes(seed, n_connect, n_lim, cs2_at_connect, n_seg=5,
                   cs2_limit=1.0, n_draws=1):
    """[B, N_seg+2, 2] arrays of (n, cs2) nodes, 'peter' scheme."""
    if n_lim <= n_connect:
        raise ValueError(f"n_lim={n_lim} must exceed n_connect={n_connect}")
    rng = np.random.default_rng(seed)
    extend = n_lim - n_connect
    nodes = np.empty((n_draws, n_seg + 2, 2))
    nodes[:, 0] = [n_connect, cs2_at_connect]
    for b in range(n_draws):
        for k in range(1, n_seg + 1):
            lo = nodes[b, k - 1, 0]
            hi = min(lo + 1.5 * extend / n_seg, n_lim)
            nodes[b, k] = [rng.uniform(lo, hi), rng.uniform(0.0, cs2_limit)]
        nodes[b, -1] = [n_lim, rng.uniform(0.0, cs2_limit)]
    return nodes


def cse_extend(cs2_nodes, p_connect, e_connect, n_connect, n_lim,
               n_points=512):
    """Integrate one cs2 draw: -> (n_high, p_high, e_high) [n_points].

    Pure/jittable; ``jax.vmap`` over the leading axis of ``cs2_nodes``
    (and p/e_connect if they vary) extends a whole family at once.
    """
    ln0 = jnp.log(n_connect)
    ln1 = jnp.log(n_lim)
    lns = ln0 + (ln1 - ln0) * jnp.arange(n_points) / (n_points - 1)
    h = (ln1 - ln0) / (n_points - 1)
    node_n = cs2_nodes[:, 0]
    node_v = cs2_nodes[:, 1]

    def cs2(ln):
        return jnp.interp(jnp.exp(ln), node_n, node_v)

    def deriv(ln, y):
        logp, loge = y
        r = jnp.exp(loge - logp)            # e/p
        return jnp.stack([cs2(ln) * (r + 1.0), 1.0 + 1.0 / r])

    def rk4(y, ln):
        k1 = deriv(ln, y)
        k2 = deriv(ln + 0.5 * h, y + 0.5 * h * k1)
        k3 = deriv(ln + 0.5 * h, y + 0.5 * h * k2)
        k4 = deriv(ln + h, y + h * k3)
        y_next = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return y_next, y

    y0 = jnp.stack([jnp.log(p_connect), jnp.log(e_connect)])
    _, ys = jax.lax.scan(rk4, y0, lns)
    return jnp.exp(lns), jnp.exp(ys[:, 0]), jnp.exp(ys[:, 1])


_cse_extend_batch = jax.jit(
    jax.vmap(cse_extend, in_axes=(0, None, None, None, None, None)),
    static_argnums=(5,))


def cse_eos_family(low_density_eos, n_connect=0.16, n_lim=2.0, n_seg=5,
                   cs2_limit=1.0, seed=42, n_draws=1, n_points=512):
    """Draw + integrate a family of CSE-extended EOS tables.

    low_density_eos: dict with 'n', 'p', 'e' arrays (fm^-3, MeV fm^-3),
    the reference's input convention (eos_gen.py:84-93). Returns a list
    of ``EOSTable`` (crust rows below n_connect + integrated extension),
    all draws integrated in one vmapped XLA call.
    """
    from .eos import EOSTable

    n_low = np.asarray(low_density_eos["n"], dtype=np.float64)
    p_low = np.asarray(low_density_eos["p"], dtype=np.float64)
    e_low = np.asarray(low_density_eos["e"], dtype=np.float64)
    p_c, e_c, cs2_c = connection_state(n_low, p_low, e_low, n_connect)

    nodes = draw_cs2_nodes(seed, n_connect, n_lim, cs2_c, n_seg=n_seg,
                           cs2_limit=cs2_limit, n_draws=n_draws)
    n_hi, p_hi, e_hi = _cse_extend_batch(
        jnp.asarray(nodes), p_c, e_c, float(n_connect), float(n_lim),
        int(n_points))
    n_hi, p_hi, e_hi = (np.asarray(n_hi, dtype=np.float64),
                        np.asarray(p_hi, dtype=np.float64),
                        np.asarray(e_hi, dtype=np.float64))

    keep = n_low < n_connect
    tables = []
    for b in range(n_draws):
        n = np.concatenate([n_low[keep], n_hi[b]])
        p = np.concatenate([p_low[keep], p_hi[b]])
        e = np.concatenate([e_low[keep], e_hi[b]])
        tables.append(EOSTable(energy_density=e, pressure=p,
                               number_density=n))
    return tables


def mixed_low_density_eos(soft, stiff, alpha=None, seed=42):
    """Convex soft/stiff crust mixture (eos_gen.py:95-117).

    alpha=None draws Uniform(0,1) with the given seed, matching the
    reference; tables must share the same density grid.
    """
    if alpha is None:
        alpha = float(np.random.default_rng(seed).uniform())
    n = np.asarray(soft["n"], dtype=np.float64)
    e_soft = np.asarray(soft["e"], dtype=np.float64)
    p_soft = np.asarray(soft["p"], dtype=np.float64)
    e = e_soft + alpha * (np.asarray(stiff["e"]) - e_soft)
    p = p_soft + alpha * (np.asarray(stiff["p"]) - p_soft)
    return {"n": n, "p": p, "e": e}
