"""Pallas TPU kernel for the Me2017 shell dynamics.

The XLA formulation (``models/kilonova.py``) materializes [B, T, S]
coefficient tensors in HBM for the associative scan. This kernel keeps the
entire shell state in VMEM: each program owns a tile of the live-point
batch, builds its [TILE_B, S] shell arrays once, and Euler-steps the
energies through all T time steps on-chip, emitting only the [TILE_B, T]
luminosity and photospheric-radius tracks — an O(T*S/ (T+S)) reduction in
HBM traffic for the hot likelihood path.

Physics identical to ``eff_metzger_lc`` (reference
nmma/em/lightcurve_generation.py:566-652); batch-independent time factors
(thermalisation, exp(-t/900), t^-1.3) are precomputed host-side and
prefetched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import c_cgs, msun_cgs, seconds_a_day

TILE_B = 128
S_PAD = 384          # 299 shells padded to a lane multiple
_MPREC = 300
_L_SCALE = 1e40


def _me2017_dynamics_kernel(tvec_ref, params_ref, xn0_ref, ltot_ref, rphoto_ref):
    n_t = tvec_ref.shape[1]
    log10_mej = params_ref[:, 0:1]
    log10_vej = params_ref[:, 1:2]
    beta = params_ref[:, 2:3]
    kappa_r = params_ref[:, 3:4]
    v0 = jnp.exp(jnp.log(10.0) * log10_vej) * c_cgs
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, S_PAD), 1).astype(jnp.float32)
    shell_ok = lane < (_MPREC - 1)
    frac = lane / (_MPREC - 1)
    log_m = -8.0 + (log10_mej + 8.0) * frac
    m = jnp.exp(jnp.log(10.0) * log_m)
    vm = v0 * jnp.exp((-1.0 / beta) * jnp.log(10.0) * (log_m - log10_mej))
    vm = jnp.minimum(vm, c_cgs)
    xn0 = xn0_ref[:, :]
    xr = 1.0 - xn0
    g_ratio = jnp.exp(jnp.log(10.0) * (log10_mej + 8.0) / (_MPREC - 1))
    dm = m * (g_ratio - 1.0)
    c_tdiff = 0.24 * msun_cgs / c_cgs / beta
    c_tau = msun_cgs / (4.0 * np.pi)
    inv_c = 1.0 / c_cgs
    msun_over_l = msun_cgs / _L_SCALE
    # loop-invariant hoists; padding lanes are pre-masked once (dm_eff=0
    # kills them in the luminosity sum, pad_penalty pushes them out of the
    # photosphere argmin) so the loop body carries no per-step where(ok)
    m_over_vm = m / vm
    m_over_vm2 = m / (vm * vm)
    dm_eff = jnp.where(shell_ok, dm * msun_over_l, 0.0)
    pad_penalty = jnp.where(shell_ok, 0.0, 1e30)

    def step(j, ene):
        t_j = tvec_ref[0, j]
        dt_j = tvec_ref[1, j]
        exp_tj = tvec_ref[2, j]
        edotr_j = tvec_ref[3, j]
        xn = xn0 * exp_tj
        edot = 3.2e14 * xn + edotr_j
        kappa = 0.4 * (1.0 - xn - xr) + kappa_r * xr
        tdiff = (c_tdiff / t_j) * kappa * m_over_vm
        denom = tdiff + (t_j * inv_c) * vm
        lum = ene / denom
        ltot = jnp.sum(lum * dm_eff, axis=1)
        tau = (c_tau / (t_j * t_j)) * kappa * m_over_vm2
        tau_dev = jnp.abs(tau - 1.0) + pad_penalty
        dev_min = jnp.min(tau_dev, axis=1, keepdims=True)
        # np.argmin's first-match rule: vm is monotone non-increasing in
        # lane, so the smallest tied lane carries the largest vm — a
        # single masked max replaces the lane-index tie-break reductions
        vm_pig = jnp.max(jnp.where(tau_dev <= dev_min, vm, 0.0), axis=1)
        ltot_ref[pl.ds(j, 1), :] = ltot[None, :]
        rphoto_ref[pl.ds(j, 1), :] = (vm_pig * t_j)[None, :]
        # same stability clamp as the XLA path (models/kilonova.py): the
        # Euler decay factor stays in [0, 1] so coarse grids relax
        # instead of diverging
        factor = jnp.clip(1.0 - dt_j / t_j - dt_j / denom, 0.0, 1.0)
        ene = factor * ene + dt_j * edot
        return ene

    ene0 = jnp.zeros((TILE_B, S_PAD), dtype=jnp.float32)
    ltot_ref[pl.ds(n_t - 1, 1), :] = jnp.zeros((1, TILE_B), jnp.float32)
    rphoto_ref[pl.ds(n_t - 1, 1), :] = jnp.zeros((1, TILE_B), jnp.float32)
    jax.lax.fori_loop(0, n_t - 1, step, ene0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def me2017_dynamics_pallas(log10_mej, log10_vej, beta, kappa_r, t_days,
                           interpret=False):
    """Batched (ltot40 [B, T], r_photo [B, T]) via the Pallas kernel.

    t_days must be a static (concrete) 1-D grid. Outputs are computed
    time-major ([T, B], dynamic sublane stores — Mosaic allows dynamic
    sublane indices but not dynamic lane indices) and transposed on the
    way out; the last time index is zero, matching the XLA
    associative-scan path and the reference (lightcurve_generation.py
    fills indices 0..T-2).
    """
    b = log10_mej.shape[0]
    n_t = t_days.shape[0]
    pad_b = (-b) % TILE_B
    params = jnp.stack([log10_mej, log10_vej, beta, kappa_r], axis=1)
    params = jnp.pad(params.astype(jnp.float32), ((0, pad_b), (0, 4)))
    bp = b + pad_b
    t_days = jnp.asarray(t_days, dtype=jnp.float32)
    t = t_days * seconds_a_day
    dt = jnp.diff(t)
    f = 2.0 * 0.17 * t_days ** 0.74
    eth = 0.36 * (jnp.exp(-0.56 * t_days) + jnp.log1p(f) / f)
    tvec = jnp.zeros((8, n_t), dtype=jnp.float32)
    tvec = tvec.at[0].set(t)
    tvec = tvec.at[1, :-1].set(dt)
    tvec = tvec.at[2].set(jnp.exp(-t / 900.0))
    tvec = tvec.at[3].set(2.1e10 * eth * t_days ** (-1.3))
    lane = jnp.arange(S_PAD, dtype=jnp.float32)
    log_m_full = -8.0 + (params[:, 0:1] + 8.0) * lane[None, :] / (_MPREC - 1)
    m_full = jnp.exp(jnp.log(10.0) * log_m_full)
    xn0_full = (0.8 * 2.0 / np.pi) * jnp.arctan(1e-8 / m_full)
    grid = (bp // TILE_B,)
    n_t_pad = ((n_t + 7) // 8) * 8
    ltot, rphoto = pl.pallas_call(
        _me2017_dynamics_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((8, n_t), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, S_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_t_pad, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_t_pad, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_t_pad, bp), jnp.float32),
            jax.ShapeDtypeStruct((n_t_pad, bp), jnp.float32),
        ],
    )(tvec, params, xn0_full)
    return ltot[:n_t, :b].T, rphoto[:n_t, :b].T


