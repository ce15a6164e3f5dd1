"""Pallas TPU kernel for the GRB EATS resampling + synchrotron stage.

The XLA formulation (``models/grb.py`` ``_eats_stage2_xla``) builds a
[T, R] hat-basis matrix per surface element; XLA's algebraic simplifier
pattern-matches the multiply+reduce into an MXU dot, which forces every
hat matrix out to HBM — ~19 GB of traffic per 256-theta batch. This
kernel keeps each hat matrix entirely in VMEM: each program owns one
(live point, theta ring) pair, processes all phi samples as one
[Ph*T, R] block, contracts the hat against the five log-space dynamical
tracks on the VPU (f32 accumulate — no bf16 MXU precision loss),
applies the Doppler/synchrotron flux math, and reduces the phi sum.
Only the tiny [T, F] per-ring flux leaves the chip.

**Measured on the v5e (2026-08-18, B=256, T=64, F=2, trumpet
default): XLA 69.7 ms vs Pallas 177 ms** — the MXU dot amortizes the
HBM round-trips better than the VPU elementwise form despite the 25x
traffic. (The first, serialized per-phi variant measured 640 ms; the
batched-phi rewrite recovered 3.6x but not the lead.) The kernel is
therefore OPT-IN via ``NMMA_TPU_GRB_PALLAS=1``; the XLA hat
contraction is the default, mirroring the SVD-kernel decision
(ops/pallas_svd.py). On-device parity 3.9e-4 relative.

The arrival-time map log t_obs(R) (with the trumpet-spreading cummax,
which Mosaic has no cheap primitive for) is precomputed by XLA in
B-chunks of 128 so the [B, Th, Ph, R] tensor stays ~150 MB.

Physics identical to ``_eats_stage2_xla`` (reference model:
afterglowpy's EATS integration, nmma/em/lightcurve_generation.py:221-280
via Ryan et al. 2020); parity pinned by tests/test_pallas_grb.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import c_cgs

_CHUNK_B = 128


def _eats_kernel(scal_ref, cphi_ref, lq_ref, nu_ref, logt_ref, tracks_ref,
                 out_ref):
    """One (live point, theta-ring block): phi-summed flux [RB, T, F_pad].

    The ring axis is blocked (RB rings per program, statically
    unrolled). Blocking was tried as an attack on per-program overhead
    of the 12k-program (1 ring/program) form; the measurement refuted
    that hypothesis (see eats_flux_pallas) — the blocked form is kept
    because it is no slower and halves the program count.

    All phi samples are processed as ONE [Ph*T, R] block — a serialized
    per-phi loop with a loop-carried accumulator starves the VPU (measured
    640 ms vs 91 ms XLA per 128-chunk); the batched form exposes the full
    [Ph*T, R] elementwise surface to Mosaic's vectorizer and unrolls the
    five track contractions statically.

    Blocks: scal (chunk, 8) SMEM whole-array (row = program_id 0; a
    (1, 8) block of a (chunk, 8) array violates Mosaic's sublane tiling
    on real TPUs); cphi (2 Ph, 128) VMEM shared (rows 0..Ph-1 cos phi,
    rows Ph..2Ph-1 quadrature weights, broadcast over lanes); lq (T, R)
    VMEM shared (log_q broadcast over lanes); nu (8, F_pad) VMEM shared
    (row 0 = observed frequencies, padded with 1.0); logt (1, 1, Ph, R)
    VMEM; tracks (1, 1, R, 8) VMEM pre-transposed for the MXU dot
    (lanes 0-4 = log gamma/nu_m'/nu_c'/em50/theta, lane 5 = ones for
    the hat row sum, lanes 6-7 zero); out (1, 1, T, F_pad) VMEM.
    """
    n_phi = logt_ref.shape[3]
    n_t = lq_ref.shape[0]
    f_pad = out_ref.shape[4]
    ring_block = logt_ref.shape[2]
    pt = n_phi * n_t

    i = pl.program_id(0)
    z = scal_ref[i, 0]
    cos_tv = scal_ref[i, 1]
    sin_tv = scal_ref[i, 2]
    p = scal_ref[i, 3]
    theta_v = scal_ref[i, 4]

    lq3 = lq_ref[:, :][None, :, :]                      # [1, T, R]
    nu_row = nu_ref[0:1, :]                             # [1, F_pad]
    one_p_z = 1.0 + z

    cphi_el = jnp.broadcast_to(
        cphi_ref[0:n_phi, 0:1][:, None, :], (n_phi, n_t, 1)).reshape(pt, 1)
    w_el = jnp.broadcast_to(
        cphi_ref[n_phi:2 * n_phi, 0:1][:, None, :],
        (n_phi, n_t, 1)).reshape(pt, 1)
    third = jnp.float32(1.0 / 3.0)
    e_mid = -(p - 1.0) / 2.0
    e_hi = -p / 2.0

    for k in range(ring_block):                         # static unroll
        lt = logt_ref[0, 0, k, :, :]                    # [Ph, R]
        x_l = jnp.concatenate([lt[:, :1], lt[:, :-1]], axis=1)
        x_r = jnp.concatenate([lt[:, 1:], lt[:, -1:]], axis=1)
        inv_dl = (1.0 / jnp.maximum(lt - x_l, 1e-12))[:, None, :]
        inv_dr = (1.0 / jnp.maximum(x_r - lt, 1e-12))[:, None, :]
        x_l3 = x_l[:, None, :]                          # [Ph, 1, R]
        x_r3 = x_r[:, None, :]
        up = (lq3 - x_l3) * inv_dl                      # [Ph, T, R]
        dn = (x_r3 - lq3) * inv_dr
        hat = jnp.clip(jnp.minimum(up, dn), 0.0, 1.0).reshape(
            pt, lt.shape[1])

        # ONE MXU dot replaces the round-3 kernel's seven VPU lane
        # reductions (5 track contractions + hat-sum + in-range max),
        # the measured bottleneck (260 ms vs 72 ms XLA at B=256):
        # tracks arrive pre-transposed as [R, 8] with lane 5 = ones,
        # so raw[:, 5] is the hat row sum — both the convex-combination
        # denominator (duplicate cummax-plateau nodes each claim
        # weight 1) and the in-range test (out-of-range rows have an
        # ALL-ZERO hat: lq < lt[0] makes every up <= 0, lq > lt[-1]
        # every dn <= 0; in-range rows sum >= 1).
        raw = jnp.dot(hat, tracks_ref[0, 0, k],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [Ph*T, 8]
        hat_sum = raw[:, 5:6]
        inv_denom = 1.0 / jnp.maximum(hat_sum, 1.0)
        in_r = hat_sum > 0.5

        g = jnp.exp(raw[:, 0:1] * inv_denom)
        num = jnp.exp(raw[:, 1:2] * inv_denom)
        nuc = jnp.exp(raw[:, 2:3] * inv_denom)
        em50 = jnp.where(in_r, jnp.exp(raw[:, 3:4] * inv_denom), 0.0)
        th_t = jnp.exp(raw[:, 4:5] * inv_denom)

        # stable 1 - mu (see models/grb.py one_minus_mu)
        omm = (2.0 * jnp.sin(0.5 * (theta_v - th_t)) ** 2
               + sin_tv * jnp.sin(th_t) * (1.0 - cphi_el))
        u2 = jnp.maximum(g * g - 1.0, 1e-12)
        u = jnp.sqrt(u2)
        be = u / g
        one_m_be = 1.0 / (g * g * (1.0 + be))
        a_fac = one_m_be + be * omm                     # 1 - beta mu
        inv_gd = g * a_fac                              # 1 / doppler
        s_sh = jnp.sqrt(1.0 + 1.0 / u2)
        one_m_bs = (3.0 - 4.0 / (s_sh + 1.0)) / (4.0 * u2 + 3.0)
        ashock = one_m_bs + (1.0 - one_m_bs) * omm      # 1 - beta_sh mu

        nu_prime = nu_row * (one_p_z * inv_gd)          # [Ph*T, F]
        # broken power-law synchrotron spectrum (SPN98), slow + fast
        # cooling — identical branch structure to _synchrotron_shape;
        # power() spelled exp(e log x) (operands strictly positive)
        l_nu = jnp.log(nu_prime)
        l_num = jnp.log(num)
        l_nuc = jnp.log(nuc)
        slow = jnp.where(
            nu_prime < num,
            jnp.exp(third * (l_nu - l_num)),
            jnp.where(nu_prime < nuc,
                      jnp.exp(e_mid * (l_nu - l_num)),
                      jnp.exp(e_mid * (l_nuc - l_num)
                              + e_hi * (l_nu - l_nuc))))
        fast = jnp.where(
            nu_prime < nuc,
            jnp.exp(third * (l_nu - l_nuc)),
            jnp.where(nu_prime < num,
                      jnp.exp(-0.5 * (l_nu - l_nuc)),
                      jnp.exp(-0.5 * (l_num - l_nuc)
                              + e_hi * (l_nu - l_num))))
        shape = jnp.where(num <= nuc, slow, fast)       # [Ph*T, F]
        # (1+z) delta^2 em50 shape / (1 - mu beta_sh): the optically-
        # thin EATS volume integrand (see models/grb.py element_flux),
        # times the phi quadrature weight (Gauss-Legendre by default)
        flux = (w_el * one_p_z * em50 / (inv_gd * inv_gd * ashock)) * shape
        out_ref[0, 0, k, :, :] = jnp.sum(
            flux.reshape(n_phi, n_t, f_pad), axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def eats_flux_pallas(t_delay, log_tracks, r_grid, scal, log_q, cphi,
                     wphi, nu_obs, interpret=False):
    """Batched [B, Th, F, T] phi-summed EATS flux elements.

    t_delay [B, Th, R], log_tracks [B, 5, Th, R], r_grid [B, R],
    scal [B, 8] (z, cos theta_v, sin theta_v, p, theta_v), log_q [T],
    cphi/wphi [Ph] (phi-quadrature nodes' cosines and weights),
    nu_obs [F]. R must be a lane multiple (128); T a sublane
    multiple (8) — the dispatch in models/grb.py guarantees both.
    """
    b, n_theta, n_r = t_delay.shape
    n_t = log_q.shape[0]
    n_phi = cphi.shape[0]
    n_f = nu_obs.shape[0]
    f_pad = max(8, ((n_f + 7) // 8) * 8)

    # fixed chunk regardless of B: every batch size then lowers to the
    # same (128, Th) kernel shape, so a process pays exactly one Mosaic
    # compile (cold Mosaic compiles on the remote toolchain have been
    # observed at minutes; see BENCHMARKS.md). The interpreter (CPU
    # parity tests) gets a small chunk — padding waste there is pure
    # test wall-clock.
    chunk = _CHUNK_B if not interpret else min(8, _CHUNK_B)
    pad_b = (-b) % chunk
    bp = b + pad_b
    nc = bp // chunk

    # theta rings per program, statically unrolled. Measured on the
    # v5e (B=256): RB=8 OOMs scoped VMEM (45.4 MB vs the 16 MB stack
    # limit), RB=2 fits but lands at 204 ms vs 195 ms for RB=1 — i.e.
    # per-program overhead was NOT the wall. The kernel is bound by
    # the per-ring [Ph*T, R]x[R, 8] dot (8 of 128 MXU result lanes
    # used) plus the VPU hat build; the XLA path wins (21.9 ms) by
    # batching the hat contraction across all rings and live points
    # into one large bf16 einsum. Documented negative result: the
    # Pallas form stays opt-in, default ring block 2 (largest that
    # cannot OOM).
    rb_want = int(os.environ.get("NMMA_TPU_GRB_RING_BLOCK", "2"))
    ring_block = max(k for k in range(1, min(rb_want, n_theta) + 1)
                     if n_theta % k == 0)

    def pad0(x):
        return jnp.pad(x, ((0, pad_b),) + ((0, 0),) * (x.ndim - 1))

    t_delay_p = pad0(t_delay).reshape(nc, chunk, n_theta, n_r)
    tracks_p = pad0(log_tracks).reshape(nc, chunk, 5, n_theta, n_r)
    r_grid_p = pad0(r_grid).reshape(nc, chunk, n_r)
    scal_p = pad0(scal).reshape(nc, chunk, 8)

    lq2d = jnp.broadcast_to(log_q[:, None].astype(jnp.float32),
                            (n_t, n_r))
    cphi2d = cphi[None, :].astype(jnp.float32)                  # [1, Ph]
    # lane-broadcast copy for the kernel (VMEM column reads; SMEM holds
    # scalars only and per-element SMEM reads in a batched-phi kernel
    # would serialize): rows 0..Ph-1 = cos phi, rows Ph..2Ph-1 = weights
    cphi_v = jnp.concatenate([
        jnp.broadcast_to(cphi[:, None].astype(jnp.float32), (n_phi, 128)),
        jnp.broadcast_to(wphi[:, None].astype(jnp.float32), (n_phi, 128)),
    ], axis=0)                                          # [2 Ph, 128]
    nu_pad = jnp.ones((8, f_pad), jnp.float32)
    nu_pad = nu_pad.at[0, :n_f].set(nu_obs.astype(jnp.float32))

    def chunk_fn(args):
        t_del, trk, rg, sc = args
        # arrival-time map (trumpet geometry + cummax) built by XLA:
        # [C, Th, Ph, R] is ~150 MB at chunk 128 — bounded and fused
        th_r = jnp.exp(trk[:, 4])                       # [C, Th, R]
        tv = sc[:, 4, None, None, None]
        # stable 1 - mu (see models/grb.py one_minus_mu)
        omm_r = (2.0 * jnp.sin(0.5 * (tv - th_r[:, :, None, :])) ** 2
                 + sc[:, 2, None, None, None] * jnp.sin(th_r)[:, :, None, :]
                 * (1.0 - cphi2d[0][None, None, :, None]))  # [C, Th, Ph, R]
        t_obs = ((1.0 + sc[:, 0, None, None, None])
                 * (t_del[:, :, None, :]
                    + omm_r * rg[:, None, None, :] / c_cgs))
        log_t3 = jnp.minimum(
            jax.lax.cummax(jnp.log(jnp.maximum(t_obs, 1e-10)), axis=3),
            60.0)
        # tracks pre-transposed to [R, 8] per (point, ring) — the MXU
        # dot's RHS — with lane 5 = ones (hat row sums, see kernel)
        trk8 = jnp.concatenate(
            [jnp.transpose(trk, (0, 2, 3, 1)),
             jnp.ones((chunk, n_theta, n_r, 1), trk.dtype),
             jnp.zeros((chunk, n_theta, n_r, 2), trk.dtype)],
            axis=3)                                     # [C, Th, R, 8]
        # logt/tracks reshaped so the ring-block is a leading block dim:
        # [C, Th/RB, RB, Ph, R] and [C, Th/RB, RB, R, 8]
        n_jb = n_theta // ring_block
        log_t3 = log_t3.reshape(chunk, n_jb, ring_block, n_phi, n_r)
        trk8 = trk8.reshape(chunk, n_jb, ring_block, n_r, 8)
        out = pl.pallas_call(
            _eats_kernel,
            grid=(chunk, n_jb),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((chunk, 8), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2 * n_phi, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_t, n_r), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, f_pad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ring_block, n_phi, n_r),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ring_block, n_r, 8),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, ring_block, n_t, f_pad),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (chunk, n_jb, ring_block, n_t, f_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                # both grid axes are independent programs: lets Mosaic
                # overlap the per-program DMAs instead of serializing
                # the pipeline stages
                dimension_semantics=("parallel", "parallel")),
        )(sc, cphi_v, lq2d, nu_pad, log_t3, trk8)
        return out.reshape(chunk, n_theta, n_t, f_pad)

    outs = jax.lax.map(chunk_fn, (t_delay_p, tracks_p, r_grid_p, scal_p))
    out = outs.reshape(bp, n_theta, n_t, f_pad)[:b, :, :, :n_f]
    return jnp.transpose(out, (0, 1, 3, 2))             # [B, Th, F, T]
