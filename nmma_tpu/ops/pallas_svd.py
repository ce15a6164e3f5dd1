"""Pallas TPU kernel for the batched SVD-surrogate evaluation.

The XLA rank-C path (``models/svd.py``) still materializes the hidden
activations ``[B, F, H]`` in HBM — 36 MiB per 512-batch at production
dims (H=2048), the dominant buffer in the compiled headline-bench HLO.
This kernel keeps the whole MLP chain in VMEM: each program owns a
[TILE_B] tile of the live-point batch and, per filter, computes

    hid  = relu(x . W1[f] + b1[f])          [TILE_B, H]   (VMEM scratch)
    c    = hid . W2[f]^T + b2[f]            [TILE_B, C]
    mags = c . VAq[f] + off[f]              [TILE_B, Qp]

so only the [B, F, Q] magnitudes ever leave the chip (~25x less HBM
traffic than the XLA form at the headline dims). Weight operands use
constant block specs (fetched once, not per grid step). One fixed
TILE_B for all batch sizes keeps it at a single Mosaic compile per
process (same policy as ops/pallas_me2017.py / ops/pallas_grb.py).

Counterpart of the reference's per-filter keras ``model(x)`` hot loop
(nmma/em/lightcurve_generation.py:196-198) at production surrogate dims
(nmma/em/training.py:336-397).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128


def _svd_eval_kernel(x_ref, w1_ref, b1_ref, w2t_ref, b2_ref, vaq_ref,
                     off_ref, out_ref):
    """One batch tile: x [TILE_B, P_pad] -> mags [TILE_B, F * Qp]."""
    n_f, _, _ = w1_ref.shape
    qp = vaq_ref.shape[2]
    x = x_ref[:, :]
    for f in range(n_f):  # static unroll: F is small (# filters)
        hid = jax.lax.dot_general(
            x, w1_ref[f], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [TB, H]
        hid = jnp.maximum(hid + b1_ref[f, :][None, :], 0.0)
        c = jax.lax.dot_general(
            hid, w2t_ref[f], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [TB, C]
        c = c + b2_ref[f, :][None, :]
        mags = jax.lax.dot_general(
            c, vaq_ref[f], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [TB, Qp]
        out_ref[:, f * qp:(f + 1) * qp] = mags + off_ref[f, :][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def svd_surrogate_mags_pallas(x, w1, b1, w2c, b2, va_q, off_q,
                              interpret=False):
    """Batched surrogate mags [B, F, Q] via the Pallas kernel.

    x [B, P] normalized inputs; w1 [F, P, H]; b1 [F, H]; w2c [F, H, C];
    b2 [F, C]; va_q [F, C, Q] (denorm + interp folded, models/svd.py
    ``operator_rankc``); off_q [F, Q].
    """
    b, p = x.shape
    n_f, _, h = w1.shape
    c_dim = w2c.shape[2]
    q = va_q.shape[2]
    p_pad = max(8, -(-p // 8) * 8)
    q_pad = -(-q // 128) * 128
    b_pad = -(-b // TILE_B) * TILE_B

    x_p = jnp.zeros((b_pad, p_pad), jnp.float32).at[:b, :p].set(x)
    w1_p = jnp.zeros((n_f, p_pad, h), jnp.float32).at[:, :p, :].set(w1)
    # W2 transposed so the contraction reads [C, H] rows (sublane dim C
    # pads to 16 instead of carrying a [H, 128]-padded lane dim)
    w2t = jnp.transpose(jnp.asarray(w2c, jnp.float32), (0, 2, 1))
    vaq_p = jnp.zeros((n_f, c_dim, q_pad),
                      jnp.float32).at[:, :, :q].set(va_q)
    off_p = jnp.zeros((n_f, q_pad), jnp.float32).at[:, :q].set(off_q)

    out = pl.pallas_call(
        _svd_eval_kernel,
        grid=(b_pad // TILE_B,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((TILE_B, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, p_pad, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, c_dim, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, c_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, c_dim, q_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_f, q_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, n_f * q_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_f * q_pad), jnp.float32),
    )(x_p, w1_p, jnp.asarray(b1, jnp.float32), w2t,
      jnp.asarray(b2, jnp.float32), vaq_p, off_p)
    return out.reshape(b_pad, n_f, q_pad)[:b, :, :q]
