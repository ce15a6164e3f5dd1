"""Pallas SVD-surrogate kernel: interpret-mode parity vs the XLA rank-C
eval (the kernel keeps the [B, F, H] hidden activations in VMEM; the
math is identical — see ops/pallas_svd.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmma_tpu.models.svd import SVDModelData, _SVDFastEval
from nmma_tpu.ops.pallas_svd import TILE_B, svd_surrogate_mags_pallas

ART = "artifacts/Bu2019lm_production_svd.npz"


def _rankc_reference(ev, x, va_q, off_q):
    xb = jnp.broadcast_to(jnp.asarray(x)[None], (ev.F,) + x.shape)
    hid = jax.nn.relu(jnp.einsum("fbp,fph->fbh", xb, ev._w1_stack)
                      + ev._b1_stack[:, None, :])
    c = jnp.einsum("fbh,fhc->fbc", hid, ev._w2c) + ev._b2c[:, None, :]
    m = jnp.einsum("fbc,fcq->fbq", c, va_q) + off_q[:, None, :]
    return np.asarray(m).transpose(1, 0, 2)


@pytest.mark.parametrize("batch", [1, TILE_B, 200])
def test_interpret_parity_production_dims(batch):
    ev = _SVDFastEval(SVDModelData.load(ART))
    t_days = np.geomspace(0.3, 12.0, 150)
    va_q, off_q, _ = ev.operator_rankc(t_days)
    rng = np.random.default_rng(batch)
    x = rng.uniform(0.0, 1.0, (batch, ev._w1_stack.shape[1])).astype(
        np.float32)
    got = np.asarray(svd_surrogate_mags_pallas(
        jnp.asarray(x), ev._w1_stack, ev._b1_stack, ev._w2c, ev._b2c,
        va_q, off_q, interpret=True))
    want = _rankc_reference(ev, x, va_q, off_q)
    assert got.shape == (batch, ev.F, 150)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_q_not_lane_multiple():
    """Q=40 (the AT2017gfo obs-grid scale) pads to 128 internally and
    slices back exactly."""
    ev = _SVDFastEval(SVDModelData.load(ART))
    t_days = np.geomspace(0.3, 12.0, 40)
    va_q, off_q, _ = ev.operator_rankc(t_days)
    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (64, ev._w1_stack.shape[1])).astype(
        np.float32)
    got = np.asarray(svd_surrogate_mags_pallas(
        jnp.asarray(x), ev._w1_stack, ev._b1_stack, ev._w2c, ev._b2c,
        va_q, off_q, interpret=True))
    want = _rankc_reference(ev, x, va_q, off_q)
    assert got.shape == (64, ev.F, 40)
    np.testing.assert_allclose(got, want, atol=1e-4)
