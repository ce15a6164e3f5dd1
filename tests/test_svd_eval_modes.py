"""The three SVD fast-eval forms (dense / batched / rankc) are the same
operator in different contraction orders; they must agree to f32 noise.

rankc is the production-dims default: the output operator stays factored
through the C-dim SVD bottleneck (~10x fewer FLOPs at H=2048) and its
batched rule keeps activations in a [F, B, H] layout (no relayout
transposes in the compiled HLO — both were measured on the headline
bench, see models/svd.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.models.svd import SVDModelData, _SVDFastEval

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "Bu2019lm_production_svd.npz")


@pytest.fixture()
def svd():
    return SVDModelData.load(ART)


def _eval_mode(svd, mode, thetas, t_days):
    os.environ["NMMA_TPU_SVD_EVAL"] = mode
    try:
        ev = _SVDFastEval(svd)
        params = {p: jnp.asarray(thetas[:, i])
                  for i, p in enumerate(svd.parameter_names)}
        fn = jax.jit(jax.vmap(lambda pp: ev(pp, t_days)))
        return np.asarray(fn(params))
    finally:
        del os.environ["NMMA_TPU_SVD_EVAL"]


def test_eval_modes_agree(svd):
    t_days = np.geomspace(0.3, 12.0, 40)
    rng = np.random.default_rng(0)
    thetas = rng.uniform(svd.param_mins, svd.param_maxs,
                         (64, len(svd.param_mins))).astype(np.float32)
    ref = _eval_mode(svd, "dense", thetas, t_days)
    for mode in ("batched", "rankc"):
        out = _eval_mode(svd, mode, thetas, t_days)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, ref, atol=2e-3)


def test_rankc_unbatched_matches_batched(svd):
    """The custom_vmap core and its batched rule are the same math."""
    t_days = np.geomspace(0.3, 12.0, 40)
    rng = np.random.default_rng(1)
    theta = rng.uniform(svd.param_mins, svd.param_maxs).astype(np.float32)
    os.environ["NMMA_TPU_SVD_EVAL"] = "rankc"
    try:
        ev = _SVDFastEval(svd)
        one = {p: jnp.asarray(theta[i])
               for i, p in enumerate(svd.parameter_names)}
        m_un = np.asarray(jax.jit(lambda pp: ev(pp, t_days))(one))
        batched = {p: jnp.asarray(theta[i][None])
                   for i, p in enumerate(svd.parameter_names)}
        m_b = np.asarray(jax.jit(jax.vmap(
            lambda pp: ev(pp, t_days)))(batched))[0]
    finally:
        del os.environ["NMMA_TPU_SVD_EVAL"]
    np.testing.assert_allclose(m_un, m_b, atol=2e-4)


def test_outside_grid_is_inf(svd):
    t_days = np.array([1e-4, 1.0, 500.0])
    rng = np.random.default_rng(2)
    thetas = rng.uniform(svd.param_mins, svd.param_maxs,
                         (4, len(svd.param_mins))).astype(np.float32)
    out = _eval_mode(svd, "rankc", thetas, t_days)
    assert np.isinf(out[:, :, 0]).all() and np.isinf(out[:, :, 2]).all()
    assert np.isfinite(out[:, :, 1]).all()
