import jax.numpy as jnp
import numpy as np

from nmma_tpu.ops.interp import (masked_interp, masked_interp_fill,
                                 masked_interp_linear)


def _numpy_autocomplete(xq, x, y, extrapolate="linear", ref_value=np.inf):
    """Oracle following autocomplete_data semantics (nmma/em/utils.py:626-677)."""
    mask = np.isfinite(y)
    if mask.sum() < 2:
        return np.full_like(xq, ref_value, dtype=float)
    xs, ys = np.asarray(x)[mask], np.asarray(y)[mask]
    if isinstance(extrapolate, (int, float)):
        return np.interp(xq, xs, ys, left=extrapolate, right=extrapolate)
    out = np.interp(xq, xs, ys)
    if extrapolate == "linear":
        lo = xq < xs[0]
        out[lo] = ys[0] + (ys[1] - ys[0]) / (xs[1] - xs[0]) * (xq[lo] - xs[0])
        hi = xq > xs[-1]
        out[hi] = ys[-1] + (ys[-1] - ys[-2]) / (xs[-1] - xs[-2]) * (xq[hi] - xs[-1])
    return out


def test_masked_interp_matches_oracle_with_nans(rng):
    x = np.sort(rng.uniform(0, 10, 40))
    y = np.sin(x)
    y[rng.choice(40, 10, replace=False)] = np.nan
    xq = rng.uniform(-2, 12, 100)

    got = np.asarray(masked_interp(xq, x, y))
    want = _numpy_autocomplete(xq, x, y, extrapolate="constant")
    # constant mode == clamped np.interp on the finite subset
    mask = np.isfinite(y)
    want = np.interp(xq, x[mask], y[mask])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_masked_interp_fill_inf(rng):
    x = np.linspace(0, 5, 20)
    y = x**2
    y[3] = np.inf
    xq = np.array([-1.0, 0.5, 2.5, 4.9, 6.0])
    got = np.asarray(masked_interp_fill(xq, x, y, np.inf))
    want = _numpy_autocomplete(xq, x, y, extrapolate=np.inf)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert np.isinf(got[0]) and np.isinf(got[-1])


def test_masked_interp_linear_extrapolation(rng):
    x = np.linspace(1, 4, 12)
    y = 2 * x + 1
    y[0] = np.nan
    y[-1] = np.nan
    xq = np.array([0.0, 2.0, 5.0])
    got = np.asarray(masked_interp_linear(xq, x, y))
    want = _numpy_autocomplete(xq, x, y, extrapolate="linear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_too_few_valid_points_returns_fill():
    x = np.linspace(0, 1, 5)
    y = np.full(5, np.nan)
    y[2] = 1.0
    out = np.asarray(masked_interp_fill(np.linspace(0, 1, 7), x, y, np.inf))
    assert np.all(np.isinf(out))
