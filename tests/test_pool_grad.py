"""The manual maxpool VJP (ops/pool.py) must match XLA's select-and-scatter
gradient exactly up to FP summation order, including tie routing (first match
in row-major window order) — post-ReLU feature maps are full of exact 0.0
ties, so tie handling is load-bearing, not a corner case.

Routing is pinned BIT-exactly by using power-of-two output gradients: an
input position collects ≤⌈k/s⌉² window contributions, and sums of nearby
powers of two are exact in any addition order, so any bit difference is a
routing bug, not sum-order noise.  Random-gradient cases additionally check
support equality + last-ulp closeness (multi-window positions legitimately
accumulate in a different order than select-and-scatter's scan)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcfa_yolo_tpu.ops.pool import max_pool_same, max_pool_same_sas


@pytest.fixture(autouse=True)
def _manual_pool_grad(monkeypatch):
    # the compare-route VJP is opt-in (ops/pool.py module docstring) — these
    # tests exist to pin it against the select-and-scatter default
    monkeypatch.setenv("DCFA_POOL_GRAD", "manual")


def _grad_pair(x, kernel, stride, w):
    gm = jax.grad(lambda a: jnp.sum(max_pool_same(a, kernel, stride) * w))(x)
    gs = jax.grad(lambda a: jnp.sum(max_pool_same_sas(a, kernel, stride) * w))(x)
    return np.asarray(gm).astype(np.float64), np.asarray(gs).astype(np.float64)


def _pow2_weights(rng, shape, dtype):
    # Exact-sum requirement: a position collects up to ceil(k/s)^2 <= 25
    # addends; their sum must be exactly representable in `dtype` for ANY
    # addition order.  f32's 24-bit mantissa absorbs exponents -3..3 easily;
    # bf16 has only 8 bits, so restrict to {1, 2} (integer sums <= 50, exact).
    lo, hi = (-3, 4) if dtype == jnp.float32 else (0, 2)
    return jnp.asarray(2.0 ** rng.integers(lo, hi, shape), dtype)


@pytest.mark.parametrize("kernel,stride,shape", [
    (3, 2, (2, 16, 16, 4)),   # stem pool
    (5, 1, (2, 8, 8, 4)),     # SPPF pool
    (3, 2, (1, 9, 7, 3)),     # odd spatial dims
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_manual_vjp_matches_select_and_scatter(kernel, stride, shape, dtype):
    rng = np.random.Generator(np.random.PCG64(0))
    x = jnp.asarray(rng.normal(size=shape), dtype)
    y = max_pool_same(x, kernel, stride)
    # power-of-two grads → order-independent exact sums → bit equality
    w = _pow2_weights(rng, y.shape, dtype)
    gm, gs = _grad_pair(x, kernel, stride, w)
    np.testing.assert_array_equal(gm, gs)
    # random grads: same support, last-ulp-close values
    w = jnp.asarray(rng.normal(size=y.shape), dtype)
    gm, gs = _grad_pair(x, kernel, stride, w)
    np.testing.assert_array_equal(gm != 0, gs != 0)
    # bf16 multi-window sums can cancel: a couple of ulps of the LARGEST
    # addend shows up as a big relative error on a small result — bound the
    # absolute error in ulp-of-max-grad terms instead for bf16
    if dtype == jnp.float32:
        np.testing.assert_allclose(gm, gs, rtol=1e-6)
    else:
        # up to kernel² addends per position, each re-rounding at 2^-8 rel
        atol = kernel * kernel * 2.0 ** -8 * np.abs(gs).max()
        np.testing.assert_allclose(gm, gs, atol=atol)
    # forward unchanged
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(max_pool_same_sas(x, kernel, stride)))


@pytest.mark.parametrize("kernel,stride", [(3, 2), (5, 1)])
def test_tie_routing_matches(kernel, stride):
    rng = np.random.Generator(np.random.PCG64(1))
    # ReLU-style input: ~70% exact zeros → nearly every window has ties
    x = rng.normal(size=(2, 12, 12, 3)).astype(np.float32)
    x = np.where(x < 0.5, 0.0, x).astype(np.float32)
    x = jnp.asarray(x)
    ho = x.shape[1] // stride if stride > 1 else x.shape[1]
    w = _pow2_weights(rng, (2, ho, ho, 3), jnp.float32)
    gm, gs = _grad_pair(x, kernel, stride, w)
    np.testing.assert_array_equal(gm, gs)


def test_all_equal_input_routes_first():
    # every window element equal → gradient must land on the first (row-major)
    # in-bounds position of each window, exactly like select-and-scatter
    x = jnp.zeros((1, 6, 6, 1), jnp.float32)
    w = jnp.arange(1.0, 10.0).reshape(1, 3, 3, 1)
    gm, gs = _grad_pair(x, 3, 2, w)
    np.testing.assert_array_equal(gm, gs)
    assert gm[0, 0, 0, 0] == 1.0 and gm[0, 3, 3, 0] == 9.0


def test_second_order_shapes():
    # grad-of-grad is never taken in training, but must not crash under jit
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 2)),
                    jnp.float32)
    g = jax.jit(jax.grad(lambda a: jnp.sum(max_pool_same(a, 3, 2) ** 2)))(x)
    assert g.shape == x.shape
