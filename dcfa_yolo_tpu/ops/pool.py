"""Pooling primitives (NHWC) matching torch nn.MaxPool2d semantics.

Backward pass: XLA differentiates `reduce_window(max)` into a
`select-and-scatter` op, which lowers to a slow, serial TPU kernel — at the
stem's (B, 640, 640, 16) it is one of the most expensive single ops in the
whole train step (tools/train_traffic_aot.py; two of them, one per backbone).
`max_pool_same` therefore carries a custom VJP that routes the gradient with
dense, fusible compares instead: for each of the k*k window offsets, compare
the strided input view against the pooled output and send the output
gradient to the FIRST (row-major window order) position that equals the max —
exactly XLA's select-and-scatter tie rule, so the swap is bit-identical
(tests/test_pool_grad.py pins it, including all-tie post-ReLU-style inputs).

Default is the select-and-scatter form (DCFA_POOL_GRAD=sas), now SETTLED by
on-chip measurement (round 4, tools/pool_grad_ab.py, b16 640², v5e): the
compare-route form is **6.4x SLOWER end-to-end** (613.9 vs 95.9 ms/step) —
deviceless attribution had already shown it adds ~26 GB/step of traffic (the
9x pad+add accumulation at input resolution), and the real chip prices those
bytes at full roofline while the "slow serial" SAS kernel turns out cheap.
DCFA_POOL_GRAD=manual stays available only as a semantics cross-check for
tests/test_pool_grad.py.  Do not re-flip without new evidence.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


def _max_pool_fwd_raw(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    pad = kernel // 2
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_manual(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    return _max_pool_fwd_raw(x, kernel, stride)


def _max_pool_manual_fwd(x, kernel, stride):
    y = _max_pool_fwd_raw(x, kernel, stride)
    return y, (x, y)


def _max_pool_manual_bwd(kernel, stride, res, g):
    x, y = res
    pad = kernel // 2
    b, h, w, c = x.shape
    ho, wo = y.shape[1:3]
    span_h = (ho - 1) * stride + 1
    span_w = (wo - 1) * stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=-jnp.inf)
    zero = jnp.zeros((), g.dtype)
    seen = jnp.zeros(y.shape, jnp.bool_)
    grad_p = jnp.zeros((b, h + 2 * pad, w + 2 * pad, c), g.dtype)
    for dy in range(kernel):
        for dx in range(kernel):
            xk = lax.slice(xp, (0, dy, dx, 0),
                           (b, dy + span_h, dx + span_w, c),
                           (1, stride, stride, 1))
            eq = (xk == y) & ~seen
            seen = seen | eq
            contrib = jnp.where(eq, g, zero)
            grad_p = grad_p + lax.pad(
                contrib, zero,
                ((0, 0, 0),
                 (dy, h + 2 * pad - dy - span_h, stride - 1),
                 (dx, w + 2 * pad - dx - span_w, stride - 1),
                 (0, 0, 0)))
    return (grad_p[:, pad:pad + h, pad:pad + w, :],)


_max_pool_manual.defvjp(_max_pool_manual_fwd, _max_pool_manual_bwd)


def max_pool_same(x: jnp.ndarray, kernel: int, stride: int = 1) -> jnp.ndarray:
    """MaxPool2d(kernel, stride, padding=kernel//2), floor mode.

    Matches the stem pool (`nets/yolo_mul.py:112`, k=3 s=2 p=1) and the SPPF pools
    (`nets/yolo_mul.py:17`, k=5 s=1 p=2).  Padding uses -inf so padded positions
    never win the max.  Gradient: select-and-scatter by default; set
    DCFA_POOL_GRAD=manual for the dense compare-route VJP (module docstring).
    """
    if (os.environ.get("DCFA_POOL_GRAD", "sas") == "manual"
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _max_pool_manual(x, kernel, stride)
    return _max_pool_fwd_raw(x, kernel, stride)


def max_pool_same_sas(x: jnp.ndarray, kernel: int, stride: int = 1) -> jnp.ndarray:
    """The raw reduce_window form whose VJP is XLA select-and-scatter (for A/B)."""
    return _max_pool_fwd_raw(x, kernel, stride)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) over NHWC spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveMaxPool2d(1) over NHWC spatial dims."""
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)
