"""Pooling primitives (NHWC) matching torch nn.MaxPool2d semantics."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool_same(x: jnp.ndarray, kernel: int, stride: int = 1) -> jnp.ndarray:
    """MaxPool2d(kernel, stride, padding=kernel//2), floor mode.

    Matches the stem pool (`nets/yolo_mul.py:112`, k=3 s=2 p=1) and the SPPF pools
    (`nets/yolo_mul.py:17`, k=5 s=1 p=2).  Padding uses -inf so padded positions
    never win the max.
    """
    pad = kernel // 2
    # NOTE: the init value must be the scalar -inf literal for JAX to recognize
    # the max-monoid (otherwise reverse-mode autodiff of reduce_window fails).
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) over NHWC spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveMaxPool2d(1) over NHWC spatial dims."""
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)
