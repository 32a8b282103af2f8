"""Reference-style weight initialization as a pure parameter transform.

`weights_init` (`nets/yolo_training.py:480-498`): conv kernels get
normal/xavier/kaiming/orthogonal init (default normal(0, 0.02)); BatchNorm
scale ~ N(1, 0.02), bias = 0.  Biases of convs are left as-initialized (the
torch version does not touch them either — only `.weight` attributes).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax


def _init_kernel(rng: np.random.Generator, shape, init_type: str,
                 init_gain: float) -> np.ndarray:
    kh, kw, cin, cout = shape
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    if init_type == "normal":
        return (rng.standard_normal(shape) * init_gain).astype(np.float32)
    if init_type == "xavier":
        std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
        return (rng.standard_normal(shape) * std).astype(np.float32)
    if init_type == "kaiming":
        std = math.sqrt(2.0 / fan_in)
        return (rng.standard_normal(shape) * std).astype(np.float32)
    if init_type == "orthogonal":
        # torch orthogonal_ semantics: QR on the tall orientation, sign-fix
        # with diag(r) (length = q columns) BEFORE transposing back — doing
        # it after broke every kernel with fan_in < cout (e.g. depthwise
        # (3,3,1,16): sign vector length 9 vs q columns 16)
        flat = rng.standard_normal((int(np.prod(shape[:-1])), cout))
        transpose = flat.shape[0] < flat.shape[1]
        tall = flat.T if transpose else flat
        q, r = np.linalg.qr(tall)
        q = q * np.sign(np.diag(r))[None, :]
        if transpose:
            q = q.T
        return (init_gain * q.reshape(shape)).astype(np.float32)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def reference_weights_init(params: Any, seed: int = 0, init_type: str = "normal",
                           init_gain: float = 0.02) -> Any:
    """Re-draw all conv kernels / BN scales with the reference's distributions."""
    rng = np.random.Generator(np.random.PCG64(seed))

    def visit(path, leaf):
        name = getattr(path[-1], "key", "")
        arr = np.asarray(leaf)
        if name == "kernel" and arr.ndim == 4:
            return jax.numpy.asarray(_init_kernel(rng, arr.shape, init_type, init_gain))
        if name == "scale" and arr.ndim == 1:  # BN gamma ~ N(1, 0.02)
            return jax.numpy.asarray(
                (1.0 + rng.standard_normal(arr.shape) * 0.02).astype(np.float32))
        if name == "bias" and arr.ndim == 1:
            # BN bias is zeroed by the reference; conv biases it leaves alone —
            # flax zeros both at init, so zeroing is behavior-identical here
            return jax.numpy.zeros_like(leaf)
        return leaf

    print(f"initialize network with {init_type} type")
    return jax.tree_util.tree_map_with_path(visit, params)
