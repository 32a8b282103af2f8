"""Probe: what does the dual-backbone stem cost under XLA at b128 640^2?

The stem (`nets/yolo_mul.py:104-115`: conv3x3 s1 3->16 + BN + ReLU + maxpool
3x3 s2) runs at FULL 640^2 resolution, so its conv output is the largest
tensor in the serving graph: bf16[128,640,640,16] = 1.68 GB per backbone at
b128.  XLA cannot fuse a reduce-window with its producer, so the sequence
moves ~(in 315 MB + conv out 1.68 GB write + 1.68 GB read + pool out 420 MB)
~= 4.1 GB per backbone per batch through HBM.  A Pallas kernel that keeps the
conv rows in VMEM would move only in+out ~= 735 MB.

This measures the XLA stem standalone (chained timing) so the Pallas win is
bounded BEFORE the kernel is built.

Run on the real TPU:  python tools/stem_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np


def stem(x, w, a, b):
    """conv3x3 s1 (3->16) + folded eval-BN + ReLU + maxpool3x3 s2, NHWC."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * a + b, 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def timeit_chained_pair(f, x0, iters=20):
    # chain through a small reduction of the output back into the input
    def step(x):
        y = f(x)
        return x + jnp.max(y).astype(x.dtype) * 0.0 + jnp.max(y).astype(x.dtype) * 1e-12

    step = jax.jit(step)
    x = x0
    for _ in range(12):
        x = step(x)
    np.asarray(jax.device_get(x[0, 0, 0, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    np.asarray(jax.device_get(x[0, 0, 0, :1]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    x = jnp.asarray(rng.integers(0, 255, (B, 640, 640, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.1, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((16,)) * 0.1 + 1.0, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.bfloat16)

    f = lambda x: stem(x, w, a, b)
    comp = jax.jit(f).lower(x).compile()
    ca = comp.cost_analysis()
    print(f"XLA stem b{B}: cost-analysis bytes {ca['bytes accessed'] / 1e9:.2f} GB, "
          f"flops {ca['flops'] / 1e9:.1f} GFLOP")
    dt = timeit_chained_pair(f, x)
    bw = ca["bytes accessed"] / dt / 1e9
    print(f"XLA stem b{B}: {dt * 1e3:.2f} ms  ({bw:.0f} GB/s of 819; "
          f"{ca['flops'] / dt / 1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
