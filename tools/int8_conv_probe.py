"""Probe: does XLA:TPU lower s8xs8->s32 convolutions natively, and what do they
cost vs bf16 at DCFA-YOLO's hot shapes?

Motivation: serving is HBM-bandwidth-bound (~81% of roofline at b128,
README "Performance accounting").  If int8 conv operands are materialized
as int8 (half of bf16 bytes) and the MXU consumes them natively (v5e: 394
int8 TOPS vs 197 bf16 TFLOPs), a PTQ serving path can approach 2x.  This
probe measures one representative conv chain both ways before we build it.

Run on the real TPU:  python tools/int8_conv_probe.py

RESULT (v5e, 2026-08-17): NEGATIVE — do not build a PTQ serving path on XLA's
s8 conv lowering.  s8 operands survive into the optimized HLO and cost-analysis
bytes drop ~2-3x, but wall time never improves and regresses at small batch:

  B128  80x80 C64: bytes 1680->525 MB, time 3.52->3.60 ms (0.98x), bf16 MFU 0.52
  B128 160x160 C32: bytes 1678->839 MB, time 4.27->4.41 ms (0.97x), MFU 0.29
  B128 320x320 C16: bytes 2517->839 MB, time 6.47->6.95 ms (0.93x), MFU 0.14
  B16  160x160 C32: bytes 1133->2936 MB (!), time 2.72->4.44 ms (0.61x), MFU 0.06

The s8xs8->s32 conv executes at ~0.5x the bf16 FLOP rate (never the 2x int8
MXU peak), and at b16 the int8 layouts PAD so badly that bytes accessed
triple.  The quant/dequant epilogues fuse fine — the conv itself is the loss.
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


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def chain_bf16(x, ws):
    # conv -> silu -> conv -> silu ... all bf16 (today's serving path shape)
    for w in ws:
        x = conv(x, w)
        x = x * jax.nn.sigmoid(x)
    return x


def chain_int8(x_q, ws_q, sx, sws, sys_):
    """Quantized chain: each conv consumes int8 operands, epilogue
    dequant+silu+requant stays elementwise (fuses into one kernel)."""
    for w_q, sw, sy in zip(ws_q, sws, sys_):
        acc = conv(x_q, w_q)  # s8 x s8 -> s32
        y = acc.astype(jnp.float32) * (sx * sw)  # per-channel dequant
        y = y * jax.nn.sigmoid(y)
        x_q = jnp.clip(jnp.round(y / sy), -127, 127).astype(jnp.int8)
        sx = sy
    return x_q


def probe(B, H, W, C, depth=6, iters=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
          for _ in range(depth)]

    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.05), -127, 127).astype(jnp.int8)
    ws_q = [jnp.clip(jnp.round(w.astype(jnp.float32) / 0.01), -127, 127).astype(jnp.int8)
            for w in ws]
    sws = [jnp.full((C,), 0.01, jnp.float32) for _ in range(depth)]
    sys_ = [jnp.float32(0.05) for _ in range(depth)]

    f_bf16 = jax.jit(lambda x: chain_bf16(x, ws))
    f_int8 = jax.jit(lambda x: chain_int8(x, ws_q, jnp.float32(0.05), sws, sys_))

    comp8 = f_int8.lower(x_q).compile()
    hlo8 = comp8.as_text()
    n_convs = hlo8.count("convolution(")
    has_s8 = "s8[" in hlo8
    ca8 = comp8.cost_analysis()
    ca16 = f_bf16.lower(x).compile().cost_analysis()

    # chained timing (axon: never trust block_until_ready)
    def timeit_chained(f, x0, n):
        y = x0
        for _ in range(12):  # warm past the post-compile stall
            y = f(y)
        np.asarray(jax.device_get(y[0, 0, 0, :1]))
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y)
        np.asarray(jax.device_get(y[0, 0, 0, :1]))
        return (time.perf_counter() - t0) / n

    t16 = timeit_chained(f_bf16, x, iters)
    t8 = timeit_chained(f_int8, x_q, iters)
    flops = 2.0 * B * H * W * C * C * 9 * depth
    print(f"B{B} {H}x{W} C{C}: s8_in_hlo={has_s8} convs={n_convs}  "
          f"bytes bf16/int8 {ca16['bytes accessed'] / 1e6:.0f}/{ca8['bytes accessed'] / 1e6:.0f} MB  "
          f"time bf16/int8 {t16 * 1e3:.2f}/{t8 * 1e3:.2f} ms  speedup {t16 / t8:.2f}x  "
          f"bf16 MFU {flops / t16 / 197e12:.2f}  bw bf16 {ca16['bytes accessed'] / t16 / 1e9:.0f} GB/s  "
          f"bw int8 {ca8['bytes accessed'] / t8 / 1e9:.0f} GB/s")


def main():
    # compute-bound regime (C=64 fills the MXU decently)
    probe(128, 80, 80, 64)
    # the model's actual bandwidth-bound hot layers: big spatial, thin channels
    probe(128, 160, 160, 32, depth=4, iters=20)
    probe(128, 320, 320, 16, depth=3, iters=10)
    # serving sweet spot equivalents at lower batch
    probe(16, 160, 160, 32, depth=4, iters=30)


if __name__ == "__main__":
    main()
