"""Ablation timing of model components on the current default device (TPU).

Usage: python tools/profile_model.py [batch] [size] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.backbone import Backbone
from dcfa_yolo_tpu.models.blocks import (
    CBAM,
    C2fRepGhost,
    ConvMaxpool,
    SPPFCBAM,
    ShuffleNetV2Block,
)
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.ops.conv import ConvBnAct


def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    print(f"batch={b} size={size} dtype={dtype} device={jax.devices()[0]}")

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype=dtype)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rgb = jnp.asarray(np.random.rand(b, size, size, 3), jnp.float32)

    # full model
    fwd = jax.jit(lambda v, r, n_: model.apply(v, r, n_, train=False))
    bench("full model", fwd, variables, rgb, rgb)

    # backbone only
    bb = Backbone(cfg.base_channels, cfg.deep_channels,
                  dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    bbv = bb.init(jax.random.PRNGKey(0), rgb, train=False)
    bfwd = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    bench("backbone x1", bfwd, bbv, rgb)

    # individual stages at their real shapes
    cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    stages = [
        ("stem (3->16) + pool", ConvMaxpool(16, dtype=cd), (b, size, size, 3)),
        ("dark2 conv s2", ConvBnAct(32, 3, 2, dtype=cd), (b, size // 2, size // 2, 16)),
        ("dark2 shuffle", ShuffleNetV2Block(32, dtype=cd), (b, size // 4, size // 4, 32)),
        ("dark3 conv s2", ConvBnAct(64, 3, 2, dtype=cd), (b, size // 4, size // 4, 32)),
        ("dark3 shuffle", ShuffleNetV2Block(64, dtype=cd), (b, size // 8, size // 8, 64)),
        ("dark4 conv s2", ConvBnAct(128, 3, 2, dtype=cd), (b, size // 8, size // 8, 64)),
        ("dark4 shuffle", ShuffleNetV2Block(128, dtype=cd), (b, size // 16, size // 16, 128)),
        ("dark5 conv s2", ConvBnAct(256, 3, 2, dtype=cd), (b, size // 16, size // 16, 128)),
        ("dark5 shuffle", ShuffleNetV2Block(256, dtype=cd), (b, size // 32, size // 32, 256)),
        ("dark5 sppf_cbam", SPPFCBAM(256, dtype=cd), (b, size // 32, size // 32, 256)),
        ("cbam 64ch @/8", CBAM(dtype=cd), (b, size // 8, size // 8, 64)),
        ("cbam 128ch @/16", CBAM(dtype=cd), (b, size // 16, size // 16, 128)),
        ("c2f_repghost 128 @/16", C2fRepGhost(128, n=1, dtype=cd), (b, size // 16, size // 16, 512)),
        ("c2f_repghost 64 @/8", C2fRepGhost(64, n=1, dtype=cd), (b, size // 8, size // 8, 256)),
        ("head cv2 64ch @/8", ConvBnAct(64, 3, dtype=cd), (b, size // 8, size // 8, 64)),
    ]
    for name, mod, shape in stages:
        x = jnp.asarray(np.random.rand(*shape), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda vv, xx, m=mod: m.apply(vv, xx))
        bench(name, f, v, x)


if __name__ == "__main__":
    main()
