"""Benchmark: RGB+NIR pairs/sec/chip for the full fused inference pipeline.

Protocol (matches the reference FPS protocol, `yolo_mul.py:132-166`: repeated
full forward+decode+NMS on the same pair, steady state after warm-up) but
batched and fully on device: letterbox preprocess, dual-backbone forward,
DFL decode, class-aware NMS, letterbox unmap — one jit, device-resident inputs,
batch 8, bfloat16 compute.

Baseline: the reference publishes no numbers (BASELINE.md); the only measured
datum is the PyTorch reference at 640x640 on this container's CPU:
~322 ms/pair forward-only ≈ 3.11 pairs/s.  `vs_baseline` is computed against
that measured number.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CPU_PAIRS_PER_SEC = 1.0 / 0.322  # BASELINE.md measured datum


def main() -> None:
    import numpy as np
    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    size = int(os.environ.get("BENCH_SIZE", "640"))

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    # serving configuration: the re-parameterized (RepGhost-fused) graph —
    # the reference's switch_to_deploy capability; ~40% faster than the
    # train-mode multi-branch graph and numerically identical (test_reparam)
    from dcfa_yolo_tpu.models.reparam import deploy_variables

    model = DCFAYolo(cfg, deploy=True)
    variables = jax.jit(deploy_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    image_hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    fn = jax.jit(lambda v, r, n, hw: detect_batch(
        model, v, r, n, hw, conf_thres=0.5, iou_thres=0.3, letterbox=True,
        max_det=300, pre_nms_topk=1024))

    res = jax.block_until_ready(fn(variables, rgb, nir, image_hw))  # compile
    # the axon runtime stalls for seconds on the first executions after a
    # compile (deferred buffer migration); warm up, then take the median of
    # several trials
    for _ in range(10):
        res = jax.block_until_ready(fn(variables, rgb, nir, image_hw))
    trials = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            res = jax.block_until_ready(fn(variables, rgb, nir, image_hw))
        trials.append((time.time() - t0) / iters)
    dt = sorted(trials)[len(trials) // 2]
    pairs_per_sec = batch / dt

    print(json.dumps({
        "metric": "pairs_per_sec_per_chip_640_batch_inference",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_CPU_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
