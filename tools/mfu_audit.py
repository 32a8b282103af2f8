"""MFU audit for the headline inference bench (VERDICT round-1 item #1).

Establishes on the real chip:
  * the actual device kind + its bf16 peak,
  * compiled-executable FLOPs per batch (XLA cost analysis of the lowered fn),
  * whether `block_until_ready` under axon under-measures vs forcing a scalar
    device->host fetch each iteration.

Run: python tools/mfu_audit.py  (foreground-safe chunks are small; full run in
background — first compile takes ~1 min).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: platform={dev.platform} kind={dev.device_kind}", flush=True)

    batch, size = 8, 640
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
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

    lowered = fn.lower(variables, rgb, nir, image_hw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    print(f"cost_analysis flops/batch: {flops:.4g}  "
          f"({flops / batch / 1e9:.3f} GFLOP/pair)", flush=True)
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    print(f"bytes accessed/batch: {bytes_acc:.4g}", flush=True)

    res = jax.block_until_ready(fn(variables, rgb, nir, image_hw))
    for _ in range(10):
        res = jax.block_until_ready(fn(variables, rgb, nir, image_hw))

    iters = 30

    def timed(sync):
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(variables, rgb, nir, image_hw)
                sync(r)
            trials.append((time.perf_counter() - t0) / iters)
        return sorted(trials)[1]

    dt_block = timed(lambda r: jax.block_until_ready(r))
    # force a real device->host payload fetch: if axon's ready-signal races
    # ahead of compute, this will be slower
    dt_fetch = timed(lambda r: np.asarray(r.scores[0, 0]))
    # fetch everything
    dt_full = timed(lambda r: jax.device_get(r))

    # sequential-dependency timing: feed each iteration's output scalar back in
    # so no two iterations can overlap even with async dispatch pipelining
    @jax.jit
    def fn_chained(v, r, n, hw, eps):
        out = detect_batch(model, v, r + eps, n, hw, conf_thres=0.5,
                           iou_thres=0.3, letterbox=True, max_det=300,
                           pre_nms_topk=1024)
        return out, jnp.sum(out.scores) * 0.0
    out, eps = fn_chained(variables, rgb, nir, image_hw, jnp.float32(0.0))
    jax.block_until_ready(out)
    for _ in range(5):
        out, eps = fn_chained(variables, rgb, nir, image_hw, eps)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, eps = fn_chained(variables, rgb, nir, image_hw, eps)
        jax.block_until_ready(out)
        trials.append((time.perf_counter() - t0) / iters)
    dt_chain = sorted(trials)[1]

    for name, dt in [("block_until_ready", dt_block), ("scalar_fetch", dt_fetch),
                     ("device_get_all", dt_full), ("chained_dependency", dt_chain)]:
        pps = batch / dt
        tflops = flops / batch * pps / 1e12
        print(f"{name:20s}: {dt * 1e3:8.3f} ms/iter  {pps:9.1f} pairs/s  "
              f"implied {tflops:7.2f} TFLOP/s", flush=True)

    print(json.dumps({
        "device_kind": dev.device_kind,
        "gflop_per_pair": flops / batch / 1e9,
        "pairs_per_sec_block": batch / dt_block,
        "pairs_per_sec_fetch": batch / dt_fetch,
        "pairs_per_sec_chained": batch / dt_chain,
    }))


if __name__ == "__main__":
    main()
