"""Honest throughput sweep for the README performance table.

Chained-dependency timing (utils/profiling.timeit_chained) across configs:
batch 1/8/32 at 640², batch 2 at 1280², deploy vs train-mode graph, XLA vs
Pallas NMS.  Run on the real chip in background.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.reparam import deploy_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.utils.profiling import timeit_chained


def run(size, batch, deploy, nms_backend="pallas", k=512):
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=deploy)
    if deploy:
        variables = jax.jit(deploy_variables)(variables)
    rng = np.random.Generator(np.random.PCG64(0))
    h, w = int(size * 0.75), size  # off-size input exercises the letterbox
    rgb = jnp.asarray(rng.integers(0, 255, (batch, h, w, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (batch, h, w, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([float(h), float(w)], (batch, 1)), jnp.float32)

    def fn(r, n):
        return detect_batch(model, variables, r, n, hw, conf_thres=0.5,
                            iou_thres=0.3, letterbox=True, max_det=300,
                            pre_nms_topk=k, nms_backend=nms_backend)

    dt = timeit_chained(fn, (rgb, nir), iters=30)
    print(f"size={size} b={batch} deploy={int(deploy)} nms={nms_backend}: "
          f"{dt * 1e3:8.3f} ms/iter  {batch / dt:8.1f} pairs/s  "
          f"({dt / batch * 1e3:6.3f} ms/pair)", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    run(640, 8, True, "pallas")
    run(640, 8, True, "xla")
    run(640, 1, True, "pallas")
    run(640, 32, True, "pallas")
    run(640, 8, False, "pallas")   # train-mode multi-branch graph
    run(1280, 2, True, "pallas")


if __name__ == "__main__":
    main()
