"""On-chip exactness + timing gate for the Pallas NMS kernel.

Compares the full fused pipeline with nms_backend='pallas' vs 'xla' on real
hardware (they must produce identical detections — same keep decisions, same
boxes), then times the b128/b1 serving configs so a kernel change has one
command that both validates and prices it.  Round-4 context: the b128 serving
profile (tools/kernel_profile.py) measured the fixed-K suppression loop at
11.1 ms/iter = 21% of the pipeline — the dynamic-trip-count kernel rewrite
(ops/pallas_nms.py) is gated by this check.

Usage: python tools/nms_onchip_check.py [batches...]  (default: 128 1)
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
from dcfa_yolo_tpu.models.reparam import deploy_variables, fold_shuffle_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from serve_ab_matrix import time_config  # noqa: E402


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [128, 1]
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True, fold_shuffle=True)
    variables = jax.jit(deploy_variables)(variables)
    variables = jax.jit(fold_shuffle_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(7))
    b = 8
    rgb = jnp.asarray(rng.integers(0, 255, (b, 480, 602, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 255, (b, 480, 602, 3)), jnp.uint8)
    hw = jnp.asarray(np.tile([480.0, 602.0], (b, 1)), jnp.float32)

    outs = {}
    for backend in ("xla", "pallas"):
        outs[backend] = jax.jit(lambda r, n, be=backend: detect_batch(
            model, variables, r, n, hw, conf_thres=0.5, iou_thres=0.3,
            letterbox=True, max_det=300, pre_nms_topk=512,
            nms_backend=be, stem_backend="pallas_d"))(rgb, nir)
    a, p = outs["xla"], outs["pallas"]
    nv = int(np.sum(np.asarray(a.valid)))
    ok = (np.array_equal(np.asarray(a.valid), np.asarray(p.valid))
          and np.array_equal(np.asarray(a.classes)[np.asarray(a.valid)],
                             np.asarray(p.classes)[np.asarray(p.valid)])
          and np.allclose(np.asarray(a.boxes)[np.asarray(a.valid)],
                          np.asarray(p.boxes)[np.asarray(p.valid)], atol=1e-5)
          and np.allclose(np.asarray(a.scores)[np.asarray(a.valid)],
                          np.asarray(p.scores)[np.asarray(p.valid)], atol=1e-6))
    print(f"pallas == xla detections over {nv} boxes (b{b}): {ok}", flush=True)
    if not ok:
        sys.exit(1)

    for batch in batches:
        dt = time_config(batch, "pallas_d", True, 20)
        print(f"b{batch:<4d} fold pallas_d (pallas NMS): "
              f"{dt*1e3/batch:7.3f} ms/pair  {batch/dt:8.1f} pairs/s",
              flush=True)


if __name__ == "__main__":
    main()
