"""Stage-by-stage inference perf breakdown on the real chip.

Measures (chained-dependency timing, see utils/profiling.timeit_chained):
  * forward only (deploy graph, bf16, b8),
  * forward + DFL decode,
  * full pipeline with the XLA fori-loop NMS,
  * full pipeline with the Pallas NMS kernel,
  * Pallas-vs-XLA keep agreement on real shapes (VERDICT r1 item #6).

Run in background: python tools/perf_breakdown.py > /tmp/perf_breakdown.log
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
from dcfa_yolo_tpu.infer.decode import decode_box
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.reparam import deploy_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.utils.profiling import timeit_chained


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    batch, size = 8, 640
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True)
    variables = jax.jit(deploy_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    def fwd(r, n):
        out = model.apply(variables, r / 255.0, n / 255.0, train=False)
        return out.dbox, out.cls

    def fwd_decode(r, n):
        out = model.apply(variables, r / 255.0, n / 255.0, train=False)
        return decode_box(out.dbox, out.cls, out.anchors, out.strides,
                          cfg.input_shape)

    def full(backend, k):
        def f(r, n):
            return detect_batch(model, variables, r, n, hw, conf_thres=0.5,
                                iou_thres=0.3, letterbox=True, max_det=300,
                                pre_nms_topk=k, nms_backend=backend)
        return f

    rgb640 = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3)), jnp.float32)
    nir640 = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3)), jnp.float32)

    rows = [
        ("fwd_only", fwd, (rgb640, nir640)),
        ("fwd_decode", fwd_decode, (rgb640, nir640)),
        ("full_xla_k1024", full("xla", 1024), (rgb, nir)),
        ("full_pallas_k1024", full("pallas", 1024), (rgb, nir)),
        ("full_xla_k512", full("xla", 512), (rgb, nir)),
        ("full_pallas_k512", full("pallas", 512), (rgb, nir)),
    ]
    for name, f, args in rows:
        dt = timeit_chained(f, args)
        print(f"{name:20s}: {dt * 1e3:8.3f} ms/iter  {batch / dt:9.1f} pairs/s",
              flush=True)

    # agreement: realistic decoded detections, both backends
    from dcfa_yolo_tpu.ops.nms import batched_nms

    pred = jax.jit(fwd_decode)(rgb640, nir640)
    xywh, sc = pred[..., :4], pred[..., 4:]
    boxes = jnp.concatenate([xywh[..., :2] - xywh[..., 2:4] / 2,
                             xywh[..., :2] + xywh[..., 2:4] / 2], -1)
    scores = jnp.max(sc, -1)
    classes = jnp.argmax(sc, -1).astype(jnp.int32)
    # random-weight scores cluster near 0.5; use a low threshold so many
    # candidates survive and the suppression actually works
    for thr in (0.3, 0.001):
        a = jax.jit(lambda b, s, c: batched_nms(
            b, s, c, thr, 0.3, pre_nms_topk=1024, max_det=300,
            backend="xla"))(boxes, scores, classes)
        p = jax.jit(lambda b, s, c: batched_nms(
            b, s, c, thr, 0.3, pre_nms_topk=1024, max_det=300,
            backend="pallas"))(boxes, scores, classes)
        n_valid = int(a.valid.sum())
        agree = bool(jnp.array_equal(a.valid, p.valid)
                     and jnp.allclose(jnp.where(a.valid[..., None], a.boxes, 0),
                                      jnp.where(p.valid[..., None], p.boxes, 0))
                     and jnp.array_equal(a.classes, p.classes))
        print(f"agreement conf={thr}: valid={n_valid} match={agree}", flush=True)


if __name__ == "__main__":
    main()
