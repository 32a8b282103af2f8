"""Batch-1 latency breakdown + roofline floor on the real chip.

The reference's canonical FPS protocol is batch 1 (`yolo_mul.py:132-166`), the
one operating point the batch-sweep work never attacked: 4.99 ms/pair vs
0.50 ms/pair at b128.  This tool answers WHERE the 10x per-pair gap lives:
per stage (forward / +decode / full pipeline, XLA vs Pallas NMS) it reports
chained-dependency time, XLA cost-analysis bytes+flops, and the implied HBM
roofline floor bytes/819GB/s — if measured time ~= floor, b1 is at
speed-of-light and the gap is physics (small transfers amortize nothing), not
a missing optimization.

Run: python tools/b1_breakdown.py [--batch 1] > /tmp/b1_breakdown.log
"""

from __future__ import annotations

import argparse
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

PEAK_BW = 819e9  # v5e HBM


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("bytes accessed", float("nan"))), \
        float(c.get("flops", float("nan")))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    b = args.batch

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  batch={b}", flush=True)
    size = 640
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True)
    variables = jax.jit(deploy_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (b, 480, 602, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (b, 480, 602, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([480.0, 602.0], (b, 1)), jnp.float32)
    rgb640 = jnp.asarray(rng.integers(0, 255, (b, size, size, 3)), jnp.float32)
    nir640 = jnp.asarray(rng.integers(0, 255, (b, size, size, 3)), jnp.float32)

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

    rows = [
        ("fwd_only", fwd, (rgb640, nir640)),
        ("fwd_decode", fwd_decode, (rgb640, nir640)),
        ("full_pallas_k512", full("pallas", 512), (rgb, nir)),
        ("full_xla_k512", full("xla", 512), (rgb, nir)),
        ("full_pallas_k256", full("pallas", 256), (rgb, nir)),
    ]
    for name, f, a in rows:
        bytes_, flops = cost(f, *a)
        dt = timeit_chained(f, a, iters=args.iters)
        floor = bytes_ / PEAK_BW
        print(f"{name:18s}: {dt*1e3:7.3f} ms | bytes {bytes_/1e6:7.1f} MB "
              f"flops {flops/1e9:6.2f} G | HBM floor {floor*1e3:6.3f} ms "
              f"| attained {floor/dt*100:5.1f}% of roofline", flush=True)


if __name__ == "__main__":
    main()
