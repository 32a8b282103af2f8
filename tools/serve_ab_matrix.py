"""On-chip A/B matrix for the serving pipeline: {stem xla|pallas} x
{plain|fold|fold+pair} x {batch sizes}, chained-dependency timing, bench.py's
exact configuration.

One command produces every number needed to decide the serving defaults
('auto' stem backend flip in infer/pipeline._stem_backend_resolve, fold
default, pair-at-b1): run AFTER deviceless byte attribution
(tools/serve_traffic_aot.py) predicts a win.  Deviceless prediction this
round (MB/pair accessed, u8 in, after session 4's three serving-graph
fixes): b128 xla+fold 289.1 / pallas+fold 231.9 / pallas+fold+pair 296.1
(pair LOSES at b128 — the block-diagonal convs add FLOPs); b1 xla 2072.7 /
pallas+fold 785.1 / pallas+fold+pair 709.2 (−10%, plus −41% kernel count).

Usage: python tools/serve_ab_matrix.py [batches...]   (default: 128 1)
Env: AB_ITERS (default 20), AB_CONFIGS (comma list of plain,fold,pair;
default all)
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


def time_config(batch: int, stem: str, fold: bool, iters: int,
                pair: bool = False, size: int = 640,
                split: bool = False) -> float:
    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import deploy_variables, fold_shuffle_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True, fold_shuffle=fold, pair_backbones=pair,
                     split_neck_concats=split)
    variables = jax.jit(deploy_variables)(variables)
    if fold:
        variables = jax.jit(fold_shuffle_variables)(variables)
    if pair:
        from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

        variables = jax.jit(pair_backbone_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.uint8)
    image_hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    fn = jax.jit(lambda r, n: detect_batch(
        model, variables, r, n, image_hw, conf_thres=0.5, iou_thres=0.3,
        letterbox=True, max_det=300, pre_nms_topk=512,
        nms_backend="pallas", stem_backend=stem))

    # chained timing on integer images: bump one pixel by the (0/1) parity of
    # the max score bit pattern so each iteration depends on the previous one
    def step(x):
        r, n = x
        res = fn(r, n)
        bump = (jnp.max(res.scores) > 2.0).astype(jnp.uint8)  # always 0
        return (r + bump, n + bump)

    step = jax.jit(step, donate_argnums=(0,))
    z = (rgb, nir)
    for _ in range(12):
        z = step(z)
    np.asarray(jax.device_get(z[0][0, 0, 0, :1]))

    def burst(n):
        nonlocal z
        t0 = time.perf_counter()
        for _ in range(n):
            z = step(z)
        np.asarray(jax.device_get(z[0][0, 0, 0, :1]))
        return time.perf_counter() - t0

    # steady-state slope: the burst-final fetch RPC costs a fixed ~20-25 ms
    # over the axon tunnel (ROUND5.md) — subtract it exactly by timing a 1x
    # and a 3x burst; the dependency chain still serializes the device
    t1 = burst(iters)
    t3 = burst(3 * iters)
    return (t3 - t1) / (2 * iters)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [128, 1]
    iters = int(os.environ.get("AB_ITERS", "20"))
    size = int(os.environ.get("AB_SIZE", "640"))
    configs = os.environ.get("AB_CONFIGS", "plain,fold,pair").split(",")
    modes = [m for m in (("plain", False, False, False),
                         ("fold", True, False, False),
                         ("pair", True, True, False),
                         ("fsplit", True, False, True))
             if m[0] in configs]
    print(f"device: {jax.devices()[0].device_kind}  {size}^2", flush=True)
    for batch in batches:
        for stem in os.environ.get("AB_STEMS", "xla,pallas").split(","):
            for name, fold, pair, split in modes:
                dt = time_config(batch, stem, fold, iters, pair=pair,
                                 size=size, split=split)
                print(f"b{batch:<4d} stem={stem:6s} {name:5s}: "
                      f"{dt*1e3/batch:7.3f} ms/pair  {batch/dt:8.1f} pairs/s",
                      flush=True)


if __name__ == "__main__":
    main()
