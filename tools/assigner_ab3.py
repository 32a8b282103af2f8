"""Post-optimization criterion timings (after iterative topk + gather-free
df_loss/target selection).  Compare with tools/assigner_ab2.py numbers."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.utils.profiling import timeit_chained
from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.train.loss import YoloLoss, _df_loss, pad_targets
from dcfa_yolo_tpu.ops.boxes import bbox2dist

B, M, A = 16, 64, 8400


def main():
    rng = np.random.Generator(np.random.PCG64(0))
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
    crit = YoloLoss(cfg, TrainConfig(max_boxes=M, batch_size=B))
    no = 4 * cfg.reg_max + cfg.num_classes
    flat = jnp.asarray(rng.normal(size=(B, A, no)), jnp.float32)
    pd = flat[..., :4 * cfg.reg_max]
    ps = flat[..., 4 * cfg.reg_max:]
    feats = [jnp.asarray(rng.normal(size=(B, s, s, no)), jnp.float32)
             for s in (80, 40, 20)]
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(B)]).astype(np.float32)
    gb, gl, gm = map(jnp.asarray, pad_targets(labels, B, M, (640, 640)))
    pb = jax.jit(crit.bbox_decode)(pd)

    rows = [
        ("df_loss", lambda d, t: _df_loss(d.reshape(B, A, 4, 16), t),
         (pd, jnp.abs(bbox2dist(crit.anchor_points[None], pb, 15.0)))),
        ("full assigner", lambda s, p0: crit.assigner(
            jax.nn.sigmoid(s), (p0 * crit.stride_tensor),
            crit.anchor_points * crit.stride_tensor, gl[..., None], gb,
            gm[..., None]).target_scores.sum(), (ps, pb)),
        ("criterion", lambda f0: crit(f0, gb, gl, gm).total, (feats,)),
        ("criterion grad", lambda f0: jax.grad(
            lambda f: crit(f, gb, gl, gm).total)(f0), (feats,)),
    ]
    for name, f, args in rows:
        dt = timeit_chained(f, args, iters=30)
        print(f"{name:16s}: {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
