"""Round 2 of criterion profiling: top_k alternatives + criterion stages.

topk on (16*64, 8400) k=10:
  * jax.lax.top_k (exact; round-1 shipped)
  * jax.lax.approx_max_k recall_target=1.0 (exact result, TPU PartialReduce)
  * jax.lax.approx_max_k default recall (what approximation would buy)
  * 10-pass iterative argmax

criterion stages timed separately to find the non-assigner 16 ms.
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

from dcfa_yolo_tpu.utils.profiling import timeit_chained

B, M, K, A = 16, 64, 10, 8400


def tk_exact(x):
    return jax.lax.top_k(x, K)


def tk_approx_exact(x):
    return jax.lax.approx_max_k(x, K, recall_target=1.0)


def tk_approx_default(x):
    return jax.lax.approx_max_k(x, K)


def tk_iterative(x):
    def body(i, state):
        vals, idxs, cur = state
        j = jnp.argmax(cur, -1)
        v = jnp.take_along_axis(cur, j[..., None], -1)[..., 0]
        vals = vals.at[..., i].set(v)
        idxs = idxs.at[..., i].set(j)
        cur = cur.at[jnp.arange(B)[:, None], jnp.arange(M)[None, :], j].set(-jnp.inf)
        return vals, idxs, cur

    vals = jnp.zeros((B, M, K), x.dtype)
    idxs = jnp.zeros((B, M, K), jnp.int32)
    vals, idxs, _ = jax.lax.fori_loop(0, K, body, (vals, idxs, x))
    return vals, idxs


def main():
    rng = np.random.Generator(np.random.PCG64(0))
    x = jnp.asarray(rng.random((B, M, A)), jnp.float32)

    ref_v, ref_i = jax.jit(tk_exact)(x)
    for name, fn in [("top_k", tk_exact),
                     ("approx_max_k r=1.0", tk_approx_exact),
                     ("approx_max_k default", tk_approx_default),
                     ("iterative argmax", tk_iterative)]:
        v, i = jax.jit(fn)(x)
        # compare as SETS per row (approx_max_k may order differently)
        same = bool(jnp.all(jnp.sort(v, -1) == jnp.sort(ref_v, -1)))
        dt = timeit_chained(fn, (x,), iters=30)
        print(f"{name:22s}: {dt * 1e3:7.3f} ms  exact_values={same}", flush=True)

    # criterion stage timings
    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.train.loss import YoloLoss, _df_loss, pad_targets
    from dcfa_yolo_tpu.train.assigner import select_candidates_in_gts
    from dcfa_yolo_tpu.ops.boxes import bbox_iou, bbox2dist

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
    crit = YoloLoss(cfg, TrainConfig(max_boxes=M, batch_size=B))
    no = 4 * cfg.reg_max + cfg.num_classes
    flat = jnp.asarray(rng.normal(size=(B, A, no)), jnp.float32)
    pd = flat[..., :4 * cfg.reg_max]
    ps = flat[..., 4 * cfg.reg_max:]
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(B)]).astype(np.float32)
    gb, gl, gm = map(jnp.asarray, pad_targets(labels, B, M, (640, 640)))
    pb = jax.jit(crit.bbox_decode)(pd)

    stages = [
        ("bbox_decode", crit.bbox_decode, (pd,)),
        ("ciou (b,M,A)", lambda g, p: bbox_iou(
            g[:, :, None, :], p[:, None, :, :], xywh=False, CIoU=True),
         (gb, pb)),
        ("in_gts (b,M,A)", lambda g: select_candidates_in_gts(
            crit.anchor_points * crit.stride_tensor, g), (gb,)),
        ("df_loss", lambda d, t: _df_loss(d.reshape(B, A, 4, 16), t),
         (pd, jnp.abs(bbox2dist(crit.anchor_points[None], pb, 15.0)))),
        ("full assigner", lambda s, p0: crit.assigner(
            jax.nn.sigmoid(s), (p0 * crit.stride_tensor),
            crit.anchor_points * crit.stride_tensor, gl[..., None], gb,
            gm[..., None]).target_scores.sum(), (ps, pb)),
    ]
    for name, f, args in stages:
        dt = timeit_chained(f, args, iters=30)
        print(f"{name:22s}: {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
