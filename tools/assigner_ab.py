"""A/B the assigner top-k membership implementations on the real chip.

Variants of `_topk_mask` (train/assigner.py):
  A. one_hot(topk_idxs).sum(-2)  — materializes (b, M, topk, A) fp32 if XLA
     doesn't fuse (round-1 shipped this);
  B. scatter-add counts into (b, M, A);
  C. broadcast-compare (topk_idxs[..., None] == iota(A)) summed over topk in
     int8 — same math as A but integer and explicitly fusible.

Also times the full criterion with the best variant and a bf16-metrics
assigner to bound what precision buys.
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


def variant_onehot(metrics, mask_gt_b):
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, K)
    topk_mask = jnp.broadcast_to(mask_gt_b[..., None], topk_idxs.shape)
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    is_in_topk = jax.nn.one_hot(topk_idxs, A, dtype=metrics.dtype).sum(-2)
    return jnp.where(is_in_topk > 1, 0.0, is_in_topk)


def variant_scatter(metrics, mask_gt_b):
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, K)
    topk_mask = jnp.broadcast_to(mask_gt_b[..., None], topk_idxs.shape)
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    counts = jnp.zeros((B, M, A), jnp.int32)
    counts = counts.at[jnp.arange(B)[:, None, None],
                       jnp.arange(M)[None, :, None], topk_idxs].add(1)
    return jnp.where(counts > 1, 0.0, counts.astype(metrics.dtype))


def variant_compare(metrics, mask_gt_b):
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, K)
    topk_mask = jnp.broadcast_to(mask_gt_b[..., None], topk_idxs.shape)
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, A), 3)
    counts = (topk_idxs[..., None] == col).astype(jnp.int8).sum(-2)
    return jnp.where(counts > 1, 0.0, counts.astype(metrics.dtype))


def main():
    rng = np.random.Generator(np.random.PCG64(0))
    metrics = jnp.asarray(rng.random((B, M, A)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.3)

    ref = None
    for name, fn in [("onehot", variant_onehot), ("scatter", variant_scatter),
                     ("compare", variant_compare)]:
        out = jax.jit(fn)(metrics, mask)
        if ref is None:
            ref = np.asarray(out)
        else:
            assert np.array_equal(ref, np.asarray(out)), f"{name} differs!"
        dt = timeit_chained(fn, (metrics, mask), iters=30)
        print(f"topk_mask {name:8s}: {dt * 1e3:7.3f} ms", flush=True)

    # full criterion with the current implementation, fp32 vs bf16 features
    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.train.loss import YoloLoss, pad_targets

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
    crit = YoloLoss(cfg, TrainConfig(max_boxes=M, batch_size=B))
    no = 4 * cfg.reg_max + cfg.num_classes
    feats = [jnp.asarray(rng.normal(size=(B, s, s, no)), jnp.float32)
             for s in (80, 40, 20)]
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(B)]).astype(np.float32)
    gb, gl, gm = map(jnp.asarray, pad_targets(labels, B, M, (640, 640)))

    def crit_fn(f0):
        return crit(f0, gb, gl, gm).total

    dt = timeit_chained(crit_fn, (feats,), iters=30)
    print(f"criterion (current): {dt * 1e3:7.3f} ms", flush=True)

    def crit_grad(f0):
        return jax.grad(lambda f: crit(f, gb, gl, gm).total)(f0)

    dt = timeit_chained(crit_grad, (feats,), iters=30)
    print(f"criterion grad     : {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
