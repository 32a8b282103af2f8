"""Training-step perf breakdown on the real chip (VERDICT r1 item #2).

Times, with chained-dependency measurement (utils/profiling.timeit_chained):
  * the full fused train step (fwd+loss+bwd+opt+EMA),
  * eval-mode forward only,
  * train-mode forward (with BN stat mutation),
  * criterion (assigner + losses) on fixed features,
  * the assigner alone,
  * grad of fwd+loss (no optimizer/EMA).

Run in background: python tools/train_breakdown.py > /tmp/train_breakdown.log
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

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.train.loss import YoloLoss, pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer
from dcfa_yolo_tpu.utils.profiling import timeit_chained


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    b, size, m = 16, 640, 64
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    tc = TrainConfig(max_boxes=m, batch_size=b)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    criterion = YoloLoss(cfg, tc)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.random((b, size, size, 3), np.float32))
    nir = jnp.asarray(rng.random((b, size, size, 3), np.float32))
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(b)])
    gt_boxes, gt_labels, gt_mask = pad_targets(labels.astype(np.float32), b, m,
                                               (size, size))
    gt_boxes, gt_labels, gt_mask = map(jnp.asarray, (gt_boxes, gt_labels, gt_mask))

    # full trainer step (fused, donated) — time via repeated dispatch; the
    # donated state forms a natural chain (step N+1 consumes step N's state)
    import time as _t

    trainer = Trainer(model, variables, tc)
    batch = trainer.put_batch(np.asarray(rgb), np.asarray(nir),
                              np.asarray(gt_boxes), np.asarray(gt_labels),
                              np.asarray(gt_mask))
    lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    for _ in range(5):
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    trials = []
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(20):
            lb = trainer.train_step(batch, 1e-3)
        float(lb.total)  # state chain serializes; fetch closes the tail
        trials.append((_t.perf_counter() - t0) / 20)
    dt_step = sorted(trials)[1]
    print(f"{'full_train_step':22s}: {dt_step * 1e3:8.2f} ms  "
          f"{b / dt_step:7.1f} img/s", flush=True)

    params = trainer.state.params
    stats = trainer.state.batch_stats

    def fwd_eval(r):
        out = model.apply({"params": params, "batch_stats": stats}, r, nir,
                          train=False)
        return out.feats

    def fwd_train(r):
        out, mut = model.apply({"params": params, "batch_stats": stats}, r, nir,
                               train=True, mutable=["batch_stats"])
        return out.feats

    feats = jax.jit(fwd_train)(rgb)
    feats = jax.block_until_ready(feats)

    def loss_only(f0):
        lb = criterion(f0, gt_boxes, gt_labels, gt_mask)
        return lb.total

    def assigner_only(f0):
        no = 4 * cfg.reg_max + cfg.num_classes
        flat = jnp.concatenate([x.reshape(b, -1, no) for x in f0], 1).astype(jnp.float32)
        pd, ps = flat[..., :4 * cfg.reg_max], flat[..., 4 * cfg.reg_max:]
        pb = criterion.bbox_decode(pd)
        assign = criterion.assigner(
            jax.nn.sigmoid(ps), pb * criterion.stride_tensor,
            criterion.anchor_points * criterion.stride_tensor,
            gt_labels[..., None], gt_boxes, gt_mask[..., None])
        return assign.target_scores.sum()

    def grad_fwd_loss(r):
        def lf(p):
            out, mut = model.apply({"params": p, "batch_stats": stats}, r, nir,
                                   train=True, mutable=["batch_stats"])
            return criterion(out.feats, gt_boxes, gt_labels, gt_mask).total
        return jax.grad(lf)(params)

    for name, f, args in [
        ("fwd_eval", fwd_eval, (rgb,)),
        ("fwd_train", fwd_train, (rgb,)),
        ("criterion_only", loss_only, (feats,)),
        ("assigner_only", assigner_only, (feats,)),
        ("grad_fwd_loss", grad_fwd_loss, (rgb,)),
    ]:
        dt = timeit_chained(f, args, iters=20)
        print(f"{name:22s}: {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
