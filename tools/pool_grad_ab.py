"""On-chip A/B of the maxpool backward: manual compare-route VJP vs XLA's
select-and-scatter (ops/pool.py module docstring).

The train HLO at b16 640^2 contains 8 select-and-scatter ops — two at the
full-res stem output (16,640,640,16) and six tiny SPPF ones — all replaced by
dense fusible compares under DCFA_POOL_GRAD=manual (opt-in; 'sas' is the
default).  This times the FULL fused train step both ways in one process
(each Trainer builds a fresh jitted step, and ops/pool.py reads the env at
trace time, so the two instances compile different programs).

VERDICT (round 4, on-chip v5e): manual = 613.9 ms/step vs sas 95.9 — 6.4x
slower; 'sas' stays the default permanently (ops/pool.py docstring).

Run in background: python tools/pool_grad_ab.py > /tmp/pool_grad_ab.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer


def time_step(mode: str, b: int, size: int) -> float:
    os.environ["DCFA_POOL_GRAD"] = mode
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    tc = TrainConfig(max_boxes=64, batch_size=b)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = rng.random((b, size, size, 3), np.float32)
    nir = rng.random((b, size, size, 3), np.float32)
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(b)])
    gt_boxes, gt_labels, gt_mask = pad_targets(labels.astype(np.float32), b, 64,
                                               (size, size))

    trainer = Trainer(model, variables, tc)
    batch = trainer.put_batch(rgb, nir, gt_boxes, gt_labels, gt_mask)
    lb = trainer.train_step(batch, 1e-3)
    loss0 = float(lb.total)
    for _ in range(8):  # axon post-compile warm-up stalls
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            lb = trainer.train_step(batch, 1e-3)
        float(lb.total)  # donated-state chain; final fetch closes the tail
        trials.append((time.perf_counter() - t0) / 20)
    dt = sorted(trials)[1]
    print(f"pool_grad={mode:7s} b{b} {size}^2: {dt * 1e3:8.2f} ms/step  "
          f"{b / dt:7.1f} img/s   (first-step loss {loss0:.4f}, "
          f"trials {[f'{t*1e3:.2f}' for t in trials]})", flush=True)
    return dt


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    dt_sas = time_step("sas", b, size)
    dt_man = time_step("manual", b, size)
    print(f"manual/sas: {dt_man / dt_sas:.3f}x  "
          f"({(dt_sas - dt_man) * 1e3:+.2f} ms saved/step)", flush=True)


if __name__ == "__main__":
    main()
