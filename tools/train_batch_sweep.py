"""Training-step throughput vs batch size on the real chip.

The serving sweep showed per-pair HBM traffic falling steeply with batch
(2.05 -> 0.50 ms/pair from b8 to b128) as per-program and layout-padding
overheads amortize; this measures whether the train step scales the same
way.  The reference recipe is b16 (`train_mul.py:72`) — larger batches are
a throughput knob with the standard lr x batch/64 scaling the recipe
already applies (`TrainConfig.scaled_lrs`).

Usage: python tools/train_batch_sweep.py [b1 b2 ...]   (default 16 32 64)

Measured (v5e, 640^2 bf16, round 2): b16 97.0 ms/step = 165 img/s,
b32 130.6 ms = 245 img/s, b64 190.1 ms = 337 img/s, b128 227.3 ms =
563 img/s — per-image cost 6.07 -> 1.78 ms, the same amortization the
serving sweep shows.  b256 exceeds the chip's HBM (compile reports
22.3 GB needed of 15.75 GB), so b128 is the single-chip ceiling.
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

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer


def time_step(trainer, batch, iters=20):
    lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    for _ in range(8):
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            lb = trainer.train_step(batch, 1e-3)
        float(lb.total)  # donated-state chain serializes; fetch closes it
        trials.append((time.perf_counter() - t0) / iters)
    return sorted(trials)[1]


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    size, m = 640, 64
    remat = os.environ.get("SWEEP_REMAT") == "1"
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16", remat=remat)
    if remat:
        print("[remat] backbones rematerialized in backward", flush=True)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.Generator(np.random.PCG64(0))
    for b in sizes:
        var_copy = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
        tc = TrainConfig(max_boxes=m, batch_size=b)
        trainer = Trainer(model, var_copy, tc)
        rgb = rng.random((b, size, size, 3), np.float32)
        labels = np.concatenate([
            np.stack([np.full(8, j), np.zeros(8),
                      rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                      rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
            for j in range(b)]).astype(np.float32)
        batch = trainer.put_batch(rgb, rgb, *pad_targets(labels, b, m,
                                                         (size, size)))
        dt = time_step(trainer, batch)
        print(f"b{b:<4d}: {dt*1e3:8.2f} ms/step  {b/dt:7.1f} img/s  "
              f"({dt*1e3/b:.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
