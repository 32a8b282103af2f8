"""A/B the fused train step with and without pack_state on the real chip.

pack_state=True flattens the ~3000-leaf TrainState into ONE device buffer so
remote-dispatch platforms (axon) pay one per-output handle instead of
thousands; it costs extra compile time.  Measures whether it should be the
TPU default.  Timing: donated-state chain + final scalar fetch (honest under
axon, see utils/profiling.timeit_chained docstring).

Measured (v5e, b16 640^2 bf16, round 2): pack_state=False 97.03 ms/step,
pack_state=True 97.09 ms/step -- NO steady-state difference.  Donated-buffer
chaining already amortizes the per-leaf handle cost, and the in-jit
ravel/unravel slices cost exactly what they save; pack_state therefore stays
opt-in (it only helps workflows that fetch/restore whole states frequently).
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
        float(lb.total)
        trials.append((time.perf_counter() - t0) / iters)
    return sorted(trials)[1]


def main():
    b, size, m = 16, 640, 64
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    tc = TrainConfig(max_boxes=m, batch_size=b)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.Generator(np.random.PCG64(0))
    rgb = rng.random((b, size, size, 3), np.float32)
    nir = rng.random((b, size, size, 3), np.float32)
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(b)]).astype(np.float32)
    gt = pad_targets(labels, b, m, (size, size))

    for pack in (False, True):
        var_copy = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
        t0 = time.time()
        trainer = Trainer(model, var_copy, tc, pack_state=pack)
        batch = trainer.put_batch(rgb, nir, *gt)
        dt = time_step(trainer, batch)
        print(f"pack_state={pack}: {dt * 1e3:8.2f} ms/step "
              f"({b / dt:6.1f} img/s)  [total incl compile {time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
