"""On-chip A/B of the round-3 training-graph byte cuts: the full fused train
step timed across {baseline, --fold-shuffle, --train-stem pallas, both}.

Deviceless v5e cost-bytes predict (b16 640², bf16 batches): 83.57 baseline →
78.49 folded → 76.14 folded+pallas-stem GB/step (tools/train_traffic_aot.py);
the measured baseline step (96.6 ms) sits on the 819 GB/s HBM roofline, so
bytes should convert to time ~1:1.  This tool is the decision gate for
flipping either feature on by default.

Run in background (one TPU job at a time on the axon tunnel):
    python tools/train_stem_ab.py [batch] [size] > /tmp/train_stem_ab.log 2>&1
Optionally set AB_REMAT=1 to time the remat (b128-recipe) variants.
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
from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer


def time_step(name: str, fold: bool, stem: str, b: int, size: int,
              remat: bool) -> float:
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16", remat=remat,
                      train_stem_backend=stem)
    tc = TrainConfig(max_boxes=64, batch_size=b)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    if fold:
        variables = jax.jit(fold_shuffle_variables)(variables)
        model = DCFAYolo(cfg, fold_shuffle=True)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = rng.random((b, size, size, 3), np.float32)
    nir = rng.random((b, size, size, 3), np.float32)
    labels = np.concatenate([
        np.stack([np.full(8, j), np.zeros(8),
                  rng.uniform(0.2, 0.8, 8), rng.uniform(0.2, 0.8, 8),
                  rng.uniform(0.05, 0.3, 8), rng.uniform(0.05, 0.3, 8)], 1)
        for j in range(b)])
    gt = pad_targets(labels.astype(np.float32), b, 64, (size, size))

    trainer = Trainer(model, variables, tc)
    batch = trainer.put_batch(rgb, nir, *gt)
    lb = trainer.train_step(batch, 1e-3)
    loss0 = float(lb.total)
    for _ in range(8):  # axon post-compile warm-up stalls
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    def burst(n):
        nonlocal lb
        t0 = time.perf_counter()
        for _ in range(n):
            lb = trainer.train_step(batch, 1e-3)
        float(lb.total)  # donated-state chain; final fetch closes the tail
        return time.perf_counter() - t0

    # steady-state slope (1x vs 3x burst): subtracts the fixed ~23 ms
    # per-burst fetch RPC exactly (ROUND5.md; ~1% at 90 ms steps, but keeps
    # the protocol uniform with bench.py/serve_ab_matrix)
    trials = []
    for _ in range(3):
        t1 = burst(10)
        t3 = burst(30)
        trials.append((t3 - t1) / 20)
    dt = sorted(trials)[1]
    print(f"{name:22s} b{b} {size}^2: {dt * 1e3:8.2f} ms/step  "
          f"{b / dt:7.1f} img/s   (first-step loss {loss0:.4f}, "
          f"trials {[f'{t*1e3:.2f}' for t in trials]})", flush=True)
    return dt


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    remat = os.environ.get("AB_REMAT", "0") == "1"
    base = time_step("baseline", False, "xla", b, size, remat)
    folded = time_step("fold-shuffle", True, "xla", b, size, remat)
    both = time_step("fold+pallas-stem", True, "pallas", b, size, remat)
    print(f"fold: {folded / base:.3f}x   fold+stem: {both / base:.3f}x  "
          f"({(base - both) * 1e3:+.2f} ms saved/step)", flush=True)


if __name__ == "__main__":
    main()
