"""Measure the data-path economics on the real chip: host-fed vs TPU-resident.

Times three things with honest (fetch-synced) measurement:
  1. H2D: device_put of one host-augmented float32 batch (the BatchLoader
     path's per-step transfer);
  2. the on-device augmentation program (mosaic+HSV+mixup from the resident
     uint8 dataset) chained back-to-back;
  3. an aug -> train-step chain (the realistic per-step cost of the
     --device-aug pipeline).

Usage: python tools/bench_device_aug.py [annotation.txt] [batch] [size] [rdt]
(Defaults synthesize a 32-pair random dataset in memory; rdt = f32|bf16
selects the resampling matmul operand dtype.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def main():
    ann = sys.argv[1] if len(sys.argv) > 1 else ""
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    rdt = jnp.bfloat16 if (len(sys.argv) > 4 and sys.argv[4] == "bf16") else None
    print("resample dtype:", rdt or "float32", flush=True)

    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.data.device_aug import DeviceAugLoader, StagedDataset
    from dcfa_yolo_tpu.models.yolo import init_model
    from dcfa_yolo_tpu.parallel.mesh import make_mesh
    from dcfa_yolo_tpu.train.trainer import Trainer

    mesh = make_mesh()
    print("devices:", [d.device_kind for d in mesh.devices.flatten()], flush=True)

    if ann:
        with open(ann) as f:
            lines = [l.strip() for l in f if l.strip()]
        staged = None
    else:
        lines = ["synthetic"] * 32
        rng = np.random.default_rng(0)
        n = 32
        images = rng.integers(0, 255, (n, 2, size, size, 3), np.uint8)
        boxes = np.zeros((n, 64, 5), np.float32)
        boxes[:, :4, :4] = rng.uniform(0.1, 0.9, (n, 4, 4)).astype(np.float32)
        boxes[:, :4, :4].sort(-1)
        nbox = np.full((n,), 4, np.int32)
        orig = np.full((n, 2), float(size), np.float32)
        staged = StagedDataset(images, boxes, nbox, orig)

    t0 = time.perf_counter()
    ld = DeviceAugLoader(lines, (size, size), batch, mesh, max_boxes=64,
                         mosaic_prob=1.0, mixup_prob=1.0, epoch_length=100,
                         seed=0, staged=staged, resample_dtype=rdt)
    ld.set_epoch(0)
    print(f"staging+upload: {time.perf_counter()-t0:.1f}s "
          f"({ld.host_ds.images.nbytes/1e6:.0f} MB resident)", flush=True)

    # --- 1. H2D of a host float32 batch (BatchLoader per-step cost) ---
    hb = (np.random.rand(batch, size, size, 3).astype(np.float32),
          np.random.rand(batch, size, size, 3).astype(np.float32),
          np.zeros((batch, 64, 4), np.float32),
          np.zeros((batch, 64), np.float32),
          np.zeros((batch, 64), np.float32))

    @jax.jit
    def touch(b):
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in b)

    for _ in range(2):
        bt = [jax.device_put(x) for x in hb]
        float(touch(bt))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        bt = [jax.device_put(x) for x in hb]
        float(touch(bt))
    h2d = (time.perf_counter() - t0) / reps
    nbytes = sum(x.nbytes for x in hb)
    print(f"H2D host-f32 batch ({nbytes/1e6:.0f} MB): {h2d*1e3:.0f} ms "
          f"({nbytes/h2d/1e9:.3f} GB/s)", flush=True)

    # --- 2. aug program alone, chained (mosaic+mixup every sample) ---
    rng = np.random.Generator(np.random.PCG64(0))
    idxs = np.arange(len(ld.host_ds.images))[:batch]
    params = ld.sampler.sample(rng, np.resize(idxs, batch))

    def run_aug():
        return ld.augment_batch(params.idx, params)

    b = run_aug()
    # warm-up past the axon post-compile stall
    for _ in range(12):
        b = run_aug()
    float(jnp.sum(b.rgb[0, 0, 0]))
    t0 = time.perf_counter()
    iters = 20
    acc = 0.0
    for _ in range(iters):
        b = run_aug()
        acc += float(jnp.sum(b.rgb[0, 0, 0]))  # per-iter fetch: no overlap lie
    aug_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"device aug (b{batch}, {size}^2, mosaic+mixup): {aug_ms:.1f} ms/batch "
          f"= {batch/aug_ms*1e3:.0f} img/s", flush=True)

    # --- 3. aug + train step chain ---
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tc = TrainConfig(batch_size=batch, max_boxes=64)
    trainer = Trainer(model, variables, tc, mesh=mesh)
    lb = trainer.train_step(run_aug(), 1e-3)
    float(lb.total)
    for _ in range(12):
        lb = trainer.train_step(run_aug(), 1e-3)
    float(lb.total)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        lb = trainer.train_step(run_aug(), 1e-3)
    float(lb.total)  # single dependency fetch at the end (steps chain on state)
    step_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"aug+train step (b{batch}): {step_ms:.1f} ms/step "
          f"= {batch/step_ms*1e3:.0f} img/s end-to-end", flush=True)
    print(f"vs host path lower bound (H2D alone): {h2d*1e3:.0f} ms/step "
          f"= {batch/h2d:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
