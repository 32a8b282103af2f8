"""Per-kernel on-chip profile of the fused TRAIN step.

The deviceless byte attribution (tools/train_traffic_aot.py + hlo_traffic)
ranks the train step's accessed bytes: ~31% async slice/copy DMAs (layout
relayouts + concat/split gradients), stems ~17%, shuffles ~6% (now foldable).
Cost-bytes cannot attribute *time* — this captures a real device trace of the
Trainer step and ranks HLO ops by measured self-time, to decide whether the
DMA category is actually on the critical path (TPU DMAs overlap compute) and
where the next training optimization should go.

Usage:  python tools/train_kernel_profile.py [batch] [size] [fold|nofold]
        [stem] [iters]      (defaults: 16 640 fold xla 10)
        AB_REMAT=1 profiles the remat (b128-recipe) graph.
"""

from __future__ import annotations

import json
import os
import sys

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

from kernel_profile import _parse_xplanes, categorize  # noqa: E402


def main() -> None:
    import collections
    import tempfile

    argv = sys.argv[1:]
    b = int(argv[0]) if len(argv) > 0 else 16
    size = int(argv[1]) if len(argv) > 1 else 640
    fold = (argv[2] if len(argv) > 2 else "fold") == "fold"
    stem = argv[3] if len(argv) > 3 else "xla"
    iters = int(argv[4]) if len(argv) > 4 else 10
    remat = os.environ.get("AB_REMAT", "0") == "1"

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  b{b} {size}^2 "
          f"fold={fold} stem={stem} remat={remat}", flush=True)

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
    for _ in range(10):  # axon post-compile warm-up stalls
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)

    trace_dir = os.environ.get("KP_TRACE_DIR") or tempfile.mkdtemp(
        prefix="ktrain_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        lb = trainer.train_step(batch, 1e-3)
    float(lb.total)
    jax.profiler.stop_trace()
    print(f"trace: {trace_dir}", flush=True)

    totals, counts, planes = _parse_xplanes(trace_dir)
    if not totals:
        print(f"no device events parsed (planes seen: {planes})")
        return
    grand = sum(totals.values())
    print(f"total device op time: {grand/1e12*1e3/iters:.3f} ms/step "
          f"({b/(grand/1e12/iters):.1f} img/s implied)")

    cat_tot = collections.Counter()
    for name, ps in totals.items():
        cat_tot[categorize(name)] += ps
    print("\n-- category rollup --")
    for cat, ps in cat_tot.most_common():
        print(f"{ps/grand*100:6.2f}%  {ps/1e12*1e3/iters:8.4f} ms/step  {cat}")

    print("\n-- top 50 ops by total device time --")
    for name, ps in totals.most_common(50):
        print(f"{ps/grand*100:6.2f}%  {ps/1e12*1e3/iters:8.4f} ms/step  "
              f"x{counts[name]:<4d} {name[:110]}")

    print("\nJSON:", json.dumps({
        "ms_per_step": round(grand / 1e12 * 1e3 / iters, 4),
        "categories": {c: round(p / grand, 4) for c, p in cat_tot.items()},
    }))


if __name__ == "__main__":
    main()
