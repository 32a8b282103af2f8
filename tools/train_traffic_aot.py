"""Attribute the TRAIN step's HBM traffic by op kind, deviceless for v5e.

The serving side's traffic attribution (tools/hlo_traffic.py) found the
fused stem win; this does the same for the fused train step using chipless
XLA:TPU AOT compilation (jax.experimental.topologies), so it runs with zero
chips.  Informs whether a differentiable fused stem / other byte cuts are
worth building for training.

Usage: python tools/train_traffic_aot.py [batch] [size]   (defaults 16, 640)
Env: DCFA_TRAIN_FOLD=1 measures the shuffle-folded train graph
(train.py --fold-shuffle): shuffles are pure permutations = relayout copies
fwd AND bwd every step; folding absorbs them into consumer weights.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.hlo_traffic import shape_bytes  # noqa: E402
from tools.serve_traffic_aot import materialized_bytes  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
    from dcfa_yolo_tpu.train.ema import init_ema
    from dcfa_yolo_tpu.train.loss import YoloLoss
    from dcfa_yolo_tpu.train.optim import build_optimizer
    from dcfa_yolo_tpu.train.trainer import Batch, TrainState, make_train_step

    fold = os.environ.get("DCFA_TRAIN_FOLD", "0") == "1"
    stem = os.environ.get("DCFA_TRAIN_STEM", "xla")
    remat = os.environ.get("DCFA_TRAIN_REMAT", "0") == "1"
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16", remat=remat)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    if stem == "pallas":
        # identical param tree, so init with the XLA stem and swap the step
        # graph; interpret MUST be pinned False for a TPU AOT target
        import dataclasses
        cfg = dataclasses.replace(cfg, train_stem_backend="pallas",
                                  train_stem_interpret=False)
        model = DCFAYolo(cfg)
    if fold:
        from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
        variables = fold_shuffle_variables(variables)
        model = DCFAYolo(cfg, fold_shuffle=True)
    tcfg = TrainConfig()
    criterion = YoloLoss(cfg)
    tx = build_optimizer(tcfg, variables["params"])
    opt_state = tx.init(variables["params"])
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt_state, init_ema(variables))
    step = make_train_step(model, criterion, tx, tcfg)

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    shr = NamedSharding(mesh, P())

    state_s = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shr), state)
    # images arrive in the compute dtype (Trainer.put_batch / device-aug
    # out_dtype host-cast) — the in-step f32→bf16 converts are gone
    img_dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    batch_s = Batch(
        rgb=jax.ShapeDtypeStruct((batch, size, size, 3), img_dt, sharding=shr),
        nir=jax.ShapeDtypeStruct((batch, size, size, 3), img_dt, sharding=shr),
        gt_boxes=jax.ShapeDtypeStruct((batch, 64, 4), jnp.float32, sharding=shr),
        gt_labels=jax.ShapeDtypeStruct((batch, 64), jnp.int32, sharding=shr),
        gt_mask=jax.ShapeDtypeStruct((batch, 64), jnp.bool_, sharding=shr),
    )
    lr_s = jax.ShapeDtypeStruct((), jnp.float32, sharding=shr)

    comp = jax.jit(step).lower(state_s, batch_s, lr_s).compile()
    ca = comp.cost_analysis()
    print(f"train step b{batch} {size}^2 bf16{' FOLDED' if fold else ''}"
          f"{' PALLAS-STEM' if stem == 'pallas' else ''}"
          f"{' REMAT' if remat else ''} (v5e AOT): "
          f"{ca['bytes accessed'] / 1e9:.2f} GB/step accessed, "
          f"{ca['flops'] / 1e9:.0f} GFLOP", flush=True)

    hlo = comp.as_text()
    dump = os.environ.get("HLO_DUMP", "/tmp/train_step_hlo.txt")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
        print(f"optimized HLO saved to {dump}")
    by_kind, _ = materialized_bytes(hlo)
    print(f"\nmaterialized output bytes (non-fusion-internal): "
          f"{sum(by_kind.values())/1e9:.2f} GB")

    from tools.hlo_traffic import attribute_traffic
    by_module, singles = attribute_traffic(hlo, depth=2)
    total = sum(by_module.values())
    print(f"\nread+write traffic (attribute_traffic): {total/1e9:.2f} GB")
    print("\nby module (reads+writes):")
    for k, v in sorted(by_module.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v/1e9:8.3f} GB  ({100*v/total:5.1f}%)  {k}")
    print("\ntop single ops:")
    for b, t in sorted(singles, key=lambda x: -x[0])[:30]:
        print(f"  {b/1e6:9.1f} MB  {t}")


if __name__ == "__main__":
    main()
