"""AOT-compile the fused multi-chip train step for a REAL TPU topology — no chips needed.

The 8-device CPU-mesh dryrun (`__graft_entry__.dryrun_multichip`) proves the
sharded program *executes*; this proves the conv+SyncBN+all-reduce FUSED
program (`train/trainer.py::make_flat_train_step`, the multi-chip TPU default)
*compiles for actual v5e hardware*: deviceless lowering via
`jax.experimental.topologies.get_topology_desc` + `.lower().compile()`
produces the real XLA:TPU executable for an 8-chip v5e mesh, including the
gradient/BN-moment all-reduces over ICI.  This closes the gap the reference
covers with `torch.nn.parallel.DistributedDataParallel` + SyncBN
(`/root/reference/train_mul.py:117-206`): its DDP surface is replaced by ONE
compiled SPMD program whose collectives are verified to lower for the target.

Run (CPU-only, does not touch the TPU):
    python tools/aot_multichip.py --quick            # 128x128, b8  (~1 min)
    python tools/aot_multichip.py                    # 640x640, b16 (minutes)
    python tools/aot_multichip.py --serve            # also the serving pipeline

Writes MULTICHIP_AOT.json at the repo root and exits nonzero on any failure —
CI-able: it fails if the fused program stops compiling for multi-chip TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"  # deviceless: never grab the axon TPU


def count_collectives(hlo_text: str) -> dict:
    ops = {}
    for name in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute"):
        ops[name] = len(re.findall(rf"\b{name}(?:-start)?\(", hlo_text)) or \
            len(re.findall(rf"\b{name}\b", hlo_text))
    return ops


def build_step(cfg, tc, fold_shuffle=False):
    import jax

    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
    from dcfa_yolo_tpu.train.flat_opt import (FlatAdam, FlatSGD, build_factors,
                                              init_flat_opt)
    from dcfa_yolo_tpu.train.loss import YoloLoss
    from dcfa_yolo_tpu.train.trainer import make_flat_train_step

    model = DCFAYolo(cfg, fold_shuffle=fold_shuffle)
    var_struct = jax.eval_shape(
        lambda k: init_model(cfg, k)[1], jax.random.PRNGKey(0))
    factors = build_factors(var_struct["params"], var_struct["batch_stats"])
    criterion = YoloLoss(cfg, tc)
    step = make_flat_train_step(model, criterion, tc, factors, False)
    opt_struct = jax.eval_shape(lambda: init_flat_opt(tc, factors.n_params))
    return step, factors, opt_struct


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--topology", default="v5e:2x4",
                   help="PJRT TPU topology name (8 chips default)")
    p.add_argument("--batch", type=int, default=16, help="GLOBAL batch")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--quick", action="store_true",
                   help="128x128 b8 shapes (fast CI check, same program shape)")
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--serve", action="store_true",
                   help="also AOT-compile the batched serving pipeline")
    p.add_argument("--fold-shuffle", action="store_true",
                   help="compile the FOLDED train graph (train.py "
                        "--fold-shuffle): channel_shuffles removed, weights "
                        "pre-permuted — same shapes, different step program")
    p.add_argument("--out", default=os.path.join(REPO, "MULTICHIP_AOT.json"))
    args = p.parse_args()
    if args.quick:
        args.input_shape, args.batch = [128, 128], 8

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")

    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.train.trainer import Batch, FlatTrainState

    t0 = time.time()
    topo = topologies.get_topology_desc(args.topology, "tpu")
    devs = np.array(topo.devices)
    mesh = Mesh(devs.reshape(-1), ("data",))
    n_dev = devs.size
    print(f"[topo] {args.topology}: {n_dev} devices, deviceless")
    assert args.batch % n_dev == 0, "global batch must divide the mesh"

    cfg = ModelConfig(num_classes=1, phi="n",
                      input_shape=tuple(args.input_shape),
                      compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=args.batch, optimizer_type=args.optimizer)
    step, factors, opt_struct = build_step(cfg, tc, args.fold_shuffle)

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))

    def sds(shape, dtype, sh):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    state = FlatTrainState(
        flat_params=sds((factors.n_params,), jnp.float32, rep),
        flat_stats=sds((factors.n_stats,), jnp.float32, rep),
        opt=jax.tree_util.tree_map(
            lambda s: sds(s.shape, s.dtype, rep), opt_struct),
        ema_p=sds((factors.n_params,), jnp.float32, rep),
        ema_s=sds((factors.n_stats,), jnp.float32, rep),
        ema_updates=sds((), jnp.int32, rep),
    )
    b, (h, w) = args.batch, args.input_shape
    m = tc.max_boxes
    batch = Batch(
        rgb=sds((b, h, w, 3), jnp.float32, dat),
        nir=sds((b, h, w, 3), jnp.float32, dat),
        gt_boxes=sds((b, m, 4), jnp.float32, dat),
        gt_labels=sds((b, m), jnp.float32, dat),
        gt_mask=sds((b, m), jnp.float32, dat),
    )
    lr = jax.ShapeDtypeStruct((), jnp.float32)

    # The ShapeDtypeStructs carry their NamedSharding; jit infers in_shardings
    # from them at lower() time (deviceless AOT path).
    jitted = jax.jit(step, donate_argnums=(0,))
    print("[lower] tracing the fused train step ...")
    lowered = jitted.lower(state, batch, lr)
    print(f"[compile] XLA:TPU for {args.topology} ...")
    compiled = lowered.compile()
    dt = time.time() - t0
    hlo = compiled.as_text()
    colls = count_collectives(hlo)
    mem = compiled.memory_analysis()
    result = {
        "topology": args.topology,
        "devices": int(n_dev),
        "global_batch": args.batch,
        "input_shape": list(args.input_shape),
        "optimizer": args.optimizer,
        "fold_shuffle": bool(args.fold_shuffle),
        "train_step": {
            "compiled": True,
            "collectives": colls,
            "generated_code_bytes": int(mem.generated_code_size_in_bytes),
            "argument_bytes": int(mem.argument_size_in_bytes),
            "temp_bytes": int(mem.temp_size_in_bytes),
            "compile_seconds": round(dt, 1),
        },
    }
    assert colls["all-reduce"] > 0, (
        "fused train step compiled with NO all-reduce — DP gradient sync is "
        "missing from the multi-chip program")
    print(f"[ok] train step compiled in {dt:.1f}s; collectives: {colls}; "
          f"temp {mem.temp_size_in_bytes / 2**20:.0f} MiB/chip")

    if args.serve:
        from dcfa_yolo_tpu.infer.pipeline import detect_batch
        from dcfa_yolo_tpu.models.reparam import deploy_variables
        from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

        smodel = DCFAYolo(cfg, deploy=True)
        var_struct = jax.eval_shape(
            lambda k: deploy_variables(init_model(cfg, k)[1]),
            jax.random.PRNGKey(0))
        t1 = time.time()

        def serve_fn(vs, rgb, nir, hw):
            return detect_batch(smodel, vs, rgb, nir, hw, conf_thres=0.5,
                                iou_thres=0.3, letterbox=True, max_det=300)

        vs = jax.tree_util.tree_map(
            lambda s: sds(s.shape, s.dtype, rep), var_struct)
        imgs = sds((b, h, w, 3), jnp.uint8, dat)
        hw = sds((b, 2), jnp.float32, dat)
        cserve = jax.jit(serve_fn).lower(vs, imgs, imgs, hw).compile()
        result["serve_pipeline"] = {
            "compiled": True,
            "compile_seconds": round(time.time() - t1, 1),
            "generated_code_bytes":
                int(cserve.memory_analysis().generated_code_size_in_bytes),
        }
        print(f"[ok] serving pipeline compiled in {time.time() - t1:.1f}s")

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
