"""Fusion-aware HBM traffic attribution for the serving pipeline, deviceless.

Compiles bench.py's exact pipeline configuration for a real v5e target with
zero chips (jax.experimental.topologies), then attributes bytes two ways:

  * XLA cost analysis "bytes accessed" (the roofline input bench.py uses);
  * materialized op outputs — ops OUTSIDE fused-computation bodies — which is
    where relayout copies, DMA slices and custom-call buffers show up.

Unlike tools/hlo_traffic.py (which compiles for the live backend), this sees
the real TPU lowering without touching the axon chip, and forces the REAL
Mosaic stem kernel (stem_interpret=False) — the pipeline's default heuristic
would silently lower Pallas interpret mode under a cpu default backend, which
overstated the stem pipeline by 22 MB/pair when first measured.

Measured (b128 640², bf16, deploy graph, this tool, jax 0.8.x):
  stem=xla    f32-in  no-fold : 339.8 MB/pair   (round-2 bench config)
  stem=pallas f32-in  no-fold : 266.9
  stem=pallas u8-in   no-fold : 260.6
  stem=pallas u8-in   fold    : 244.8 -> 231.9 (head split-concat removal
  stem=xla    u8-in   fold    : 315.3 -> 289.1  -2.8%, DFL two-reduction
  stem=pallas u8-in   pair    : 296.1            -1.1%, letterbox pad fold
                                                 -1.4%; pair loses at b128)
b1: xla+f32 2111.4 / pallas+u8+fold 765.5->785.1 / pair 689.6->709.2 MB/pair
(the three b128 wins each cost ~1% at b1 — lane/sublane padding of the
smaller separate buffers — where time is dominated by fixed per-execution
overheads, not bytes; b1 remains padding-bound, see README)

Usage: python tools/serve_traffic_aot.py [batch] [xla|pallas] [u8|f32] [fold] [pair]
("pair" implies fold: the paired backbones of models/pairing.py)
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.hlo_traffic import shape_bytes


def materialized_bytes(hlo: str):
    """(by_op_kind, singles) over ops outside fused-computation bodies."""
    fused_names = set()
    for line in hlo.splitlines():
        if "fusion(" in line and "calls=" in line:
            tail = line.split("calls=")[1]
            fused_names.add(
                tail.split(",")[0].split(")")[0].strip().lstrip("%"))
    by_kind = defaultdict(int)
    singles = []
    cur_comp = None
    for line in hlo.splitlines():
        s = line.rstrip()
        if s and not s.startswith(" ") and "{" in s:
            cur_comp = s.split()[0].lstrip("%")
            continue
        t = s.strip()
        if "=" not in t or not t.startswith(("%", "ROOT")):
            continue
        if cur_comp in fused_names:
            continue
        rhs = t.split("=", 1)[1].strip()
        shape_txt = rhs.split(" ")[0]
        op = rhs[len(shape_txt):].strip().split("(")[0].strip().split(".")[0]
        b = shape_bytes(shape_txt)
        if b and op:
            by_kind[op] += b
            name = t.split("=", 1)[0].strip()
            meta = ""
            if 'op_name="' in t:
                meta = t.split('op_name="', 1)[1].split('"', 1)[0]
            singles.append((b, f"{name} = {shape_txt} {op}  [{meta}]"))
    return by_kind, singles


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stem = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    in_dtype = sys.argv[3] if len(sys.argv) > 3 else "u8"
    pair = "pair" in sys.argv[4:]
    fold = "fold" in sys.argv[4:] or pair

    import jax
    jax.config.update("jax_platforms", "cpu")  # deviceless — never grab axon
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import deploy_variables, fold_shuffle_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True, fold_shuffle=fold, pair_backbones=pair)
    variables = jax.jit(deploy_variables)(variables)
    if fold:
        variables = jax.jit(fold_shuffle_variables)(variables)
    if pair:
        from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

        variables = jax.jit(pair_backbone_variables)(variables)
    if "castw" in sys.argv[4:]:
        # measured +11.8 MB/pair at b1: bf16 kernel layouts pad small convs
        # to MORE bytes than f32 — why predictor cast_weights defaults False
        from dcfa_yolo_tpu.models.reparam import cast_conv_kernels

        variables = jax.jit(cast_conv_kernels)(variables)

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    shr = NamedSharding(mesh, P())

    def fn(variables, r, n, hw):
        return detect_batch(model, variables, r, n, hw, conf_thres=0.5,
                            iou_thres=0.3, letterbox=True, max_det=300,
                            pre_nms_topk=512, nms_backend="pallas",
                            stem_backend=stem, stem_interpret=False)

    var_s = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shr),
        variables)
    idt = jnp.float32 if in_dtype == "f32" else jnp.uint8
    r_s = jax.ShapeDtypeStruct((batch, 480, 602, 3), idt, sharding=shr)
    hw_s = jax.ShapeDtypeStruct((batch, 2), jnp.float32, sharding=shr)

    comp = jax.jit(fn).lower(var_s, r_s, r_s, hw_s).compile()
    ca = comp.cost_analysis()
    print(f"serve b{batch} 640^2 stem={stem} in={in_dtype} fold={fold} "
          f"pair={pair} "
          f"(v5e AOT): {ca['bytes accessed'] / 1e9:.2f} GB accessed = "
          f"{ca['bytes accessed'] / batch / 1e6:.1f} MB/pair, "
          f"{ca['flops'] / 1e9:.0f} GFLOP", flush=True)

    by_kind, singles = materialized_bytes(comp.as_text())
    total = sum(by_kind.values())
    print(f"\nmaterialized output bytes (non-fusion-internal): "
          f"{total/1e9:.2f} GB = {total/batch/1e6:.1f} MB/pair")
    print("\nby op kind:")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {k:24s} {v/1e9:8.3f} GB  ({100*v/total:5.1f}%)")
    print("\ntop single ops:")
    for b, t in sorted(singles, key=lambda x: -x[0])[:20]:
        print(f"  {b/1e6:9.1f} MB  {t}")


if __name__ == "__main__":
    main()
