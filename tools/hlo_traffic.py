"""Attribute the compiled pipeline's HBM traffic by HLO op kind.

The fused inference pipeline runs at ~75-83% of the v5e's HBM roofline;
remaining headroom (if any) hides in ops that move bytes without computing —
layout copies, transposes, converts XLA inserted between convs.  This tool
compiles the bench configuration, parses the optimized HLO, and prints the
top op kinds and single ops by output bytes, so layout thrash is visible
without a TensorBoard profile.

Usage: python tools/hlo_traffic.py [batch] [size]   (defaults 32, 640)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
               "u16": 2}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(txt: str) -> int:
    """Total bytes of all array shapes in an HLO result-type string."""
    total = 0
    for dt, dims in SHAPE_RE.findall(txt):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


_VIEW_OPS = ("parameter", "constant", "tuple", "get-tuple-element", "bitcast",
             "copy-start", "slice-start", "all-reduce-start", "custom-call-start")


def _strip_wrappers(meta: str) -> str:
    return "/".join(p for p in meta.split("/")
                    if not p.startswith(("jit(", "jvp(", "transpose(",
                                         "checkpoint", "remat")))


def attribute_traffic(hlo: str, depth: int = 2):
    """Approximate per-module HBM traffic (reads+writes) from optimized HLO.

    Counts, for every op outside fused-computation bodies (fusions count as
    one op: their operands are read and their outputs written; view ops —
    parameter/gte/bitcast/tuple and async `-start` halves — are free):
      * writes: the op's output bytes;
      * reads: the resolved output bytes of each distinct operand.
    Attributed to `fwd|bwd <first `depth` op_name path components>` with
    jit()/jvp()/transpose() wrappers stripped; ops with no metadata (relayout
    copies, DMAs) inherit their first operand producer's module.  While-loop
    bodies are counted ONCE (like XLA cost analysis), so loop-heavy code
    (iterative NMS/argmax) is under-counted by its trip count.  This is a
    ranking tool, not an exact model: double-buffering, VMEM residency and
    padding are invisible.  Returns (by_module, singles) where singles are
    (bytes, description) for the largest individual ops.
    """
    from collections import defaultdict

    # fused-computation names (fusion bodies — their ops are internal)
    fused_names = set()
    for line in hlo.splitlines():
        if "fusion(" in line and "calls=" in line:
            tail = line.split("calls=")[1]
            fused_names.add(tail.split(",")[0].split(")")[0].strip().lstrip("%"))

    op_re = re.compile(
        r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\],{}():/#\s]+?))\s+"
        r"([a-z][\w\-]*)\((.*)$")
    oper_re = re.compile(r"%[\w.\-]+")

    shape_of, meta_of, module_of = {}, {}, {}
    records = []  # (name, op, out_bytes, operands, meta, in_fused)
    cur_comp = None
    for line in hlo.splitlines():
        s = line.rstrip()
        if s and not s.startswith(" ") and "{" in s:
            cur_comp = s.split()[0].lstrip("%")
            continue
        m = op_re.match(s)
        if not m:
            continue
        name, rtype, op, rest = m.groups()
        b = shape_bytes(rtype)
        shape_of[name] = b
        meta = ""
        if 'op_name="' in rest:
            meta = rest.split('op_name="', 1)[1].split('"', 1)[0]
        meta_of[name] = meta
        # operand list = leading %refs before any computation-ref keyword
        cut = len(rest)
        for kw in (", kind=", "metadata=", "calls=", "condition=", "body=",
                   "to_apply=", "select=", "scatter=", "custom_call_target="):
            i = rest.find(kw)
            if i != -1:
                cut = min(cut, i)
        opers = oper_re.findall(rest[:cut])
        records.append((name, op, b, opers, meta, cur_comp in fused_names))

    by_module = defaultdict(int)
    singles = []
    for name, op, b, opers, meta, in_fused in records:
        if in_fused or op in _VIEW_OPS:
            continue
        reads = sum(shape_of.get(o, 0) for o in dict.fromkeys(opers))
        total = b + reads
        key = None
        if meta:
            tag = "bwd" if "transpose(" in meta else "fwd"
            path = _strip_wrappers(meta)
            key = f"{tag} {'/'.join(path.split('/')[:depth]) or '(root)'}"
        else:
            for o in opers:
                if meta_of.get(o):
                    key = module_of.get(o) or "(no meta)"
                    break
            key = (key or "(no meta)") + f" [{op}]"
        module_of[name] = key.split(" [")[0]
        by_module[key] += total
        singles.append((total, f"{name} {op} w={b/1e6:.0f}MB r={reads/1e6:.0f}MB"
                               f"  [{meta[:90]}]"))
    return by_module, singles


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import deploy_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True)
    variables = jax.jit(deploy_variables)(variables)
    image_hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    def fn(r, n):
        return detect_batch(model, variables, r, n, image_hw, conf_thres=0.5,
                            iou_thres=0.3, letterbox=True, max_det=300,
                            pre_nms_topk=512, nms_backend="xla")

    r = jnp.zeros((batch, 480, 602, 3), jnp.float32)
    compiled = jax.jit(fn).lower(r, r).compile()
    hlo = compiled.as_text()
    print(f"HLO: {len(hlo)/1e6:.1f} MB text", flush=True)

    by_kind = defaultdict(int)
    top_ops = []
    # one instruction per line: "%name = TYPE op(...)" or "ROOT ..."
    line_re = re.compile(r"=\s*((?:\([^)]*\)|\S+))\s+([a-z][\w-]*)\(")
    for line in hlo.splitlines():
        m = line_re.search(line)
        if not m:
            continue
        rtype, op = m.group(1), m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        b = shape_bytes(rtype)
        by_kind[op] += b
        if b > 1e6:
            top_ops.append((b, op, line.strip()[:140]))

    total = sum(by_kind.values())
    print(f"\ntotal output bytes (all ops): {total/1e9:.2f} GB "
          f"({total/batch/1e6:.0f} MB/pair)")
    print("\nby op kind (output bytes):")
    for op, b in sorted(by_kind.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {op:28s} {b/1e9:7.3f} GB  ({100*b/total:5.1f}%)")
    print("\ntop single ops:")
    for b, op, line in sorted(top_ops, reverse=True)[:15]:
        print(f"  {b/1e6:8.1f} MB  {line}")


if __name__ == "__main__":
    main()
