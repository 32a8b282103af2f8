"""Per-kernel on-chip profile of the fused serving pipeline.

Round-4 context: the v3 Pallas stem + shuffle folding cut the b128 pipeline to
0.419 ms/pair but HBM-roofline utilization FELL to 0.64 (from 0.81 in round 2)
— the graph is no longer purely bandwidth-bound, so roughly a third of the
remaining time is something else (per-kernel fixed overheads, VPU-bound
gating ops, DMA stalls).  XLA cost analysis cannot attribute *time*; this tool
captures a real device trace (jax.profiler) around chained pipeline
iterations and ranks HLO ops by measured self-time.

Trace parsing: tensorboard_plugin_profile's xspace converter when it works,
with a raw xplane_pb2 aggregation fallback (sums event durations per op name
on every device plane, skipping host planes).

Usage:  python tools/kernel_profile.py [batch] [stem] [fold|nofold] [iters]
        (defaults: 128 pallas_d fold 12)
Output: top-40 ops by total device time + a category rollup
        (convolution / pallas / copy-transpose / elementwise-fusion / nms /
        other), each with time share.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.reparam import deploy_variables, fold_shuffle_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


def _parse_xplanes(trace_dir: str):
    """Aggregate device-plane event durations per op name from xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals = collections.Counter()
    counts = collections.Counter()
    plane_names = []
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            plane_names.append(
                f"{plane.name}[{','.join(l.name for l in plane.lines)}]")
            # device planes only: TPU op lines live on '/device:TPU:N' planes
            if not ("TPU" in plane.name or "device" in plane.name.lower()):
                continue
            if "Host" in plane.name or "host" in plane.name:
                continue
            meta = {mid: m.name for mid, m in plane.event_metadata.items()}
            for line in plane.lines:
                # 'XLA Ops' carries per-HLO timing; 'XLA Modules'/'Steps'
                # would double-count
                if line.name and "op" not in line.name.lower():
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps
                    counts[name] += 1
    return totals, counts, plane_names


CATEGORIES = [
    ("convolution", re.compile(r"conv|dot", re.I)),
    ("pallas/custom", re.compile(r"custom-call|tpu_custom_call|pallas", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce/pool", re.compile(r"reduce", re.I)),
    ("fusion(elementwise)", re.compile(r"fusion", re.I)),
    ("loop/dynamic", re.compile(r"while|dynamic|scatter|gather|sort", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main() -> None:
    argv = sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else 128
    stem = argv[1] if len(argv) > 1 else "pallas_d"
    fold = (argv[2] if len(argv) > 2 else "fold") == "fold"
    iters = int(argv[3]) if len(argv) > 3 else 12
    size = int(os.environ.get("KP_SIZE", "640"))

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  batch={batch} "
          f"stem={stem} fold={fold} size={size}", flush=True)

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True, fold_shuffle=fold)
    variables = jax.jit(deploy_variables)(variables)
    if fold:
        variables = jax.jit(fold_shuffle_variables)(variables)

    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.uint8)
    hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    @jax.jit
    def fn(r, n):
        return detect_batch(model, variables, r, n, hw, conf_thres=0.5,
                            iou_thres=0.3, letterbox=True, max_det=300,
                            pre_nms_topk=512, nms_backend="pallas",
                            stem_backend=stem)

    # warm up past the axon post-compile stall (first ~10 executions)
    out = fn(rgb, nir)
    for _ in range(12):
        out = fn(rgb, nir)
    jax.block_until_ready(out)

    trace_dir = os.environ.get("KP_TRACE_DIR") or tempfile.mkdtemp(
        prefix="kprof_")
    jax.profiler.start_trace(trace_dir)
    # dispatch is async but the single TPU core executes serially, so
    # back-to-back submissions trace as steady-state executions; per-op
    # SHARES are trustworthy even where axon timing offsets are not
    for _ in range(iters):
        out = fn(rgb, nir)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"trace: {trace_dir}", flush=True)

    totals, counts, planes = _parse_xplanes(trace_dir)
    if not totals:
        print(f"no device events parsed (planes seen: {planes})")
        return
    grand = sum(totals.values())
    print(f"planes: {sorted(set(planes))}")
    print(f"total device op time: {grand/1e12*1e3:.3f} ms over {iters} iters "
          f"= {grand/1e12*1e3/iters:.3f} ms/iter "
          f"({grand/1e12*1e3/iters/batch*1e3:.1f} us/pair)")

    cat_tot = collections.Counter()
    for name, ps in totals.items():
        cat_tot[categorize(name)] += ps
    print("\n-- category rollup --")
    for cat, ps in cat_tot.most_common():
        print(f"{ps/grand*100:6.2f}%  {ps/1e12*1e3/iters:8.4f} ms/iter  {cat}")

    print("\n-- top 40 ops by total device time --")
    for name, ps in totals.most_common(40):
        print(f"{ps/grand*100:6.2f}%  {ps/1e12*1e3/iters:8.4f} ms/iter  "
              f"x{counts[name]:<4d} {name[:110]}")

    # machine-readable tail for downstream diffing
    print("\nJSON:", json.dumps({
        "ms_per_iter": round(grand / 1e12 * 1e3 / iters, 4),
        "categories": {c: round(p / grand, 4) for c, p in cat_tot.items()},
    }))


if __name__ == "__main__":
    main()
