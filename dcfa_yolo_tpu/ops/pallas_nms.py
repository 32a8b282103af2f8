"""Pallas TPU kernel for greedy NMS suppression.

The XLA path (`ops/nms.py`) materializes a (K, K) IoU matrix in HBM and runs a
K-step `fori_loop` over rows of it.  This kernel keeps the coordinate vectors
and the alive/keep state resident in VMEM and computes each step's IoU row on
the fly on the VPU — no K×K intermediate, one HBM round-trip total.

Layout: coordinates arrive as four (B, K) planes (K on the 128-lane axis —
(B, K, 4) would waste 31/32 of every tile on the 4-wide trailing dim).

Semantics are identical to `ops.nms._greedy_suppress` (score-descending
candidates, strict `iou > threshold` suppression), verified by
tests/test_pallas_nms.py.  Grid: one program per batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, alive_ref, keep_ref, *,
                iou_thres: float):
    k = x1_ref.shape[-1]
    x1 = x1_ref[0, 0, :]
    y1 = y1_ref[0, 0, :]
    x2 = x2_ref[0, 0, :]
    y2 = y2_ref[0, 0, :]
    area = (x2 - x1) * (y2 - y1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    def body(i, state):
        alive, keep = state
        # scalar extraction via masked reduction — Mosaic has no dynamic_slice
        # on values, and a one-hot multiply-reduce is a single VPU pass
        sel = (col == i).astype(jnp.float32)
        pick = lambda v: jnp.sum(v * sel)
        is_kept = pick(alive)
        bx1, by1, bx2, by2, ba = pick(x1), pick(y1), pick(x2), pick(y2), pick(area)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + ba - inter + 1e-7)
        suppress = jnp.where(is_kept > 0.0,
                             (iou > iou_thres).astype(jnp.float32), 0.0)
        suppress = jnp.where(col == i, 0.0, suppress)
        keep = jnp.where(col == i, is_kept, keep)
        alive = alive * (1.0 - suppress)
        return alive, keep

    alive0 = alive_ref[0, 0, :]
    keep0 = jnp.zeros((k,), jnp.float32)
    _, keep = jax.lax.fori_loop(0, k, body, (alive0, keep0))
    keep_ref[0, 0, :] = keep


def _suppress_planes(x1, y1, x2, y2, alive, *, iou_thres, interpret):
    """Per-shard pallas_call on (B, 1, K) planes → (B, 1, K) keep mask."""
    b, _, k = x1.shape
    kernel = functools.partial(_nms_kernel, iou_thres=iou_thres)
    spec = pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(x1, y1, x2, y2, alive)


@functools.lru_cache(maxsize=None)
def _partitionable_suppress(iou_thres: float, interpret: bool):
    """Mosaic custom-calls cannot be auto-partitioned by GSPMD/Shardy, which
    would break batch-sharded DP serving with the Pallas NMS backend.  The
    kernel is trivially batch-parallel (grid=(B,), one program per image), so
    declare exactly that: dim 0 passes through, everything else replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl = functools.partial(_suppress_planes, iou_thres=iou_thres,
                             interpret=interpret)
    fn = custom_partitioning(lambda *a: impl(*a))

    def _bshard(sharding, shape):
        spec0 = sharding.spec[0] if len(sharding.spec) else None
        return NamedSharding(sharding.mesh,
                             P(spec0, *([None] * (len(shape.shape) - 1))))

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _bshard(arg_shapes[0].sharding, result_shape)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(_bshard(a.sharding, a) for a in arg_shapes)
        result_sharding = _bshard(arg_shapes[0].sharding, result_shape)
        return mesh, impl, result_sharding, arg_shardings

    fn.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        # Shardy path (the default partitioner in this jax): batch dim is
        # elementwise, candidate axis must stay whole on each shard
        sharding_rule="b u k, b u k, b u k, b u k, b u k -> b u k",
        need_replication_factors=("u", "k"),
    )
    return fn


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_suppress(boxes: jnp.ndarray, alive: jnp.ndarray,
                           iou_thres: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched greedy suppression.  boxes (B, K, 4) score-sorted xyxy;
    alive (B, K) bool → keep (B, K) bool.  interpret=True runs the kernel in
    the Pallas interpreter (for CPU tests).  Batch-partitionable: under a
    batch-sharded jit the kernel runs per-shard with no resharding."""
    # (B, 1, K) planes: K rides the 128-lane axis, the singleton dim keeps the
    # block shape legal for the Mosaic tiling rules
    planes = [boxes[..., j].astype(jnp.float32)[:, None, :] for j in range(4)]
    alive_p = alive.astype(jnp.float32)[:, None, :]
    if len(jax.devices()) > 1:
        keep = _partitionable_suppress(iou_thres, interpret)(*planes, alive_p)
    else:
        # custom_partitioning needs a live-backend Python callback at compile
        # time, which AOT/chipless compilers (incl. the axon remote-compile
        # helper) cannot provide ("Custom emitter for CustomSPMDPartitioning
        # not found") — and with one device there is nothing to partition
        keep = _suppress_planes(*planes, alive_p, iou_thres=iou_thres,
                                interpret=interpret)
    return keep[:, 0, :] > 0.5
