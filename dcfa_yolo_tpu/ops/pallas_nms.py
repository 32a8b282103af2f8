"""Pallas TPU kernel for greedy NMS suppression.

The XLA path (`ops/nms.py`) materializes a (K, K) IoU matrix in HBM and runs a
K-step `fori_loop` over rows of it.  This kernel keeps the coordinate vectors
and the alive/keep state resident in VMEM and computes each step's IoU row on
the fly on the VPU — no K×K intermediate, one HBM round-trip total.

Layout: coordinates arrive as four (B, K) planes (K on the 128-lane axis —
(B, K, 4) would waste 31/32 of every tile on the 4-wide trailing dim).

Semantics are identical to `ops.nms._greedy_suppress` (score-descending
candidates, strict `iou > threshold` suppression), verified by
tests/test_pallas_nms.py.

Two kernel shapes, bit-identical outputs:

- **per-image** (`_nms_kernel`, grid=(B,)): one program per image, a
  dynamic-trip-count loop over candidates with SMEM scalar coordinate loads.
  Best at tiny batch, where its per-iteration work is a fraction of a vreg.
- **lane-batched** (`_nms_kernel_batched`, B ≥ _BATCHED_MIN_B): planes
  transposed to (K, B) — candidate index on sublanes, images on lanes — so
  ONE loop over candidates updates every image as (K, B) vector ops.  The
  greedy dependency chain is along the candidate axis only; batch is
  embarrassingly parallel, and the per-image form serializes it (128 programs
  × K loop steps of scalar-latency-bound work: measured 9.4 ms/iter at b128
  k512 full occupancy = the largest serial op in the serving pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(n_ref, x1_ref, y1_ref, x2_ref, y2_ref, alive_ref,
                x1s_ref, y1s_ref, x2s_ref, y2s_ref, keep_ref, alive_scr, *,
                iou_thres: float):
    """One program per image.  Three structural speedups over the naive
    fixed-K loop, all bit-exact (the round-4 b128 serving profile measured the
    fixed-K form at 11.1 ms/iter = 21% of the whole pipeline):

    - **dynamic trip count** (`n_ref`, SMEM): candidates arrive score-sorted,
      so every index past the last initially-alive one is a provable no-op
      (alive can only be cleared, a dead candidate suppresses nothing and
      records keep=0, which the init already wrote) — the loop runs
      `last_alive+1 ≤ K` steps.  At serving confidences the alive prefix is
      tens, not K=512.
    - **SMEM scalar coordinates**: the candidate-i box is read as four scalar
      loads from an SMEM copy of the planes instead of four one-hot
      multiply-reduces over the VMEM vectors (a one-hot sum of v equals v[i]
      exactly — every other term is +0.0).
    - **suppressed-candidate skip**: `alive` lives in a VMEM scratch and the
      whole IoU-row update is inside `pl.when(is_kept > 0)` — v1 computed the
      row and multiplied by 0; typical NMS suppresses most of the prefix, so
      most iterations reduce to one masked pick of alive[i].
    """
    k = x1_ref.shape[-1]
    x1 = x1_ref[0, 0, :]
    y1 = y1_ref[0, 0, :]
    x2 = x2_ref[0, 0, :]
    y2 = y2_ref[0, 0, :]
    area = (x2 - x1) * (y2 - y1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    alive_scr[0, :] = alive_ref[0, 0, :]

    def body(i, keep):
        alive = alive_scr[0, :]
        # alive[i] via one-hot multiply-reduce (alive is loop-mutated vector
        # state — Mosaic has no dynamic scalar indexing on VMEM)
        sel = (col == i).astype(jnp.float32)
        is_kept = jnp.sum(alive * sel)
        keep = jnp.where(col == i, is_kept, keep)

        @pl.when(is_kept > 0.0)
        def _():
            bx1 = x1s_ref[0, 0, i]
            by1 = y1s_ref[0, 0, i]
            bx2 = x2s_ref[0, 0, i]
            by2 = y2s_ref[0, 0, i]
            ba = (bx2 - bx1) * (by2 - by1)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (area + ba - inter + 1e-7)
            suppress = (iou > iou_thres).astype(jnp.float32)
            suppress = jnp.where(col == i, 0.0, suppress)
            alive_scr[0, :] = alive * (1.0 - suppress)

        return keep

    # n is the full (B, 1) SMEM array (Mosaic requires SMEM blocks to tile by
    # (8, 128) or equal the array dims — a (1, 1) per-program block is
    # neither), indexed by this program's batch position
    keep = jax.lax.fori_loop(0, n_ref[pl.program_id(0), 0], body,
                             jnp.zeros((k,), jnp.float32))
    keep_ref[0, 0, :] = keep


def _nms_kernel_batched(n_ref, x1_ref, y1_ref, x2_ref, y2_ref, alive_ref,
                        keep_ref, alive_scr, *, iou_thres: float):
    """One program per 128-image lane tile; refs are (K, BT) — candidate
    index on sublanes, images on lanes.  Candidate i's boxes for every image
    are one (1, BT) dynamic sublane slice, and the IoU-row suppression is a
    (K, BT) vector update across all images at once.  Arithmetic is
    elementwise-identical to the per-image kernel (same f32 min/max/mul/div
    per (candidate, image) pair), so outputs are bit-exact against it."""
    x1 = x1_ref[...]
    y1 = y1_ref[...]
    x2 = x2_ref[...]
    y2 = y2_ref[...]
    area = (x2 - x1) * (y2 - y1)
    rows = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 0)
    alive_scr[...] = alive_ref[...]
    keep_ref[...] = jnp.zeros_like(x1)

    def body(i, carry):
        alive_i = alive_scr[pl.ds(i, 1), :]  # (1, BT): candidate i, all images
        keep_ref[pl.ds(i, 1), :] = alive_i

        # skip the row update when candidate i is suppressed in EVERY image
        @pl.when(jnp.max(alive_i) > 0.0)
        def _():
            bx1 = x1_ref[pl.ds(i, 1), :]
            by1 = y1_ref[pl.ds(i, 1), :]
            bx2 = x2_ref[pl.ds(i, 1), :]
            by2 = y2_ref[pl.ds(i, 1), :]
            ba = (bx2 - bx1) * (by2 - by1)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (area + ba - inter + 1e-7)
            suppress = (iou > iou_thres).astype(jnp.float32) * alive_i
            suppress = jnp.where(rows == i, 0.0, suppress)
            alive_scr[...] = alive_scr[...] * (1.0 - suppress)

        return carry

    # trip count: max last-alive+1 over the tile's images (per-image overrun
    # rows are no-ops — alive there is already 0, so keep stays 0 and the
    # suppress contribution vanishes)
    jax.lax.fori_loop(0, n_ref[pl.program_id(0), 0], body, 0)


# below this batch the per-image kernel's sub-vreg iterations beat the
# batched form's (K, B)-sized vector iterations (lanes pad to 128 anyway)
_BATCHED_MIN_B = 8
_LANE_TILE = 128


def _suppress_planes_batched(x1, y1, x2, y2, alive, *, iou_thres, interpret):
    """Lane-batched pallas_call on (B, 1, K) planes → (B, 1, K) keep mask."""
    b, _, k = x1.shape
    lt = min(b, _LANE_TILE)
    bp = ((b + lt - 1) // lt) * lt
    ntiles = bp // lt

    def t(p):  # (B, 1, K) → (K, B) lane-tile-padded; pad images are all-dead
        p2 = jnp.transpose(p[:, 0, :], (1, 0))
        return jnp.pad(p2, ((0, 0), (0, bp - b))) if bp != b else p2

    planes = [t(p) for p in (x1, y1, x2, y2, alive)]
    iota = jax.lax.broadcasted_iota(jnp.int32, alive.shape, 2)
    n_img = jnp.max(jnp.where(alive > 0.0, iota + 1, 0), axis=2)[:, 0]
    n_t = jnp.max(jnp.pad(n_img, (0, bp - b)).reshape(ntiles, lt),
                  axis=1, keepdims=True).astype(jnp.int32)
    kernel = functools.partial(_nms_kernel_batched, iou_thres=iou_thres)
    spec = pl.BlockSpec((k, lt), lambda i: (0, i), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((ntiles, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    keep = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[nspec] + [spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((k, bp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, lt), jnp.float32)],
        interpret=interpret,
    )(n_t, *planes)
    return jnp.transpose(keep, (1, 0))[:b, None, :]


def _suppress_planes(x1, y1, x2, y2, alive, *, iou_thres, interpret):
    """Per-shard pallas_call on (B, 1, K) planes → (B, 1, K) keep mask."""
    b, _, k = x1.shape
    if b >= _BATCHED_MIN_B:
        return _suppress_planes_batched(x1, y1, x2, y2, alive,
                                        iou_thres=iou_thres,
                                        interpret=interpret)
    kernel = functools.partial(_nms_kernel, iou_thres=iou_thres)
    spec = pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    nspec = pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    # trip count: last initially-alive index + 1 (== the alive count for the
    # score-sorted prefix masks the product path produces; the max form stays
    # correct for arbitrary masks, e.g. hand-built test inputs)
    iota = jax.lax.broadcasted_iota(jnp.int32, alive.shape, 2)
    n = jnp.max(jnp.where(alive > 0.0, iota + 1, 0), axis=2)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[nspec] + [spec] * 5 + [sspec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(n.astype(jnp.int32), x1, y1, x2, y2, alive, x1, y1, x2, y2)


@functools.lru_cache(maxsize=None)
def _partitionable_suppress(iou_thres: float, interpret: bool):
    """Mosaic custom-calls cannot be auto-partitioned by GSPMD/Shardy, which
    would break batch-sharded DP serving with the Pallas NMS backend.  Both
    kernel shapes are trivially batch-parallel (per-image grid programs /
    independent lanes), so declare exactly that: dim 0 passes through,
    everything else replicated.  Each shard re-picks its kernel shape by its
    LOCAL batch — bit-identical outputs either way."""
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
