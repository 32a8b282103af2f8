"""Fixed-shape, on-device non-maximum suppression.

TPU-first replacement for the reference's `torchvision.ops.nms` loop
(`utils/utils_bbox.py:136-149`): no ragged shapes, no host round-trips.
Class separation uses the standard batched-NMS coordinate-offset trick, which is
mathematically identical to running NMS per class.  Greedy suppression runs as a
`fori_loop` over the K pre-NMS candidates with an O(K²) IoU matrix computed once
— K is small (≤1024) so the matrix lives comfortably in VMEM.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.boxes import pairwise_iou_xyxy


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (B, max_det, 4) xyxy, same units as input boxes
    scores: jnp.ndarray   # (B, max_det); 0 for empty slots
    classes: jnp.ndarray  # (B, max_det) int32; -1 for empty slots
    valid: jnp.ndarray    # (B, max_det) bool
    # (B,) int32: candidates at/above conf_thres BEFORE the pre_nms_topk cut.
    # The reference NMS is uncapped (`utils/utils_bbox.py:106-149`); when
    # n_candidates > pre_nms_topk the fixed-shape cap binds and results can
    # deviate from reference semantics — callers (get_map.py) count and warn.
    n_candidates: jnp.ndarray = None


def _greedy_suppress(iou: jnp.ndarray, alive0: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Sequential greedy NMS over score-sorted candidates.

    iou: (K, K) IoU matrix; alive0: (K,) candidate validity.  Returns keep mask.
    Matches torchvision's strict `iou > threshold` suppression.
    """
    k = iou.shape[0]

    def body(i, state):
        keep, alive = state
        is_kept = alive[i]
        keep = keep.at[i].set(is_kept)
        # suppress all later candidates overlapping candidate i (only if kept)
        suppress = jnp.where(is_kept, iou[i] > iou_thres, False)
        suppress = suppress.at[i].set(False)
        alive = alive & ~suppress
        return keep, alive

    keep, _ = jax.lax.fori_loop(0, k, body, (jnp.zeros(k, bool), alive0))
    return keep


def _select_candidates(boxes, scores, classes, conf_thres, k, class_aware,
                       coord_scale):
    """Per-image top-k candidate selection + class-offset boxes."""
    masked = jnp.where(scores >= conf_thres, scores, -1.0)
    top_scores, idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[idx]
    top_classes = classes[idx]
    alive = top_scores > 0.0
    if class_aware:
        off_boxes = top_boxes + (top_classes.astype(boxes.dtype) * coord_scale)[:, None]
    else:
        off_boxes = top_boxes
    return top_boxes, top_scores, top_classes, alive, off_boxes


def _finalize(keep, top_boxes, top_scores, top_classes, max_det):
    k = top_scores.shape[0]
    if k < max_det:
        # fewer candidates than output slots (tiny inputs or small
        # pre_nms_topk): top_k(x, max_det) needs len(x) >= max_det, so pad
        # with always-invalid slots to keep the (max_det,) output shape
        pad = max_det - k
        keep = jnp.pad(keep, (0, pad))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=-1.0)
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_classes = jnp.pad(top_classes, (0, pad), constant_values=-1)
    final_scores = jnp.where(keep, top_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(final_scores, max_det)
    valid = out_scores > 0.0
    out_boxes = jnp.where(valid[:, None], top_boxes[out_idx], 0.0)
    out_classes = jnp.where(valid, top_classes[out_idx], -1)
    out_scores = jnp.where(valid, out_scores, 0.0)
    return out_boxes, out_scores, out_classes, valid


def nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    conf_thres: float,
    iou_thres: float,
    pre_nms_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
    coord_scale=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS for one image.  boxes (A,4) xyxy, scores (A,), classes (A,) int.

    coord_scale: per-class box offset for the batched-NMS trick; None (the
    default) derives it from the data (2·max|coord|+1) so boxes in ANY units
    — normalized or pixels — never overlap across classes.
    """
    if coord_scale is None:
        coord_scale = 2.0 * jnp.max(jnp.abs(boxes)) + 1.0
    k = min(pre_nms_topk, boxes.shape[0])
    top_boxes, top_scores, top_classes, alive, off_boxes = _select_candidates(
        boxes, scores, classes, conf_thres, k, class_aware, coord_scale)
    iou = pairwise_iou_xyxy(off_boxes, off_boxes)
    keep = _greedy_suppress(iou, alive, iou_thres) & alive
    return _finalize(keep, top_boxes, top_scores, top_classes, max_det)


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    conf_thres: float,
    iou_thres: float,
    pre_nms_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
    backend: str = "auto",
) -> NMSResult:
    """Batch NMS.  boxes (B,A,4), scores (B,A), classes (B,A).

    backend='xla': vmapped (K,K)-IoU-matrix + fori_loop suppression.
    backend='pallas': the VMEM-resident Pallas TPU kernel
    (`ops/pallas_nms.py`) — one kernel dispatch per batch instead of K
    sequential XLA loop steps; identical keep semantics (tests/test_pallas_nms).
    backend='auto' (default): pallas on TPU, xla elsewhere — at batch 1 the
    XLA loop costs +2.6 ms vs +0.4 ms for the kernel (tools/b1_breakdown.py).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    n_cand = jnp.sum(scores >= conf_thres, axis=-1).astype(jnp.int32)
    # PER-IMAGE data-derived class offset (the batched-NMS trick is per-image,
    # so the offset only needs to separate one image's classes): keeping the
    # reduction inside the vmap means a batch-sharded serving program stays
    # collective-free — DP serving over a mesh needs no ICI traffic
    # (tests/test_serving_sharded.py pins the no-collective property).
    if backend == "pallas":
        from dcfa_yolo_tpu.ops.pallas_nms import pallas_greedy_suppress

        k = min(pre_nms_topk, boxes.shape[1])
        sel = jax.vmap(lambda b, s, c: _select_candidates(
            b, s, c, conf_thres, k, class_aware,
            2.0 * jnp.max(jnp.abs(b)) + 1.0))
        top_boxes, top_scores, top_classes, alive, off_boxes = sel(
            boxes, scores, classes)
        keep = pallas_greedy_suppress(
            off_boxes, alive, iou_thres,
            # explicit backend='pallas' off-TPU (tests) runs the interpreter
            interpret=jax.default_backend() != "tpu") & alive
        out = jax.vmap(lambda kp, b, s, c: _finalize(kp, b, s, c, max_det))(
            keep, top_boxes, top_scores, top_classes)
        return NMSResult(*out, n_candidates=n_cand)
    fn = lambda b, s, c: nms_single(
        b, s, c, conf_thres, iou_thres, pre_nms_topk, max_det, class_aware)
    out = jax.vmap(fn)(boxes, scores, classes)
    return NMSResult(*out, n_candidates=n_cand)
