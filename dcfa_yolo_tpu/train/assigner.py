"""Task-Aligned Assigner (`nets/yolo_training.py:75-225`) with static shapes.

The reference pads ground truth to the per-batch max count and uses a Python
roll-out fallback for large counts; here everything is fixed at `max_boxes`
(tensor (b, M, ...)) with an explicit validity mask, so the whole assignment jits
into the training step.  The (b, M, A) CIoU tensor is the memory hot spot noted
in SURVEY §7 — at M=64, A=8400, b=16 it is ~34 MB in fp32, fine in HBM and
XLA-fusible.

All quirks reproduced:
  * duplicate top-k hits zeroed via the one-hot-sum > 1 rule
    (`nets/yolo_training.py:197`), which also silently kills padded rows whose
    indices were forced to 0;
  * multi-gt anchors resolved by max CIoU (`select_highest_overlaps`);
  * target scores normalized by `align_metric * pos_overlaps / pos_align_metrics`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (b, A) int32
    target_bboxes: jnp.ndarray  # (b, A, 4) xyxy
    target_scores: jnp.ndarray  # (b, A, nc)
    fg_mask: jnp.ndarray        # (b, A) bool
    target_gt_idx: jnp.ndarray  # (b, A) int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray,
                             eps: float = 1e-9) -> jnp.ndarray:
    """(A,2), (b,M,4) → (b,M,A) bool: anchor center strictly inside the gt box
    (`nets/yolo_training.py:12-38`)."""
    lt = gt_bboxes[..., None, :2]   # (b, M, 1, 2)
    rb = gt_bboxes[..., None, 2:]   # (b, M, 1, 2)
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1)
    return jnp.min(deltas, axis=-1) > eps


def select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray,
                            n_max_boxes: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resolve anchors matched to multiple gts by max overlap
    (`nets/yolo_training.py:41-72`).  Applied unconditionally (jit-safe; a
    no-op when no anchor is multi-assigned)."""
    fg_mask = mask_pos.sum(-2)  # (b, A)
    mask_multi = (fg_mask[:, None, :] > 1)
    mask_multi = jnp.broadcast_to(mask_multi, mask_pos.shape)
    max_overlaps_idx = jnp.argmax(overlaps, axis=1)  # (b, A)
    is_max = jax.nn.one_hot(max_overlaps_idx, n_max_boxes, axis=1,
                            dtype=mask_pos.dtype)  # (b, M, A)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (b, A)
    return target_gt_idx, fg_mask, mask_pos


def _iterative_topk_indices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k largest entries along the last axis of (..., A) via k
    argmax passes (exact; ties resolved to the lowest index, like top_k)."""
    batch_shape = x.shape[:-1]
    grid = jnp.ix_(*[jnp.arange(s) for s in batch_shape])

    def body(i, state):
        idxs, cur = state
        j = jnp.argmax(cur, -1)
        idxs = idxs.at[..., i].set(j)
        cur = cur.at[grid + (j,)].set(-jnp.inf)
        return idxs, cur

    idxs0 = jnp.zeros(batch_shape + (k,), jnp.int32)
    idxs, _ = jax.lax.fori_loop(0, k, body, (idxs0, x))
    return idxs


class TaskAlignedAssigner:
    def __init__(self, topk: int = 10, num_classes: int = 80, alpha: float = 0.5,
                 beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.bg_idx = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                 mask_gt) -> AssignResult:
        """All shapes static: pd_scores (b,A,nc) post-sigmoid, pd_bboxes (b,A,4)
        xyxy in image units, anc_points (A,2) image units, gt_labels (b,M,1),
        gt_bboxes (b,M,4), mask_gt (b,M,1) bool/0-1.  Runs under stop_gradient
        like the reference's @no_grad."""
        args = (pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt)
        return jax.lax.stop_gradient(self._assign(*args))

    # ------------------------------------------------------------------
    def _assign(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                mask_gt) -> AssignResult:
        b, a, nc = pd_scores.shape
        m = gt_bboxes.shape[1]
        mask_gt_b = mask_gt[..., 0] > 0  # (b, M)

        align_metric, overlaps = self._box_metrics(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes)
        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
        mask_topk = self._topk_mask(align_metric * mask_in_gts, mask_gt_b)
        mask_pos = mask_topk * mask_in_gts * mask_gt_b[..., None]

        target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
            mask_pos, overlaps, m)

        # gather targets (`get_targets`, nets/yolo_training.py:200-225) as a
        # one-hot MXU contraction: take_along_axis lowers to a slow TPU gather
        # at these shapes (cf. the 19.5 ms _df_loss gather, tools/assigner_ab2)
        sel = jax.nn.one_hot(target_gt_idx, m, dtype=jnp.float32)  # (b, A, M)
        tl = jnp.einsum("bam,bm->ba", sel,
                        gt_labels[..., 0].astype(jnp.float32)).astype(jnp.int32)
        tb = jnp.einsum("bam,bmc->bac", sel, gt_bboxes)  # (b, A, 4)
        target_scores = jax.nn.one_hot(tl, nc, dtype=pd_scores.dtype)
        target_scores = jnp.where(fg_mask[..., None] > 0, target_scores, 0.0)

        # score normalization (`nets/yolo_training.py:126-134`)
        align_metric = align_metric * mask_pos
        pos_align_metrics = jnp.max(align_metric, axis=-1, keepdims=True)  # (b,M,1)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm_align = jnp.max(
            align_metric * pos_overlaps / (pos_align_metrics + self.eps),
            axis=-2)[..., None]  # (b, A, 1)
        target_scores = target_scores * norm_align

        return AssignResult(
            target_labels=tl, target_bboxes=tb, target_scores=target_scores,
            fg_mask=fg_mask > 0, target_gt_idx=target_gt_idx)

    def _box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes):
        """(b,M,A) score^α · CIoU^β (`get_box_metrics`, nets/yolo_training.py:150-173)."""
        gl = gt_labels[..., 0].astype(jnp.int32)  # (b, M)
        # pd_scores (b, A, nc) gathered at gt class per (b, M): (b, M, A),
        # expressed as a one-hot contraction (MXU) instead of a TPU gather
        cls_sel = jax.nn.one_hot(gl, pd_scores.shape[-1],
                                 dtype=pd_scores.dtype)  # (b, M, nc)
        bbox_scores = jnp.einsum("bmc,bac->bma", cls_sel, pd_scores)
        overlaps = bbox_iou(
            gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False,
            CIoU=True)[..., 0]
        overlaps = jnp.clip(overlaps, 0.0, None)
        align = bbox_scores**self.alpha * overlaps**self.beta
        return align, overlaps

    def _topk_mask(self, metrics: jnp.ndarray, mask_gt_b: jnp.ndarray) -> jnp.ndarray:
        """(b,M,A) metrics → (b,M,A) 0/1 top-k membership
        (`select_topk_candidates`, nets/yolo_training.py:175-198).

        The top-k itself runs as a k-pass iterative argmax: measured 3.8 ms vs
        11.2 ms for `jax.lax.top_k` on (16,64,8400) k=10 on a v5e
        (tools/assigner_ab2.py) — top_k lowers to a full-width sort network
        while k passes of argmax are k cheap VPU reductions.  Tie behavior is
        identical (argmax and top_k both prefer the lowest index), so the
        selected index SET matches exactly; order within the k slots differs
        but only membership is consumed downstream.
        """
        a = metrics.shape[-1]
        topk_idxs = _iterative_topk_indices(metrics, self.topk)
        topk_mask = jnp.broadcast_to(mask_gt_b[..., None], topk_idxs.shape)
        topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
        is_in_topk = jax.nn.one_hot(topk_idxs, a, dtype=metrics.dtype).sum(-2)
        # duplicate-index rule also erases masked rows (their forced-0 indices
        # collide when topk > 1)
        return jnp.where(is_in_topk > 1, 0.0, is_in_topk)
