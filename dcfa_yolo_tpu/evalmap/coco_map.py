"""COCO-style AP without pycocotools (not present in this container).

The reference's `get_coco_map` (`utils/utils_map.py:1032-1132`) converts the
same ground-truth/detection-results text files to COCO json and runs COCOeval;
here the COCOeval protocol itself is implemented natively:
  * IoU thresholds 0.5:0.05:0.95, 101-point interpolated precision;
  * greedy matching per class in score order, each gt used once per threshold
    (no crowd/ignore handling — the text protocol has only `difficult`, which
    COCOeval would treat as a normal annotation after the reference's
    conversion, since `preprocess_gt` drops the flag into a regular ann);
  * maxDets=100 cap per image per class (COCO default).

Returns [AP@0.5:0.95, AP@0.5], matching the reference's use of
`get_coco_map(...)[1]` as AP50.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from dcfa_yolo_tpu.evalmap.voc_map import _parse_dr_dir, _parse_gt_dir

# linspace, not arange: arange(0.5, 1.0, 0.05) drifts (last value
# 0.9500000000000004), which would flip IoU==0.95 matches vs COCOeval
IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_xyxy(bb: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Plain (no +1) IoU matrix (nd, ng) — COCO convention."""
    if len(bb) == 0 or len(gt) == 0:
        return np.zeros((len(bb), len(gt)))
    ixmin = np.maximum(bb[:, None, 0], gt[None, :, 0])
    iymin = np.maximum(bb[:, None, 1], gt[None, :, 1])
    ixmax = np.minimum(bb[:, None, 2], gt[None, :, 2])
    iymax = np.minimum(bb[:, None, 3], gt[None, :, 3])
    iw = np.clip(ixmax - ixmin, 0, None)
    ih = np.clip(iymax - iymin, 0, None)
    inter = iw * ih
    area_d = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    return inter / np.maximum(area_d[:, None] + area_g[None, :] - inter, 1e-12)


def _class_ap(dets: List[dict], gt_by_image: Dict[str, np.ndarray],
              n_gt: int, max_dets: int = 100) -> np.ndarray:
    """AP at each IoU threshold for one class; dets already score-sorted."""
    if n_gt == 0:
        return np.full(len(IOU_THRESHOLDS), np.nan)
    per_image_count: Dict[str, int] = defaultdict(int)
    kept = []
    for d in dets:
        if per_image_count[d["file_id"]] < max_dets:
            per_image_count[d["file_id"]] += 1
            kept.append(d)
    nd = len(kept)
    if nd == 0:
        # gt exists but nothing was detected: AP 0 at every threshold (the
        # size-0 precision array would otherwise crash the interpolation)
        return np.zeros(len(IOU_THRESHOLDS))
    tp = np.zeros((len(IOU_THRESHOLDS), nd))
    used: Dict[Tuple[int, str], np.ndarray] = {}
    ious_cache: Dict[str, np.ndarray] = {}
    det_idx_in_image: Dict[str, int] = defaultdict(int)

    for di, d in enumerate(kept):
        fid = d["file_id"]
        gts = gt_by_image.get(fid, np.zeros((0, 4)))
        if fid not in ious_cache:
            boxes = np.array([dd["bbox"] for dd in kept if dd["file_id"] == fid])
            ious_cache[fid] = _iou_xyxy(boxes, gts)
        row = ious_cache[fid][det_idx_in_image[fid]]
        det_idx_in_image[fid] += 1
        for ti, thr in enumerate(IOU_THRESHOLDS):
            key = (ti, fid)
            if key not in used:
                used[key] = np.zeros(len(gts), bool)
            best, best_j = thr, -1
            for j in range(len(gts)):
                if used[key][j]:
                    continue
                if row[j] >= best:
                    best, best_j = row[j], j
            if best_j >= 0:
                used[key][best_j] = True
                tp[ti, di] = 1

    aps = np.zeros(len(IOU_THRESHOLDS))
    for ti in range(len(IOU_THRESHOLDS)):
        tp_cum = np.cumsum(tp[ti])
        fp_cum = np.cumsum(1 - tp[ti])
        rec = tp_cum / n_gt
        prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        # 101-point interpolation with monotone precision (COCOeval accumulate)
        for i in range(len(prec) - 1, 0, -1):
            prec[i - 1] = max(prec[i - 1], prec[i])
        idx = np.searchsorted(rec, RECALL_POINTS, side="left")
        q = np.where(idx < len(prec), prec[np.minimum(idx, max(len(prec) - 1, 0))], 0.0)
        aps[ti] = q.mean() if len(prec) else 0.0
    return aps


def get_coco_map(class_names: Sequence[str], path: str = "map_out",
                 max_dets: int = 100) -> List[float]:
    """→ [AP@0.5:0.95, AP@0.5] over the text-file protocol."""
    per_image_gt, gt_counter, _ = _parse_gt_dir(os.path.join(path, "ground-truth"))
    per_class_dr, _ = _parse_dr_dir(os.path.join(path, "detection-results"),
                                    list(class_names))

    all_aps = []
    for cname in class_names:
        gt_by_image = {
            fid: np.array([o["bbox"] for o in objs if o["class_name"] == cname])
            for fid, objs in per_image_gt.items()}
        gt_by_image = {k: v.reshape(-1, 4) for k, v in gt_by_image.items()}
        n_gt = sum(len(v) for v in gt_by_image.values())
        aps = _class_ap(per_class_dr.get(cname, []), gt_by_image, n_gt, max_dets)
        all_aps.append(aps)
    ap_matrix = np.array(all_aps)  # (n_classes, n_thresholds)
    with np.errstate(invalid="ignore"):
        mean_per_thr = np.nanmean(ap_matrix, axis=0)
    if np.all(np.isnan(mean_per_thr)):
        return [0.0, 0.0]
    return [float(np.nanmean(mean_per_thr)), float(mean_per_thr[0])]
