"""Box geometry ops: anchors, distance<->box transforms, IoU family.

JAX counterparts of `utils/utils_bbox.py:16-40` and `nets/yolo_training.py:227-270`.
Anchors are *static* numpy constants derived from the input shape (the reference
recomputes them lazily and caches them on the module, `nets/yolo_mul.py:455-457`;
under jit they are baked into the compiled program).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def make_anchors_np(
    input_hw: Tuple[int, int],
    strides: Tuple[int, ...] = (8, 16, 32),
    grid_cell_offset: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid anchor centers and per-anchor strides (`utils/utils_bbox.py:16-28`).

    Returns (anchor_points (A, 2) xy in feature units, stride_tensor (A, 1)).
    Anchor order: levels in stride order, row-major within a level (x fastest) —
    identical to the reference's flatten order of NCHW `.view(b, no, -1)`.
    """
    h, w = input_hw
    points, stride_vals = [], []
    for s in strides:
        fh, fw = h // s, w // s
        sx = np.arange(fw, dtype=np.float32) + grid_cell_offset
        sy = np.arange(fh, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_vals.append(np.full((fh * fw, 1), s, dtype=np.float32))
    return np.concatenate(points, axis=0), np.concatenate(stride_vals, axis=0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True,
              axis: int = -1) -> jnp.ndarray:
    """ltrb distances → xywh/xyxy boxes (`utils/utils_bbox.py:30-40`)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float) -> jnp.ndarray:
    """xyxy box → ltrb distances clamped to reg_max-0.01 (`nets/yolo_training.py:267-270`)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0.0,
        reg_max - 0.01,
    )


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """cxcywh → xyxy (`nets/yolo_training.py:305-320`)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """IoU / GIoU / DIoU / CIoU with the reference's exact epsilon placement
    (`nets/yolo_training.py:227-265`).  Inputs broadcast; last dim is 4; the
    returned array keeps a trailing singleton dim like the torch `chunk` version.
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, axis=-1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * \
        jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                    (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax_stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def jax_stop_gradient(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.stop_gradient(x)


def pairwise_iou_xyxy(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Plain IoU matrix between (..., N, 4) and (..., M, 4) xyxy boxes → (..., N, M)."""
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    inter_w = jnp.clip(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0, None
    )
    inter_h = jnp.clip(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0, None
    )
    inter = inter_w * inter_h
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (area1 + area2 - inter + eps)
