"""Prediction decode: anchors→boxes, normalization, letterbox unmapping.

JAX counterpart of `utils/utils_bbox.py:42-85` (`DecodeBox.decode_box` /
`yolo_correct_boxes`), fully on device and batchable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.boxes import dist2bbox


def decode_box(dbox: jnp.ndarray, cls_logits: jnp.ndarray, anchors: jnp.ndarray,
               strides: jnp.ndarray, input_hw: Tuple[int, int]) -> jnp.ndarray:
    """(b,A,4) ltrb distances + (b,A,nc) logits → (b,A,4+nc):
    xywh normalized to [0,1] by input shape + sigmoid scores
    (`utils/utils_bbox.py:49-58`)."""
    xywh = dist2bbox(dbox, anchors[None], xywh=True, axis=-1) * strides[None]
    h, w = input_hw
    norm = jnp.array([w, h, w, h], dtype=xywh.dtype)
    xywh = xywh / norm
    return jnp.concatenate([xywh, jax.nn.sigmoid(cls_logits)], axis=-1)


def correct_boxes_yxyx(
    boxes_xyxy_norm: jnp.ndarray,
    input_hw: Tuple[int, int],
    image_hw,
    letterbox: bool = True,
) -> jnp.ndarray:
    """Normalized input-space xyxy → original-image-pixel [y1,x1,y2,x2]
    (`utils/utils_bbox.py:60-85`, including its y/x-swapped output order).

    image_hw: (2,) array or tuple (h, w) of the original image; broadcastable
    per batch if boxes has a leading batch dim and image_hw is (B, 2).
    """
    x1, y1, x2, y2 = jnp.split(boxes_xyxy_norm, 4, axis=-1)
    box_yx = jnp.concatenate([(y1 + y2) / 2, (x1 + x2) / 2], axis=-1)
    box_hw = jnp.concatenate([y2 - y1, x2 - x1], axis=-1)

    input_shape = jnp.asarray(input_hw, dtype=boxes_xyxy_norm.dtype)
    image_shape = jnp.asarray(image_hw, dtype=boxes_xyxy_norm.dtype)
    if image_shape.ndim == 2:  # (B, 2) → broadcast over detections
        image_shape = image_shape[:, None, :]

    if letterbox:
        new_shape = jnp.round(image_shape * jnp.min(input_shape / image_shape, axis=-1, keepdims=True))
        offset = (input_shape - new_shape) / 2.0 / input_shape
        scale = input_shape / new_shape
        box_yx = (box_yx - offset) * scale
        box_hw = box_hw * scale

    box_mins = box_yx - box_hw / 2.0
    box_maxes = box_yx + box_hw / 2.0
    boxes = jnp.concatenate([box_mins, box_maxes], axis=-1)
    return boxes * jnp.concatenate([image_shape, image_shape], axis=-1)
