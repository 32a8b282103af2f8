"""One compiled inference program: letterbox → /255 → dual-backbone forward →
DFL decode → fixed-shape NMS → original-image coordinates.

This is the BASELINE.json north star: the reference round-trips to host numpy
between forward and NMS (`utils/utils_bbox.py:171`); here everything from raw
uint8 image pairs to final detections is a single jit with donated input buffers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.decode import correct_boxes_yxyx, decode_box
from dcfa_yolo_tpu.models.yolo import DCFAYolo
from dcfa_yolo_tpu.ops.nms import NMSResult, batched_nms
from dcfa_yolo_tpu.ops.resize import letterbox_batch


def detect_batch(
    model: DCFAYolo,
    variables,
    rgb: jnp.ndarray,
    nir: jnp.ndarray,
    image_hw,
    *,
    conf_thres: float,
    iou_thres: float,
    letterbox: bool = True,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    nms_backend: str = "auto",
) -> NMSResult:
    """Full pipeline on preprocessed-size uint8/float inputs.

    rgb/nir: (B, H, W, 3) raw images already at a common size (the original
    dataset size); they are letterboxed to model input shape on device.
    image_hw: (B, 2) original (h, w) per image (= input size here, but kept
    per-image for the general API).
    Returns NMSResult with boxes in original-image [y1, x1, y2, x2] pixels —
    the reference's output convention (`utils/utils_bbox.py:170-173`).
    """
    cfg = model.cfg
    in_hw = cfg.input_shape
    if rgb.shape[1:3] != tuple(in_hw):
        if letterbox:
            rgb = letterbox_batch(rgb, in_hw)
            nir = letterbox_batch(nir, in_hw)
        else:
            from dcfa_yolo_tpu.ops.resize import resize_bicubic

            rgb = jnp.clip(jnp.round(resize_bicubic(rgb.astype(jnp.float32), in_hw)), 0, 255)
            nir = jnp.clip(jnp.round(resize_bicubic(nir.astype(jnp.float32), in_hw)), 0, 255)
    rgb = rgb.astype(jnp.float32) / 255.0
    nir = nir.astype(jnp.float32) / 255.0

    out = model.apply(variables, rgb, nir, train=False)
    pred = decode_box(out.dbox, out.cls, out.anchors, out.strides, in_hw)
    xywh, scores_all = pred[..., :4], pred[..., 4:]
    x1y1 = xywh[..., :2] - xywh[..., 2:4] / 2
    x2y2 = xywh[..., :2] + xywh[..., 2:4] / 2
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores = jnp.max(scores_all, axis=-1)
    classes = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)

    res = batched_nms(boxes, scores, classes, conf_thres, iou_thres,
                      pre_nms_topk=pre_nms_topk, max_det=max_det,
                      backend=nms_backend)
    boxes_out = correct_boxes_yxyx(res.boxes, in_hw, image_hw, letterbox=letterbox)
    boxes_out = jnp.where(res.valid[..., None], boxes_out, 0.0)
    return NMSResult(boxes=boxes_out, scores=res.scores, classes=res.classes,
                     valid=res.valid, n_candidates=res.n_candidates)


@functools.partial(
    jax.jit,
    static_argnames=("model", "conf_thres", "iou_thres", "letterbox", "max_det",
                     "pre_nms_topk", "nms_backend"),
    donate_argnames=("rgb", "nir"),
)
def detect_batch_jit(model, variables, rgb, nir, image_hw, *, conf_thres,
                     iou_thres, letterbox=True, max_det=300, pre_nms_topk=1024,
                     nms_backend="auto"):
    return detect_batch(model, variables, rgb, nir, image_hw,
                        conf_thres=conf_thres, iou_thres=iou_thres,
                        letterbox=letterbox, max_det=max_det,
                        pre_nms_topk=pre_nms_topk, nms_backend=nms_backend)


def heatmap_scores(model: DCFAYolo, variables, rgb: jnp.ndarray, nir: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, ...]:
    """Per-level max-over-class sigmoid score maps (`yolo_mul.py:190-203`).

    Returns one (B, h, w) array per pyramid level.
    """
    cfg = model.cfg
    out = model.apply(variables, rgb, nir, train=False)
    maps = []
    for f in out.feats:  # (B, h, w, no); last nc channels are class logits
        cls = f[..., 4 * cfg.reg_max:]
        maps.append(jnp.max(jax.nn.sigmoid(cls), axis=-1))
    return tuple(maps)


@functools.partial(jax.jit, static_argnames=("model",))
def heatmap_batch_jit(model: DCFAYolo, variables, rgb_raw, nir_raw
                      ) -> Tuple[jnp.ndarray, ...]:
    """Letterbox + /255 + heatmap_scores under ONE jit — eager dispatch is an
    RPC per op on remote platforms, so the whole heatmap path compiles like
    detect_batch_jit does."""
    in_hw = model.cfg.input_shape
    r = letterbox_batch(rgb_raw, in_hw) / 255.0
    n = letterbox_batch(nir_raw, in_hw) / 255.0
    return heatmap_scores(model, variables, r, n)
