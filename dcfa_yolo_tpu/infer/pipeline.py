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


def _stem_backend_resolve(stem_backend: str, cfg: ModelConfig,
                          batch: int = 0) -> str:
    """Decide which stem implements the conv3x3+BN+ReLU+maxpool stems:
    'xla', 'pallas' (ops/pallas_stem.py v2, gather deinterleave) or
    'pallas_d' (v3, gather-free deinterleaved-canvas input).  'auto' picks a
    Pallas kernel exactly where it is a pure speed win: TPU backend, bf16
    compute, phi with 16 stem channels, an input shape the kernel's 16-row
    grouping supports, and a batch where the kernel measured faster."""
    if stem_backend == "xla":
        return "xla"
    from dcfa_yolo_tpu.ops.pallas_stem import chunk5_cw, stem_vmem_fit
    base_ok = (cfg.base_channels == 16
               and cfg.compute_dtype == "bfloat16"
               and cfg.input_shape[0] % 16 == 0
               and cfg.input_shape[1] % 2 == 0)
    # the per-image kernels (v2-v4) double-buffer whole-image blocks; past
    # ~1280² they exceed the scoped-VMEM limit (round 5).  v5's footprint is
    # resolution-independent (blocks scale with cw·B only).
    eligible = base_ok and stem_vmem_fit(cfg.input_shape[1],
                                         cfg.input_shape[0])
    # v5 (batch-on-lanes, batch-minor output) additionally needs the batch
    # on full 128-lane groups and the pooled width chunkable (chunk5_cw)
    f_eligible = (base_ok and bool(batch) and batch % 128 == 0
                  and chunk5_cw(cfg.input_shape[1]) is not None)
    if stem_backend in ("pallas", "pallas_d", "pallas_e", "pallas_f"):
        if not (f_eligible if stem_backend == "pallas_f" else eligible):
            raise ValueError(
                f"stem_backend='{stem_backend}' needs base_channels=16, bf16 "
                f"compute, H%16==0, and (v2-v4) a resolution within the "
                f"scoped-VMEM fit (pallas_f instead: batch%128==0 and a "
                f"chunkable width): cfg has "
                f"base_channels={cfg.base_channels}, "
                f"compute_dtype={cfg.compute_dtype}, "
                f"input_shape={cfg.input_shape}, batch={batch}")
        return stem_backend
    assert stem_backend == "auto", stem_backend
    # 'auto', measured on the v5e (tools/serve_ab_matrix.py, 640² fold, round
    # 4): the compact-K v4 kernel wins at EVERY batch — ms/pair v4 vs v3:
    # b1 2.245/2.298, b8 0.731/0.744, b32 0.550/0.560, b128 0.326/0.335
    # (3070 pairs/s) — and v3 already beat the XLA stem everywhere (b1
    # 2.244/4.205, b8 0.823/1.851): the XLA stem's full-res kernels are
    # launch-latency-bound at small batch and HBM-bound at large.  At full
    # 128-lane batches the round-5 v5 kernel additionally emits the
    # batch-minor layout the large-batch convs want (killing the 2×1.7 ms
    # stem-output relayout copies the b128 profile pinned).  bench.py's stem
    # autotune re-decides empirically per chip either way.
    if jax.default_backend() == "tpu":
        if f_eligible and len(jax.devices()) == 1:
            return "pallas_f"
        if eligible:
            return "pallas_e"
    return "xla"


def _pallas_stem_outs(variables, rgb, nir, in_hw, letterbox: bool,
                      interpret=None, variant: str = "pallas"):
    """Letterbox to the kernel's channels-first zero-bordered contract and run
    the fused stem for both modalities.  Returns NHWC /2-pooled maps.
    variant 'pallas' = v2 (plain bordered canvas); 'pallas_d' = v3
    (column-deinterleaved canvas, folded into the letterbox matrices).

    interpret=None uses Pallas interpret mode unless the DEFAULT backend is
    TPU.  That heuristic is wrong for deviceless XLA:TPU AOT compiles
    (jax.experimental.topologies with a cpu default backend) — those must pass
    interpret=False explicitly or they silently lower the interpret-mode
    emulation instead of the Mosaic kernel (tools/serve_traffic_aot.py does)."""
    from dcfa_yolo_tpu.ops.pallas_stem import (
        chunk5_cw, fold_stem_params, fold_stem_params_d, fold_stem_params_e,
        pallas_stem, pallas_stem_d, pallas_stem_e, pallas_stem_f)
    from dcfa_yolo_tpu.ops.resize import (
        chunk5_cols_cf, deinterleave_cols_cf, letterbox_batch_cf,
        letterbox_batch_cf5, resize_bicubic)

    deint = variant in ("pallas_d", "pallas_e")
    chunk5 = variant == "pallas_f"
    cw5 = chunk5_cw(in_hw[1]) if chunk5 else None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def stem_params(bk, mod):
        if bk is not None:
            p = variables["params"][bk]["stem"]
            s = variables["batch_stats"][bk]["stem"]
            return (p["conv"]["kernel"], p["bn"]["scale"], p["bn"]["bias"],
                    s["bn"]["mean"], s["bn"]["var"])
        # paired variables (models/pairing.py): the stem kernel is
        # block-diagonal (3,3,6,2c) in blocked layout — slice the modality out
        p = variables["params"]["backbone_pair"]["stem"]
        s = variables["batch_stats"]["backbone_pair"]["stem"]
        k = p["conv"]["kernel"]
        c = k.shape[-1] // 2
        ci, co = (slice(0, 3), slice(0, c)) if mod == 0 else (
            slice(3, 6), slice(c, 2 * c))
        return (k[:, :, ci, co], p["bn"]["scale"][co], p["bn"]["bias"][co],
                s["bn"]["mean"][co], s["bn"]["var"][co])

    paired = "backbone_pair" in variables["params"]
    outs = []
    for img, bk, mod in ((rgb, "backbone_rgb", 0), (nir, "backbone_nir", 1)):
        if chunk5:
            if img.shape[1:3] != tuple(in_hw) and letterbox:
                x5 = letterbox_batch_cf5(img, in_hw, cw=cw5)
            else:
                if img.shape[1:3] != tuple(in_hw):
                    x = jnp.clip(jnp.round(resize_bicubic(
                        img.astype(jnp.float32), in_hw)), 0, 255)
                else:
                    x = img.astype(jnp.float32)
                x_cf = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                               ((0, 0), (0, 0), (1, 1), (1, 1)))
                x5 = chunk5_cols_cf(x_cf, cw5)
            we = fold_stem_params_e(*stem_params(None if paired else bk, mod))
            so = pallas_stem_f(x5.astype(jnp.bfloat16), we, w=in_hw[1],
                               cw=cw5, interpret=interpret)
            # (H/2, W/2, 16, B) → NHWC; physically a bitcast (batch-minor is
            # the conv operand layout XLA picks at these batches)
            outs.append(jnp.transpose(so, (3, 0, 1, 2)))
            continue
        if img.shape[1:3] != tuple(in_hw):
            if letterbox:
                x_cf = letterbox_batch_cf(img, in_hw,
                                          deinterleave_cols=deint)
            else:
                x = jnp.clip(jnp.round(resize_bicubic(
                    img.astype(jnp.float32), in_hw)), 0, 255)
                x_cf = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                               ((0, 0), (0, 0), (1, 1), (1, 1)))
                if deint:
                    x_cf = deinterleave_cols_cf(x_cf)
        else:
            x_cf = jnp.pad(
                jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2)),
                ((0, 0), (0, 0), (1, 1), (1, 1)))
            if deint:
                x_cf = deinterleave_cols_cf(x_cf)
        params = stem_params(None if paired else bk, mod)
        if variant == "pallas_e":
            we = fold_stem_params_e(*params)
            so = pallas_stem_e(x_cf.astype(jnp.bfloat16), we,
                               w=in_hw[1], interpret=interpret)
        elif deint:
            wd, bias = fold_stem_params_d(*params)
            so = pallas_stem_d(x_cf.astype(jnp.bfloat16), wd, bias,
                               w=in_hw[1], interpret=interpret)
        else:
            wd, bias = fold_stem_params(*params)
            so = pallas_stem(x_cf.astype(jnp.bfloat16), wd, bias,
                             interpret=interpret)
        outs.append(jnp.transpose(so, (0, 1, 3, 2)))  # → NHWC
    return tuple(outs)


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
    stem_backend: str = "auto",
    stem_interpret=None,
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
    stem = _stem_backend_resolve(stem_backend, cfg, batch=rgb.shape[0])
    if stem != "xla":
        stem_outs = _pallas_stem_outs(variables, rgb, nir, in_hw, letterbox,
                                      interpret=stem_interpret, variant=stem)
        b = rgb.shape[0]
        dummy = jnp.zeros((b, 2, 2, 3), jnp.float32)
        out = model.apply(variables, dummy, dummy, train=False,
                          stem_outs=stem_outs)
    else:
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
                     "pre_nms_topk", "nms_backend", "stem_backend"),
    donate_argnames=("rgb", "nir"),
)
def detect_batch_jit(model, variables, rgb, nir, image_hw, *, conf_thres,
                     iou_thres, letterbox=True, max_det=300, pre_nms_topk=1024,
                     nms_backend="auto", stem_backend="auto"):
    return detect_batch(model, variables, rgb, nir, image_hw,
                        conf_thres=conf_thres, iou_thres=iou_thres,
                        letterbox=letterbox, max_det=max_det,
                        pre_nms_topk=pre_nms_topk, nms_backend=nms_backend,
                        stem_backend=stem_backend)


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
