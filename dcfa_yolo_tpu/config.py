"""Typed configuration for the whole framework.

The reference scatters ~30 hardcoded knobs across script headers
(`train_mul.py:22-110`, `yolo_mul.py:17-26`, `get_map_mul.py:12-20`,
`voc_annotation_mul.py:13-38`, `predict_mul.py:20-33`).  Here they are collected
into frozen dataclasses with the same default values, so every entry point shares
one source of truth and configs are hashable (usable as jit static args).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Scaling tables of the reference (`nets/yolo_mul.py:331-333`).
DEPTH_DICT = {"n": 0.33, "s": 0.33, "m": 0.67, "l": 1.00, "x": 1.00}
WIDTH_DICT = {"n": 0.25, "s": 0.50, "m": 0.75, "l": 1.00, "x": 1.25}
DEEP_WIDTH_DICT = {"n": 1.00, "s": 1.00, "m": 0.75, "l": 0.50, "x": 0.50}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (`nets/yolo_mul.py:328-395`)."""

    num_classes: int = 1
    phi: str = "n"
    input_shape: Tuple[int, int] = (640, 640)  # (H, W)
    reg_max: int = 16
    # Compute dtype for the forward pass ("float32" or "bfloat16").  Params and BN
    # statistics always stay float32; bfloat16 activations feed the MXU at 2x rate.
    compute_dtype: str = "float32"
    # Rematerialize the two backbones in the backward pass (jax.checkpoint via
    # nn.remat): only the three pyramid taps per backbone are stored, the
    # full-resolution stem/dark activations are recomputed.  Trades ~15% extra
    # FLOPs (bandwidth-bound model) for the activation memory that dominates at
    # large batch — b128 640² with the HBM-staged dataset (data/device_aug.py)
    # only fits with this on.  Numerically identical (tests/test_remat.py).
    remat: bool = False
    # Train-mode stem backend: "xla" (ConvMaxpool as separate conv/BN/pool
    # ops) or "pallas" (ops/pallas_stem_train.py: ONE kernel pass emitting
    # pooled extrema + BN stat sums — the full-resolution conv output never
    # touches HBM).  Pallas supports phi='n' (16 stem channels), H%16==0,
    # single-device or shard_map(axis_name) execution; parameter tree is
    # identical, so checkpoints are interchangeable.
    train_stem_backend: str = "xla"
    # Pallas interpret mode for the train stem: None = auto (interpret
    # everywhere except a real TPU backend).  Deviceless AOT lowering for TPU
    # targets MUST pass False — the auto heuristic sees the CPU host backend
    # and would silently bake interpret mode into the compiled program (same
    # pitfall as infer/pipeline.detect_batch(stem_interpret=...)).
    train_stem_interpret: Optional[bool] = None

    @property
    def depth_mul(self) -> float:
        return DEPTH_DICT[self.phi]

    @property
    def width_mul(self) -> float:
        return WIDTH_DICT[self.phi]

    @property
    def deep_mul(self) -> float:
        return DEEP_WIDTH_DICT[self.phi]

    @property
    def base_channels(self) -> int:
        return int(self.width_mul * 64)

    @property
    def base_depth(self) -> int:
        return max(round(self.depth_mul * 3), 1)

    @property
    def deep_channels(self) -> int:
        return int(self.base_channels * 16 * self.deep_mul)

    @property
    def feat_channels(self) -> Tuple[int, int, int]:
        """Channels of the three pyramid levels (P3, P4, P5)."""
        bc = self.base_channels
        return (bc * 4, bc * 8, self.deep_channels)

    @property
    def strides(self) -> Tuple[int, int, int]:
        # The backbone downsamples by 2 at stem, dark2..dark5 → /8, /16, /32
        # (reference derives this with a dummy forward at `nets/yolo_mul.py:382`;
        # here it is a static property of the architecture).
        return (8, 16, 32)

    @property
    def no(self) -> int:
        return self.num_classes + self.reg_max * 4

    @property
    def num_anchors(self) -> int:
        h, w = self.input_shape
        return sum((h // s) * (w // s) for s in self.strides)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (`train_mul.py:22-110`, `nets/yolo_training.py`)."""

    seed: int = 11
    init_epoch: int = 0
    freeze_epoch: int = 0
    unfreeze_epoch: int = 200
    freeze_train: bool = False
    batch_size: int = 16
    optimizer_type: str = "sgd"  # "sgd" | "adam"
    init_lr: float = 1e-2
    min_lr_ratio: float = 0.01
    momentum: float = 0.937
    nesterov: bool = True
    weight_decay: float = 5e-4
    lr_decay_type: str = "cos"  # "cos" | "step"
    grad_clip_norm: float = 10.0
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    # Loss gains (`nets/yolo_training.py:427-429`).
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    # Assigner (`nets/yolo_training.py:334-338`).
    assigner_topk: int = 10
    assigner_alpha: float = 0.5
    assigner_beta: float = 6.0
    # Fixed padding for per-image ground-truth boxes (replaces the reference's
    # ragged `preprocess` at `nets/yolo_training.py:342-358` with a static shape).
    max_boxes: int = 64
    # Augmentation (`train_mul.py:55-63`).
    mosaic: bool = True
    mosaic_prob: float = 0.5
    mixup: bool = True
    mixup_prob: float = 0.5
    special_aug_ratio: float = 0.7
    # Checkpointing / eval cadence (`train_mul.py:95-105`).
    save_period: int = 20
    eval_period: int = 20
    save_dir: str = "logs"

    def scaled_lrs(self, batch_size: Optional[int] = None) -> Tuple[float, float]:
        """lr scaling by batch/64 with clamps, as in `train_mul.py:240-244`."""
        bs = self.batch_size if batch_size is None else batch_size
        nbs = 64
        lr_limit_max = 1e-3 if self.optimizer_type == "adam" else 5e-2
        lr_limit_min = 3e-4 if self.optimizer_type == "adam" else 5e-4
        init_lr_fit = min(max(bs / nbs * self.init_lr, lr_limit_min), lr_limit_max)
        min_lr_fit = min(
            max(bs / nbs * self.init_lr * self.min_lr_ratio, lr_limit_min * 1e-2),
            lr_limit_max * 1e-2,
        )
        return init_lr_fit, min_lr_fit


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Paired-VOC dataset layout (`voc_annotation_mul.py`, `utils/dataloader_mul.py`)."""

    dataset_path: str = "VOCdevkit"
    classes_path: str = "model_data/voc_classes.txt"
    train_annotation: str = "2007_train.txt"
    val_annotation: str = "2007_val.txt"
    trainval_percent: float = 0.9
    train_percent: float = 0.9
    split_seed: int = 0
    num_workers: int = 4


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """mAP harness settings (`get_map_mul.py:12-20`, `yolo_mul.py:17-26`)."""

    confidence: float = 0.001
    nms_iou: float = 0.5
    score_threshold: float = 0.5
    min_overlap: float = 0.5
    letterbox: bool = True
    max_detections: int = 100  # top-k cap used by EvalCallback (`utils/callbacks_mul.py:103`)


@dataclasses.dataclass(frozen=True)
class PredictConfig:
    """Inference facade defaults (`yolo_mul.py:17-26`)."""

    confidence: float = 0.5
    nms_iou: float = 0.3
    letterbox: bool = True
    max_detections: int = 300
