from dcfa_yolo_tpu.ops.conv import ConvBnAct, autopad, torch_batchnorm, torch_conv
from dcfa_yolo_tpu.ops.pool import max_pool_same
from dcfa_yolo_tpu.ops.resize import resize_bilinear_align_corners, letterbox_batch
from dcfa_yolo_tpu.ops import boxes

__all__ = [
    "ConvBnAct",
    "torch_conv",
    "torch_batchnorm",
    "autopad",
    "max_pool_same",
    "resize_bilinear_align_corners",
    "letterbox_batch",
    "boxes",
]
