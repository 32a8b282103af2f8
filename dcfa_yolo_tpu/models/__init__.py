from dcfa_yolo_tpu.models.yolo import DCFAYolo
from dcfa_yolo_tpu.models.backbone import Backbone

__all__ = ["DCFAYolo", "Backbone"]
