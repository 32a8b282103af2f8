from dcfa_yolo_tpu.evalmap.voc_map import get_map
from dcfa_yolo_tpu.evalmap.coco_map import get_coco_map

__all__ = ["get_map", "get_coco_map"]
