from dcfa_yolo_tpu.infer.predictor import YOLOPredictor

__all__ = ["YOLOPredictor"]
