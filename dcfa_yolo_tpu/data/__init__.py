from dcfa_yolo_tpu.data.loader import PairedDetectionDataset, BatchLoader

__all__ = ["PairedDetectionDataset", "BatchLoader"]
