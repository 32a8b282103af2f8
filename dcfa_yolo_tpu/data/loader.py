"""Dataset + batch loader feeding fixed-shape device batches.

Counterpart of `YoloDataset`/`yolo_dataset_collate`/`DataLoader` usage
(`utils/dataloader_mul.py:10-81, 382-395`, `train_mul.py:275-296`), redesigned
for a jit training step: every batch is (rgb, nir) float32 [0,1] NHWC plus
ground truth pre-padded to (B, max_boxes, …) — no ragged label tensors.
A small thread pool overlaps augmentation with device compute (the reference
uses DataLoader worker processes; numpy/PIL release the GIL during the heavy
ops so threads suffice here and keep the loader dependency-free).
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from dcfa_yolo_tpu.data.augment import (
    load_mosaic,
    load_pair_letterbox,
    load_pair_random,
    mixup_pairs,
)


class HostBatch(NamedTuple):
    rgb: np.ndarray        # (B, H, W, 3) float32 in [0,1]
    nir: np.ndarray        # (B, H, W, 3)
    gt_boxes: np.ndarray   # (B, M, 4) xyxy pixels
    gt_labels: np.ndarray  # (B, M)
    gt_mask: np.ndarray    # (B, M)


class PairedDetectionDataset:
    """Map-style dataset over annotation lines
    `rgb_path nir_path x1,y1,x2,y2,cls ...` (`voc_annotation_mul.py:121-125`)."""

    def __init__(
        self,
        annotation_lines: Sequence[str],
        input_shape: Tuple[int, int] = (640, 640),
        train: bool = True,
        mosaic: bool = True,
        mosaic_prob: float = 0.5,
        mixup: bool = True,
        mixup_prob: float = 0.5,
        special_aug_ratio: float = 0.7,
        epoch_length: int = 200,
    ):
        self.lines = [l.strip() for l in annotation_lines if l.strip()]
        self.input_shape = tuple(input_shape)
        self.train = train
        self.mosaic = mosaic and train
        self.mosaic_prob = mosaic_prob
        self.mixup = mixup and train
        self.mixup_prob = mixup_prob
        self.special_aug_ratio = special_aug_ratio
        self.epoch_length = epoch_length
        self.epoch_now = -1

    def __len__(self) -> int:
        return len(self.lines)

    def set_epoch(self, epoch: int) -> None:
        """Mosaic switches off after special_aug_ratio of training
        (`utils/dataloader_mul.py:39`)."""
        self.epoch_now = epoch

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        index = index % len(self.lines)
        use_mosaic = (
            self.mosaic and np.random.rand() < self.mosaic_prob
            and self.epoch_now < self.epoch_length * self.special_aug_ratio)
        if use_mosaic:
            lines = random.sample(self.lines, 3) + [self.lines[index]]
            random.shuffle(lines)
            rgb, nir, boxes = load_mosaic(lines, self.input_shape)
            if self.mixup and np.random.rand() < self.mixup_prob:
                other = random.sample(self.lines, 1)[0]
                rgb2, nir2, boxes2 = load_pair_random(other, self.input_shape)
                rgb, nir, boxes = mixup_pairs(rgb, nir, boxes, rgb2, nir2, boxes2)
        elif self.train:
            rgb, nir, boxes = load_pair_random(self.lines[index], self.input_shape)
        else:
            rgb, nir, boxes = load_pair_letterbox(self.lines[index], self.input_shape)
        return rgb, nir, np.asarray(boxes, np.float32).reshape(-1, 5)


class BatchLoader:
    """Iterates shuffled fixed-size batches with background prefetch."""

    def __init__(
        self,
        dataset: PairedDetectionDataset,
        batch_size: int,
        max_boxes: int = 64,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 11,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # ------------------------------------------------------------------
    def _collate(self, items) -> HostBatch:
        h, w = self.dataset.input_shape
        b = len(items)
        rgb = np.stack([it[0] for it in items]) / 255.0
        nir = np.stack([it[1] for it in items]) / 255.0
        gt_boxes = np.zeros((b, self.max_boxes, 4), np.float32)
        gt_labels = np.zeros((b, self.max_boxes), np.float32)
        gt_mask = np.zeros((b, self.max_boxes), np.float32)
        for j, (_, _, boxes) in enumerate(items):
            n = min(len(boxes), self.max_boxes)
            if len(boxes) > self.max_boxes:
                print(f"[loader] warning: {len(boxes)} boxes truncated to "
                      f"{self.max_boxes}")
            if n:
                gt_boxes[j, :n] = boxes[:n, :4]
                gt_labels[j, :n] = boxes[:n, 4]
                gt_mask[j, :n] = (np.abs(boxes[:n, :4]).sum(-1) > 0)
        return HostBatch(rgb.astype(np.float32), nir.astype(np.float32),
                         gt_boxes, gt_labels, gt_mask)

    def __iter__(self) -> Iterator[HostBatch]:
        n = len(self.dataset)
        order = np.arange(n)
        rng = np.random.Generator(np.random.PCG64(self.seed + self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        batches: List[np.ndarray] = []
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            batches.append(order[i:i + self.batch_size])

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            for idxs in batches:
                items = [self.dataset[int(i)] for i in idxs]
                q.put(self._collate(items))
            q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
