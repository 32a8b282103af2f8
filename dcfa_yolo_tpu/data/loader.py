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

import os
import random
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from collections import deque
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
    # (B,) 1.0 = real sample, 0.0 = repeated tail-pad duplicate (drop_last=False
    # pads ragged tails by repetition for static shapes); per-item metric
    # consumers must exclude zeros or they double-count the repeats
    sample_mask: np.ndarray = None


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
        # more worker threads than cores only thrash the GIL (measured on this
        # 1-core host: 4 workers = 0.08 batches/s vs 1 worker = 0.14); clamp.
        self.num_workers = max(1, min(num_workers, os.cpu_count() or 1))
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        self._stats_lock = threading.Lock()
        # per-epoch accounting, reset at each __iter__ (read after the epoch)
        self.overflow_items = 0       # items whose gt exceeded max_boxes
        self.overflow_dropped = 0     # total boxes dropped by the cap
        self._busy_s = 0.0            # producer-side busy seconds (all workers)
        self._produced = 0            # batches produced this epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the per-epoch shuffle/augmentation RNG stream so a loader
        rebuilt mid-run (freeze->unfreeze batch-size switch) continues the
        stream instead of replaying epoch 0's (mirrors DeviceAugLoader)."""
        self._epoch = epoch

    # ------------------------------------------------------------------
    def _collate(self, items) -> HostBatch:
        h, w = self.dataset.input_shape
        b = len(items)
        # one fused uint8→float32 /255 pass into preallocated batches (a
        # stack + divide + astype chain was the single hottest loader cost)
        rgb = np.empty((b, h, w, 3), np.float32)
        nir = np.empty((b, h, w, 3), np.float32)
        for j, it in enumerate(items):
            np.divide(it[0], np.float32(255.0), out=rgb[j], casting="unsafe")
            np.divide(it[1], np.float32(255.0), out=nir[j], casting="unsafe")
        gt_boxes = np.zeros((b, self.max_boxes, 4), np.float32)
        gt_labels = np.zeros((b, self.max_boxes), np.float32)
        gt_mask = np.zeros((b, self.max_boxes), np.float32)
        for j, (_, _, boxes) in enumerate(items):
            if len(boxes) > self.max_boxes:
                # keep the largest-area boxes: under mosaic+mixup unions dense
                # scenes can exceed the cap, and tiny slivers carry the least
                # training signal (the reference pads to the per-batch max
                # instead, `nets/yolo_training.py:342-358`; a fixed cap keeps
                # shapes static for jit)
                area = ((boxes[:, 2] - boxes[:, 0])
                        * (boxes[:, 3] - boxes[:, 1]))
                keep = np.argsort(-area)[: self.max_boxes]
                with self._stats_lock:
                    self.overflow_items += 1
                    self.overflow_dropped += len(boxes) - self.max_boxes
                boxes = boxes[keep]
            n = len(boxes)
            if n:
                gt_boxes[j, :n] = boxes[:, :4]
                gt_labels[j, :n] = boxes[:, 4]
                gt_mask[j, :n] = (np.abs(boxes[:, :4]).sum(-1) > 0)
        sample_mask = np.ones((b,), np.float32)
        return HostBatch(rgb, nir, gt_boxes, gt_labels, gt_mask, sample_mask)

    def _make_batch(self, idxs: np.ndarray, n_real: int = None) -> HostBatch:
        t0 = time.perf_counter()
        items = [self.dataset[int(i)] for i in idxs]
        out = self._collate(items)
        if n_real is not None and n_real < len(idxs):
            sm = out.sample_mask.copy()
            sm[n_real:] = 0.0
            out = out._replace(sample_mask=sm)
        with self._stats_lock:
            self._busy_s += time.perf_counter() - t0
            self._produced += 1
        return out

    def throughput(self) -> Optional[float]:
        """Measured producer capacity this epoch, batches/s (busy-time based:
        what the pool could sustain if never blocked on the consumer)."""
        if not self._busy_s:
            return None
        return self._produced / (self._busy_s / self.num_workers)

    def __iter__(self) -> Iterator[HostBatch]:
        n = len(self.dataset)
        order = np.arange(n)
        rng = np.random.Generator(np.random.PCG64(self.seed + self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1
        self.overflow_items = 0
        self.overflow_dropped = 0
        self._busy_s = 0.0
        self._produced = 0

        batches: List[Tuple[np.ndarray, int]] = []
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            idxs = order[i:i + self.batch_size]
            n_real = len(idxs)
            if n_real < self.batch_size:
                # pad the ragged tail by repetition: a fixed batch shape
                # avoids a fresh jit compile for the odd size (matches
                # DeviceAugLoader); sample_mask marks the repeats
                idxs = np.resize(idxs, self.batch_size)
            batches.append((idxs, n_real))

        # thread pool (the reference uses 4 DataLoader worker processes,
        # `train_mul.py:281-296`; PIL/cv2/numpy release the GIL in their hot
        # loops so threads parallelize the augmentation here).  Bounded
        # in-flight window keeps memory flat; results are yielded in order.
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            inflight = deque()
            max_inflight = self.num_workers + self.prefetch
            it = iter(batches)
            for idxs, n_real in batches[:max_inflight]:
                next(it)
                inflight.append(pool.submit(self._make_batch, idxs, n_real))
            while inflight:
                fut = inflight.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    inflight.append(pool.submit(self._make_batch, *nxt))
                yield fut.result()
