"""Data pipeline tests: VOC prep, augmentation geometry, loader batching."""

import os

import numpy as np
import pytest
from PIL import Image

from dcfa_yolo_tpu.data.augment import (
    load_mosaic,
    load_pair_letterbox,
    load_pair_random,
    mixup_pairs,
)
from dcfa_yolo_tpu.data.loader import BatchLoader, PairedDetectionDataset
from dcfa_yolo_tpu.data.voc import (
    generate_annotation_files,
    generate_imagesets,
    parse_voc_xml,
)

XML_TEMPLATE = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""
OBJ_TEMPLATE = """<object><name>{name}</name><difficult>{difficult}</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>"""


@pytest.fixture()
def voc_dir(tmp_path):
    """Tiny paired-VOC tree with 6 images."""
    rng = np.random.Generator(np.random.PCG64(0))
    base = tmp_path / "VOCdevkit" / "VOC2007"
    (base / "Annotations").mkdir(parents=True)
    (base / "JPEGImages_rgb").mkdir()
    (base / "JPEGImages_nir").mkdir()
    (tmp_path / "model_data").mkdir()
    (tmp_path / "model_data" / "cls.txt").write_text("tomato\n")
    for i in range(6):
        w, h = 160, 120
        objs = "".join(
            OBJ_TEMPLATE.format(name="tomato", difficult=1 if j == 2 else 0,
                                x1=10 + 20 * j, y1=10, x2=40 + 20 * j, y2=60)
            for j in range(3))
        (base / "Annotations" / f"{i:06d}.xml").write_text(
            XML_TEMPLATE.format(w=w, h=h, objects=objs))
        for sub in ("JPEGImages_rgb", "JPEGImages_nir"):
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(base / sub / f"{i:06d}.jpg")
    return tmp_path


class TestVocPrep:
    def test_splits_and_annotations(self, voc_dir, monkeypatch):
        sizes = generate_imagesets(str(voc_dir / "VOCdevkit"))
        assert sizes["trainval"] + sizes["test"] == 6
        monkeypatch.chdir(voc_dir)  # annotation files written to cwd
        out = generate_annotation_files(str(voc_dir / "VOCdevkit"),
                                        str(voc_dir / "model_data" / "cls.txt"))
        assert os.path.exists(voc_dir / "2007_train.txt")
        line = open(voc_dir / "2007_train.txt").readline().split()
        assert line[0].endswith(".jpg") and line[1].endswith(".jpg")
        # difficult object skipped: 2 of 3 per image
        assert all(len(line) == 2 + 2 for line in
                   [l.split() for l in open(voc_dir / "2007_train.txt")])

    def test_parse_difficult(self, voc_dir):
        xml = str(voc_dir / "VOCdevkit/VOC2007/Annotations/000000.xml")
        objs = parse_voc_xml(xml, ["tomato"])
        assert len(objs) == 2
        objs_all = parse_voc_xml(xml, ["tomato"], keep_difficult=True)
        assert len(objs_all) == 3


@pytest.fixture()
def annotation_lines(voc_dir, monkeypatch):
    monkeypatch.chdir(voc_dir)
    generate_imagesets(str(voc_dir / "VOCdevkit"))
    generate_annotation_files(str(voc_dir / "VOCdevkit"),
                              str(voc_dir / "model_data" / "cls.txt"),
                              sets=("train", "val", "test"))
    lines = []
    for s in ("train", "val", "test"):
        p = voc_dir / f"2007_{s}.txt"
        if p.exists():
            lines += [l for l in open(p) if l.strip()]
    return lines


class TestAugment:
    def test_letterbox_val_path(self, annotation_lines):
        rgb, nir, boxes = load_pair_letterbox(annotation_lines[0], (128, 128))
        assert rgb.shape == (128, 128, 3) and nir.shape == (128, 128, 3)
        # gray padding present (160x120 → scaled to 128x96, pad 16 top/bottom)
        assert (rgb[0] == 128).all()
        if len(boxes):
            assert (boxes[:, :4] >= 0).all()
            assert (boxes[:, [0, 2]] <= 128).all()

    def test_random_train_path_joint_geometry(self, annotation_lines):
        np.random.seed(0)
        rgb, nir, boxes = load_pair_random(annotation_lines[0], (128, 128))
        assert rgb.shape == (128, 128, 3)
        if len(boxes):
            assert (boxes[:, 2] > boxes[:, 0]).all()
            assert (boxes[:, 3] > boxes[:, 1]).all()

    def test_mosaic(self, annotation_lines):
        np.random.seed(1)
        import random

        random.seed(1)
        lines = annotation_lines[:4]
        rgb, nir, boxes = load_mosaic(lines, (128, 128))
        assert rgb.shape == (128, 128, 3) and nir.shape == (128, 128, 3)
        assert boxes.shape[1] == 5 if len(boxes) else True

    def test_mixup(self, annotation_lines):
        np.random.seed(2)
        r1, n1, b1 = load_pair_random(annotation_lines[0], (96, 96))
        r2, n2, b2 = load_pair_random(annotation_lines[1], (96, 96))
        rm, nm, bm = mixup_pairs(r1, n1, b1, r2, n2, b2)
        assert rm.shape == (96, 96, 3)
        assert len(bm) == len(b1) + len(b2) or len(bm) in (len(b1), len(b2))


class TestLoader:
    def test_max_boxes_overflow_keeps_largest(self):
        """>max_boxes gt (dense mosaic+mixup scenes): the largest-area boxes
        are kept and the overflow is counted (VERDICT r1 #8; the reference
        pads to the per-batch max instead, `nets/yolo_training.py:342-358`)."""
        from dcfa_yolo_tpu.data.loader import BatchLoader

        n = 80
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, 2] = np.arange(1, n + 1)  # widths 1..80 → areas 1..80
        boxes[:, 3] = 1.0
        items = [(np.zeros((64, 64, 3), np.uint8),
                  np.zeros((64, 64, 3), np.uint8), boxes)]
        ld = BatchLoader.__new__(BatchLoader)
        ld.max_boxes = 64
        ld.overflow_items = 0
        ld.overflow_dropped = 0
        import threading

        ld._stats_lock = threading.Lock()

        class DS:
            input_shape = (64, 64)

        ld.dataset = DS()
        hb = ld._collate(items)
        assert ld.overflow_items == 1 and ld.overflow_dropped == 16
        assert hb.gt_mask[0].sum() == 64
        widths = hb.gt_boxes[0, :, 2] - hb.gt_boxes[0, :, 0]
        assert widths.min() == 17  # smallest 16 dropped

        # pad_targets applies the same policy on the (N,6) label format
        from dcfa_yolo_tpu.train.loss import pad_targets

        labels = np.zeros((n, 6), np.float32)
        labels[:, 0] = 0
        labels[:, 2:4] = 0.5
        labels[:, 4] = np.arange(1, n + 1) / 100.0
        labels[:, 5] = 0.1
        gt_boxes, _, gt_mask = pad_targets(labels, 1, 64, (100, 100))
        assert gt_mask[0].sum() == 64
        w = gt_boxes[0, :, 2] - gt_boxes[0, :, 0]
        assert w.min() == pytest.approx(17.0, abs=1e-4)

    def test_batch_shapes_and_padding(self, annotation_lines):
        ds = PairedDetectionDataset(annotation_lines, (96, 96), train=False,
                                    mosaic=False, mixup=False)
        loader = BatchLoader(ds, batch_size=2, max_boxes=8, shuffle=True,
                             num_workers=1, seed=0)
        batches = list(loader)
        assert len(batches) == len(ds) // 2
        hb = batches[0]
        assert hb.rgb.shape == (2, 96, 96, 3)
        assert hb.rgb.dtype == np.float32 and hb.rgb.max() <= 1.0
        assert hb.gt_boxes.shape == (2, 8, 4)
        assert ((hb.gt_mask == 0) | (hb.gt_mask == 1)).all()
        # valid rows have positive area
        m = hb.gt_mask.astype(bool)
        if m.any():
            assert (hb.gt_boxes[m][:, 2] > hb.gt_boxes[m][:, 0]).all()

    def test_epoch_reshuffle_differs(self, annotation_lines):
        ds = PairedDetectionDataset(annotation_lines, (64, 64), train=False,
                                    mosaic=False, mixup=False)
        loader = BatchLoader(ds, batch_size=2, max_boxes=4, shuffle=True,
                             num_workers=1, seed=0)
        a = [b.rgb.sum() for b in loader]
        b = [b.rgb.sum() for b in loader]
        assert len(a) == len(b)
