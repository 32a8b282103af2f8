"""mAP harness tests: VOC protocol vs reference golden, COCO AP sanity."""

import json
import os
import shutil

import numpy as np
import pytest

from dcfa_yolo_tpu.evalmap.coco_map import get_coco_map
from dcfa_yolo_tpu.evalmap.voc_map import get_map, voc_ap

import pathlib
GOLDEN_DIR = str(pathlib.Path(__file__).parent / "goldens")


class TestVocMap:
    def test_matches_reference_golden(self, tmp_path):
        src = os.path.join(GOLDEN_DIR, "map_files")
        work = tmp_path / "map"
        shutil.copytree(src, work)
        with open(os.path.join(GOLDEN_DIR, "map_golden.json")) as f:
            ref = json.load(f)["map50"]
        mine = get_map(0.5, False, score_threshold=0.5, path=str(work))
        np.testing.assert_allclose(mine, ref, atol=1e-10)

    def test_results_txt_matches_reference_golden(self, tmp_path):
        """The rebuilt harness's results.txt carries the reference's facts
        (`utils/utils_map.py:608-742`): per-class AP, rounded P/R arrays,
        gt counts and detection counts with tp/fp."""
        import re

        src = os.path.join(GOLDEN_DIR, "map_files")
        work = tmp_path / "map"
        shutil.copytree(src, work)
        get_map(0.5, False, score_threshold=0.5, path=str(work))
        mine = (work / "results" / "results.txt").read_text()
        ref = open(os.path.join(GOLDEN_DIR, "map_results_golden.txt")).read()

        def facts(txt):
            ap = dict(re.findall(r"^([\d.]+)% = (\S+) AP", txt, re.M))
            ap = {cls: v for v, cls in ap.items()}
            prec = re.findall(r"Precision: (\[[^\]]*\])", txt)
            rec = re.findall(r"Recall :(\[[^\]]*\])", txt)
            m = re.search(r"mAP = ([\d.]+)%", txt)
            gts = dict(re.findall(r"^(\S+): (\d+)$", txt, re.M))
            dets = dict(re.findall(r"^(\S+): (\d+ \(tp:\d+, fp:\d+\))$", txt, re.M))
            return ap, prec, rec, m.group(1), gts, dets

        assert facts(mine) == facts(ref)

    def test_voc_ap_known_value(self):
        # single det matching single gt: P=1 at R=1 → AP = 1
        ap, _, _ = voc_ap([1.0], [1.0])
        assert ap == 1.0
        # P=0.5 at all recalls → AP 0.5
        ap, _, _ = voc_ap([0.5, 1.0], [0.5, 0.5])
        assert ap == pytest.approx(0.5)


class TestCocoMap:
    def _write(self, base, gt, dr):
        os.makedirs(base / "ground-truth", exist_ok=True)
        os.makedirs(base / "detection-results", exist_ok=True)
        for fid, lines in gt.items():
            (base / "ground-truth" / f"{fid}.txt").write_text("".join(lines))
        for fid, lines in dr.items():
            (base / "detection-results" / f"{fid}.txt").write_text("".join(lines))

    def test_perfect_detections(self, tmp_path):
        gt = {"a": ["c 10 10 50 50\n", "c 60 60 100 100\n"]}
        dr = {"a": ["c 0.9 10 10 50 50\n", "c 0.8 60 60 100 100\n"]}
        self._write(tmp_path, gt, dr)
        ap, ap50 = get_coco_map(["c"], path=str(tmp_path))
        assert ap50 == pytest.approx(1.0)
        assert ap == pytest.approx(1.0)

    def test_half_detections(self, tmp_path):
        gt = {"a": ["c 10 10 50 50\n", "c 200 200 240 240\n"]}
        dr = {"a": ["c 0.9 10 10 50 50\n"]}  # one of two found
        self._write(tmp_path, gt, dr)
        ap, ap50 = get_coco_map(["c"], path=str(tmp_path))
        # precision 1 up to recall 0.5 → 101-pt AP ≈ 51/101
        assert ap50 == pytest.approx(51 / 101, abs=1e-6)

    def test_class_with_gt_but_no_detections(self, tmp_path):
        """Zero detections for a class with gt must give AP 0, not crash
        (early-epoch eval: the size-0 precision array used to IndexError)."""
        gt = {"a": ["c 10 10 50 50\n", "d 60 60 100 100\n"]}
        dr = {"a": ["d 0.9 60 60 100 100\n"]}  # nothing for class c
        self._write(tmp_path, gt, dr)
        ap, ap50 = get_coco_map(["c", "d"], path=str(tmp_path))
        assert ap50 == pytest.approx(0.5)  # c: 0, d: 1

    def test_iou_thresholds_are_exact(self):
        """linspace, not arange: the top threshold must be exactly 0.95 so an
        IoU that computes to 0.95 in double counts as a match (COCOeval)."""
        from dcfa_yolo_tpu.evalmap.coco_map import IOU_THRESHOLDS

        assert IOU_THRESHOLDS[-1] == 0.95
        np.testing.assert_allclose(np.diff(IOU_THRESHOLDS), 0.05, rtol=1e-12)

    def test_localization_quality_affects_high_iou(self, tmp_path):
        # det overlaps gt with IoU ≈ 0.62 → counts at 0.5-0.6, not at 0.65+
        gt = {"a": ["c 0 0 100 100\n"]}
        dr = {"a": ["c 0.9 0 0 80 100\n"]}  # IoU = 0.8
        self._write(tmp_path, gt, dr)
        ap, ap50 = get_coco_map(["c"], path=str(tmp_path))
        assert ap50 == pytest.approx(1.0)
        assert ap < 1.0  # fails at IoU .85/.9/.95


class TestEvalCallbackVocFallback:
    def test_mixed_difficult_gt(self, tmp_path):
        """difficult gt: matched dets are neither TP nor FP."""
        gt = {"a": ["c 10 10 50 50 difficult\n", "c 100 100 150 150\n"]}
        dr = {"a": ["c 0.95 10 10 50 50\n", "c 0.9 100 100 150 150\n"]}
        os.makedirs(tmp_path / "ground-truth", exist_ok=True)
        os.makedirs(tmp_path / "detection-results", exist_ok=True)
        for fid, lines in gt.items():
            (tmp_path / "ground-truth" / f"{fid}.txt").write_text("".join(lines))
        for fid, lines in dr.items():
            (tmp_path / "detection-results" / f"{fid}.txt").write_text("".join(lines))
        m = get_map(0.5, False, path=str(tmp_path))
        assert m == pytest.approx(1.0)


class TestEvalCallbackBatched:
    def test_batched_eval_matches_per_image(self, tmp_path):
        """EvalCallback(batch_size=2) must produce the same epoch mAP as the
        per-image protocol (same txts → same score), incl. a ragged tail."""
        import numpy as np
        from PIL import Image

        from dcfa_yolo_tpu.infer.predictor import YOLOPredictor
        from dcfa_yolo_tpu.utils.callbacks import EvalCallback

        rng = np.random.Generator(np.random.PCG64(5))
        lines = []
        for i in range(3):
            rgb = Image.fromarray(rng.integers(0, 255, (96, 120, 3),
                                               dtype=np.uint8))
            nir = Image.fromarray(rng.integers(0, 255, (96, 120, 3),
                                               dtype=np.uint8))
            rp = tmp_path / f"r{i}.png"
            np_ = tmp_path / f"n{i}.png"
            rgb.save(rp)
            nir.save(np_)
            lines.append(f"{rp} {np_} 10,10,60,60,0")

        predictor = YOLOPredictor(class_names=["a"], input_shape=(128, 128),
                                  phi="n", confidence=0.01, nms_iou=0.5,
                                  max_det=20)
        factory = lambda variables, conf, iou, max_boxes: predictor
        maps = {}
        for bs in (1, 2):
            cb = EvalCallback(factory, ["a"], lines,
                              str(tmp_path / f"log{bs}"),
                              map_out_path=str(tmp_path / f"map{bs}"),
                              period=1, batch_size=bs)
            maps[bs] = cb.on_epoch_end(1, None)
        assert maps[1] == maps[2]
