"""Adversarial vectors for the native COCOeval implementation.

Each case is hand-derived by walking pycocotools' exact algorithm
(COCOeval.evaluateImg + accumulate, with the reference's converter semantics
`utils/utils_map.py:835,878`: difficult → iscrowd → ignore).  The derivations
are spelled out inline so a reviewer can re-check them against the published
algorithm without pycocotools present.

Covers the divergence classes VERDICT r2 called out: score ties across
images, difficult flags (crowd/ignore matching + crowd IoU), maxDets edges,
multi-class NaN averaging, and a VOC-vs-COCO AP50 consistency bound.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from dcfa_yolo_tpu.evalmap.coco_map import get_coco_map
from dcfa_yolo_tpu.evalmap.voc_map import get_map


def write_case(tmp_path, gt: dict, dr: dict):
    """gt/dr: {image_id: [line, ...]} → map_out layout on disk."""
    for sub, data in (("ground-truth", gt), ("detection-results", dr)):
        d = os.path.join(tmp_path, sub)
        os.makedirs(d, exist_ok=True)
        for image_id, lines in data.items():
            with open(os.path.join(d, image_id + ".txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
    return str(tmp_path)


class TestScoreTies:
    def test_cross_image_tie_resolves_in_file_order(self, tmp_path):
        """Two dets with IDENTICAL scores, one TP (image 0001) one FP (0002).

        pycocotools sorts all scores with kind='mergesort' (stable), so the
        0001 det (earlier image) stays first: tp=[1,0] → rec=[.5,.5],
        prec=[1,.5] → monotone [1,.5] → q(p)=1 for p≤0.5 (51 of the 101
        recall points), 0 after → AP50 = 51/101.
        """
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100"], "0002": ["a 0 0 100 100"]},
            dr={"0001": ["a 0.9 0 0 100 100"],
                "0002": ["a 0.9 500 500 600 600"]})
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == pytest.approx(51 / 101, abs=1e-9)


class TestDifficultIsCrowd:
    def test_crowd_absorbs_multiple_dets_as_ignored(self, tmp_path):
        """gt: one normal box + one difficult (→iscrowd) box.  Three dets:
        two on the difficult box (scores .9/.7), one on the normal (.8).

        COCOeval: both difficult-box dets match the ignore region (crowd gts
        are never consumed) → dtIg, neither TP nor FP.  The .8 det is a TP.
        npig=1 → rec=[...,1], prec=1 after masking ignored dets → AP=1.0 at
        every IoU threshold (all overlaps are exact).
        """
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100", "a 300 300 400 400 difficult"]},
            dr={"0001": ["a 0.9 300 300 400 400",
                         "a 0.8 0 0 100 100",
                         "a 0.7 300 300 400 400"]})
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == pytest.approx(1.0, abs=1e-9)
        assert ap == pytest.approx(1.0, abs=1e-9)

    def test_crowd_iou_uses_detection_area(self, tmp_path):
        """A small det INSIDE a big difficult region: normal IoU would be
        100/40000=0.0025 (no match → FP), but crowd IoU = inter/det_area = 1
        → matched-to-ignore → dropped.  With one clean TP, AP50 stays 1.0.
        """
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100", "a 300 300 500 500 difficult"]},
            dr={"0001": ["a 0.9 350 350 360 360",   # tiny, inside the region
                         "a 0.8 0 0 100 100"]})
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == pytest.approx(1.0, abs=1e-9)

    def test_normal_match_never_traded_for_ignore(self, tmp_path):
        """A det overlapping BOTH a normal gt (IoU .8) and a difficult gt
        (crowd IoU 1.0): COCOeval stops at the ignored tail once a normal
        match is in hand (`gtIg[m]==0 and gtIg[gind]==1 → break`), so the det
        is a TP on the normal gt, not ignored.  rec hits 1 → AP50=1.
        """
        # det [0,0,100,80]: vs normal gt [0,0,100,100] IoU = 8000/10000 = 0.8;
        # inside difficult region [0,0,200,200] → crowd IoU 1.0
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100", "a 0 0 200 200 difficult"]},
            dr={"0001": ["a 0.9 0 0 100 80"]})
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == pytest.approx(1.0, abs=1e-9)
        # AP@0.75: IoU .8 ≥ .75 still matches; AP@0.85 would not — mean over
        # thresholds = 7/10 (thresholds .5...80 match, .85/.90/.95 don't)
        assert ap == pytest.approx(7 / 10, abs=1e-9)

    def test_difficult_excluded_from_recall_denominator(self, tmp_path):
        """One normal + one difficult gt, one TP det on the normal box, no
        det near the difficult one: npig=1 (not 2) → recall reaches 1.0 →
        AP50 = 1.0.  (Counting the difficult gt would cap recall at .5 and
        halve the 101-point AP.)"""
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100", "a 300 300 400 400 difficult"]},
            dr={"0001": ["a 0.9 0 0 100 100"]})
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == pytest.approx(1.0, abs=1e-9)


class TestMaxDets:
    def _dense(self, tmp_path, n_fp=100, tp_score=0.5):
        gt = {"0001": ["a 0 0 100 100"]}
        dr_lines = [f"a 0.9 {1000 + 200 * i} 0 {1100 + 200 * i} 100"
                    for i in range(n_fp)]
        dr_lines.append(f"a {tp_score} 0 0 100 100")
        return write_case(tmp_path, gt, dr={"0001": dr_lines})

    def test_tp_beyond_cap_is_dropped(self, tmp_path):
        """100 higher-scored FPs + 1 TP at rank 101: COCO maxDets=100 drops
        the TP → AP = 0."""
        path = self._dense(tmp_path)
        ap, ap50 = get_coco_map(["a"], path=path)
        assert ap50 == 0.0

    def test_raising_cap_recovers_the_tail_tp(self, tmp_path):
        """Same scene at maxDets=101: tp arrives at det rank 101 →
        prec=[0]*100+[1/101] → monotone → 1/101 at every recall point →
        AP50 = 1/101."""
        path = self._dense(tmp_path)
        ap, ap50 = get_coco_map(["a"], path=path, max_dets=101)
        assert ap50 == pytest.approx(1 / 101, abs=1e-9)


class TestMultiClass:
    def test_zero_gt_class_is_nan_excluded(self, tmp_path):
        """Class 'b' has detections but no gt anywhere: COCOeval marks its
        precision slab -1 and excludes it from the mean (nanmean here), so
        mAP equals class 'a' alone — not the average with 0."""
        path = write_case(
            tmp_path,
            gt={"0001": ["a 0 0 100 100"]},
            dr={"0001": ["a 0.9 0 0 100 100", "b 0.9 200 200 300 300"]})
        ap, ap50 = get_coco_map(["a", "b"], path=path)
        assert ap50 == pytest.approx(1.0, abs=1e-9)


class TestVocCocoConsistency:
    def test_ap50_close_on_unambiguous_scenario(self, tmp_path):
        """On a scenario where every match is unambiguous (overlaps ≈ 1 or
        ≈ 0), VOC AP (continuous area, +1-px IoU) and COCO AP50 (101-point)
        may differ only by interpolation granularity, ≤ ~1/101 per PR step.
        8 gts over 4 images, 6 TPs + 2 FPs interleaved by score.
        """
        rng = np.random.Generator(np.random.PCG64(5))
        gt, dr = {}, {}
        scores = iter(np.linspace(0.95, 0.6, 8).round(3))
        for i in range(4):
            fid = f"{i:04d}"
            g = []
            d = []
            for j in range(2):
                x = 50 + 200 * j
                y = 60 + 10 * i
                g.append(f"a {x} {y} {x + 80} {y + 90}")
                s = next(scores)
                if (i, j) != (1, 1) and (i, j) != (3, 0):
                    d.append(f"a {s} {x} {y} {x + 80} {y + 90}")   # clean TP
                else:
                    d.append(f"a {s} {x + 500} {y + 500} {x + 580} {y + 590}")  # FP
            gt[fid], dr[fid] = g, d
        path = write_case(tmp_path, gt, dr)
        _, ap50 = get_coco_map(["a"], path=path)
        voc = get_map(0.5, False, score_threshold=0.5, path=path)
        assert abs(ap50 - voc) < 0.02
