"""Predictor facade integration tests (CPU, small input)."""

import numpy as np
import pytest
from PIL import Image

from dcfa_yolo_tpu.infer.predictor import YOLOPredictor


@pytest.fixture(scope="module")
def predictor():
    return YOLOPredictor(class_names=["a", "b"], input_shape=(128, 128),
                         phi="n", confidence=0.01, nms_iou=0.5, max_det=20)


def _pair(seed, size=(120, 96)):
    rng = np.random.Generator(np.random.PCG64(seed))
    rgb = Image.fromarray(rng.integers(0, 255, size + (3,), dtype=np.uint8))
    nir = Image.fromarray(rng.integers(0, 255, size + (3,), dtype=np.uint8))
    return rgb, nir


class TestPredictor:
    def test_detect_shapes(self, predictor):
        rgb, nir = _pair(0)
        boxes, scores, classes = predictor.detect(rgb, nir)
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert len(boxes) == len(scores) == len(classes)

    def test_detect_batch_consistent_with_single(self, predictor):
        rgb, nir = _pair(1)
        single = predictor.detect(rgb, nir)
        batched = predictor.detect_batch([rgb, rgb], [nir, nir])
        assert len(batched) == 2
        np.testing.assert_allclose(batched[0][0], single[0], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(batched[1][1], single[1], rtol=1e-5)

    def test_deploy_predictor_builds_and_matches_train_graph(self, predictor):
        """deploy=True must build a deploy-shaped variable template (the
        train template used to be passed to the fused graph and crash) and
        agree numerically with the train-graph predictor (reparam identity)."""
        dep = YOLOPredictor(class_names=["a", "b"], input_shape=(128, 128),
                            phi="n", confidence=0.01, nms_iou=0.5, max_det=20,
                            deploy=True)
        rgb, nir = _pair(7)
        b0, s0, c0 = predictor.detect(rgb, nir)
        b1, s1, c1 = dep.detect(rgb, nir)
        assert len(b0) == len(b1)
        np.testing.assert_allclose(b1, b0, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(s1, s0, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(c1, c0)

    def test_detect_heatmap_writes_file(self, predictor, tmp_path):
        rgb, nir = _pair(8)
        out = str(tmp_path / "hm.png")
        predictor.detect_heatmap(rgb, nir, out)
        import os

        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_detect_image_draws(self, predictor):
        rgb, nir = _pair(2)
        out = predictor.detect_image(rgb, nir)
        assert out.size == rgb.size

    def test_grayscale_input_converted(self, predictor):
        rng = np.random.Generator(np.random.PCG64(3))
        gray = Image.fromarray(rng.integers(0, 255, (96, 120), dtype=np.uint8),
                               mode="L")
        boxes, _, _ = predictor.detect(gray, gray)
        assert boxes.shape[1] == 4

    def test_get_map_txt_format(self, predictor, tmp_path):
        rgb, nir = _pair(4)
        predictor.get_map_txt("img1", rgb, nir, ["a", "b"], str(tmp_path))
        txt = (tmp_path / "detection-results" / "img1.txt").read_text()
        for line in txt.strip().splitlines():
            parts = line.split()
            assert parts[0] in ("a", "b")
            float(parts[1])
            [int(x) for x in parts[2:6]]

    def test_get_map_txt_batch_matches_per_image(self, predictor, tmp_path):
        """Batched eval txt outputs must equal the per-image protocol's
        (EvalCallback batch_size>1 relies on this)."""
        pairs = [_pair(s) for s in (11, 12, 13)]
        d1 = tmp_path / "per_image"
        d2 = tmp_path / "batched"
        for i, (rgb, nir) in enumerate(pairs):
            predictor.get_map_txt(f"im{i}", rgb, nir, ["a", "b"], str(d1))
        predictor.get_map_txt_batch(
            [f"im{i}" for i in range(3)],
            [p[0] for p in pairs], [p[1] for p in pairs],
            ["a", "b"], str(d2))
        for i in range(3):
            a = (d1 / "detection-results" / f"im{i}.txt").read_text()
            b = (d2 / "detection-results" / f"im{i}.txt").read_text()
            assert a == b, f"im{i} differs"
