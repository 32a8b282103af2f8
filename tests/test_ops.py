"""Pure-op parity tests against torch/PIL goldens."""

import numpy as np

from dcfa_yolo_tpu.ops.pool import max_pool_same
from dcfa_yolo_tpu.ops.resize import (
    letterbox_batch,
    resize_bilinear_align_corners,
)


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


class TestBilinearAlignCorners:
    def test_upsample_40x40(self, golden_ops):
        x = nchw_to_nhwc(golden_ops["resize_in"])
        out = resize_bilinear_align_corners(x, (40, 40))
        np.testing.assert_allclose(
            nhwc_to_nchw(np.asarray(out)), golden_ops["resize_out_40x40"],
            rtol=1e-5, atol=1e-5)

    def test_downsample_3x5(self, golden_ops):
        x = nchw_to_nhwc(golden_ops["resize_in"])
        out = resize_bilinear_align_corners(x, (3, 5))
        np.testing.assert_allclose(
            nhwc_to_nchw(np.asarray(out)), golden_ops["resize_out_3x5"],
            rtol=1e-5, atol=1e-5)


class TestMaxPool:
    def test_k5_s1(self, golden_ops):
        x = nchw_to_nhwc(golden_ops["pool_in"])
        out = max_pool_same(x, 5, 1)
        np.testing.assert_allclose(
            nhwc_to_nchw(np.asarray(out)), golden_ops["pool_k5s1"], rtol=0, atol=0)

    def test_k3_s2(self, golden_ops):
        x = nchw_to_nhwc(golden_ops["pool_in"])
        out = max_pool_same(x, 3, 2)
        np.testing.assert_allclose(
            nhwc_to_nchw(np.asarray(out)), golden_ops["pool_k3s2"], rtol=0, atol=0)


class TestLetterbox:
    def test_pil_bicubic_parity(self, golden_ops):
        """On-device letterbox vs PIL BICUBIC + gray paste (`utils/utils.py:24-37`)."""
        img = golden_ops["letterbox_in"][None]  # (1, H, W, 3) uint8
        out = np.asarray(letterbox_batch(img, (640, 640)))
        ref = golden_ops["letterbox_out"].astype(np.float32)
        # PIL rounds to uint8 per separable pass; allow ±1 count on a tiny
        # fraction of pixels from the different rounding point.
        diff = np.abs(out[0] - ref)
        assert float(np.mean(diff <= 1.0)) > 0.995, f"mean close frac {np.mean(diff <= 1.0)}"
        assert float(diff.max()) <= 16.0


class TestAnchors:
    def test_make_anchors_matches_reference(self, golden_model_fwd):
        from dcfa_yolo_tpu.ops.boxes import make_anchors_np

        anchors, strides = make_anchors_np((640, 640), (8, 16, 32))
        # reference returns transposed copies (`nets/yolo_mul.py:456`)
        np.testing.assert_allclose(anchors.T, golden_model_fwd["anchors"], atol=0)
        np.testing.assert_allclose(strides.T, golden_model_fwd["strides"], atol=0)
