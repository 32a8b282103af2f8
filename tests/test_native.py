"""Native host-op library tests (C++ via ctypes): parity with PIL/cv2."""

import numpy as np
import pytest
from PIL import Image

from dcfa_yolo_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _pil_letterbox(img, out_hw, pad=128):
    oh, ow = out_hw
    ih, iw = img.shape[:2]
    scale = min(ow / iw, oh / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    canvas = Image.new("RGB", (ow, oh), (pad, pad, pad))
    canvas.paste(Image.fromarray(img).resize((nw, nh), Image.BICUBIC),
                 ((ow - nw) // 2, (oh - nh) // 2))
    return np.asarray(canvas)


class TestNativeLetterbox:
    @pytest.mark.parametrize("shape,out", [((480, 602), (640, 640)),
                                           ((120, 160), (96, 96)),
                                           ((300, 200), (256, 256))])
    def test_pil_parity(self, shape, out):
        rng = np.random.Generator(np.random.PCG64(3))
        img = rng.integers(0, 255, shape + (3,), dtype=np.uint8)
        mine = native.letterbox_bicubic(img, out)
        ref = _pil_letterbox(img, out)
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.max() <= 2 and (diff <= 1).mean() > 0.999


class TestNativeHSV:
    def test_identity_luts(self):
        rng = np.random.Generator(np.random.PCG64(4))
        img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        x = np.arange(256, dtype=np.uint8)
        out = native.hsv_jitter(img, x[:180].copy(), x, x)
        # identity HSV roundtrip: within quantization of the H channel
        diff = np.abs(out.astype(int) - img.astype(int))
        assert (diff <= 3).mean() > 0.99

    def test_value_scaling(self):
        img = np.full((8, 8, 3), 100, np.uint8)
        x = np.arange(256, dtype=np.uint8)
        lut_v = np.clip(x * 1.5, 0, 255).astype(np.uint8)
        out = native.hsv_jitter(img, x[:180].copy(), x, lut_v)
        assert abs(int(out[0, 0, 0]) - 150) <= 1


class TestNativeNormalize:
    def test_matches_div255(self):
        rng = np.random.Generator(np.random.PCG64(5))
        img = rng.integers(0, 255, (33, 17, 3), dtype=np.uint8)
        np.testing.assert_allclose(native.normalize(img),
                                   img.astype(np.float32) / 255.0, rtol=1e-7)
