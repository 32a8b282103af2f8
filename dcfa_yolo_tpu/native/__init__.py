"""ctypes loader for the native host-ops library (native/dcfa_host.cpp).

Builds the shared library on demand with g++ (cached next to the source) and
exposes numpy-friendly wrappers.  Everything degrades gracefully: if the
toolchain is unavailable, callers fall back to the PIL/cv2 paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dcfa_host.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libdcfa_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.letterbox_bicubic_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8]
    lib.letterbox_bicubic_u8.restype = None
    lib.hsv_jitter_u8.argtypes = [u8p, ctypes.c_long, u8p, u8p, u8p]
    lib.hsv_jitter_u8.restype = None
    lib.normalize_to_f32.argtypes = [u8p, f32p, ctypes.c_long]
    lib.normalize_to_f32.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def letterbox_bicubic(img: np.ndarray, out_hw: Tuple[int, int],
                      pad_value: int = 128) -> np.ndarray:
    """PIL-parity bicubic letterbox of an (H, W, 3) uint8 image."""
    ih, iw = img.shape[:2]
    oh, ow = out_hw
    scale = min(ow / iw, oh / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    return resize_paste(img, (nh, nw), out_hw, (oh - nh) // 2, (ow - nw) // 2,
                        pad_value)


def resize_paste(img: np.ndarray, resized_hw: Tuple[int, int],
                 out_hw: Tuple[int, int], dy: int, dx: int,
                 pad_value: int = 128) -> np.ndarray:
    """PIL-parity bicubic resize of an (H, W, 3) uint8 image to resized_hw,
    pasted (clipped) at (dy, dx) onto a gray canvas of out_hw — the general
    form used by the train-path random placement and mosaic tiles
    (`utils/dataloader_mul.py:150-162, 299-311`)."""
    lib = get_lib()
    assert lib is not None
    ih, iw = img.shape[:2]
    oh, ow = out_hw
    nh, nw = resized_hw
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((oh, ow, 3), np.uint8)
    lib.letterbox_bicubic_u8(_u8ptr(img), ih, iw, _u8ptr(out), oh, ow, nh, nw,
                             dy, dx, pad_value)
    return out


def hsv_jitter(img: np.ndarray, lut_h: np.ndarray, lut_s: np.ndarray,
               lut_v: np.ndarray) -> np.ndarray:
    """In-place-style joint HSV jitter of an (H, W, 3) uint8 RGB image."""
    lib = get_lib()
    assert lib is not None
    out = np.ascontiguousarray(img, dtype=np.uint8).copy()
    lib.hsv_jitter_u8(_u8ptr(out), out.shape[0] * out.shape[1],
                      _u8ptr(np.ascontiguousarray(lut_h, np.uint8)),
                      _u8ptr(np.ascontiguousarray(lut_s, np.uint8)),
                      _u8ptr(np.ascontiguousarray(lut_v, np.uint8)))
    return out


def normalize(img: np.ndarray) -> np.ndarray:
    """(...,) uint8 → float32 / 255 via the fused native loop."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(img, np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.normalize_to_f32(_u8ptr(src),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         src.size)
    return out
