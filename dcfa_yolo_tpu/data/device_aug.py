"""TPU-resident data pipeline: the dataset lives in HBM, augmentation runs on-chip.

Motivation (measured in this container, tools/bench_device_aug.py): the axon
host<->device link moves ~25 MB/s -- a b16 float32 640^2 batch costs ~6.6 s of
H2D, ~68x the 97.6 ms train step -- and the 1-core host sustains ~1 batch/s of
mosaic augmentation.  Both bottlenecks disappear when the decoded dataset is
staged into device HBM once (uint8, ~2.5 MB per RGB+NIR pair at 640^2) and
everything after JPEG decode is a jitted TPU program: per-step host->device
traffic drops to tile indices plus a few geometry scalars (~KB), and the
augmentation itself rides the MXU -- each slot's resize+paste is two batched
contractions against custom per-slot weight matrices with the flips and the
mosaic quadrant masks folded into the weights (see `make_device_augment`).
Measured on the v5e chip (tools/bench_device_aug.py, b16 640^2 mosaic+mixup
on every sample): aug 47.1 ms/batch bf16 (58.0 f32), aug+train-step chain
106.7 ms/step = 150 img/s end-to-end, vs a multi-second H2D floor for the
host-fed float32 path on this link.  bf16 resampling keeps geometry f32-exact
(box outputs bit-identical); pixel delta vs f32 is sub-LSB (p99 0.27 LSB).

Behavioral counterpart of the reference host-side pipeline
(`/root/reference/utils/dataloader_mul.py:86-379`):
  * identical parameter distributions and int-truncation math (drawn on the
    host by `ParamSampler`, so reference quirks like `int(scale*h)` and the
    flip-only-when-boxes-exist mosaic rule at `dataloader_mul.py:247-251`
    survive exactly);
  * identical mosaic quadrant paste / `merge_bboxes` clipping semantics
    (`dataloader_mul.py:194-238`), including its quirk of NOT re-filtering
    degenerate boxes after the quadrant clip;
  * identical joint-HSV gain ranges applied to both modalities
    (`dataloader_mul.py:340-363`) and 0.5/0.5 mixup (`:370-379`).

Pixel values differ from the PIL path only through resampling: tiles are
staged at a fixed resolution and re-resampled on device with a Keys cubic
kernel (antialiased), vs PIL's one-step BICUBIC from the original -- an
augmentation-quality tradeoff pinned by tests/test_device_aug.py (p99 within
1 LSB of PIL for the single-resample case).  Box arithmetic is exact.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from dcfa_yolo_tpu.data.augment import _load_rgb_u8


class StagedDataset(NamedTuple):
    """Host-side staged arrays (uint8 tiles + normalized boxes)."""

    images: np.ndarray    # (N, 2, Sh, Sw, 3) uint8 -- [rgb, nir]
    boxes: np.ndarray     # (N, T, 5) float32, xyxy normalized to [0,1] + cls
    nbox: np.ndarray      # (N,) int32 valid box count
    orig_wh: np.ndarray   # (N, 2) float32 original (iw, ih)
    overflow_items: int = 0    # items whose gt count exceeded max_boxes
    overflow_dropped: int = 0  # boxes dropped by the largest-area cap


class GeomParams(NamedTuple):
    """Per-sample augmentation parameters, all host-computed (B-leading).

    Slots 0-3 are the mosaic quadrant tiles (paste order TL,BL,BR,TR --
    `dataloader_mul.py:264-271`); slot 0 doubles as the plain-path image when
    ``mode`` is 0; slot 4 is the mixup partner (always plain-jittered,
    `dataloader_mul.py:370`).
    """

    idx: np.ndarray        # (B, 5) int32 dataset indices per slot
    mode: np.ndarray       # (B,) f32: 1 = mosaic, 0 = plain/letterbox
    mix: np.ndarray        # (B,) f32: 1 = blend slot4 in
    preflip: np.ndarray    # (B, 5) f32 flip source before resize (mosaic tiles)
    postflip: np.ndarray   # (B, 5) f32 flip the composited canvas (plain path)
    nw: np.ndarray         # (B, 5) f32 resized width (reference int truncation)
    nh: np.ndarray         # (B, 5) f32 resized height
    dx: np.ndarray         # (B, 5) f32 paste x offset (may be negative)
    dy: np.ndarray         # (B, 5) f32 paste y offset
    cut: np.ndarray        # (B, 2) f32 (cutx, cuty) mosaic stitch point
    hsv: np.ndarray        # (B, 3) f32 HSV gains r (1.0 = identity)


# ---------------------------------------------------------------------------
# Staging (host, one-time)
# ---------------------------------------------------------------------------

def stage_pairs(lines: Sequence[str], stage_hw: Tuple[int, int],
                max_boxes: int = 64) -> StagedDataset:
    """Decode + stretch-resize every pair once to a fixed staging resolution.

    Boxes are stored normalized to the ORIGINAL image size, so the staging
    stretch is transparent to all downstream box math.  Items with more than
    ``max_boxes`` ground truths keep the largest-area ones (same overflow
    policy as BatchLoader._collate).
    """
    from PIL import Image

    sh, sw = stage_hw
    n = len(lines)
    images = np.empty((n, 2, sh, sw, 3), np.uint8)
    boxes = np.zeros((n, max_boxes, 5), np.float32)
    nbox = np.zeros((n,), np.int32)
    overflow_items = 0
    overflow_dropped = 0
    orig_wh = np.zeros((n, 2), np.float32)
    for i, line in enumerate(lines):
        parts = line.split()
        # cache=False: staging is one-shot; inserting into the host LRU would
        # pin GBs of decoded images that --device-aug never reads again
        rgb = _load_rgb_u8(parts[0], cache=False)
        nir = _load_rgb_u8(parts[1], cache=False)
        ih, iw = rgb.shape[:2]
        orig_wh[i] = (iw, ih)
        for m, arr in enumerate((rgb, nir)):
            if arr.shape[:2] != (sh, sw):
                arr = np.asarray(
                    Image.fromarray(arr).resize((sw, sh), Image.BICUBIC))
            images[i, m] = arr
        b = np.array([list(map(int, s.split(","))) for s in parts[2:]],
                     np.float32).reshape(-1, 5)
        if len(b) > max_boxes:
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            overflow_items += 1
            overflow_dropped += len(b) - max_boxes
            b = b[np.argsort(-area)[:max_boxes]]
        if len(b):
            b[:, [0, 2]] /= iw
            b[:, [1, 3]] /= ih
            boxes[i, : len(b)] = b
        nbox[i] = len(b)
    return StagedDataset(images, boxes, nbox, orig_wh,
                         overflow_items, overflow_dropped)


# ---------------------------------------------------------------------------
# Host parameter sampling (reference distributions + int math, exactly)
# ---------------------------------------------------------------------------

class ParamSampler:
    """Draws reference-distributed augmentation parameters on the host.

    Mirrors `utils/dataloader_mul.py`: mosaic tile geometry (:253-271), plain
    jitter (:136-158), HSV gains (:340-346), mosaic/mixup gating
    (`YoloDataset.__getitem__`, :32-54).  Keeping the draw on the host keeps
    every int() truncation bit-identical to the reference; the device program
    consumes the results as data.
    """

    def __init__(self, ds: StagedDataset, input_hw: Tuple[int, int], *,
                 train: bool = True, mosaic: bool = True,
                 mosaic_prob: float = 0.5, mixup: bool = True,
                 mixup_prob: float = 0.5, special_aug_ratio: float = 0.7,
                 epoch_length: int = 200, jitter: float = 0.3,
                 hue: float = 0.1, sat: float = 0.7, val: float = 0.4):
        self.ds = ds
        self.h, self.w = input_hw
        self.train = train
        self.mosaic = mosaic and train
        self.mosaic_prob = mosaic_prob
        self.mixup = mixup and train
        self.mixup_prob = mixup_prob
        self.special_aug_ratio = special_aug_ratio
        self.epoch_length = epoch_length
        self.jitter = jitter
        self.hue, self.sat, self.val = hue, sat, val
        self.epoch_now = -1

    def set_epoch(self, epoch: int) -> None:
        self.epoch_now = epoch

    # -- reference `self.rand()` (`dataloader_mul.py:28-29`)
    @staticmethod
    def _rand(rng, a=0.0, b=1.0):
        return float(rng.random()) * (b - a) + a

    def _jitter_geom(self, rng, iw, ih, scale_lo, scale_hi):
        """Shared aspect+scale draw (`dataloader_mul.py:140-147, 253-260`)."""
        j = self.jitter
        new_ar = (iw / ih * self._rand(rng, 1 - j, 1 + j)
                  / self._rand(rng, 1 - j, 1 + j))
        scale = self._rand(rng, scale_lo, scale_hi)
        if new_ar < 1:
            nh = int(scale * self.h)
            nw = int(nh * new_ar)
        else:
            nw = int(scale * self.w)
            nh = int(nw / new_ar)
        # the reference would crash in PIL on a 0-size resize; clamp instead
        return max(nw, 1), max(nh, 1)

    def _orig_wh(self, img_idx):
        # Python floats (f64): the reference does this arithmetic in double,
        # and float32 products can flip an int() truncation by one pixel
        iw, ih = self.ds.orig_wh[img_idx]
        return float(iw), float(ih)

    def _plain_slot(self, rng, img_idx):
        """load_pair_random geometry (`dataloader_mul.py:136-158`): jitter +
        scale(.25,2) + random placement; flip applied to the composited canvas."""
        iw, ih = self._orig_wh(img_idx)
        nw, nh = self._jitter_geom(rng, iw, ih, 0.25, 2.0)
        dx = int(self._rand(rng, 0, self.w - nw))
        dy = int(self._rand(rng, 0, self.h - nh))
        flip = self._rand(rng) < 0.5
        return nw, nh, dx, dy, flip

    def sample(self, rng: np.random.Generator, indices: np.ndarray
               ) -> GeomParams:
        """Draw parameters for one batch whose primary images are ``indices``."""
        b = len(indices)
        n_img = len(self.ds.images)
        p = GeomParams(
            idx=np.zeros((b, 5), np.int32),
            mode=np.zeros((b,), np.float32),
            mix=np.zeros((b,), np.float32),
            preflip=np.zeros((b, 5), np.float32),
            postflip=np.zeros((b, 5), np.float32),
            nw=np.ones((b, 5), np.float32),
            nh=np.ones((b, 5), np.float32),
            dx=np.full((b, 5), -4.0, np.float32),
            dy=np.full((b, 5), -4.0, np.float32),
            cut=np.zeros((b, 2), np.float32),
            hsv=np.ones((b, 3), np.float32),
        )
        for k, index in enumerate(indices):
            p.idx[k, :] = index
            if not self.train:
                # deterministic val letterbox (`dataloader_mul.py:101-131`)
                iw, ih = self._orig_wh(index)
                scale = min(self.w / iw, self.h / ih)
                nw, nh = int(iw * scale), int(ih * scale)
                p.nw[k, 0], p.nh[k, 0] = nw, nh
                p.dx[k, 0] = (self.w - nw) // 2
                p.dy[k, 0] = (self.h - nh) // 2
                continue
            use_mosaic = (
                self.mosaic and rng.random() < self.mosaic_prob
                and self.epoch_now < self.epoch_length * self.special_aug_ratio)
            if use_mosaic:
                p.mode[k] = 1.0
                # 3 random partners + self, shuffled (`dataloader_mul.py:43-45`)
                others = rng.choice(n_img, size=min(3, n_img), replace=False)
                tile_idx = np.concatenate([others, [index]])
                rng.shuffle(tile_idx)
                if len(tile_idx) < 4:  # degenerate tiny dataset
                    tile_idx = np.resize(tile_idx, 4)
                p.idx[k, :4] = tile_idx
                mox = self._rand(rng, 0.3, 0.7)
                moy = self._rand(rng, 0.3, 0.7)
                p.cut[k] = (int(self.w * mox), int(self.h * moy))
                for s in range(4):
                    ii = int(tile_idx[s])
                    iw, ih = self._orig_wh(ii)
                    flip = self._rand(rng) < 0.5
                    # flip is a no-op for box-less tiles (`:247-251` quirk)
                    p.preflip[k, s] = float(flip and self.ds.nbox[ii] > 0)
                    nw, nh = self._jitter_geom(rng, iw, ih, 0.4, 1.0)
                    p.nw[k, s], p.nh[k, s] = nw, nh
                    if s == 0:    # TL
                        dx, dy = int(self.w * mox) - nw, int(self.h * moy) - nh
                    elif s == 1:  # BL
                        dx, dy = int(self.w * mox) - nw, int(self.h * moy)
                    elif s == 2:  # BR
                        dx, dy = int(self.w * mox), int(self.h * moy)
                    else:         # TR
                        dx, dy = int(self.w * mox), int(self.h * moy) - nh
                    p.dx[k, s], p.dy[k, s] = dx, dy
                # joint HSV gains (`:340-346`)
                r = (rng.uniform(-1, 1, 3)
                     * np.array([self.hue, self.sat, self.val]) + 1)
                p.hsv[k] = r
                if self.mixup and rng.random() < self.mixup_prob:
                    p.mix[k] = 1.0
                    mi = int(rng.integers(n_img))
                    p.idx[k, 4] = mi
                    nw, nh, dx, dy, flip = self._plain_slot(rng, mi)
                    p.nw[k, 4], p.nh[k, 4] = nw, nh
                    p.dx[k, 4], p.dy[k, 4] = dx, dy
                    p.postflip[k, 4] = float(flip)
            else:
                nw, nh, dx, dy, flip = self._plain_slot(rng, index)
                p.nw[k, 0], p.nh[k, 0] = nw, nh
                p.dx[k, 0], p.dy[k, 0] = dx, dy
                p.postflip[k, 0] = float(flip)
        return p


# ---------------------------------------------------------------------------
# Device program
# ---------------------------------------------------------------------------

def _keys_cubic(x):
    """Keys cubic convolution kernel (a=-0.5), the BICUBIC kernel.  Matches
    `jax.image.ResizeMethod.CUBIC` exactly (jax._src.image.scale)."""
    import jax.numpy as jnp

    out = ((1.5 * x - 2.5) * x) * x + 1.0
    out = jnp.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, out)
    return jnp.where(x >= 2.0, 0.0, out)


def _weight_matrix(in_size, out_size, n_px, d_px, mirror):
    """(in_size, out_size) f32 resampling matrix: resize a source axis to
    ``n_px`` pixels pasted at offset ``d_px`` of an ``out_size`` canvas,
    antialiased Keys-cubic, output pixels outside the paste extent zeroed
    (the caller turns that zero-fill into gray padding via a -128 shift).

    Semantics match `jax.image.scale_and_translate(scale=n/in, translation=d,
    cubic, antialias=True)` -- pinned by tests/test_device_aug.py.  ``mirror``
    folds a horizontal source flip into the weights (u -> in_size-1-u), which
    replaces materialized `reverse` ops on full canvases; geometry stays f32
    regardless of the image compute dtype.
    """
    import jax.numpy as jnp

    scale = n_px / in_size
    inv = 1.0 / scale
    kscale = jnp.maximum(inv, 1.0)  # antialias: widen kernel when shrinking
    sample = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * inv \
        - d_px * inv - 0.5
    sample_m = jnp.where(mirror > 0, (in_size - 1.0) - sample, sample)
    x = jnp.abs(sample_m[None, :]
                - jnp.arange(in_size, dtype=jnp.float32)[:, None]) / kscale
    w = _keys_cubic(x)
    total = jnp.sum(w, axis=0, keepdims=True)
    w = jnp.where(jnp.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                  w / jnp.where(total != 0, total, 1.0), 0.0)
    valid = (sample >= -0.5) & (sample <= in_size - 0.5)
    return jnp.where(valid[None, :], w, 0.0)


def _rgb_to_hsv_cv(img):
    """cv2-convention HSV from f32 RGB in [0,255]: H in [0,180), S,V in [0,255]."""
    import jax.numpy as jnp

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    c = v - jnp.minimum(jnp.minimum(r, g), b)
    safe = jnp.where(c == 0, 1.0, c)
    h = jnp.where(
        v == r, ((g - b) / safe) % 6.0,
        jnp.where(v == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(c == 0, 0.0, h) * 30.0  # degrees / 2 (cv2 8-bit convention)
    s = jnp.where(v == 0, 0.0, c / jnp.where(v == 0, 1.0, v)) * 255.0
    return h, s, v


def _hsv_to_rgb_cv(h, s, v):
    import jax.numpy as jnp

    sv = (s / 255.0) * v

    def chan(n):
        k = (n + h / 30.0) % 6.0  # cv2 H is degrees/2, so /30 not /60
        return v - sv * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def _hsv_jitter(canvas, gains):
    """Joint HSV jitter, same gains on both modalities
    (`dataloader_mul.py:340-363`).  Continuous-valued equivalent of the
    reference's uint8 LUTs: h*r0 mod 180, clip(s*r1), clip(v*r2)."""
    import jax.numpy as jnp

    h, s, v = _rgb_to_hsv_cv(canvas)
    h = (h * gains[0]) % 180.0
    s = jnp.clip(s * gains[1], 0.0, 255.0)
    v = jnp.clip(v * gains[2], 0.0, 255.0)
    return _hsv_to_rgb_cv(h, s, v)


def _transform_boxes(bn, nw, nh, dx, dy, preflip, postflip, out_hw):
    """Reference box math (`dataloader_mul.py:160-166, 281-285`), vectorized:
    optional pre-resize flip (normalized), scale+offset to canvas pixels,
    optional post-composite flip, clip, and the w>1 & h>1 validity filter."""
    import jax.numpy as jnp

    h, w = out_hw
    x1, y1, x2, y2, cls = [bn[..., i] for i in range(5)]
    # pre-flip in normalized source space: x -> 1-x (swap x1/x2)
    fx1 = jnp.where(preflip > 0, 1.0 - x2, x1)
    fx2 = jnp.where(preflip > 0, 1.0 - x1, x2)
    x1p = fx1 * nw + dx
    x2p = fx2 * nw + dx
    y1p = y1 * nh + dy
    y2p = y2 * nh + dy
    # post-flip in canvas space: x -> w-x (swap)
    gx1 = jnp.where(postflip > 0, w - x2p, x1p)
    gx2 = jnp.where(postflip > 0, w - x1p, x2p)
    x1c = jnp.maximum(gx1, 0.0)
    y1c = jnp.maximum(y1p, 0.0)
    x2c = jnp.minimum(gx2, float(w))
    y2c = jnp.minimum(y2p, float(h))
    valid = (x2c - x1c > 1.0) & (y2c - y1c > 1.0)
    return jnp.stack([x1c, y1c, x2c, y2c, cls], -1), valid


def _merge_quadrants(boxes, valid, cutx, cuty):
    """`merge_bboxes` (`dataloader_mul.py:194-238`): per-quadrant keep rule +
    clip to the cut lines.  Deliberately does NOT re-filter degenerate boxes
    afterward (reference quirk).  boxes: (4, T, 5), slot order TL,BL,BR,TR."""
    import jax.numpy as jnp

    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    keep = jnp.stack([
        (y1[0] <= cuty) & (x1[0] <= cutx),
        (y2[1] >= cuty) & (x1[1] <= cutx),
        (y2[2] >= cuty) & (x2[2] >= cutx),
        (y1[3] <= cuty) & (x2[3] >= cutx),
    ])
    nx1 = jnp.stack([x1[0], x1[1], jnp.maximum(x1[2], cutx),
                     jnp.maximum(x1[3], cutx)])
    ny1 = jnp.stack([y1[0], jnp.maximum(y1[1], cuty),
                     jnp.maximum(y1[2], cuty), y1[3]])
    nx2 = jnp.stack([jnp.minimum(x2[0], cutx), jnp.minimum(x2[1], cutx),
                     x2[2], x2[3]])
    ny2 = jnp.stack([jnp.minimum(y2[0], cuty), y2[1], y2[2],
                     jnp.minimum(y2[3], cuty)])
    out = jnp.stack([nx1, ny1, nx2, ny2, boxes[..., 4]], -1)
    return out, valid & keep


def make_device_augment(out_hw: Tuple[int, int], max_boxes: int = 64,
                        resample_dtype=None, out_dtype=None):
    """Build the jittable augmentation program.

    Returns ``augment(images_u8, boxes_norm, nbox, params) ->
    (rgb, nir, gt_boxes, gt_labels, gt_mask)`` where images_u8 is the
    device-resident (N,2,Sh,Sw,3) uint8 dataset and params a GeomParams of
    device arrays.  Fully fixed-shape; vmapped over the batch.

    Pixel path design (TPU): each slot's resize+paste is two batched MXU
    contractions against per-slot f32 weight matrices (`_weight_matrix`).
    Horizontal flips (pre- and post-composite) and the mosaic quadrant
    stitch are FOLDED INTO THE WEIGHTS -- a post-composite flip is the same
    composite with mirrored content at dx' = W-nw-dx, and each quadrant mask
    is a rank-1 outer product row_mask(h)*col_mask(w) absorbed into the two
    weight matrices -- so no reversed or masked full-canvas intermediates are
    ever materialized (these were ~2/3 of the program's HBM traffic).  With
    ``resample_dtype=bfloat16`` BOTH matmul operands (pixels and the weight
    matrices, which are computed in f32 then cast) ride the MXU at bf16 with
    f32 accumulation; box geometry is untouched by the cast (bit-identical to
    f32), pixel delta is sub-LSB (p99 0.27 of a uint8 step).
    """
    import jax
    import jax.numpy as jnp

    h, w = out_hw
    rdt = resample_dtype or jnp.float32

    def one_sample(tiles, tboxes, tvalid, p_preflip, p_postflip, p_nw, p_nh,
                   p_dx, p_dy, p_mode, p_mix, p_cut, p_hsv):
        # tiles: (5, 2, S, S, 3) uint8
        sh, sw = tiles.shape[2], tiles.shape[3]
        # content mirror = preflip XOR postflip; postflip also mirrors the
        # paste position (flip(composite(t)) == composite(mirror(t)) at
        # dx' = W - nw - dx)
        mirror = jnp.abs(p_preflip - p_postflip)
        dx_eff = jnp.where(p_postflip > 0, w - p_nw - p_dx, p_dx)
        wh = jax.vmap(lambda n, d: _weight_matrix(sh, h, n, d, 0.0))(
            p_nh, p_dy)                                    # (5, S, H)
        ww = jax.vmap(_weight_matrix, in_axes=(None, None, 0, 0, 0))(
            sw, w, p_nw, dx_eff, mirror)                   # (5, S, W)

        # mosaic quadrant masks (paste order TL,BL,BR,TR,
        # `dataloader_mul.py:264-271, 290-296`) are separable -> fold into
        # the slot weight matrices; when not mosaic, slot 0 passes whole and
        # slots 1-3 vanish, so the masked sum IS the plain composite.
        cutx, cuty = p_cut[0], p_cut[1]
        is_m = p_mode > 0
        top = (jnp.arange(h, dtype=jnp.float32) < cuty).astype(jnp.float32)
        left = (jnp.arange(w, dtype=jnp.float32) < cutx).astype(jnp.float32)
        oh, ow = jnp.ones((h,), jnp.float32), jnp.ones((w,), jnp.float32)
        zh, zw = jnp.zeros((h,), jnp.float32), jnp.zeros((w,), jnp.float32)
        rowm = jnp.where(is_m, jnp.stack([top, 1 - top, 1 - top, top]),
                         jnp.stack([oh, zh, zh, zh]))      # (4, H)
        colm = jnp.where(is_m, jnp.stack([left, left, 1 - left, 1 - left]),
                         jnp.stack([ow, zw, zw, zw]))      # (4, W)
        wh4 = (wh[:4] * rowm[:, None, :]).astype(rdt)
        ww4 = (ww[:4] * colm[:, None, :]).astype(rdt)

        src = tiles.astype(rdt) - jnp.asarray(128.0, rdt)  # (5,2,S,S,3)
        f32 = jnp.float32
        # f32 operands: force full-precision MXU passes so the output matches
        # `scale_and_translate` (whose default precision is HIGHEST) bit-near;
        # bf16 operands ride the MXU natively (precision is an f32 concept).
        prec = "highest" if rdt == jnp.float32 else None

        def resample(t, wh_, ww_):
            # t (..., 2, Sh, Sw, 3) x wh_ (..., Sh, H) x ww_ (..., Sw, W)
            t1 = jnp.einsum("...mikc,...ih->...mhkc", t, wh_,
                            preferred_element_type=f32,
                            precision=prec).astype(rdt)
            return jnp.einsum("...mhkc,...kw->...mhwc", t1, ww_,
                              preferred_element_type=f32, precision=prec)

        # masked quadrant sum: sum(mask_s) == 1 on the canvas, so adding the
        # per-slot zero-filled composites and one gray offset reconstructs
        # the stitched mosaic (or the plain composite when not mosaic)
        comp = resample(src[:4], wh4, ww4).sum(0) + 128.0  # (2, H, W, 3)
        mixp = resample(src[4], wh[4].astype(rdt), ww[4].astype(rdt)) + 128.0

        main = jnp.where(is_m, _hsv_jitter(comp, p_hsv), comp)
        out = jnp.where(p_mix > 0, 0.5 * main + 0.5 * mixp, main)
        out = jnp.clip(out, 0.0, 255.0) / 255.0   # uint8 saturation + /255

        # ---- boxes ----
        bpx, bval = _transform_boxes(
            tboxes, p_nw[:, None], p_nh[:, None], p_dx[:, None], p_dy[:, None],
            p_preflip[:, None], p_postflip[:, None], out_hw)
        bval = bval & tvalid
        mboxes, mvalid = _merge_quadrants(bpx[:4], bval[:4], cutx, cuty)
        is_mosaic = p_mode > 0
        slot_on = jnp.stack([jnp.where(is_mosaic, mv, pv) for mv, pv in [
            (mvalid[0], bval[0]),
            (mvalid[1], jnp.zeros_like(bval[1])),
            (mvalid[2], jnp.zeros_like(bval[2])),
            (mvalid[3], jnp.zeros_like(bval[3])),
        ]])
        coords = jnp.where(is_mosaic, mboxes, bpx[:4])
        all_boxes = jnp.concatenate([coords, bpx[4:5]], 0)       # (5, T, 5)
        all_valid = jnp.concatenate(
            [slot_on, (bval[4] & (p_mix > 0))[None]], 0)         # (5, T)
        flat = all_boxes.reshape(-1, 5)
        fval = all_valid.reshape(-1)
        area = (flat[:, 2] - flat[:, 0]) * (flat[:, 3] - flat[:, 1])
        # keep the largest-area max_boxes (the documented overflow policy)
        _, keep = jax.lax.top_k(jnp.where(fval, area, -1.0), max_boxes)
        sel = jnp.take(flat, keep, axis=0)
        msk = jnp.take(fval, keep).astype(jnp.float32)
        gt_boxes = sel[:, :4] * msk[:, None]
        gt_labels = sel[:, 4] * msk
        # emitting the model's compute dtype fuses the cast into the aug's
        # last kernel and halves the staged Batch image buffers — the model
        # casts its inputs to compute dtype anyway (bit-identical)
        odt = out_dtype or jnp.float32
        return out[0].astype(odt), out[1].astype(odt), gt_boxes, gt_labels, msk

    def augment(images_u8, boxes_norm, nbox, idx, p: GeomParams):
        tiles = jnp.take(images_u8, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], 5, *images_u8.shape[1:])
        tboxes = jnp.take(boxes_norm, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], 5, *boxes_norm.shape[1:])
        counts = jnp.take(nbox, idx.reshape(-1), axis=0).reshape(idx.shape)
        tvalid = (jnp.arange(boxes_norm.shape[1])[None, None, :]
                  < counts[..., None])
        return jax.vmap(one_sample)(
            tiles, tboxes, tvalid, p.preflip, p.postflip, p.nw, p.nh,
            p.dx, p.dy, p.mode, p.mix, p.cut, p.hsv)

    return augment


# ---------------------------------------------------------------------------
# Loader facade
# ---------------------------------------------------------------------------

class DeviceAugLoader:
    """Drop-in alternative to BatchLoader that yields DEVICE batches.

    Stages the dataset into HBM once, then each batch is: host draws geometry
    scalars (ParamSampler), ships ~KB to the device, and one jitted program
    gathers tiles from the resident dataset and produces the augmented
    `Batch` already sharded over the mesh -- no per-step image H2D at all.
    """

    def __init__(self, annotation_lines: Sequence[str],
                 input_shape: Tuple[int, int], batch_size: int, mesh, *,
                 train: bool = True, max_boxes: int = 64,
                 stage_hw: Optional[Tuple[int, int]] = None,
                 mosaic: bool = True, mosaic_prob: float = 0.5,
                 mixup: bool = True, mixup_prob: float = 0.5,
                 special_aug_ratio: float = 0.7, epoch_length: int = 200,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 11,
                 max_hbm_gb: float = 8.0, resample_dtype=None,
                 out_dtype=None, staged: Optional[StagedDataset] = None,
                 dev_data=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        lines = [l.strip() for l in annotation_lines if l.strip()]
        stage_hw = tuple(stage_hw or input_shape)
        need = len(lines) * 2 * stage_hw[0] * stage_hw[1] * 3
        if need > max_hbm_gb * 1e9:
            raise ValueError(
                f"staged dataset needs {need/1e9:.1f} GB HBM "
                f"(> {max_hbm_gb} GB cap); lower --device-aug-stage or use "
                f"the host BatchLoader")
        ds = staged if staged is not None else stage_pairs(
            lines, stage_hw, max_boxes)
        self.host_ds = ds
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.mesh = mesh
        self.sampler = ParamSampler(
            ds, input_shape, train=train, mosaic=mosaic,
            mosaic_prob=mosaic_prob, mixup=mixup, mixup_prob=mixup_prob,
            special_aug_ratio=special_aug_ratio, epoch_length=epoch_length)
        self._rep = NamedSharding(mesh, P())
        self._dat = NamedSharding(mesh, P("data"))
        if dev_data is not None:
            # share the resident HBM copy with a sibling loader (e.g. across a
            # freeze->unfreeze batch-size switch) instead of re-uploading
            self.dev_images, self.dev_boxes, self.dev_nbox = dev_data
        else:
            self.dev_images = jax.device_put(ds.images, self._rep)
            self.dev_boxes = jax.device_put(ds.boxes, self._rep)
            self.dev_nbox = jax.device_put(ds.nbox, self._rep)
        aug = make_device_augment(tuple(input_shape), max_boxes,
                                  resample_dtype=resample_dtype,
                                  out_dtype=out_dtype)
        self._aug = jax.jit(
            aug,
            in_shardings=(self._rep, self._rep, self._rep, self._dat,
                          GeomParams(*([self._dat] * len(GeomParams._fields)))),
            out_shardings=(self._dat,) * 5)
        self._epoch = 0
        # BatchLoader-compatible accounting (overflow happens at staging here)
        # true counts from staging ((nbox >= max_boxes) would also flag
        # items that had EXACTLY max_boxes ground truths)
        self.overflow_items = ds.overflow_items
        self.overflow_dropped = ds.overflow_dropped

    def __len__(self) -> int:
        n = len(self.host_ds.images)
        bs = self.batch_size
        return n // bs if self.drop_last else -(-n // bs)

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)
        # pin the iteration RNG stream to the true epoch so a loader rebuilt
        # mid-run (freeze->unfreeze batch-size switch) continues the shuffle/
        # augmentation streams instead of replaying epoch 0's
        self._epoch = epoch

    def throughput(self):
        return None  # host does ~nothing per batch; the device is the loader

    def augment_batch(self, idx: np.ndarray, params: GeomParams):
        """Run the device program for explicit indices/params (test hook)."""
        import jax

        from dcfa_yolo_tpu.train.trainer import Batch

        # copy: device_put may alias the host buffer and read it after this
        # call returns (async dispatch) -- callers may mutate their arrays
        dev_p = GeomParams(*[jax.device_put(np.array(x), self._dat)
                             for x in params])
        rgb, nir, gtb, gtl, gtm = self._aug(
            self.dev_images, self.dev_boxes, self.dev_nbox,
            jax.device_put(np.asarray(idx, np.int32), self._dat), dev_p)
        return Batch(rgb, nir, gtb, gtl, gtm)

    def __iter__(self) -> Iterator:
        # keep the sampler's epoch gate (mosaic special_aug_ratio) in lockstep
        # with the RNG stream even when the caller never calls set_epoch()
        self.sampler.set_epoch(self._epoch)
        n = len(self.host_ds.images)
        order = np.arange(n)
        rng = np.random.Generator(np.random.PCG64(self.seed + self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size:  # pad the ragged tail batch
                idx = np.resize(idx, self.batch_size)
            params = self.sampler.sample(rng, idx)
            yield self.augment_batch(params.idx, params)
