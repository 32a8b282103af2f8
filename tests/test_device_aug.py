"""On-device augmentation pipeline (data/device_aug.py) vs host oracles.

Pixel oracles are the host-side functions already pinned against the
reference (`data/augment.py`: `_resize_paste` = PIL BICUBIC resize+paste,
`_merge_mosaic_boxes` = `merge_bboxes` semantics, cv2 HSV LUTs); box math is
checked against an inline numpy transcription of
`/root/reference/utils/dataloader_mul.py:160-166, 281-285`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from dcfa_yolo_tpu.data.device_aug import (
    DeviceAugLoader,
    GeomParams,
    ParamSampler,
    make_device_augment,
    stage_pairs,
    _merge_quadrants,
)
from dcfa_yolo_tpu.data.augment import _merge_mosaic_boxes, _resize_paste


def _mesh(n=1):
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _write_pairs(tmp_path, sizes, n_boxes=3, seed=0):
    """Synthesize RGB/NIR pairs + annotation lines."""
    rng = np.random.default_rng(seed)
    lines = []
    for i, (iw, ih) in enumerate(sizes):
        rgb = rng.integers(0, 255, (ih, iw, 3), np.uint8)
        nir = rng.integers(0, 255, (ih, iw, 3), np.uint8)
        rp = str(tmp_path / f"r{i}.png")
        npth = str(tmp_path / f"n{i}.png")
        Image.fromarray(rgb).save(rp)
        Image.fromarray(nir).save(npth)
        bs = []
        for _ in range(n_boxes):
            x1 = int(rng.integers(0, iw - 40))
            y1 = int(rng.integers(0, ih - 40))
            bs.append(f"{x1},{y1},{x1 + int(rng.integers(15, 40))},"
                      f"{y1 + int(rng.integers(15, 40))},0")
        lines.append(f"{rp} {npth} " + " ".join(bs))
    return lines


def _inert_params(b):
    return GeomParams(
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


# ---------------------------------------------------------------------------
# pixel parity
# ---------------------------------------------------------------------------

def test_plain_composite_matches_pil(tmp_path):
    """Single-resample placement (staged == original size) vs PIL resize+paste:
    p99 within 1 LSB; the gray pad region exact."""
    H = W = 128
    lines = _write_pairs(tmp_path, [(W, H)])
    ld = DeviceAugLoader(lines, (H, W), 1, _mesh(), max_boxes=8,
                         stage_hw=(H, W))
    p = _inert_params(1)
    nw, nh, dx, dy = 77, 93, 11, -5
    p.nw[0, 0], p.nh[0, 0], p.dx[0, 0], p.dy[0, 0] = nw, nh, dx, dy
    batch = ld.augment_batch(p.idx, p)
    got = np.asarray(batch.rgb[0]) * 255.0

    src = Image.fromarray(ld.host_ds.images[0, 0])
    ref = _resize_paste(src, (nw, nh), (W, H), dx, dy).astype(np.float32)
    d = np.abs(np.clip(np.rint(got), 0, 255) - ref)
    assert np.percentile(d, 99) <= 1.0, np.percentile(d, 99)
    pad = np.ones((H, W), bool)
    pad[max(dy, 0):dy + nh, max(dx, 0):dx + nw] = False
    assert d[pad].max() == 0.0  # scale_and_translate zero-fill == gray(128)

    # NIR gets the identical geometry (joint augmentation)
    got_n = np.asarray(batch.nir[0]) * 255.0
    ref_n = _resize_paste(Image.fromarray(ld.host_ds.images[0, 1]),
                          (nw, nh), (W, H), dx, dy).astype(np.float32)
    assert np.percentile(np.abs(np.rint(got_n) - ref_n), 99) <= 1.0


def test_postflip_flips_canvas_and_boxes(tmp_path):
    H = W = 96
    lines = _write_pairs(tmp_path, [(W, H)], n_boxes=2)
    ld = DeviceAugLoader(lines, (H, W), 1, _mesh(), max_boxes=8,
                         stage_hw=(H, W))
    p = _inert_params(1)
    p.nw[0, 0], p.nh[0, 0], p.dx[0, 0], p.dy[0, 0] = 60, 50, 10, 20
    plain = ld.augment_batch(p.idx, p)
    plain_rgb = np.asarray(plain.rgb[0])  # materialize BEFORE mutating p:
    # device_put may alias/defer-read the numpy buffers (async dispatch)
    p.postflip[0, 0] = 1.0
    flipped = ld.augment_batch(p.idx, p)
    # the flip is folded into the resampling weights (mirrored sample
    # coordinates), not a post-hoc `reverse`, so the mirror identity holds to
    # float eps (~1e-3 of a uint8 LSB), not bit-exactly
    np.testing.assert_allclose(np.asarray(flipped.rgb[0]),
                               plain_rgb[:, ::-1], atol=1e-5)
    # boxes: x -> W - x swap (`dataloader_mul.py:164-165`)
    pm, fm = np.asarray(plain.gt_mask[0]) > 0, np.asarray(flipped.gt_mask[0]) > 0
    pb = np.asarray(plain.gt_boxes[0])[pm]
    fb = np.asarray(flipped.gt_boxes[0])[fm]
    assert len(pb) == len(fb) > 0
    exp = np.stack([W - pb[:, 2], pb[:, 1], W - pb[:, 0], pb[:, 3]], -1)
    np.testing.assert_allclose(np.sort(fb, 0), np.sort(exp, 0), atol=1e-3)


def test_box_math_matches_reference_formula(tmp_path):
    """x' = x*nw/iw + dx etc. with clip + (w>1, h>1) filter
    (`dataloader_mul.py:160-166`), exactly."""
    H, W = 160, 192
    iw, ih = 250, 170
    lines = _write_pairs(tmp_path, [(iw, ih)], n_boxes=6, seed=4)
    ld = DeviceAugLoader(lines, (H, W), 1, _mesh(), max_boxes=16)
    p = _inert_params(1)
    nw, nh, dx, dy = 210, 117, -30, 61
    p.nw[0, 0], p.nh[0, 0], p.dx[0, 0], p.dy[0, 0] = nw, nh, dx, dy
    batch = ld.augment_batch(p.idx, p)

    raw = np.array([list(map(int, s.split(","))) for s in
                    lines[0].split()[2:]], np.float64)
    ref = raw.copy()
    ref[:, [0, 2]] = ref[:, [0, 2]] * nw / iw + dx
    ref[:, [1, 3]] = ref[:, [1, 3]] * nh / ih + dy
    ref[:, 0:2] = np.maximum(ref[:, 0:2], 0)
    ref[:, 2] = np.minimum(ref[:, 2], W)
    ref[:, 3] = np.minimum(ref[:, 3], H)
    keep = (ref[:, 2] - ref[:, 0] > 1) & (ref[:, 3] - ref[:, 1] > 1)
    ref = ref[keep]

    m = np.asarray(batch.gt_mask[0]) > 0
    got = np.asarray(batch.gt_boxes[0])[m]
    assert len(got) == len(ref)
    order_g = np.lexsort(got.T)
    order_r = np.lexsort(ref[:, :4].T)
    np.testing.assert_allclose(got[order_g], ref[order_r, :4], atol=2e-3)


def test_quadrant_merge_matches_host_oracle():
    """Device `_merge_quadrants` == `_merge_mosaic_boxes` (already pinned to
    the reference `merge_bboxes`), over random boxes incl. degenerates."""
    rng = np.random.default_rng(7)
    T = 12
    boxes = np.zeros((4, T, 5), np.float32)
    valid = np.zeros((4, T), bool)
    for s in range(4):
        n = int(rng.integers(3, T))
        x1 = rng.uniform(0, 200, n)
        y1 = rng.uniform(0, 200, n)
        boxes[s, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(2, 80, n), y1 + rng.uniform(2, 80, n),
             rng.integers(0, 3, n)], -1)
        valid[s, :n] = True
    cutx, cuty = 97.0, 123.0
    got_b, got_v = jax.jit(_merge_quadrants)(
        jnp.asarray(boxes), jnp.asarray(valid), cutx, cuty)
    got = np.asarray(got_b)[np.asarray(got_v)]

    per_tile = [boxes[s][valid[s]] for s in range(4)]
    ref = _merge_mosaic_boxes(per_tile, int(cutx), int(cuty))
    assert len(got) == len(ref)
    np.testing.assert_allclose(np.sort(got, 0), np.sort(ref, 0), atol=1e-4)


def test_hsv_jitter_matches_cv2(tmp_path):
    """Continuous HSV transform vs the reference's cv2 uint8 LUT path: same
    gains, median diff well under 1 LSB (LUT quantization + hue wrap produce
    a tail of outliers by construction)."""
    cv2 = pytest.importorskip("cv2")
    from dcfa_yolo_tpu.data.device_aug import _hsv_jitter

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    r = np.array([1.04, 0.8, 1.2], np.float32)

    got = np.asarray(jax.jit(_hsv_jitter)(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(r)))[0]

    x = np.arange(0, 256, dtype=np.uint8)
    lut_hue = ((x * r[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
    hch, sch, vch = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    ref = cv2.cvtColor(
        cv2.merge((cv2.LUT(hch, lut_hue), cv2.LUT(sch, lut_sat),
                   cv2.LUT(vch, lut_val))), cv2.COLOR_HSV2RGB).astype(np.float32)
    d = np.abs(got - ref)
    assert np.median(d) <= 1.0
    # the tail comes from cv2's integer HSV internals + the LUTs' truncation
    assert (d <= 2.0).mean() > 0.8

    # gains of 1.0 must round-trip RGB->HSV->RGB exactly (identity jitter)
    ident = np.asarray(jax.jit(_hsv_jitter)(
        jnp.asarray(img[None], jnp.float32), jnp.ones(3, jnp.float32)))[0]
    assert np.abs(ident - img.astype(np.float32)).max() < 1e-3


def test_mixup_blends(tmp_path):
    H = W = 96
    lines = _write_pairs(tmp_path, [(W, H), (W, H)], n_boxes=2, seed=9)
    ld = DeviceAugLoader(lines, (H, W), 1, _mesh(), max_boxes=8,
                         stage_hw=(H, W))
    base = _inert_params(1)
    base.nw[0, 0], base.nh[0, 0], base.dx[0, 0], base.dy[0, 0] = W, H, 0, 0
    a = np.asarray(ld.augment_batch(base.idx, base).rgb[0])
    solo = _inert_params(1)
    solo.idx[:] = 1
    solo.nw[0, 0], solo.nh[0, 0], solo.dx[0, 0], solo.dy[0, 0] = W, H, 0, 0
    b_img = np.asarray(ld.augment_batch(solo.idx, solo).rgb[0])
    mixed_p = _inert_params(1)
    mixed_p.mix[0] = 1.0
    mixed_p.idx[0, 4] = 1
    for s in (0, 4):
        mixed_p.nw[0, s], mixed_p.nh[0, s] = W, H
        mixed_p.dx[0, s], mixed_p.dy[0, s] = 0, 0
    got = ld.augment_batch(mixed_p.idx, mixed_p)
    np.testing.assert_allclose(np.asarray(got.rgb[0]), 0.5 * a + 0.5 * b_img,
                               atol=2e-3)
    # box union (`dataloader_mul.py:370-379`): 2 + 2 boxes
    assert int(np.asarray(got.gt_mask[0]).sum()) == 4


# ---------------------------------------------------------------------------
# sampler semantics
# ---------------------------------------------------------------------------

def test_val_letterbox_params_match_host(tmp_path):
    """Val path == `load_pair_letterbox` geometry + boxes exactly; pixels
    within tolerance (single resample when staged at original size)."""
    from dcfa_yolo_tpu.data.augment import load_pair_letterbox

    iw, ih = 200, 150
    lines = _write_pairs(tmp_path, [(iw, ih)], n_boxes=4, seed=2)
    H = W = 128
    ld = DeviceAugLoader(lines, (H, W), 1, _mesh(), train=False,
                         max_boxes=8, stage_hw=(ih, iw), shuffle=False)
    batch = next(iter(ld))
    ref_rgb, _, ref_boxes = load_pair_letterbox(lines[0], (H, W))
    d = np.abs(np.rint(np.asarray(batch.rgb[0]) * 255) -
               ref_rgb.astype(np.float32))
    assert np.percentile(d, 99) <= 1.0
    m = np.asarray(batch.gt_mask[0]) > 0
    got = np.asarray(batch.gt_boxes[0])[m]
    assert len(got) == len(ref_boxes)
    np.testing.assert_allclose(np.sort(got, 0), np.sort(ref_boxes[:, :4], 0),
                               atol=1e-2)


def test_mosaic_gate_and_determinism(tmp_path):
    lines = _write_pairs(tmp_path, [(100, 80)] * 5, seed=5)
    ds = stage_pairs(lines, (64, 64), 8)
    smp = ParamSampler(ds, (64, 64), epoch_length=10, special_aug_ratio=0.7,
                       mosaic_prob=1.0)
    smp.set_epoch(0)
    p = smp.sample(np.random.Generator(np.random.PCG64(0)), np.arange(4))
    assert p.mode.sum() == 4  # prob 1.0, epoch inside the gate
    # same seed -> identical draw
    p2 = smp.sample(np.random.Generator(np.random.PCG64(0)), np.arange(4))
    for a, b in zip(p, p2):
        np.testing.assert_array_equal(a, b)
    # past special_aug_ratio: mosaic off (`dataloader_mul.py:39`)
    smp.set_epoch(8)
    p3 = smp.sample(np.random.Generator(np.random.PCG64(0)), np.arange(4))
    assert p3.mode.sum() == 0 and p3.mix.sum() == 0


def test_mosaic_boxes_within_quadrants(tmp_path):
    """End-to-end mosaic sample: every emitted box lies inside its canvas and
    the composite contains 4 distinct quadrant sources."""
    lines = _write_pairs(tmp_path, [(150, 120)] * 6, n_boxes=4, seed=11)
    ld = DeviceAugLoader(lines, (128, 128), 2, _mesh(), max_boxes=32,
                         mosaic_prob=1.0, mixup_prob=1.0, seed=0,
                         epoch_length=100)
    ld.set_epoch(0)
    batch = next(iter(ld))
    gb = np.asarray(batch.gt_boxes)
    m = np.asarray(batch.gt_mask) > 0
    assert m.any()
    v = gb[m]
    assert (v[:, 0] >= -1e-3).all() and (v[:, 2] <= 128 + 1e-3).all()
    assert (v[:, 1] >= -1e-3).all() and (v[:, 3] <= 128 + 1e-3).all()
    assert (v[:, 2] >= v[:, 0] - 1e-6).all()


# ---------------------------------------------------------------------------
# integration: feeds the sharded train step
# ---------------------------------------------------------------------------

def test_device_batches_train_step(tmp_path):
    """DeviceAugLoader batches (already device-resident, data-sharded over a
    2-device mesh) drive Trainer.train_step without host round-trips."""
    from jax.sharding import Mesh

    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.models.yolo import init_model
    from dcfa_yolo_tpu.train.trainer import Trainer

    lines = _write_pairs(tmp_path, [(90, 70)] * 4, n_boxes=2, seed=6)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tc = TrainConfig(batch_size=2, max_boxes=8)
    trainer = Trainer(model, variables, tc, mesh=mesh)
    ld = DeviceAugLoader(lines, (64, 64), 2, mesh, max_boxes=8, seed=1,
                         epoch_length=10)
    ld.set_epoch(0)
    batch = next(iter(ld))
    lb = trainer.train_step(batch, lr=1e-3)
    assert np.isfinite(float(lb.total))
