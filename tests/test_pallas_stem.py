"""Fused Pallas stem (ops/pallas_stem.py) correctness pins.

The kernel runs in interpreter mode on the CPU test backend; on TPU the same
jaxpr lowers through Mosaic (driven by tools/stem_pallas_ab.py and the bench).
Reference semantics: conv3x3 s1 (3→16, zero pad) on /255-normalized input +
eval-BN + ReLU + maxpool3x3 s2 pad1 — `/root/reference/nets/yolo_mul.py:104-115`.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.pallas_stem import (chunk5_cw, col_parity_block,
                                           fold_stem_params,
                                           fold_stem_params_d,
                                           fold_stem_params_e, pallas_stem,
                                           pallas_stem_d, pallas_stem_e,
                                           pallas_stem_f)
from dcfa_yolo_tpu.ops.resize import (_chunk5_col_map, chunk5_cols_cf,
                                      deinterleave_cols_cf, letterbox_batch,
                                      letterbox_batch_cf, letterbox_batch_cf5)


def _xla_stem_f32(img, k, gamma, beta, mean, var, eps=1e-5):
    x = img / 255.0
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = gamma / jnp.sqrt(var + eps)
    y = jnp.maximum(y * a + (beta - mean * a), 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


@pytest.mark.parametrize("shape", [(2, 32, 48), (1, 64, 130), (3, 16, 640)])
def test_pallas_stem_matches_xla_semantics(shape):
    B, H, W = shape
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)

    ref = _xla_stem_f32(img, k, gamma, beta, mean, var)

    wd, bias = fold_stem_params(k, gamma, beta, mean, var)
    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = pallas_stem(x_cf, wd, bias, interpret=True)
    out_nhwc = jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.float32)

    assert out_nhwc.shape == ref.shape
    # kernel is bf16-operand/f32-accumulate; reference above is f32
    np.testing.assert_allclose(np.asarray(out_nhwc), np.asarray(ref),
                               atol=0.03, rtol=0.02)


def test_pallas_stem_negative_gamma_relu_commutes():
    """relu∘maxpool == maxpool∘relu even when the folded BN scale is negative
    (monotone max); the pool's zero padding must not leak through."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(-(rng.random(16) + 0.2), jnp.float32)  # all negative
    beta = jnp.asarray(rng.standard_normal(16) * 0.5, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)

    ref = _xla_stem_f32(img, k, gamma, beta, mean, var)
    wd, bias = fold_stem_params(k, gamma, beta, mean, var)
    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = jnp.transpose(pallas_stem(x_cf, wd, bias, interpret=True),
                        (0, 1, 3, 2)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.03, rtol=0.02)


def test_letterbox_batch_cf_matches_nhwc():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 256, (2, 48, 72, 3)), jnp.float32)
    a = letterbox_batch(img, (64, 64))
    b = letterbox_batch_cf(img, (64, 64))
    assert b.shape == (2, 3, 66, 66)
    inner = jnp.transpose(b[:, :, 1:-1, 1:-1], (0, 2, 3, 1))
    np.testing.assert_array_equal(np.asarray(inner), np.asarray(a))
    border = (np.abs(np.asarray(b[:, :, 0, :])).sum()
              + np.abs(np.asarray(b[:, :, -1, :])).sum()
              + np.abs(np.asarray(b[:, :, :, 0])).sum()
              + np.abs(np.asarray(b[:, :, :, -1])).sum())
    assert border == 0.0


@pytest.mark.parametrize("shape", [(2, 32, 48), (1, 64, 130), (1, 16, 640)])
def test_pallas_stem_v3_bit_identical_to_v2(shape):
    """The gather-free v3 kernel (deinterleaved-canvas input) must be
    BIT-identical to v2: same per-element f32 accumulation order, same max
    tree, same final relu→bf16 rounding."""
    B, H, W = shape
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)

    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    o2 = pallas_stem(x_cf, *fold_stem_params(k, gamma, beta, mean, var),
                     interpret=True)
    x_cfd = deinterleave_cols_cf(x_cf)
    assert x_cfd.shape == (B, 3, H + 2, 2 * col_parity_block(W))
    o3 = pallas_stem_d(x_cfd, *fold_stem_params_d(k, gamma, beta, mean, var),
                       w=W, interpret=True)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o3))


@pytest.mark.parametrize("shape", [(2, 32, 48), (1, 64, 130), (1, 16, 640)])
def test_pallas_stem_v4_matches_v3(shape):
    """The compact-K dual-parity v4 kernel vs v3: fusing the three dx taps
    into one K=216 accumulation changes the f32 summation order (documented
    in `_stem_kernel_e`), and v4b additionally rounds the BN bias to bf16
    inside the weight matrix (bias-in-K, fold_stem_params_e), so agreement
    is tolerance-level — but the products are exact in f32 (bf16 inputs) and
    the sums are short (≤28 terms), so nearly every bf16 output still rounds
    identically."""
    B, H, W = shape
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)

    x_cfd = deinterleave_cols_cf(jnp.pad(
        jnp.transpose(img, (0, 3, 1, 2)), ((0, 0), (0, 0), (1, 1), (1, 1))))
    wd3, bias3 = fold_stem_params_d(k, gamma, beta, mean, var)
    o3 = pallas_stem_d(x_cfd, wd3, bias3, w=W, interpret=True)
    o4 = pallas_stem_e(x_cfd, fold_stem_params_e(k, gamma, beta, mean, var),
                       w=W, interpret=True)
    a3 = np.asarray(o3, np.float32)
    a4 = np.asarray(o4, np.float32)
    np.testing.assert_allclose(a3, a4, atol=0.03, rtol=0.02)
    # against v3-with-bf16-bias (the XLA product path also applies the folded
    # eval-BN bias in compute dtype, ops/norm.py) the remaining deviation is
    # pure f32 summation order — nearly every output rounds identically
    o3q = pallas_stem_d(x_cfd, wd3, bias3.astype(jnp.bfloat16).astype(
        jnp.float32), w=W, interpret=True)
    a3q = np.asarray(o3q, np.float32)
    assert (a3q == a4).mean() > 0.999


@pytest.mark.parametrize("shape,cw", [((128, 32, 48), 8), ((128, 16, 80), 20)])
def test_pallas_stem_v5_bit_identical_to_v4(shape, cw):
    """The batch-on-lanes v5 kernel (`pallas_stem_f`) vs v4: given the same
    canvas values, every output column's K=216 accumulation is the same sum,
    so on the MXU the results are bit-equal (pinned on-chip by
    tools/kernel_smoke.py).  The CPU interpret dot's accumulation ORDER
    depends on oneDNN's N-blocking (which differs between the two kernels'
    operand widths and with the thread count), so a handful of bf16
    round-ties may flip here — near-exact, not array_equal."""
    B, H, W = shape
    rng = np.random.default_rng(13)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)
    we = fold_stem_params_e(k, gamma, beta, mean, var)

    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    o4 = pallas_stem_e(deinterleave_cols_cf(x_cf), we, w=W, interpret=True)
    x5 = chunk5_cols_cf(x_cf, cw)
    o5 = pallas_stem_f(x5, we, w=W, cw=cw, interpret=True)
    assert o5.shape == (H // 2, W // 2, 16, B)
    a4 = np.asarray(o4, np.float32)
    a5 = np.asarray(jnp.transpose(o5, (3, 0, 2, 1)), np.float32)
    np.testing.assert_allclose(a5, a4, atol=0.05, rtol=0.02)
    frac = (a5 == a4).mean()
    assert frac > 0.9999, f"only {frac} bit-equal"


def test_pallas_stem_v5_input_validation():
    we = jnp.zeros((216, 256), jnp.bfloat16)
    with pytest.raises(ValueError):
        pallas_stem_f(jnp.zeros((3, 40, 80, 64), jnp.bfloat16), we, w=64,
                      cw=8, interpret=True)  # B % 128 != 0
    with pytest.raises(ValueError):
        pallas_stem_f(jnp.zeros((3, 40, 60, 128), jnp.bfloat16), we, w=64,
                      cw=8, interpret=True)  # NC mismatch
    assert chunk5_cw(640) == 40 and chunk5_cw(64) == 32
    assert chunk5_cw(14) is None


def test_letterbox_batch_cf5_matches_plain_canvas():
    """The v5 chunked/shifted/duplicated-halo batch-minor canvas must map
    column-for-column onto the plain bordered canvas (resample and
    no-resample paths), up to the documented ±1-LSB PIL-round sum-order
    deviation on the resample path."""
    rng = np.random.default_rng(15)
    cw = 8
    for in_hw, exact in (((48, 72), False), ((64, 64), True)):
        img = jnp.asarray(rng.integers(0, 256, (4, *in_hw, 3)), jnp.uint8)
        plain = np.asarray(letterbox_batch_cf(img, (64, 64)))
        got5 = np.asarray(letterbox_batch_cf5(img, (64, 64), cw=cw))
        idx = _chunk5_col_map(64, cw)
        assert got5.shape == (3, 72, len(idx), 4)
        assert np.abs(got5[:, 66:]).sum() == 0.0  # 6 zero pad rows
        got5 = got5[:, :66]
        for q, c in enumerate(idx):
            exp = (plain[:, :, :, c] if c >= 0
                   else np.zeros_like(plain[:, :, :, 0]))
            gq = np.transpose(got5[:, :, q, :], (2, 0, 1))
            if exact:
                np.testing.assert_array_equal(exp, gq)
            else:
                d = np.abs(exp - gq)
                assert d.max() <= 1.0 and (d > 0).mean() < 0.01


def test_detect_batch_pallas_f_matches_pallas_e():
    """Full serving pipeline with the v5 stem vs v4 at a full-lane batch:
    same-size inputs take the exact chunk5 canvas; detection agreement at
    bf16 tolerance (CPU interpret dots may flip round-ties, see above)."""
    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.yolo import init_model

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(32, 32),
                      compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.Generator(np.random.PCG64(5))
    b = 128
    rgb = jnp.asarray(rng.integers(0, 255, (b, 32, 32, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 255, (b, 32, 32, 3)), jnp.uint8)
    hw = jnp.asarray(np.tile([32.0, 32.0], (b, 1)), jnp.float32)
    kw = dict(conf_thres=0.3, iou_thres=0.5, letterbox=True, max_det=8,
              pre_nms_topk=16, nms_backend="xla")

    r4 = detect_batch(model, variables, rgb, nir, hw, stem_backend="pallas_e",
                      **kw)
    r5 = detect_batch(model, variables, rgb, nir, hw, stem_backend="pallas_f",
                      **kw)
    np.testing.assert_array_equal(np.asarray(r4.classes),
                                  np.asarray(r5.classes))
    np.testing.assert_array_equal(np.asarray(r4.valid), np.asarray(r5.valid))
    np.testing.assert_allclose(np.asarray(r4.boxes), np.asarray(r5.boxes),
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(r4.scores), np.asarray(r5.scores),
                               atol=0.005)


def test_letterbox_batch_cf_deinterleave_matches_gather():
    """The matrix-folded column permutation must equal permuting the plain
    canvas (both the resample path and the no-resample path)."""
    rng = np.random.default_rng(8)
    for in_hw in ((48, 72), (64, 64)):  # resample / same-size paths
        img = jnp.asarray(rng.integers(0, 256, (2, *in_hw, 3)), jnp.float32)
        plain = letterbox_batch_cf(img, (64, 64))
        deint = letterbox_batch_cf(img, (64, 64), deinterleave_cols=True)
        np.testing.assert_array_equal(np.asarray(deinterleave_cols_cf(plain)),
                                      np.asarray(deint))


def test_detect_batch_pallas_stem_matches_xla_stem():
    """Full serving pipeline: stem_backend='pallas' (interpret on CPU) must
    reproduce the XLA-stem pipeline's detections at bf16 tolerance."""
    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.yolo import init_model

    cfg = ModelConfig(num_classes=2, phi="n", input_shape=(64, 64),
                      compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.Generator(np.random.PCG64(3))
    b = 2
    rgb = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([48.0, 72.0], (b, 1)), jnp.float32)
    kw = dict(conf_thres=0.3, iou_thres=0.5, letterbox=True, max_det=10,
              pre_nms_topk=32)

    r_xla = jax.jit(lambda r, n, h: detect_batch(
        model, variables, r, n, h, stem_backend="xla", **kw))(rgb, nir, hw)
    for backend in ("pallas", "pallas_d", "pallas_e"):
        r_pal = jax.jit(lambda r, n, h: detect_batch(
            model, variables, r, n, h, stem_backend=backend, **kw))(rgb, nir, hw)

        np.testing.assert_array_equal(np.asarray(r_xla.classes),
                                      np.asarray(r_pal.classes))
        np.testing.assert_array_equal(np.asarray(r_xla.valid),
                                      np.asarray(r_pal.valid))
        np.testing.assert_allclose(np.asarray(r_xla.boxes),
                                   np.asarray(r_pal.boxes), atol=0.01)
        np.testing.assert_allclose(np.asarray(r_xla.scores),
                                   np.asarray(r_pal.scores), atol=0.005)


def test_stem_backend_auto_resolution(monkeypatch):
    """Pin the 'auto' policy (infer/pipeline._stem_backend_resolve): the v4
    kernel wherever eligible on TPU (on-chip crossover, ROUND4.md), XLA
    elsewhere; explicit Pallas requests on ineligible configs fail loud."""
    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer import pipeline

    ok = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640),
                     compute_dtype="bfloat16")
    assert pipeline._stem_backend_resolve("xla", ok) == "xla"
    assert pipeline._stem_backend_resolve("pallas", ok) == "pallas"
    assert pipeline._stem_backend_resolve("pallas_d", ok) == "pallas_d"

    # auto on the CPU test backend -> xla
    assert pipeline._stem_backend_resolve("auto", ok, batch=1) == "xla"
    # auto on TPU -> the v4 kernel at every batch; at full-128-lane batches
    # on a single chip the v5 batch-minor kernel takes over (round 5)
    monkeypatch.setattr(pipeline.jax, "default_backend", lambda: "tpu")
    for b in (1, 8, 32):
        assert pipeline._stem_backend_resolve("auto", ok, batch=b) == "pallas_e"
    expect_f = "pallas_f" if len(jax.devices()) == 1 else "pallas_e"
    assert pipeline._stem_backend_resolve("auto", ok, batch=128) == expect_f
    monkeypatch.setattr(pipeline.jax, "devices", lambda: [object()])
    assert pipeline._stem_backend_resolve("auto", ok, batch=128) == "pallas_f"
    assert pipeline._stem_backend_resolve("auto", ok, batch=256) == "pallas_f"
    assert pipeline._stem_backend_resolve("auto", ok, batch=64) == "pallas_e"
    with pytest.raises(ValueError):
        pipeline._stem_backend_resolve("pallas_f", ok, batch=64)

    # multi-scale: 1280² stays eligible (needs the 64 MB scoped-VMEM limit —
    # the old 48 MB limit failed by 64 KB at compile, round 5); past the
    # VMEM-fit bound the per-image kernels are excluded BEFORE compile
    from dcfa_yolo_tpu.ops.pallas_stem import stem_vmem_fit
    assert stem_vmem_fit(1280, 1280)
    assert not stem_vmem_fit(2560, 2560)
    big = ModelConfig(num_classes=1, phi="n", input_shape=(2560, 2560),
                      compute_dtype="bfloat16")
    # v5's VMEM footprint is resolution-independent, so it stays available
    # past the per-image kernels' fit bound at full-lane batches
    assert pipeline._stem_backend_resolve("auto", big, batch=128) == "pallas_f"
    assert pipeline._stem_backend_resolve("auto", big, batch=64) == "xla"
    with pytest.raises(ValueError):
        pipeline._stem_backend_resolve("pallas_e", big)

    # ineligible configs: auto falls back to xla, explicit raises
    for bad in (ModelConfig(num_classes=1, phi="s", input_shape=(640, 640),
                            compute_dtype="bfloat16"),
                ModelConfig(num_classes=1, phi="n", input_shape=(640, 640)),
                ModelConfig(num_classes=1, phi="n", input_shape=(648, 640),
                            compute_dtype="bfloat16")):
        assert pipeline._stem_backend_resolve("auto", bad, batch=128) == "xla"
        with pytest.raises(ValueError):
            pipeline._stem_backend_resolve("pallas_d", bad)
