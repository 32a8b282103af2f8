"""Paired dual-backbone serving graph (`models/pairing.py` +
`DCFAYolo(pair_backbones=True)`).

The reference runs two identical-architecture backbones sequentially
(`/root/reference/nets/yolo_mul.py:342-343,399-400`); the paired graph fuses
them into ONE doubled-channel stream with block-diagonal kernels, chosen so
the result matches the unpaired graph exactly up to floating-point summation
order (a zero addend is exact; only reduction order may differ).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_pair_layout_invariants():
    from dcfa_yolo_tpu.models.pairing import pair_layout

    for c, nb in ((3, 2), (16, 2), (32, 4), (64, 4), (512, 8)):
        mod, ch = pair_layout(c, nb)
        assert mod.shape == ch.shape == (2 * c,)
        # each (mod, ch) pair appears exactly once
        seen = set(zip(mod.tolist(), ch.tolist()))
        assert len(seen) == 2 * c
        assert set(mod.tolist()) == {0, 1}
        assert set(ch.tolist()) == set(range(c))
        # blocks alternate R, N with equal sizes
        bl = 2 * c // nb
        for b in range(nb):
            blk = mod[b * bl:(b + 1) * bl]
            assert (blk == b % 2).all()
        # within the midpoint split both halves stay alternating-blocked:
        # the first half carries per-modality channels 0:c/2 (ShuffleNetV2 x1)
        if nb == 4:
            assert set(ch[: c].tolist()) == set(range(c // 2))


def test_pair_dense_blockdiag():
    import jax.numpy as jnp

    from dcfa_yolo_tpu.models.pairing import _pair_dense, pair_layout

    rng = np.random.default_rng(0)
    kr = jnp.asarray(rng.random((3, 3, 8, 4)), jnp.float32)
    kn = jnp.asarray(rng.random((3, 3, 8, 4)), jnp.float32)
    K = np.asarray(_pair_dense(kr, kn, 4, 2))
    assert K.shape == (3, 3, 16, 8)
    mi, chi = pair_layout(8, 4)
    mo, cho = pair_layout(4, 2)
    for i in range(16):
        for o in range(8):
            want = (np.asarray(kr)[:, :, chi[i], cho[o]] if mi[i] == 0 == mo[o]
                    else np.asarray(kn)[:, :, chi[i], cho[o]]
                    if mi[i] == 1 == mo[o] else 0.0)
            np.testing.assert_array_equal(K[:, :, i, o], want)


@pytest.fixture(scope="module")
def pair_setup():
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
    from dcfa_yolo_tpu.models.yolo import init_model
    from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

    cfg = ModelConfig(num_classes=3, phi="n", input_shape=(64, 64),
                      compute_dtype="float32")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    fvars = fold_shuffle_variables(variables)
    pvars = pair_backbone_variables(fvars)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    nir = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    return cfg, fvars, pvars, rgb, nir


def test_forward_equivalence(pair_setup):
    import jax

    from dcfa_yolo_tpu.models.yolo import DCFAYolo

    cfg, fvars, pvars, rgb, nir = pair_setup
    fmodel = DCFAYolo(cfg, fold_shuffle=True)
    base = jax.jit(lambda v, a, b: fmodel.apply(v, a, b, train=False))(
        fvars, rgb, nir)
    pmodel = DCFAYolo(cfg, fold_shuffle=True, pair_backbones=True)
    pair = jax.jit(lambda v, a, b: pmodel.apply(v, a, b, train=False))(
        pvars, rgb, nir)

    np.testing.assert_allclose(np.asarray(base.dbox), np.asarray(pair.dbox),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.cls), np.asarray(pair.cls),
                               rtol=1e-4, atol=1e-5)


def test_param_conservation(pair_setup):
    """Block-diagonal pairing adds only exact zeros: the multiset of nonzero
    weights is preserved, and the off-modality blocks are zero."""
    _, fvars, pvars, _, _ = pair_setup
    k_r = np.asarray(fvars["params"]["backbone_rgb"]["dark3_conv"]["conv"]["kernel"])
    k_n = np.asarray(fvars["params"]["backbone_nir"]["dark3_conv"]["conv"]["kernel"])
    k_p = np.asarray(pvars["params"]["backbone_pair"]["dark3_conv"]["conv"]["kernel"])
    assert k_p.shape == (3, 3, 2 * k_r.shape[2], 2 * k_r.shape[3])
    both = np.concatenate([k_r.ravel(), k_n.ravel()])
    nz = k_p.ravel()[k_p.ravel() != 0.0]
    np.testing.assert_array_equal(np.sort(both[both != 0.0]), np.sort(nz))
    # half the paired kernel's entries are the structural zeros
    assert (k_p == 0.0).mean() >= 0.5
    # consumed subtrees are gone, paired ones exist
    assert "backbone_rgb" not in pvars["params"]
    assert "cbam_rgb_feat1" not in pvars["params"]
    assert "cbam_pair_feat1" in pvars["params"]


def test_pipeline_equivalence_with_pallas_stem(pair_setup):
    """detect_batch on the paired graph: xla stem vs the fused Pallas stem
    (interpret mode on CPU) — the paired stem params are block-diagonal and
    the pipeline slices the per-modality stem back out."""
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
    from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

    cfg = ModelConfig(num_classes=3, phi="n", input_shape=(64, 64),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    pvars = pair_backbone_variables(fold_shuffle_variables(variables))
    pmodel = DCFAYolo(cfg, fold_shuffle=True, pair_backbones=True)

    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.integers(0, 256, (2, 48, 56, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 256, (2, 48, 56, 3)), jnp.uint8)
    hw = jnp.asarray(np.tile([48.0, 56.0], (2, 1)), jnp.float32)

    outs = {}
    for stem in ("xla", "pallas"):
        res = jax.jit(lambda r, n, s=stem: detect_batch(
            pmodel, pvars, r, n, hw, conf_thres=0.01, iou_thres=0.5,
            letterbox=True, max_det=20, pre_nms_topk=64,
            nms_backend="xla", stem_backend=s))(rgb, nir)
        outs[stem] = jax.tree_util.tree_map(np.asarray, res)
    a, b = outs["xla"], outs["pallas"]
    assert np.array_equal(a.valid, b.valid)
    assert np.abs(a.boxes - b.boxes).max() < 1e-2
    assert np.abs(a.scores - b.scores).max() < 1e-3


def test_detection_agreement_trained(tmp_path):
    """End-to-end on a trained-weights fixture: the paired predictor returns
    the same detections as the folded baseline (same counts, <=1 px)."""
    from PIL import Image

    from tools.make_ab_fixture import unflatten
    from tools.make_synth_dataset import main as make_synth

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor

    with np.load(os.path.join(REPO, "tests/fixtures/ab_weights_f16.npz")) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    weights = unflatten(flat)

    make_synth(str(tmp_path), n_images=1, size=(480, 360))
    voc = os.path.join(tmp_path, "VOCdevkit", "VOC2007")
    rgb = np.asarray(Image.open(
        os.path.join(voc, "JPEGImages_rgb", "000000.png")))
    nir = np.asarray(Image.open(
        os.path.join(voc, "JPEGImages_nir", "000000.png")))

    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
    from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

    fvars = fold_shuffle_variables(weights)
    results = {}
    for pair in (False, True):
        predictor = YOLOPredictor(
            class_names=["tomato_bunch"], input_shape=(640, 640), phi="n",
            confidence=0.5, nms_iou=0.5, max_det=100, pre_nms_topk=2048,
            variables=pair_backbone_variables(fvars) if pair else fvars,
            compute_dtype="float32", fold_shuffle=True, pair_backbones=pair)
        boxes, scores, classes = predictor.detect(rgb, nir)
        results[pair] = (np.asarray(boxes), np.asarray(scores),
                         np.asarray(classes))

    (b0, s0, c0), (b1, s1, c1) = results[False], results[True]
    assert len(s0) > 0, "degenerate: trained fixture detected nothing"
    assert len(s0) == len(s1)
    assert np.array_equal(c0, c1)
    assert np.max(np.abs(b0 - b1)) <= 1.0
    assert np.max(np.abs(s0 - s1)) < 1e-3
