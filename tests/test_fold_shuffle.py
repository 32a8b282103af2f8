"""Channel-shuffle folding (`reparam.fold_shuffle_variables` +
`DCFAYolo(fold_shuffle=True)`).

The ShuffleNetV2 `channel_shuffle` (`/root/reference/nets/yolo_mul.py:164-168`)
is a fixed channel permutation; on TPU it lowers to a relayout copy per block
per image.  The fold removes the op from the serving graph and permutes every
consumer's input-channel rows instead, so the result must match the unfolded
graph exactly up to floating-point summation order (the conv input-channel
reduction order changes).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def small_setup():
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.models.yolo import init_model

    cfg = ModelConfig(num_classes=3, phi="n", input_shape=(64, 64),
                      compute_dtype="float32")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    nir = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    return cfg, model, variables, rgb, nir


def test_forward_equivalence(small_setup):
    import jax

    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo

    cfg, model, variables, rgb, nir = small_setup
    base = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
        variables, rgb, nir)

    fmodel = DCFAYolo(cfg, fold_shuffle=True)
    fvars = fold_shuffle_variables(variables)
    fold = jax.jit(lambda v, a, b: fmodel.apply(v, a, b, train=False))(
        fvars, rgb, nir)

    np.testing.assert_allclose(np.asarray(base.dbox), np.asarray(fold.dbox),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.cls), np.asarray(fold.cls),
                               rtol=1e-4, atol=1e-5)


def test_param_tree_unchanged_shapes(small_setup):
    import jax

    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables

    _, _, variables, _, _ = small_setup
    fvars = fold_shuffle_variables(variables)
    base_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables)
    fold_shapes = jax.tree_util.tree_map(lambda a: a.shape, fvars)
    assert base_shapes == fold_shapes
    # the fold must actually permute something
    k0 = np.asarray(variables["params"]["backbone_rgb"]["dark3_conv"]["conv"]["kernel"])
    k1 = np.asarray(fvars["params"]["backbone_rgb"]["dark3_conv"]["conv"]["kernel"])
    assert not np.array_equal(k0, k1)
    assert np.array_equal(np.sort(k0.ravel()), np.sort(k1.ravel()))


def test_inverse_perm_is_inverse():
    from dcfa_yolo_tpu.models.blocks import channel_shuffle
    from dcfa_yolo_tpu.models.reparam import _shuffle_inv_perm

    import jax.numpy as jnp

    for c in (4, 8, 32, 64, 256):
        z = jnp.arange(c, dtype=jnp.float32).reshape(1, 1, 1, c)
        y = np.asarray(channel_shuffle(z, 2)).ravel()
        inv = _shuffle_inv_perm(c)
        # y[inv[i]] == z[i]: consuming y at rows inv reproduces z order
        assert np.array_equal(y[inv], np.arange(c, dtype=np.float32))


def test_detection_agreement_trained(tmp_path):
    """End-to-end: the folded predictor returns the same detections as the
    baseline on a trained-weights fixture (same counts, <=1 px, scores 1e-3)."""
    from PIL import Image

    from tools.make_ab_fixture import unflatten
    from tools.make_synth_dataset import main as make_synth

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor
    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables

    with np.load(os.path.join(REPO, "tests/fixtures/ab_weights_f16.npz")) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    weights = unflatten(flat)

    make_synth(str(tmp_path), n_images=1, size=(480, 360))
    voc = os.path.join(tmp_path, "VOCdevkit", "VOC2007")
    rgb = np.asarray(Image.open(
        os.path.join(voc, "JPEGImages_rgb", "000000.png")))
    nir = np.asarray(Image.open(
        os.path.join(voc, "JPEGImages_nir", "000000.png")))

    results = {}
    for fold in (False, True):
        predictor = YOLOPredictor(
            class_names=["tomato_bunch"], input_shape=(640, 640), phi="n",
            confidence=0.5, nms_iou=0.5, max_det=100, pre_nms_topk=2048,
            variables=fold_shuffle_variables(weights) if fold else weights,
            compute_dtype="float32", fold_shuffle=fold)
        boxes, scores, classes = predictor.detect(rgb, nir)
        results[fold] = (np.asarray(boxes), np.asarray(scores),
                         np.asarray(classes))

    (b0, s0, c0), (b1, s1, c1) = results[False], results[True]
    assert len(s0) > 0, "degenerate: trained fixture detected nothing"
    assert len(s0) == len(s1)
    assert np.array_equal(c0, c1)
    assert np.max(np.abs(b0 - b1)) <= 1.0
    assert np.max(np.abs(s0 - s1)) < 1e-3


def test_uint8_float32_input_equality(small_setup):
    """The pipeline contract takes raw uint8 or float images; integral values
    must produce IDENTICAL results either way (bench.py feeds uint8 — the
    product path — so this pins that equivalence)."""
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.infer.pipeline import detect_batch

    cfg, model, variables, _, _ = small_setup
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (2, 48, 56, 3), dtype=np.uint8)
    raw2 = rng.integers(0, 256, (2, 48, 56, 3), dtype=np.uint8)
    hw = jnp.asarray(np.tile([48.0, 56.0], (2, 1)), jnp.float32)

    outs = {}
    for dt in (jnp.uint8, jnp.float32):
        res = jax.jit(lambda r, n: detect_batch(
            model, variables, r, n, hw, conf_thres=0.01, iou_thres=0.5,
            letterbox=True, max_det=20, pre_nms_topk=64,
            nms_backend="xla", stem_backend="xla"))(
                jnp.asarray(raw, dt), jnp.asarray(raw2, dt))
        outs[str(dt)] = jax.tree_util.tree_map(np.asarray, res)
    a, b = outs.values()
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.scores, b.scores)
    np.testing.assert_array_equal(a.valid, b.valid)
