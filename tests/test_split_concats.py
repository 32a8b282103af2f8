"""Neck concat-through-conv rewrite (`DCFAYolo(split_neck_concats=True)`).

XLA fuses elementwise producers into a conv's operand but never a
concatenate, so every neck concat feeding a 1×1 conv (the three BiFPN
fusions `nets/yolo_mul.py:428,435,443`, the down-path concat `:440`, and
each C2f_repghost's internal y-concat `nets/repghost.py:316-319`) is a real
HBM round-trip in the serving graph — the P3 site alone measured 1.55
ms/iter at b128 640² on the v5e.  The rewrite computes conv(concat(parts))
as a sum of sliced-kernel part convs (ops/conv.py ConvBnAct parts path):
same parameters, exact up to the K-split partial accumulation order.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def setup():
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


def test_forward_equivalence(setup):
    import jax

    from dcfa_yolo_tpu.models.yolo import DCFAYolo

    cfg, model, variables, rgb, nir = setup
    base = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
        variables, rgb, nir)
    smodel = DCFAYolo(cfg, split_neck_concats=True)
    split = jax.jit(lambda v, a, b: smodel.apply(v, a, b, train=False))(
        variables, rgb, nir)
    np.testing.assert_allclose(np.asarray(base.dbox), np.asarray(split.dbox),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.cls), np.asarray(split.cls),
                               rtol=1e-4, atol=1e-5)


def test_param_tree_identical(setup):
    import jax

    from dcfa_yolo_tpu.models.yolo import DCFAYolo

    cfg, model, variables, rgb, nir = setup
    v2 = DCFAYolo(cfg, split_neck_concats=True).init(
        jax.random.PRNGKey(0), rgb, nir, train=False)
    sh = jax.tree_util.tree_map(lambda a: a.shape, variables)
    sh2 = jax.tree_util.tree_map(lambda a: a.shape, v2)
    assert sh == sh2


def test_composes_with_deploy_and_fold(setup):
    import jax

    from dcfa_yolo_tpu.models.reparam import (deploy_variables,
                                              fold_shuffle_variables)
    from dcfa_yolo_tpu.models.yolo import DCFAYolo

    cfg, model, variables, rgb, nir = setup
    dv = jax.jit(deploy_variables)(variables)
    fv = jax.jit(fold_shuffle_variables)(dv)
    base = jax.jit(lambda v, a, b: DCFAYolo(
        cfg, deploy=True, fold_shuffle=True).apply(v, a, b, train=False))(
        fv, rgb, nir)
    split = jax.jit(lambda v, a, b: DCFAYolo(
        cfg, deploy=True, fold_shuffle=True,
        split_neck_concats=True).apply(v, a, b, train=False))(fv, rgb, nir)
    np.testing.assert_allclose(np.asarray(base.dbox), np.asarray(split.dbox),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.cls), np.asarray(split.cls),
                               rtol=1e-4, atol=1e-5)


def test_parts_conv_rejects_nonpointwise():
    import jax
    import jax.numpy as jnp

    from dcfa_yolo_tpu.ops.conv import ConvBnAct

    parts = (jnp.ones((1, 4, 4, 3)), jnp.ones((1, 4, 4, 5)))
    with pytest.raises(ValueError):
        ConvBnAct(8, kernel_size=3).init(jax.random.PRNGKey(0), parts)


def test_detection_agreement_trained(tmp_path):
    """End-to-end predictor with trained weights: fold+split vs fold."""
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
    for split in (False, True):
        predictor = YOLOPredictor(
            class_names=["tomato_bunch"], input_shape=(640, 640), phi="n",
            confidence=0.5, nms_iou=0.5, max_det=100, pre_nms_topk=2048,
            variables=fold_shuffle_variables(weights),
            compute_dtype="float32", fold_shuffle=True,
            split_neck_concats=split)
        boxes, scores, classes = predictor.detect(rgb, nir)
        results[split] = (np.asarray(boxes), np.asarray(scores),
                          np.asarray(classes))

    (b0, s0, c0), (b1, s1, c1) = results[False], results[True]
    assert len(s0) > 0, "degenerate: trained fixture detected nothing"
    assert len(s0) == len(s1)
    assert np.array_equal(c0, c1)
    assert np.max(np.abs(b0 - b1)) <= 1.0
    assert np.max(np.abs(s0 - s1)) < 1e-3
