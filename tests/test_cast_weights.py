"""Pre-cast bf16 conv kernels must be BIT-identical to f32 kernels through the
full serving pipeline when compute_dtype='bfloat16' (every conv casts its
kernel to bfloat16 at apply time anyway — reparam.cast_conv_kernels just does
the identical round-to-nearest-even once at load).  Covers the plain deploy
graph and the fold_shuffle x pair_backbones composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.reparam import (cast_conv_kernels, deploy_variables,
                                          fold_shuffle_variables)
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


def _detections(model, variables, rgb, nir, image_hw):
    return detect_batch(model, variables, rgb, nir, image_hw,
                        conf_thres=0.01, iou_thres=0.5, letterbox=True,
                        max_det=32, pre_nms_topk=128, nms_backend="xla")


@pytest.mark.parametrize("pair", [False, True])
def test_cast_conv_kernels_bit_identical(pair):
    cfg = ModelConfig(num_classes=2, phi="n", input_shape=(320, 320),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(3))
    model = DCFAYolo(cfg, deploy=True, fold_shuffle=True, pair_backbones=pair)
    variables = deploy_variables(variables)
    variables = fold_shuffle_variables(variables)
    if pair:
        from dcfa_yolo_tpu.models.pairing import pair_backbone_variables

        variables = pair_backbone_variables(variables)
    cast = cast_conv_kernels(variables)

    # every 4-D kernel went bf16; BN/bias vectors stayed f32
    kinds = set()
    for leaf in jax.tree_util.tree_leaves(cast["params"]):
        kinds.add((leaf.ndim == 4, str(leaf.dtype)))
    assert (True, "bfloat16") in kinds
    assert all(d == "float32" for nd4, d in kinds if not nd4)

    rng = np.random.Generator(np.random.PCG64(7))
    rgb = jnp.asarray(rng.integers(0, 255, (2, 240, 300, 3)), jnp.uint8)
    nir = jnp.asarray(rng.integers(0, 255, (2, 240, 300, 3)), jnp.uint8)
    image_hw = jnp.asarray(np.tile([240.0, 300.0], (2, 1)), jnp.float32)

    base = jax.jit(lambda v: _detections(model, v, rgb, nir, image_hw))(variables)
    fast = jax.jit(lambda v: _detections(model, v, rgb, nir, image_hw))(cast)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
