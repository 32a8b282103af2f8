"""Train-graph ≡ deploy-graph parity for RepGhost re-parameterization
(BASELINE config #4; reference `switch_to_deploy` at `nets/repghost.py:158-175`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.blocks import C2fRepGhost
from dcfa_yolo_tpu.models.reparam import deploy_variables
from dcfa_yolo_tpu.models.yolo import DCFAYolo


class TestC2fRepGhostFusion:
    def test_block_level(self):
        rng = jax.random.PRNGKey(42)
        block = C2fRepGhost(features=32, n=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 48))
        variables = block.init(rng, x, train=False)
        # randomize batch stats so BN fusion is non-trivial
        stats = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.random.RandomState(0).uniform(0.5, 1.5, v.shape).astype(np.float32))
            if v.ndim == 1 else v,
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}

        train_out = block.apply(variables, x, train=False)
        deploy_block = C2fRepGhost(features=32, n=2, deploy=True)
        dep_vars = deploy_variables(variables)
        deploy_out = deploy_block.apply(dep_vars, x, train=False)
        np.testing.assert_allclose(
            np.asarray(train_out), np.asarray(deploy_out), rtol=1e-4, atol=1e-5)

    def test_deploy_param_structure(self):
        rng = jax.random.PRNGKey(0)
        block = C2fRepGhost(features=16, n=1)
        x = jnp.zeros((1, 8, 8, 16))
        variables = block.init(rng, x, train=False)
        dep = deploy_variables(variables)
        g1 = dep["params"]["m0"]["ghost1"]
        assert "bias" in g1["cheap_conv"]
        assert "cheap_bn" not in g1 and "fusion_bn" not in g1
        # deploy variables initialize the deploy module without shape errors
        deploy_block = C2fRepGhost(features=16, n=1, deploy=True)
        ref_shapes = jax.tree_util.tree_map(
            lambda v: v.shape, deploy_block.init(rng, x, train=False)["params"])
        dep_shapes = jax.tree_util.tree_map(lambda v: v.shape, dep["params"])
        assert ref_shapes == dep_shapes


class TestFullModelFusion:
    def test_fullmodel_outputs_match(self):
        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(128, 128))
        model = DCFAYolo(cfg)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
        nir = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), rgb, nir, train=False)
        out = model.apply(variables, rgb, nir, train=False)

        deploy_model = DCFAYolo(cfg, deploy=True)
        dep_vars = deploy_variables(variables)
        dep_out = deploy_model.apply(dep_vars, rgb, nir, train=False)
        np.testing.assert_allclose(
            np.asarray(out.dbox), np.asarray(dep_out.dbox), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.cls), np.asarray(dep_out.cls), rtol=1e-4, atol=1e-4)
