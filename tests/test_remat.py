"""Backbone rematerialization: identical numerics, identical variable tree.

`ModelConfig.remat` wraps the two backbones in `nn.remat` so the backward pass
recomputes the full-resolution stem/dark activations instead of storing them —
the knob that lets b128 640² training fit HBM alongside the device-staged
dataset (data/device_aug.py).  jax.checkpoint must not change WHAT is computed,
only when: these tests pin forward equality, gradient equality, and that the
variable tree (param names/shapes) is untouched so checkpoints are
interchangeable between remat settings.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


@pytest.fixture(scope="module")
def cfgs():
    base = ModelConfig(num_classes=2, phi="n", input_shape=(64, 64))
    return base, dataclasses.replace(base, remat=True)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.Generator(np.random.PCG64(7))
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    nir = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    return rgb, nir


def test_variable_tree_identical(cfgs):
    cfg, cfg_r = cfgs
    _, v0 = init_model(cfg, jax.random.PRNGKey(0))
    _, v1 = init_model(cfg_r, jax.random.PRNGKey(0))
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_identical_train_and_eval(cfgs, inputs):
    cfg, cfg_r = cfgs
    rgb, nir = inputs
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    for train in (False, True):
        out0 = jax.jit(lambda v: DCFAYolo(cfg).apply(
            v, rgb, nir, train, mutable=["batch_stats"] if train else False))(variables)
        out1 = jax.jit(lambda v: DCFAYolo(cfg_r).apply(
            v, rgb, nir, train, mutable=["batch_stats"] if train else False))(variables)
        l0 = jax.tree_util.tree_leaves(out0)
        l1 = jax.tree_util.tree_leaves(out1)
        assert len(l0) == len(l1)
        for a, b in zip(l0, l1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_gradients_identical(cfgs, inputs):
    """remat changes the schedule, not the math: grads must match to fp tol."""
    cfg, cfg_r = cfgs
    rgb, nir = inputs
    _, variables = init_model(cfg, jax.random.PRNGKey(0))

    def loss_fn(c):
        def f(params):
            out, _ = DCFAYolo(c).apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                rgb, nir, True, mutable=["batch_stats"])
            return jnp.mean(out.dbox ** 2) + jnp.mean(out.cls ** 2)
        return f

    g0 = jax.jit(jax.grad(loss_fn(cfg)))(variables["params"])
    g1 = jax.jit(jax.grad(loss_fn(cfg_r)))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_runs_with_remat(cfgs):
    from dcfa_yolo_tpu.train.trainer import Trainer

    _, cfg_r = cfgs
    model, variables = init_model(cfg_r, jax.random.PRNGKey(0))
    tc = TrainConfig(batch_size=8, max_boxes=4)
    trainer = Trainer(model, variables, tc)
    rng = np.random.Generator(np.random.PCG64(0))
    rgb = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    boxes = np.tile(np.array([[4.0, 4.0, 30.0, 30.0]], np.float32), (8, 4, 1))
    labels = np.zeros((8, 4), np.float32)
    mask = np.ones((8, 4), np.float32)
    batch = trainer.put_batch(rgb, rgb, boxes, labels, mask)
    lb = trainer.train_step(batch, lr=1e-3)
    assert np.isfinite(float(lb.total))
