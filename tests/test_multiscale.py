"""Multi-scale input support (BASELINE config #5: 320/640/1280 sweep).

The reference pins the neck to 640 via hardcoded interpolate sizes
(`nets/yolo_mul.py:426,433`); this build derives them from the input, so any
size divisible by 32 works.  1280 is exercised shape-only via eval_shape to
keep the CPU test fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model


class TestMultiScale:
    @pytest.mark.parametrize("size", [320, 416])
    def test_forward_runs(self, size):
        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(size, size))
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        x = jnp.zeros((1, size, size, 3))
        out = model.apply(variables, x, x, train=False)
        a = sum((size // s) ** 2 for s in (8, 16, 32))
        assert out.dbox.shape == (1, a, 4)
        assert out.anchors.shape == (a, 2)

    def test_1280_shapes(self):
        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(1280, 1280))
        model = DCFAYolo(cfg)
        x = jax.ShapeDtypeStruct((1, 1280, 1280, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, 1280, 1280, 3)),
                                 jnp.zeros((1, 1280, 1280, 3)), train=False),
            jax.random.PRNGKey(0))
        out = jax.eval_shape(
            lambda v: model.apply(v, jnp.zeros((1, 1280, 1280, 3)),
                                  jnp.zeros((1, 1280, 1280, 3)), train=False),
            variables)
        a = sum((1280 // s) ** 2 for s in (8, 16, 32))
        assert out.dbox.shape == (1, a, 4)

    def test_non_square(self):
        cfg = ModelConfig(num_classes=2, phi="n", input_shape=(320, 416))
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        x = jnp.zeros((1, 320, 416, 3))
        out = model.apply(variables, x, x, train=False)
        a = sum((320 // s) * (416 // s) for s in (8, 16, 32))
        assert out.cls.shape == (1, a, 2)
