"""Every phi variant is constructible, runs, and trains — pinned.

The reference only FUNCTIONS at phi='n': its neck in-channel literals
+128/+64/+256 (`/root/reference/nets/yolo_mul.py:361,364,376`) match the
second fusion input's width only when base_channels=16; phi='s' crashes with a
channel mismatch (verified by execution, SURVEY §2.2).  This rebuild derives
those channels symbolically — these tests pin that claim for every phi so a
neck-channel regression (the exact bug the reference has) cannot land
silently.

Param counts are pinned to the values measured at first implementation; the
phi='n' count equals the reference's measured 2,678,866 minus the 16
untrainable DFL-projection weights (frozen arange conv,
`nets/yolo_mul.py:316-317`), which here is a pure function, not a parameter.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model

# phi -> (params, batch_stats entries) at num_classes=1
EXPECTED_COUNTS = {
    "n": (2_678_850, 14_080),
    "s": (9_770_850, 27_392),
    "m": (17_451_202, 44_928),
    "l": (24_325_538, 62_208),
    "x": (37_962_370, 77_760),
}


def count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("phi", list("nsmlx"))
class TestEveryPhi:
    def test_constructs_with_pinned_param_count(self, phi):
        cfg = ModelConfig(num_classes=1, phi=phi, input_shape=(256, 256))
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        exp_p, exp_s = EXPECTED_COUNTS[phi]
        assert count(variables["params"]) == exp_p
        assert count(variables["batch_stats"]) == exp_s

    def test_forward_shapes_at_256(self, phi):
        """The regression the reference has would surface here as a neck
        channel mismatch during tracing — eval_shape catches it without
        paying for the full forward on every phi."""
        cfg = ModelConfig(num_classes=1, phi=phi, input_shape=(256, 256))
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rgb = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
        out = jax.eval_shape(
            lambda v, r: model.apply(v, r, r, train=False), variables, rgb)
        assert out.dbox.shape == (1, 1344, 4)       # 32²+16²+8² anchors
        assert out.cls.shape == (1, 1344, 1)
        assert [f.shape for f in out.feats] == [
            (1, 32, 32, 65), (1, 16, 16, 65), (1, 8, 8, 65)]


def test_phi_s_takes_a_train_step():
    """One real optimizer step on the mesh for the phi the reference's own
    train entry selects (`train_mul.py:49` sets phi='s' — and would crash)."""
    from dcfa_yolo_tpu.train.trainer import Trainer

    cfg = ModelConfig(num_classes=1, phi="s", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
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
