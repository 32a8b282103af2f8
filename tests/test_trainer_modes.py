"""Trainer edge paths: adam, split≡fused on one device, bifpn-frozen mode."""

import numpy as np
import pytest

import jax

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.parallel.mesh import make_mesh
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer


def tiny_setup(batch=2, seed=0):
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(seed), batch_size=batch)
    rng = np.random.Generator(np.random.PCG64(seed))
    rgb = rng.random((batch, 64, 64, 3), np.float32)
    labels = np.array([[j, 0, 0.5, 0.5, 0.4, 0.4] for j in range(batch)],
                      np.float32)
    gt = pad_targets(labels, batch, 4, (64, 64))
    return cfg, model, variables, rgb, gt


class TestTrainerModes:
    def test_adam_optimizer_step(self):
        cfg, model, variables, rgb, gt = tiny_setup()
        tc = TrainConfig(max_boxes=4, optimizer_type="adam", momentum=0.9,
                         weight_decay=0.0)
        trainer = Trainer(model, variables, tc, mesh=make_mesh(1))
        batch = trainer.put_batch(rgb, rgb, *gt)
        lb1 = trainer.train_step(batch, 1e-3)
        lb2 = trainer.train_step(batch, 1e-3)
        assert np.isfinite(float(lb2.total))

    def test_split_equals_fused_on_one_device(self):
        """On a 1-device mesh the split and fused steps are numerically
        identical (same BN semantics, same reduction)."""
        cfg, model, variables, rgb, gt = tiny_setup()
        tc = TrainConfig(max_boxes=4)
        var_copy = jax.tree_util.tree_map(lambda x: x.copy(), variables)
        tr_f = Trainer(model, variables, tc, mesh=make_mesh(1),
                       step_mode="fused")
        tr_s = Trainer(model, var_copy, tc, mesh=make_mesh(1),
                       step_mode="split")
        bf = tr_f.put_batch(rgb, rgb, *gt)
        bs = tr_s.put_batch(rgb, rgb, *gt)
        lf = tr_f.train_step(bf, 1e-2)
        ls = tr_s.train_step(bs, 1e-2)
        np.testing.assert_allclose(float(lf.total), float(ls.total), rtol=1e-5)
        pf = np.asarray(tr_f.state.params["cv3_0_2"]["kernel"])
        psp = np.asarray(tr_s.state.params["cv3_0_2"]["kernel"])
        np.testing.assert_allclose(pf, psp, rtol=1e-4, atol=1e-6)

    def test_freeze_phase_accumulates_no_backbone_opt_state(self):
        """torch skips grad-less params entirely during freeze training, so
        weight decay must not feed momentum for frozen backbones (a stale
        trace would kick the weights at unfreeze)."""
        import jax.tree_util as jtu

        cfg, model, variables, rgb, gt = tiny_setup()
        tc = TrainConfig(max_boxes=4)  # sgd momentum .937, wd 5e-4
        trainer = Trainer(model, variables, tc, mesh=make_mesh(1))
        batch = trainer.put_batch(rgb, rgb, *gt)
        p0 = jax.tree_util.tree_map(np.asarray,
                                    trainer.state.params["backbone_rgb"])
        for _ in range(3):
            trainer.train_step(batch, 1e-2, freeze_backbone=True)
        st = trainer.state
        # frozen params unmoved
        jtu.tree_map(np.testing.assert_array_equal, p0,
                     jtu.tree_map(np.asarray, st.params["backbone_rgb"]))
        # and their optimizer-state slots still zero (= never accumulated)
        frozen_state = [np.abs(np.asarray(v)).sum()
                        for p, v in jtu.tree_flatten_with_path(st.opt_state)[0]
                        if "backbone" in jtu.keystr(p)
                        and getattr(v, "ndim", 0) >= 1]
        assert frozen_state and max(frozen_state) == 0.0
        # a non-frozen param's state did accumulate
        live_state = [np.abs(np.asarray(v)).sum()
                      for p, v in jtu.tree_flatten_with_path(st.opt_state)[0]
                      if "cv3" in jtu.keystr(p) and getattr(v, "ndim", 0) >= 1]
        assert live_state and max(live_state) > 0.0

    def test_bifpn_frozen_reference_mode(self):
        """train_bifpn=False reproduces the reference quirk: bi_fpn.w is in no
        optimizer param group and never moves (`train_mul.py:246-259`)."""
        cfg, model, variables, rgb, gt = tiny_setup()
        trainer = Trainer(model, variables, TrainConfig(max_boxes=4),
                          mesh=make_mesh(1), train_bifpn=False)
        before = np.asarray(variables["params"]["bi_fpn"]["w"])
        batch = trainer.put_batch(rgb, rgb, *gt)
        for _ in range(2):
            trainer.train_step(batch, 1e-2)
        after = np.asarray(trainer.state.params["bi_fpn"]["w"])
        np.testing.assert_array_equal(before, after)
