"""Training-system parity + end-to-end train-step tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.train.assigner import TaskAlignedAssigner
from dcfa_yolo_tpu.train.loss import YoloLoss, pad_targets
from dcfa_yolo_tpu.train.schedule import get_lr_scheduler

import pathlib
GOLDEN = str(pathlib.Path(__file__).parent / "goldens" / "train.npz")


@pytest.fixture(scope="module")
def tr():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestAssigner:
    def test_matches_reference(self, tr):
        assigner = TaskAlignedAssigner(topk=10, num_classes=3, alpha=0.5, beta=6.0)
        res = assigner(
            jnp.asarray(tr["as_pd_scores"]), jnp.asarray(tr["as_pd_bboxes"]),
            jnp.asarray(tr["as_anc"]), jnp.asarray(tr["as_gt_labels"]),
            jnp.asarray(tr["as_gt_bboxes"]), jnp.asarray(tr["as_mask_gt"]))
        # target scores are the loss-relevant output — must match exactly
        np.testing.assert_allclose(np.asarray(res.target_scores), tr["as_t_scores"],
                                   rtol=1e-4, atol=1e-6)
        # fg may differ ONLY on zero-metric candidates (top-k tie-breaking among
        # zeros is implementation-defined in torch); those carry zero loss weight
        mine_fg = np.asarray(res.fg_mask)
        ref_fg = tr["as_fg"].astype(bool)
        disagree = mine_fg != ref_fg
        if disagree.any():
            ref_w = tr["as_t_scores"].sum(-1)[disagree]
            mine_w = np.asarray(res.target_scores).sum(-1)[disagree]
            assert np.abs(ref_w).max() < 1e-6 and np.abs(mine_w).max() < 1e-6
        # boxes compared where both agree on a (weighted) assignment
        fg = ref_fg & mine_fg
        np.testing.assert_allclose(np.asarray(res.target_bboxes)[fg],
                                   tr["as_t_bboxes"][fg], rtol=1e-5, atol=1e-4)


class TestLoss:
    def _criterion(self):
        cfg = ModelConfig(num_classes=3, phi="n", input_shape=(128, 128))
        return YoloLoss(cfg, TrainConfig(max_boxes=8))

    def test_total_matches_reference(self, tr):
        criterion = self._criterion()
        feats = [jnp.asarray(nchw_to_nhwc(tr[k]))
                 for k in ("loss_feat_p3", "loss_feat_p4", "loss_feat_p5")]
        gt_boxes, gt_labels, gt_mask = pad_targets(
            tr["loss_targets"], batch_size=2, max_boxes=8, input_hw=(128, 128))
        lb = criterion(feats, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                       jnp.asarray(gt_mask))
        np.testing.assert_allclose(float(lb.total), float(tr["loss_total"]),
                                   rtol=2e-4)

    def test_empty_targets(self, tr):
        criterion = self._criterion()
        feats = [jnp.asarray(nchw_to_nhwc(tr[k]))
                 for k in ("loss_feat_p3", "loss_feat_p4", "loss_feat_p5")]
        zeros = np.zeros((0, 6), np.float32)
        gt_boxes, gt_labels, gt_mask = pad_targets(zeros, 2, 8, (128, 128))
        lb = criterion(feats, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                       jnp.asarray(gt_mask))
        np.testing.assert_allclose(float(lb.total), float(tr["loss_total_empty"]),
                                   rtol=2e-4)

    def test_gradients_finite(self, tr):
        """Padded gt rows must not inject NaNs into gradients."""
        criterion = self._criterion()
        feats = [jnp.asarray(nchw_to_nhwc(tr[k]))
                 for k in ("loss_feat_p3", "loss_feat_p4", "loss_feat_p5")]
        gt_boxes, gt_labels, gt_mask = pad_targets(
            tr["loss_targets"], 2, 8, (128, 128))

        def f(fs):
            return criterion(fs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                             jnp.asarray(gt_mask)).total

        grads = jax.grad(f)(feats)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()


class TestSchedule:
    def test_cos_matches_reference(self, tr):
        fn = get_lr_scheduler("cos", 0.01, 0.0001, 200)
        mine = np.array([fn(e) for e in range(200)])
        np.testing.assert_allclose(mine, tr["lr_cos"], rtol=1e-10)

    def test_step_matches_reference(self, tr):
        fn = get_lr_scheduler("step", 0.01, 0.0001, 200)
        mine = np.array([fn(e) for e in range(200)])
        np.testing.assert_allclose(mine, tr["lr_step"], rtol=1e-10)


class TestTrainStep:
    def test_end_to_end_loss_decreases_on_mesh(self):
        """Overfit a tiny batch on a 2-device CPU mesh: loss drops, EMA moves,
        BN stats update, grads all-reduce over the data axis.  (The container
        has a single CPU core, so the mesh is kept at 2 virtual devices — an
        8-device step exceeds the XLA CPU collective rendezvous timeout.)"""
        from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
        from dcfa_yolo_tpu.parallel.mesh import make_mesh
        from dcfa_yolo_tpu.train.trainer import Trainer

        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
        model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
        tc = TrainConfig(max_boxes=4, weight_decay=5e-4)
        trainer = Trainer(model, variables, tc, mesh=make_mesh(2))
        assert len(trainer.mesh.devices.flatten()) == 2

        rng = np.random.Generator(np.random.PCG64(0))
        rgb = rng.random((2, 64, 64, 3), np.float32)
        nir = rng.random((2, 64, 64, 3), np.float32)
        labels = np.array(
            [[j, 0, 0.5, 0.5, 0.4, 0.4] for j in range(2)], np.float32)
        gt_boxes, gt_labels, gt_mask = pad_targets(labels, 2, 4, (64, 64))
        batch = trainer.put_batch(rgb, nir, gt_boxes, gt_labels, gt_mask)

        first = None
        last = None
        for i in range(6):
            lb = trainer.train_step(batch, lr=1e-2)
            if first is None:
                first = float(lb.total)
            last = float(lb.total)
        assert np.isfinite(last)
        assert last < first, (first, last)
        assert int(trainer.state.ema.updates) == 6

    def test_freeze_backbone(self):
        from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
        from dcfa_yolo_tpu.parallel.mesh import make_mesh
        from dcfa_yolo_tpu.train.trainer import Trainer

        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
        model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
        trainer = Trainer(model, variables, TrainConfig(max_boxes=4),
                          mesh=make_mesh(2))
        before = np.asarray(
            variables["params"]["backbone_rgb"]["stem"]["conv"]["kernel"])
        head_before = np.asarray(variables["params"]["cv3_0_2"]["kernel"])

        rng = np.random.Generator(np.random.PCG64(1))
        rgb = rng.random((2, 64, 64, 3), np.float32)
        labels = np.array([[j, 0, 0.5, 0.5, 0.4, 0.4] for j in range(2)], np.float32)
        gt = pad_targets(labels, 2, 4, (64, 64))
        batch = trainer.put_batch(rgb, rgb, *gt)
        trainer.train_step(batch, lr=1e-2, freeze_backbone=True)
        after = np.asarray(
            trainer.state.params["backbone_rgb"]["stem"]["conv"]["kernel"])
        head_after = np.asarray(trainer.state.params["cv3_0_2"]["kernel"])
        np.testing.assert_array_equal(before, after)
        assert not np.allclose(head_before, head_after)
