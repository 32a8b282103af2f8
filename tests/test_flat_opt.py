"""Flat-vector optimizer tail ≡ the optax tree chain (train/flat_opt.py).

The fused trainer runs its optimizer+EMA tail on raveled vectors by default
(measured 7.3 -> <1 ms on the v5e, tools/optstep_ab.py); these tests pin that
the flat math reproduces `build_optimizer`'s exact chain — clip-by-global-
norm (triggered and untriggered), 3-group weight decay, nesterov SGD / Adam,
BiFPN zeroing, freeze masking — and that the full flat-tail train step
matches the tree-form step end-to-end, including the checkpoint round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.parallel.mesh import make_mesh
from dcfa_yolo_tpu.train.flat_opt import build_factors, flat_update, init_flat_opt
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.optim import build_optimizer, frozen_backbone_mask
from dcfa_yolo_tpu.train.trainer import Trainer


def _toy_params(rng):
    return {
        "backbone_rgb": {"c1": {"kernel": rng.standard_normal(
            (3, 3, 4, 8)).astype(np.float32)}},
        "neck": {"bi_fpn": {"w": rng.standard_normal(3).astype(np.float32)},
                 "c2": {"kernel": rng.standard_normal(
                     (1, 1, 8, 4)).astype(np.float32),
                     "bias": rng.standard_normal(4).astype(np.float32)}},
        "head": {"bn": {"scale": rng.standard_normal(8).astype(np.float32),
                        "bias": rng.standard_normal(8).astype(np.float32)}},
    }


class TestFlatUpdateMatchesOptax:
    @pytest.mark.parametrize("opt_type", ["sgd", "adam"])
    @pytest.mark.parametrize("gscale", [1e-3, 1e3])  # clip off / triggered
    @pytest.mark.parametrize("freeze", [False, True])
    def test_steps_match(self, opt_type, gscale, freeze):
        rng = np.random.Generator(np.random.PCG64(0))
        params = _toy_params(rng)
        tc = TrainConfig(optimizer_type=opt_type)
        tx = build_optimizer(tc, params, train_bifpn=False)
        factors = build_factors(params, {"s": np.zeros(2, np.float32)},
                                train_bifpn=False)

        flat_p, unravel = ravel_pytree(params)
        opt_tree = tx.init(params)
        opt_flat = init_flat_opt(tc, factors.n_params)
        fmask = frozen_backbone_mask(params)
        p_tree, p_flat = params, jnp.asarray(flat_p)
        lr = 0.01
        for step in range(3):
            g_tree = jax.tree_util.tree_map(
                lambda x: (rng.standard_normal(x.shape) * gscale
                           ).astype(np.float32), p_tree)
            # tree path (exactly the trainer's tree-form step)
            g_used = jax.tree_util.tree_map(
                lambda g, m: np.zeros_like(g) if (freeze and m) else g,
                g_tree, fmask)
            upd, opt_tree = tx.update(g_used, opt_tree, p_tree)
            if freeze:
                upd = jax.tree_util.tree_map(
                    lambda u, m: jnp.zeros_like(u) if m else u, upd, fmask)
            p_tree = optax.apply_updates(
                p_tree, jax.tree_util.tree_map(lambda u: u * lr, upd))
            # flat path
            gf = ravel_pytree(g_tree)[0]
            updf, opt_flat = flat_update(tc, factors, gf, p_flat, opt_flat,
                                         freeze_backbone=freeze)
            p_flat = p_flat + lr * updf

            np.testing.assert_allclose(
                np.asarray(ravel_pytree(p_tree)[0]), np.asarray(p_flat),
                rtol=2e-6, atol=1e-7,
                err_msg=f"{opt_type} gscale={gscale} freeze={freeze} "
                        f"step={step}")


def _tiny_batch(batch=2, seed=0):
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(seed),
                                  batch_size=batch)
    rng = np.random.Generator(np.random.PCG64(seed))
    rgb = rng.random((batch, 64, 64, 3), np.float32)
    labels = np.array([[j, 0, 0.5, 0.5, 0.4, 0.4] for j in range(batch)],
                      np.float32)
    gt = pad_targets(labels, batch, 4, (64, 64))
    return model, variables, rgb, gt


class TestFlatTailTrainer:
    def test_flat_tail_equals_tree_step(self):
        """Three fused steps (incl. a frozen one): flat-tail trainer ==
        tree trainer on params, BN stats and EMA."""
        model, variables, rgb, gt = _tiny_batch()
        var_copy = jax.tree_util.tree_map(lambda x: np.array(x), variables)
        tc = TrainConfig(max_boxes=4)
        tr_flat = Trainer(model, variables, tc, mesh=make_mesh(1),
                          step_mode="fused", flat_tail=True)
        tr_tree = Trainer(model, var_copy, tc, mesh=make_mesh(1),
                          step_mode="fused", flat_tail=False)
        assert tr_flat.flat_tail and not tr_tree.flat_tail
        for freeze in (False, True, False):
            bf = tr_flat.put_batch(rgb, rgb, *gt)
            bt = tr_tree.put_batch(rgb, rgb, *gt)
            lf = tr_flat.train_step(bf, 1e-2, freeze_backbone=freeze)
            lt = tr_tree.train_step(bt, 1e-2, freeze_backbone=freeze)
            np.testing.assert_allclose(float(lf.total), float(lt.total),
                                       rtol=1e-5)
        sf, st = tr_flat.state, tr_tree.state
        # atol 1e-5: the two programs compile with different op orders, so
        # tiny BN-stat accumulations drift at float-epsilon level
        for name, a, b in [("params", sf.params, st.params),
                           ("stats", sf.batch_stats, st.batch_stats),
                           ("ema", sf.ema.variables, st.ema.variables)]:
            jax.tree_util.tree_map(
                lambda x, y: np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5,
                    err_msg=name), a, b)

    def test_state_roundtrip_and_resume(self):
        """state property -> setter round-trips (the checkpoint/resume
        surface) and training continues."""
        model, variables, rgb, gt = _tiny_batch()
        tc = TrainConfig(max_boxes=4)
        tr = Trainer(model, variables, tc, mesh=make_mesh(1),
                     step_mode="fused", flat_tail=True)
        b = tr.put_batch(rgb, rgb, *gt)
        tr.train_step(b, 1e-2)
        ts = tr.state  # materialized tree (what the checkpoint saves)
        flat_before = np.asarray(tr._state.flat_params)
        tr.state = ts  # restore path
        np.testing.assert_allclose(np.asarray(tr._state.flat_params),
                                   flat_before, rtol=1e-6, atol=0)
        # opt state survives the round-trip (momentum not reset)
        assert float(jnp.abs(tr._state.opt.trace).sum()) > 0
        lb = tr.train_step(tr.put_batch(rgb, rgb, *gt), 1e-2)
        assert np.isfinite(float(lb.total))
