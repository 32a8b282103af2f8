"""Fused (SyncBN) train step on a REAL multi-device mesh (VERDICT r1 item #3).

The fused `make_train_step` is the multi-chip TPU default: one jit program,
batch sharded over the mesh, and the claim (`ops/norm.py` docstring) that
GSPMD computes BatchNorm moments over the *global* batch — SyncBN for free,
the analogue of `convert_sync_batchnorm` at `/root/reference/train_mul.py:193-196`.

Round 1 never executed that program on >1 device (XLA:CPU's in-program
collectives deadlock when interleaved with convs on this 1-core host).  These
tests drive the REAL `make_train_step` — same jit wrapping, shardings, optax
update and EMA — through a conv-free Dense+BN model, which XLA:CPU executes
fine, and assert:

  * the post-step BN running mean equals the hand-computed GLOBAL batch mean
    (per-device moments would differ — the test distinguishes them);
  * the fused step on a 2-device mesh is bit-compatible with the same step on
    a 1-device mesh (GSPMD ≡ single-program semantics, grads all-reduced);
  * the split step (local-BN DDP semantics) equals the fused step when every
    device sees an identical batch (local moments then equal global moments).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dcfa_yolo_tpu.config import TrainConfig
from dcfa_yolo_tpu.parallel.fused_check import (
    make_state,
    mse_criterion,
    run_fused,
    run_fused_flat,
    setup,
)
from dcfa_yolo_tpu.parallel.mesh import data_sharding, make_mesh
from dcfa_yolo_tpu.train.trainer import Batch, make_split_train_step


class TestFusedMultiDevice:
    def test_fused_syncbn_global_moments_on_2dev_mesh(self):
        """The fused step on 2 devices reduces BN moments over the GLOBAL
        batch (SyncBN), not per-device."""
        assert len(jax.devices()) >= 2
        model, variables, batch = setup()
        new_state, total = run_fused(model, variables, batch, n_dev=2)
        assert np.isfinite(total)

        # hand-computed pre-BN activations over the full batch
        x = np.concatenate([batch.rgb, batch.nir], axis=-1).reshape(8, -1)
        h = x @ np.asarray(variables["params"]["d1"]["kernel"])
        global_mean = h.mean(0)
        m = 0.1  # torch momentum
        expected = m * global_mean  # running mean starts at 0
        np.testing.assert_allclose(new_state.batch_stats["bn"]["mean"],
                                   expected, rtol=1e-5, atol=1e-6)
        # the halves genuinely differ: per-device moments would NOT match
        half_mean = h[:4].mean(0)
        assert not np.allclose(m * half_mean, expected, rtol=1e-3, atol=1e-5)
        # unbiased (Bessel) running var over the global batch size n=8
        var = h.var(0)
        np.testing.assert_allclose(new_state.batch_stats["bn"]["var"],
                                   (1 - m) * 1.0 + m * var * 8.0 / 7.0,
                                   rtol=1e-5)

    def test_fused_2dev_equals_fused_1dev(self):
        """GSPMD over 2 devices computes exactly the single-device program:
        same loss, same updated params (grad all-reduce), same BN stats."""
        assert len(jax.devices()) >= 2
        model, variables, batch = setup()
        s1, t1 = run_fused(model, variables, batch, n_dev=1)
        s2, t2 = run_fused(model, variables, batch, n_dev=2)
        np.testing.assert_allclose(t1, t2, rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            s1.params, s2.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            s1.batch_stats, s2.batch_stats)

    def test_flat_tail_fused_matches_tree_on_2dev_mesh(self):
        """The FLAT-tail fused step (the Trainer's default) executes on a
        real 2-device mesh with the same SyncBN global moments and the same
        updated params as the tree-form fused step."""
        assert len(jax.devices()) >= 2
        model, variables, batch = setup()
        st, tt = run_fused(model, variables, batch, n_dev=2)
        sf, tf = run_fused_flat(model, variables, batch, n_dev=2)
        np.testing.assert_allclose(tt, tf, rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            st.params, sf["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            st.batch_stats, sf["batch_stats"])

    def test_split_equals_fused_on_identical_per_device_batches(self):
        """When both devices see identical data, local-BN (split) and SyncBN
        (fused) agree — the split≡fused bridge on a REAL 2-device mesh."""
        assert len(jax.devices()) >= 2
        model, variables, batch = setup(n_batch=4)
        # duplicate the 4-sample batch across both devices: shards identical
        dup = Batch(*[np.concatenate([np.asarray(x)] * 2, 0) for x in batch])

        sf, tf = run_fused(model, variables, dup, n_dev=2)

        mesh = make_mesh(2)
        tc = TrainConfig(max_boxes=4)
        tx = optax.sgd(1.0)
        _, sharded_grads, reduce_fn = make_split_train_step(
            model, mse_criterion, tx, tc, mesh)
        gfn = jax.jit(sharded_grads)
        rfn = jax.jit(reduce_fn)
        state = make_state(variables, tx)
        dat = data_sharding(mesh)
        dbatch = Batch(*[jax.device_put(x, dat) for x in dup])
        g, lb_stacked, s = gfn(state.params, state.batch_stats, dbatch)
        new_state, lb = rfn(state, g, lb_stacked, s, jnp.float32(1e-2))
        ss = jax.device_get(new_state)

        np.testing.assert_allclose(tf, float(lb.total), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            sf.params, ss.params)
        # NOTE: running-var differs by design: fused uses Bessel n/(n-1) with
        # the GLOBAL n=8, split with the local n=4 — exactly torch
        # SyncBN-vs-local semantics.  Means agree:
        np.testing.assert_allclose(sf.batch_stats["bn"]["mean"],
                                   ss.batch_stats["bn"]["mean"], rtol=1e-5,
                                   atol=1e-7)
