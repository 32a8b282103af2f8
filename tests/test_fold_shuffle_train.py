"""Folded-space TRAINING (`train.py --fold-shuffle`).

The backbones' channel_shuffles are pure permutations, so training with them
folded into consumer weights (reparam.fold_shuffle_variables) must follow
EXACTLY the unfolded trajectory, permuted: the optimizer (SGD momentum /
Adam), weight decay, EMA are elementwise and grad-clip's global norm is
permutation-invariant.  Only the convs' input-channel FP summation order
differs.  These tests pin (a) fold/unfold as exact inverses (bitwise), (b)
multi-step training equivalence in f32 incl. optimizer moments, (c) the
checkpoint surface staying canonical (unfolded) through fold_opt_state.

Tolerance design: the ONLY legitimate divergence source is conv input-channel
FP summation order (~1e-7 relative per forward), but Adam's g/sqrt(nu)
normalization can amplify a sub-LSB gradient difference on a near-zero
gradient element into a full +/-lr update (a sign flip), and steps 2-3 feed
the diverged params back through the loss.  A WIRING bug, by contrast,
mis-permutes whole channels: O(0.1-1) differences across ~half a kernel.  So
the asserts bound (a) the worst element by a hard cap ~ a few lr, and (b) the
FRACTION of elements beyond FP-noise scale — both orders of magnitude below
what any mis-wiring produces, yet robust to amplified summation noise.
"""

import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.reparam import (
    apply_shuffle_spec,
    fold_opt_state,
    fold_shuffle_variables,
    shuffle_fold_spec,
    unfold_shuffle_variables,
)
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.parallel.mesh import make_mesh
from dcfa_yolo_tpu.train.loss import pad_targets
from dcfa_yolo_tpu.train.trainer import Trainer


def tiny_setup(batch=2, seed=0):
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64),
                      compute_dtype="float32")
    model, variables = init_model(cfg, jax.random.PRNGKey(seed),
                                  batch_size=batch)
    rng = np.random.Generator(np.random.PCG64(seed))
    rgb = rng.random((batch, 64, 64, 3), np.float32)
    nir = rng.random((batch, 64, 64, 3), np.float32)
    labels = np.array([[j, 0, 0.5, 0.5, 0.4, 0.4] for j in range(batch)],
                      np.float32)
    gt = pad_targets(labels, batch, 4, (64, 64))
    return cfg, model, variables, rgb, nir, gt


def test_unfold_is_exact_inverse():
    _, _, variables, _, _, _ = tiny_setup()
    rt = unfold_shuffle_variables(fold_shuffle_variables(variables))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, rt)
    # and the fold is not the identity
    k0 = np.asarray(variables["params"]["backbone_rgb"]["dark3_conv"]["conv"]["kernel"])
    k1 = np.asarray(fold_shuffle_variables(variables)["params"]
                    ["backbone_rgb"]["dark3_conv"]["conv"]["kernel"])
    assert not np.array_equal(k0, k1)


def assert_updates_match(final_a, final_b, init, frac=0.01):
    """Two trained states match up to amplified FP-summation noise, NOT up to
    mis-wiring, judged on the UPDATES (final − init).

    A wiring bug (wrong permutation on some leaf axis) moves whole channels
    of the update — a large fraction of a leaf's elements differ at FULL
    update scale.  FP summation-order noise, even through Adam's g/sqrt(nu)
    amplification (which can flip the sign of a near-zero-gradient element's
    entire +/-lr update and wander ~20% of scale over 3 steps — measured),
    touches only rare elements at a fraction of the scale.  So per float
    leaf: at most `frac` of elements may differ by more than 25% of the
    leaf's max update magnitude (floored at 1e-5 absolute for no-op leaves).
    Int leaves (Adam count) must match exactly.  The per-step LOSS agreement
    asserted alongside carries the function-equality load at much tighter
    tolerance; this check only pins which SPACE each state tree lives in.
    Small leaves get an absolute allowance (2 elements) since Adam gives
    every element the same ~lr update magnitude and a (16,)-vector with one
    noise-dominated gradient element would otherwise flap the fraction.
    """
    def one(a, b, i0):
        a, b, i0 = np.asarray(a), np.asarray(b), np.asarray(i0)
        if not np.issubdtype(a.dtype, np.floating):
            np.testing.assert_array_equal(a, b)
            return
        d = np.abs(a - b)
        scale = np.abs(a - i0).max()
        thr = max(1e-5, 0.25 * float(scale))
        bad = int((d > thr).sum())
        allowed = max(2, int(frac * d.size))
        assert bad <= allowed, (
            f"{bad}/{d.size} elements differ beyond {thr:.2e} "
            f"(update scale {scale:.2e}, max diff {d.max():.2e})")

    jax.tree_util.tree_map(one, final_a, final_b, init)


@pytest.mark.parametrize("opt", ["sgd", "adam"])
def test_folded_training_matches_unfolded(opt):
    """3 fused steps, f32: unfold(folded trajectory) == unfolded trajectory.

    The per-step loss agreement (rtol 1e-3) pins that the folded graph
    computes the SAME function along the whole trajectory; the update
    comparison pins that every state tree (params, EMA, BN stats, optimizer
    moments) lives in the permuted space the spec claims.  SGD accumulates
    linearly, so its state stays comparable after 3 steps; Adam's g/sqrt(nu)
    normalization amplifies conv-summation FP noise chaotically once the
    diverged params feed back (measured: BN-param moments shift wholesale by
    step 3), and even at step 1 its update lr·g/(|g|+eps) is pure sign chaos
    for any element whose gradient is FP-noise-scale (measured: 10/16
    elements of one small leaf flip) — params/EMA mismatches there are
    Adam's own property, not the fold's.  So for Adam the state comparison
    runs after step 1 on the MOMENTS (linear in g, mu=(1-b1)g / nu=(1-b2)g²)
    and the BN stats; moments agreement + 3-step loss tracking jointly pin
    the trajectory."""
    cfg, model, variables, rgb, nir, gt = tiny_setup()
    tc = TrainConfig(max_boxes=4, optimizer_type=opt,
                     momentum=0.9 if opt == "adam" else 0.937)
    spec = shuffle_fold_spec(variables["params"])
    init_p = jax.tree_util.tree_map(np.asarray, variables["params"])
    init_bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    var_base = jax.tree_util.tree_map(lambda x: x.copy(), variables)
    tr_base = Trainer(model, var_base, tc, mesh=make_mesh(1))

    fmodel = DCFAYolo(cfg, fold_shuffle=True)
    var_fold = fold_shuffle_variables(
        jax.tree_util.tree_map(lambda x: x.copy(), variables))
    tr_fold = Trainer(fmodel, var_fold, tc, mesh=make_mesh(1))

    def compare_states(include_params: bool):
        st_b, st_f = tr_base.state, tr_fold.state
        if include_params:
            unfolded_p = apply_shuffle_spec(
                jax.tree_util.tree_map(np.asarray, st_f.params), spec,
                inverse=True)
            assert_updates_match(st_b.params, unfolded_p, init_p)
            # EMA params follow the same permutation
            unfolded_ema = apply_shuffle_spec(
                jax.tree_util.tree_map(np.asarray,
                                       st_f.ema.variables["params"]),
                spec, inverse=True)
            assert_updates_match(st_b.ema.variables["params"], unfolded_ema,
                                 init_p)
        # BN stats are untouched by the fold: must agree leaf-for-leaf
        assert_updates_match(st_b.batch_stats, st_f.batch_stats, init_bs)
        # optimizer moments (mu/nu or momentum trace) unfold to the base
        # ones — the checkpoint-resume surface of train.py --fold-shuffle.
        # Moments start at zero, so the moments themselves are the updates.
        opt_zero = jax.tree_util.tree_map(np.zeros_like, st_b.opt_state)
        opt_unfolded = fold_opt_state(
            jax.tree_util.tree_map(np.asarray, st_f.opt_state), spec,
            inverse=True)
        assert_updates_match(st_b.opt_state, opt_unfolded, opt_zero)

    for step in range(3):
        lb_b = tr_base.train_step(tr_base.put_batch(rgb, nir, *gt), 1e-3)
        lb_f = tr_fold.train_step(tr_fold.put_batch(rgb, nir, *gt), 1e-3)
        np.testing.assert_allclose(float(lb_b.total), float(lb_f.total),
                                   rtol=1e-3)
        if step == 0 and opt == "adam":
            compare_states(include_params=False)
    if opt == "sgd":
        compare_states(include_params=True)


def test_fold_opt_state_permutes_moment_leaves():
    """fold_opt_state must hit exactly the params-shaped subtrees: a permuted
    conv-kernel moment round-trips, and scalar leaves (Adam count) survive."""
    cfg, model, variables, _, _, _ = tiny_setup()
    tc = TrainConfig(max_boxes=4, optimizer_type="adam", momentum=0.9)
    from dcfa_yolo_tpu.train.optim import build_optimizer

    tx = build_optimizer(tc, variables["params"])
    opt_state = jax.tree_util.tree_map(
        np.asarray, jax.jit(tx.init)(variables["params"]))
    # make the moments distinguishable from zeros
    opt_state = jax.tree_util.tree_map(
        lambda a: (np.arange(a.size, dtype=np.float32).reshape(a.shape)
                   if getattr(a, "ndim", 0) >= 1 else a), opt_state)
    spec = shuffle_fold_spec(variables["params"])
    folded = fold_opt_state(opt_state, spec)
    rt = fold_opt_state(folded, spec, inverse=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        opt_state, rt)

    flat_f, _ = jax.tree_util.tree_flatten_with_path(folded)
    changed = [jax.tree_util.keystr(p) for p, v in flat_f
               if getattr(v, "ndim", 0) == 4
               and not np.array_equal(
                   v, leaf_by_path(opt_state, p))]
    assert changed, "fold_opt_state permuted no moment leaves"


def leaf_by_path(tree, path):
    """Walk a tree_flatten_with_path path: DictKey(.key), SequenceKey(.idx),
    GetAttrKey(.name, namedtuple optax states)."""
    node = tree
    for entry in path:
        if hasattr(entry, "name"):
            node = getattr(node, entry.name)
        elif hasattr(entry, "idx"):
            node = node[entry.idx]
        else:
            node = node[entry.key]
    return node
