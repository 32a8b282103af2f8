"""Fused train-mode stem (ops/pallas_stem_train.py, interpret mode on CPU).

Pins: (a) the fused forward equals the XLA decomposition (conv + train-BN +
ReLU + maxpool, `models/blocks.py::ConvMaxpool` /
`/root/reference/nets/yolo_mul.py:104-115`) including negative-gamma channels
(the minpool branch); (b) gradients w.r.t. x / kernel / gamma / beta agree
(the custom VJP differentiates the reference decomposition, so agreement is
by construction — the test guards the wiring); (c) the module backends are
checkpoint-identical and numerically interchangeable in train AND eval mode;
(d) shard_map SyncBN (axis_name) matches global-batch statistics.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dcfa_yolo_tpu.models.blocks import ConvMaxpool
from dcfa_yolo_tpu.ops.pallas_stem_train import (
    _reference_stem,
    fused_train_stem,
)

EPS = 1e-5


def _data(seed=0, b=2, h=32, w=256):
    rng = np.random.Generator(np.random.PCG64(seed))
    x = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.2, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)
    return x, k, gamma, beta


def test_fused_matches_reference_f32():
    x, k, gamma, beta = _data()
    assert int((gamma < 0).sum()) > 0  # the minpool branch must be exercised
    y_f, m_f, v_f = jax.jit(
        lambda *a: fused_train_stem(*a, EPS, None, True))(x, k, gamma, beta)
    y_r, m_r, v_r = jax.jit(
        lambda *a: _reference_stem(*a, EPS, None))(x, k, gamma, beta)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), atol=1e-5)


def test_fused_grads_match_reference_f32():
    x, k, gamma, beta = _data(seed=1)

    def make_loss(fn):
        def loss(x, k, g, b):
            y, _, _ = fn(x, k, g, b)
            wgt = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                          .reshape(y.shape))
            return jnp.sum(y * wgt)
        return loss

    gf = jax.jit(jax.grad(make_loss(
        lambda *a: fused_train_stem(*a, EPS, None, True)),
        argnums=(0, 1, 2, 3)))(x, k, gamma, beta)
    gr = jax.jit(jax.grad(make_loss(
        lambda *a: _reference_stem(*a, EPS, None)),
        argnums=(0, 1, 2, 3)))(x, k, gamma, beta)
    for a, b in zip(gf, gr):
        scale = float(jnp.abs(b).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4 * scale)


def test_module_backends_checkpoint_identical_and_agree():
    rng = np.random.Generator(np.random.PCG64(2))
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.float32)
    mx = ConvMaxpool(16, backend="xla")
    mp = ConvMaxpool(16, backend="pallas", stem_interpret=True)
    vx = mx.init(jax.random.PRNGKey(7), x, train=True)
    vp = mp.init(jax.random.PRNGKey(7), x, train=True)

    assert (jax.tree_util.tree_structure(vx)
            == jax.tree_util.tree_structure(vp))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), vx, vp)

    yx, sx = mx.apply(vx, x, train=True, mutable=["batch_stats"])
    yp, sp = mp.apply(vp, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-6), sx, sp)

    # eval mode through the updated stats
    ex = mx.apply({**vx, **sx}, x, train=False)
    ep = mp.apply({**vp, **sp}, x, train=False)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(ep),
                               rtol=1e-5, atol=1e-6)

    # param grads through the module
    def loss(m, params, stats):
        y = m.apply({"params": params, **stats}, x, train=True,
                    mutable=["batch_stats"])[0]
        wgt = jnp.sin(jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape))
        return jnp.sum(y * wgt)

    gx = jax.grad(lambda p: loss(mx, p, {"batch_stats": vx["batch_stats"]}))(
        vx["params"])
    gp = jax.grad(lambda p: loss(mp, p, {"batch_stats": vp["batch_stats"]}))(
        vp["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4,
            atol=1e-4 * (float(jnp.abs(a).max()) + 1e-9)), gx, gp)


def test_bf16_rounding_semantics():
    """bf16 mode: the fused path rounds the conv output to bf16 before stats
    and pooling, exactly like the XLA path's compute-dtype conv — outputs
    must agree to bf16 resolution."""
    x, k, gamma, beta = _data(seed=3)
    xb = x.astype(jnp.bfloat16)
    y_f, m_f, v_f = jax.jit(
        lambda *a: fused_train_stem(*a, EPS, None, True))(xb, k, gamma, beta)
    mx = ConvMaxpool(16, backend="xla", dtype=jnp.bfloat16)
    variables = {
        "params": {"conv": {"kernel": k},
                   "bn": {"scale": gamma, "bias": beta}},
        "batch_stats": {"bn": {"mean": jnp.zeros(16), "var": jnp.ones(16)}},
    }
    y_r, _ = mx.apply(variables, xb, train=True, mutable=["batch_stats"])
    assert y_f.dtype == jnp.bfloat16
    d = jnp.abs(y_f.astype(jnp.float32) - y_r.astype(jnp.float32))
    s = jnp.abs(y_r.astype(jnp.float32)).max()
    # bf16 has ~3 decimal digits; summation-order differences round visibly
    assert float(d.max()) <= 0.05 * float(s), (float(d.max()), float(s))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_gspmd_batch_sharded_matches_global():
    """The fused-step (GSPMD SyncBN) path: batch-sharded jit over a 2-device
    mesh routes through custom_partitioning (per-shard kernels + psum'd stat
    sums) and must reproduce the global-batch result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, k, gamma, beta = _data(seed=5, b=4)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    y_s, m_s, v_s = jax.jit(
        lambda *a: fused_train_stem(*a, EPS, None, True))(xs, k, gamma, beta)
    # reference: the plain decomposition on the unsharded batch
    y_g, m_g, v_g = jax.jit(
        lambda *a: _reference_stem(*a, EPS, None))(x, k, gamma, beta)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_g), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_g),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_shard_map_syncbn_matches_global():
    """axis_name SyncBN over 2 shards == single-device global batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    x, k, gamma, beta = _data(seed=4, b=4)
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("dp",))

    def local(xs, k, g, b):
        y, m, v = fused_train_stem(xs, k, g, b, EPS, "dp", True)
        return y, m, v

    y_s, m_s, v_s = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P(), P(), P()),
        out_specs=(P("dp"), P(), P()),
        check_vma=False))(x, k, gamma, beta)  # pallas_call can't declare vma
        # (same setting as the split train step, train/trainer.py:199)
    y_g, m_g, v_g = jax.jit(
        lambda *a: fused_train_stem(*a, EPS, None, True))(x, k, gamma, beta)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_g), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_g),
                               rtol=1e-5, atol=1e-5)
