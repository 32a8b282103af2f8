"""Self-check harness for the fused (SyncBN) multi-device train step.

The fused `make_train_step` is the multi-chip TPU default: one jit program,
batch sharded over the mesh, BatchNorm moments reduced by GSPMD over the
GLOBAL batch — the analogue of `convert_sync_batchnorm` at
`/root/reference/train_mul.py:193-196`.  The full model cannot execute that
program on multi-device XLA:CPU meshes (in-program collectives deadlock when
interleaved with convs on low-core hosts), so this module provides a conv-free
Dense+BN stand-in — using the exact BatchNorm module the real model uses —
that drives the REAL `make_train_step` (same jit wrapping, shardings, optax
update, EMA) anywhere.  Used by `__graft_entry__.dryrun_multichip` and
tests/test_fused_multidevice.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from dcfa_yolo_tpu.config import TrainConfig
from dcfa_yolo_tpu.ops.norm import TorchExactBatchNorm
from dcfa_yolo_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from dcfa_yolo_tpu.train.ema import init_ema
from dcfa_yolo_tpu.train.loss import LossBreakdown
from dcfa_yolo_tpu.train.trainer import Batch, TrainState, make_train_step


class TinyOut(NamedTuple):
    feats: Any


class TinyBNNet(nn.Module):
    """Conv-free stand-in with the DCFAYolo apply signature: Dense → BN → SiLU
    → Dense.  BN is the exact module the real model uses."""

    @nn.compact
    def __call__(self, rgb, nir, train: bool = False, **kw):
        x = jnp.concatenate([rgb, nir], axis=-1)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(16, use_bias=False, name="d1")(x)
        x = TorchExactBatchNorm(name="bn")(x, use_running_average=not train)
        x = nn.silu(x)
        x = nn.Dense(8, name="d2")(x)
        return TinyOut(feats=x)


def mse_criterion(feats, gt_boxes, gt_labels, gt_mask):
    t = jnp.mean(jnp.square(feats - 1.0))
    return LossBreakdown(total=t, box=t, cls=t * 0, dfl=t * 0)


def setup(n_batch=8, seed=0):
    """Model + init variables + a deterministic Batch of ``n_batch`` samples."""
    model = TinyBNNet()
    rng = np.random.Generator(np.random.PCG64(seed))
    rgb = rng.normal(size=(n_batch, 2, 2, 3)).astype(np.float32)
    nir = rng.normal(size=(n_batch, 2, 2, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(seed), rgb, nir, train=False)
    z = np.zeros((n_batch, 4, 1), np.float32)
    batch = Batch(rgb=rgb, nir=nir, gt_boxes=np.zeros((n_batch, 4, 4), np.float32),
                  gt_labels=z[..., 0], gt_mask=z[..., 0])
    return model, variables, batch


def make_state(variables, tx):
    params, stats = variables["params"], variables["batch_stats"]
    return TrainState(
        params=params, batch_stats=stats, opt_state=tx.init(params),
        ema=init_ema({"params": params, "batch_stats": stats}, 0))


def run_fused(model, variables, batch, n_dev, lr=1e-2):
    """One REAL fused train step over an ``n_dev`` mesh; returns
    (host TrainState, loss)."""
    mesh = make_mesh(n_dev)
    tc = TrainConfig(max_boxes=4)
    tx = optax.sgd(1.0)  # lr applied by the step itself
    step = make_train_step(model, mse_criterion, tx, tc)
    rep, dat = replicated(mesh), data_sharding(mesh)
    batch_sh = Batch(dat, dat, dat, dat, dat)
    jstep = jax.jit(step, in_shardings=(rep, batch_sh, None),
                    out_shardings=(rep, rep))
    state = make_state(variables, tx)
    dbatch = Batch(*[jax.device_put(np.asarray(x), dat) for x in batch])
    new_state, lb = jstep(state, dbatch, jnp.float32(lr))
    return jax.device_get(new_state), float(lb.total)


def run_fused_flat(model, variables, batch, n_dev, lr=1e-2):
    """Same step through make_flat_train_step — the Trainer's DEFAULT fused
    tail — over an ``n_dev`` mesh.  Returns (host materialized dict with
    'params'/'batch_stats' trees, loss)."""
    from dcfa_yolo_tpu.train.flat_opt import build_factors, init_flat_opt
    from dcfa_yolo_tpu.train.flat_opt import ravel_tree
    from dcfa_yolo_tpu.train.trainer import FlatTrainState, make_flat_train_step

    mesh = make_mesh(n_dev)
    # match run_fused's plain-SGD(lr) semantics: no decay/clip/momentum/EMA
    # ramp differences beyond what TrainConfig carries — use the same config
    tc = TrainConfig(max_boxes=4, weight_decay=0.0, grad_clip_norm=0.0,
                     momentum=0.0, nesterov=False)
    factors = build_factors(variables["params"], variables["batch_stats"])
    step = make_flat_train_step(model, mse_criterion, tc, factors)
    rep, dat = replicated(mesh), data_sharding(mesh)
    batch_sh = Batch(dat, dat, dat, dat, dat)
    jstep = jax.jit(step, in_shardings=(rep, batch_sh, None),
                    out_shardings=(rep, rep))
    flat_p = jax.jit(ravel_tree)(variables["params"])
    flat_s = jax.jit(ravel_tree)(variables["batch_stats"])
    fs = FlatTrainState(
        flat_params=flat_p, flat_stats=flat_s,
        opt=init_flat_opt(tc, factors.n_params),
        ema_p=jnp.array(flat_p, copy=True), ema_s=jnp.array(flat_s, copy=True),
        ema_updates=jnp.asarray(0, jnp.int32))
    dbatch = Batch(*[jax.device_put(np.asarray(x), dat) for x in batch])
    new_fs, lb = jstep(fs, dbatch, jnp.float32(lr))
    out = {"params": factors.unravel_p(new_fs.flat_params),
           "batch_stats": factors.unravel_s(new_fs.flat_stats)}
    return jax.device_get(out), float(lb.total)
