"""Flat-vector optimizer + EMA tail for the fused train step.

The tree-form optax chain + EMA touch ~900 param/stat leaves with several
tiny elementwise kernels each — 7.3 ms as a STANDALONE program on the v5e
vs 0.7 ms for the same math on one raveled f32 vector, bit-identical
(tools/optstep_ab.py).  Inside the full fused train step XLA already fuses
most of those per-leaf ops into the backward kernels, so the end-to-end win
is ~0.5-1 ms (97.0 -> 96.6 ms/step); the flat form stays the default
because it is never slower, shrinks the donated train state to 6 device
buffers, and makes the optimizer semantics explicit in one tested place.
This module replicates `build_optimizer`'s exact chain semantics on flat
vectors:

    clip_by_global_norm -> masked coupled weight decay (kernels only)
    -> nesterov SGD momentum | Adam -> optional BiFPN update zeroing
    -> scale(-1)

plus the EMA decay ramp (`train/ema.py`) over params AND BatchNorm running
stats.  Masks are precomputed once from the parameter STRUCTURE (no device
fetches).  Equivalence with the optax tree path is pinned by
tests/test_flat_opt.py and by the trainer-mode split≡fused tests.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from dcfa_yolo_tpu.config import TrainConfig
from dcfa_yolo_tpu.train.optim import bifpn_mask, decay_mask, frozen_backbone_mask


class FlatSGD(NamedTuple):
    trace: jnp.ndarray          # (P,) momentum buffer


class FlatAdam(NamedTuple):
    count: jnp.ndarray          # () int32
    mu: jnp.ndarray             # (P,)
    nu: jnp.ndarray             # (P,)


class FlatFactors(NamedTuple):
    """Static factors of the flat tail (host-built, no device fetches)."""

    unravel_p: Callable         # flat (P,) -> params tree
    unravel_s: Callable         # flat (S,) -> batch_stats tree
    n_params: int
    n_stats: int
    decay: np.ndarray           # (P,) f32: 1 where weight decay applies
    live_bifpn: np.ndarray      # (P,) f32: 0 on bi_fpn.w when it is untrained
    live_frozen: np.ndarray     # (P,) f32: 0 inside the modal backbones


def _zeros_like_struct(tree):
    return jax.tree_util.tree_map(
        lambda x: np.zeros(np.shape(x), np.asarray(x).dtype
                           if isinstance(x, np.ndarray) else x.dtype), tree)


def _flat_mask(mask_tree, struct_tree) -> np.ndarray:
    """Pure-numpy flat mask in ravel_pytree order (tree_leaves order, each
    leaf C-raveled) — no device traffic."""
    ms = jax.tree_util.tree_leaves(mask_tree)
    xs = jax.tree_util.tree_leaves(struct_tree)
    return np.concatenate([
        np.full(int(np.prod(np.shape(x), dtype=np.int64)),
                1.0 if m else 0.0, np.float32)
        for m, x in zip(ms, xs)])


def build_factors(params_struct, stats_struct,
                  train_bifpn: bool = True) -> FlatFactors:
    """Build from SHAPE structures (e.g. jax.eval_shape output or host
    zeros) — never touches device data."""
    p0 = _zeros_like_struct(params_struct)
    s0 = _zeros_like_struct(stats_struct)
    n_p = sum(int(np.prod(np.shape(x), dtype=np.int64))
              for x in jax.tree_util.tree_leaves(p0))
    n_s = sum(int(np.prod(np.shape(x), dtype=np.int64))
              for x in jax.tree_util.tree_leaves(s0))
    # unravel closures from host zeros; the throwaway flat zeros do land on
    # the default device once (~10 MB), which is fine as a one-time cost
    _, unravel_p = ravel_pytree(p0)
    _, unravel_s = ravel_pytree(s0)
    dm = _flat_mask(decay_mask(p0), p0)
    bi = 1.0 - _flat_mask(bifpn_mask(p0), p0) \
        if not train_bifpn else np.ones_like(dm)
    fr = 1.0 - _flat_mask(frozen_backbone_mask(p0), p0)
    return FlatFactors(unravel_p=unravel_p, unravel_s=unravel_s,
                       n_params=n_p, n_stats=n_s,
                       decay=dm, live_bifpn=bi, live_frozen=fr)


def init_flat_opt(cfg: TrainConfig, n_params: int):
    if cfg.optimizer_type == "sgd":
        return FlatSGD(trace=jnp.zeros((n_params,), jnp.float32))
    if cfg.optimizer_type == "adam":
        return FlatAdam(count=jnp.zeros((), jnp.int32),
                        mu=jnp.zeros((n_params,), jnp.float32),
                        nu=jnp.zeros((n_params,), jnp.float32))
    raise ValueError(cfg.optimizer_type)


def flat_update(cfg: TrainConfig, factors: FlatFactors, g: jnp.ndarray,
                p: jnp.ndarray, opt, freeze_backbone: bool = False):
    """One optimizer step on flat vectors; returns (updates, new_opt) where
    ``new_p = p + lr * updates`` (the scale(-1) is already applied, matching
    the tree step's `updates * lr` + `apply_updates`)."""
    live = jnp.asarray(factors.live_frozen) if freeze_backbone else None
    if live is not None:
        g = g * live
    if cfg.grad_clip_norm > 0:
        # optax.clip_by_global_norm, operation-order exact:
        # select(gn < max, g, (g / gn) * max)
        gn = jnp.sqrt(jnp.sum(g * g))
        g = jnp.where(gn < cfg.grad_clip_norm, g,
                      (g / gn) * cfg.grad_clip_norm)
    if cfg.weight_decay > 0:
        g = g + cfg.weight_decay * p * jnp.asarray(factors.decay)
    if isinstance(opt, FlatSGD):
        new_trace = g + cfg.momentum * opt.trace
        upd = g + cfg.momentum * new_trace if cfg.nesterov else new_trace
        if live is not None:
            new_trace = new_trace * live
        new_opt = FlatSGD(trace=new_trace)
    else:
        from dcfa_yolo_tpu.train.optim import ADAM_B2, ADAM_EPS
        b1, b2, eps = cfg.momentum, ADAM_B2, ADAM_EPS
        count = opt.count + 1
        mu = (1.0 - b1) * g + b1 * opt.mu
        nu = (1.0 - b2) * (g * g) + b2 * opt.nu
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
        if live is not None:
            mu, nu = mu * live, nu * live
        new_opt = FlatAdam(count=count, mu=mu, nu=nu)
    upd = upd * jnp.asarray(factors.live_bifpn)
    if live is not None:
        upd = upd * live
    return -upd, new_opt


def flat_ema(ema_vec: jnp.ndarray, new_vec: jnp.ndarray,
             updates: jnp.ndarray, decay: float, tau: float):
    """EMA ramp d(u) = decay * (1 - e^(-u/tau)) on one flat vector
    (`train/ema.py::update_ema` semantics).  Caller increments `updates`
    ONCE per step and passes the incremented value."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return ema_vec * d + (1.0 - d) * new_vec


def ravel_tree(tree) -> jnp.ndarray:
    """In-jit ravel (the measured-cheap variant B of tools/optstep_ab.py)."""
    return ravel_pytree(tree)[0]
