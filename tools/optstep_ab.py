"""A/B the optimizer+EMA tail of the train step: tree ops vs flat vectors.

The fused train step's residual beyond fwd+bwd (~16 ms of the 97.6 ms b16
step, tools/train_breakdown.py) is suspected to be launch-bound: the optax
chain + EMA touch ~1500 param leaves with several tiny elementwise kernels
each.  The whole chain (clip-by-global-norm -> masked coupled weight decay ->
nesterov momentum -> EMA ramp) is expressible on ONE flat f32 vector with a
precomputed decay mask, turning ~10k tiny kernels into ~10 big ones.

Variants measured (real phi='n' param shapes, donated-state chains):
  A tree:       tx.update + apply_updates + update_ema on the pytree
  B flat+ravel: grads arrive as a tree (as jax.grad produces) and are
                raveled in-jit, then flat math
  C flat:       grads already flat (the integrated flat-trainer design where
                loss_fn takes flat params and jax.grad emits a flat cotangent)

If C (or B) wins by >5 ms on the real chip, a flat-state trainer mode is
worth building; otherwise this documents why the tree form stays.

Measured (v5e, round 2): A = 7.3-10.7 ms, B = 0.96 ms, C = 0.71 ms, with
BIT-IDENTICAL params (max|diff| 0.00e+00).  Follow-up: integrating the flat
tail into the full fused train step (train/flat_opt.py, now the default)
improved the end-to-end step only 97.0 -> 96.6 ms — XLA already fuses most
of the per-leaf tree-tail ops into the backward kernels, so the standalone
win does not transfer; the step is fwd+bwd bound.
(The first B/C attempts aliased params and EMA to one donated buffer —
axon reports that as an opaque InvalidArgument, CPU names it "donate the
same buffer twice"; fixed with explicit copies.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.train.ema import init_ema, update_ema
from dcfa_yolo_tpu.train.optim import build_optimizer, decay_mask


def time_chain(fn, state, n_iters=50, n_trials=3):
    """fn(state) -> state, donated; chain by reuse, sync by final fetch."""
    jfn = jax.jit(fn, donate_argnums=(0,))
    state = jfn(state)
    for _ in range(5):
        state = jfn(state)
    jax.block_until_ready(state)
    first = jax.tree_util.tree_leaves(state)[0]
    float(jnp.sum(first))
    trials = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state = jfn(state)
        float(jnp.sum(jax.tree_util.tree_leaves(state)[0]))
        trials.append((time.perf_counter() - t0) / n_iters)
    return sorted(trials)[1]


def main():
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640),
                      compute_dtype="bfloat16")
    tc = TrainConfig()
    _, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    # host snapshot FIRST: the donated chains below consume the device buffers
    p_host = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = jax.device_put(p_host)
    tx = build_optimizer(tc, params, True)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    flat0, unravel = ravel_pytree(p_host)
    print(f"params: {n_leaves} leaves, {flat0.size/1e6:.2f}M elements",
          flush=True)

    rng = np.random.Generator(np.random.PCG64(0))
    g_host = jax.tree_util.tree_map(
        lambda x: (rng.standard_normal(x.shape) * 1e-3).astype(np.float32),
        p_host)
    lr = jnp.float32(1e-2)

    # ---------------- A: tree path (the current trainer tail) --------------
    ema0 = init_ema({"params": params}, 0)
    stateA = (params, jax.jit(tx.init)(params), ema0,
              jax.device_put(g_host))

    def tree_tail(s):
        p, opt, ema, g = s
        updates, new_opt = tx.update(g, opt, p)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        new_p = optax.apply_updates(p, updates)
        new_ema = update_ema(ema, {"params": new_p}, tc.ema_decay, tc.ema_tau)
        return new_p, new_opt, new_ema, g

    dtA = time_chain(tree_tail, stateA)
    print(f"A tree opt+EMA        : {dtA*1e3:7.2f} ms", flush=True)

    # ---------------- flat math (identical chain semantics) ----------------
    dmask_flat = jnp.asarray(ravel_pytree(
        jax.tree_util.tree_map(
            lambda m, x: np.full(np.shape(x), m, np.float32),
            decay_mask(p_host), p_host)
    )[0])
    wd, mom, clip = tc.weight_decay, tc.momentum, tc.grad_clip_norm
    decay, tau = tc.ema_decay, tc.ema_tau

    def flat_math(p, trace, ema_p, upd_count, g):
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        g = g + wd * p * dmask_flat
        new_trace = mom * trace + g
        upd = g + mom * new_trace  # nesterov (optax.trace semantics)
        new_p = p - lr * upd
        n = upd_count + 1
        d = decay * (1.0 - jnp.exp(-n.astype(jnp.float32) / tau))
        new_ema = ema_p * d + (1.0 - d) * new_p
        return new_p, new_trace, new_ema, n

    # ---------------- B: flat with in-jit ravel of tree grads --------------
    g_dev = jax.device_put(g_host)  # NOT donated: captured as closure consts
    # distinct buffers: asarray would alias flat0 for params AND ema,
    # which the donated call rejects ("donate the same buffer twice")
    stateB = (jnp.array(flat0, copy=True), jnp.zeros_like(flat0),
              jnp.array(flat0, copy=True), jnp.asarray(0, jnp.int32))

    def flat_tail_ravel(s):
        p, trace, ema_p, n = s
        g = ravel_pytree(g_dev)[0]
        return flat_math(p, trace, ema_p, n, g)

    try:
        dtB = time_chain(flat_tail_ravel, stateB)
        print(f"B flat (ravel grads)  : {dtB*1e3:7.2f} ms", flush=True)
    except Exception as e:  # axon has rejected this variant before
        print(f"B flat (ravel grads)  : FAILED ({type(e).__name__}: {e})",
              flush=True)

    # ---------------- C: flat with flat grads -----------------------------
    gflat = jnp.asarray(ravel_pytree(g_host)[0])
    stateC = (jnp.array(flat0, copy=True), jnp.zeros_like(flat0),
              jnp.array(flat0, copy=True), jnp.asarray(0, jnp.int32))

    def flat_tail(s):
        p, trace, ema_p, n = s
        return flat_math(p, trace, ema_p, n, gflat)

    try:
        dtC = time_chain(flat_tail, stateC)
        print(f"C flat (flat grads)   : {dtC*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"C flat (flat grads)   : FAILED ({type(e).__name__}: {e})",
              flush=True)

    # numerical agreement check: A's params after 1 step == flat math's
    pfresh = jax.device_put(p_host)
    pA = jax.jit(tree_tail)((pfresh, jax.jit(tx.init)(pfresh),
                             init_ema({"params": pfresh}, 0),
                             jax.device_put(g_host)))[0]
    pA_flat = ravel_pytree(jax.tree_util.tree_map(np.asarray, pA))[0]
    pC = jax.jit(flat_tail)(
        (jnp.array(flat0, copy=True), jnp.zeros_like(flat0),
         jnp.array(flat0, copy=True), jnp.asarray(0, jnp.int32)))[0]
    err = float(jnp.max(jnp.abs(pA_flat - np.asarray(pC))))
    print(f"tree-vs-flat param max|diff| after 1 step: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
