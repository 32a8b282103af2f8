"""Exponential moving average of model state (`ModelEMA`,
`nets/yolo_training.py:448-478`) as a pure pytree update.

Like the torch version, the EMA covers *all* floating state — params and BN
running stats — with decay ramp d(u) = decay · (1 - e^(-u/tau)).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    variables: Any        # {"params": ..., "batch_stats": ...}
    updates: jnp.ndarray  # scalar int32


def init_ema(variables, updates: int = 0) -> EMAState:
    # NOTE: must materialize fresh buffers — `astype(float32)` on fp32 leaves
    # the EMA aliasing the live params, which breaks donation (the train step
    # would donate the same buffer twice).
    ema_vars = jax.tree_util.tree_map(
        lambda x: jnp.array(x, dtype=jnp.float32, copy=True), variables)
    return EMAState(variables=ema_vars, updates=jnp.asarray(updates, jnp.int32))


def update_ema(state: EMAState, variables, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new_vars = jax.tree_util.tree_map(
        lambda e, v: e * d + (1.0 - d) * v.astype(jnp.float32),
        state.variables, variables)
    return EMAState(variables=new_vars, updates=updates)
