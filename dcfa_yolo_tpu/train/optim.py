"""Optimizer construction mirroring the reference's three param groups
(`train_mul.py:246-259`): BN scales — no decay; conv/linear kernels — weight
decay; biases — no decay.  SGD is nesterov with torch-style coupled decay
(decay added to the gradient before the momentum buffer).

The LR is injected per-epoch through `optax.inject_hyperparams`, reproducing
`set_optimizer_lr` semantics.

Quirk note: the reference's group builder iterates `named_modules()` and only
collects `.weight`/`.bias` attributes, so the BiFPN fusion weights
(`bi_fpn.w`, `nets/yolo_mul.py:41`) end up in NO param group and are never
optimized.  Here they ARE trained (no decay) — set `train_bifpn=False` for
strict reference behavior.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from dcfa_yolo_tpu.config import TrainConfig

# Shared Adam constants: the flat-vector tail (`train/flat_opt.py`) must use
# the exact values of this tree path or the two silently diverge.
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def _path_has(path, *names: str) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    return any(n in keys for n in names)


def decay_mask(params) -> Any:
    """True for entries that get weight decay: conv kernels only."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: (
            getattr(path[-1], "key", "") == "kernel" and v.ndim >= 2
        ),
        params,
    )


def frozen_backbone_mask(params) -> Any:
    """True for params inside the two modal backbones (`Freeze_Train` support,
    `train_mul.py:231-237`)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _path_has(path, "backbone_rgb", "backbone_nir"),
        params,
    )


def bifpn_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _path_has(path, "bi_fpn"), params)


def build_optimizer(cfg: TrainConfig, params,
                    train_bifpn: bool = True) -> optax.GradientTransformation:
    """LR-agnostic transformation; the train step multiplies the final update by
    the epoch LR (equivalent to `optax.scale(-lr)`, but lets the LR be a plain
    scalar argument of the compiled step — no recompile per epoch)."""
    mask = decay_mask(params)

    chain = []
    if cfg.grad_clip_norm > 0:
        # reference clips grads before the step (`utils/utils_fit_mul.py:40`)
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.masked(optax.add_decayed_weights(cfg.weight_decay), mask))
    if cfg.optimizer_type == "sgd":
        chain.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
    elif cfg.optimizer_type == "adam":
        chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=ADAM_B2,
                                         eps=ADAM_EPS))
    else:
        raise ValueError(cfg.optimizer_type)

    if not train_bifpn:
        chain.append(optax.masked(optax.set_to_zero(), bifpn_mask(params)))

    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)
