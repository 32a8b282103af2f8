"""Checkpoint save/load.

The reference saves raw `state_dict` .pth files (best/last/periodic,
`utils/utils_fit_mul.py:108-121`) and resumes by hand-setting `model_path` +
`Init_Epoch`.  Here checkpoints are msgpack-serialized pytrees that bundle
params, BN stats, EMA, optimizer state and the epoch counter — so resume is
exact (an improvement noted in SURVEY §5).  Torch `.pth`/`.npz` checkpoints are
importable via `models.torch_import` for parity with reference weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # to_state_dict flattens tuples/namedtuples (e.g. optax chain states) into
    # plain dicts msgpack can serialize
    state = serialization.to_state_dict(_to_numpy_tree(payload))
    data = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        from flax import serialization

        return serialization.msgpack_restore(f.read())


def restore_into(target, state_dict):
    """Rebuild a typed pytree (e.g. an optax state) from a loaded state dict."""
    from flax import serialization

    return serialization.from_state_dict(target, state_dict)


def load_variables(path: str, variables_template=None, duplicate_single_backbone: bool = True):
    """Load model variables from a native checkpoint (.ckpt/.msgpack) or a torch
    checkpoint (.pth/.npz, via the importer; requires a template for shapes)."""
    if path.endswith((".pth", ".npz")):
        from dcfa_yolo_tpu.models.torch_import import (
            import_state_dict,
            load_torch_checkpoint,
        )

        assert variables_template is not None, "torch import needs a variables template"
        sd = load_torch_checkpoint(path)
        variables, _ = import_state_dict(
            sd, variables_template, duplicate_single_backbone=duplicate_single_backbone)
        return variables
    ckpt = load_checkpoint(path)
    if "params" in ckpt:  # full training checkpoint → prefer EMA weights if present
        if "ema" in ckpt and ckpt["ema"]:
            return {"params": ckpt["ema"]["params"],
                    "batch_stats": ckpt["ema"].get("batch_stats", ckpt.get("batch_stats", {}))}
        return {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}
    return ckpt
