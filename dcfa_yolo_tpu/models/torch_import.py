"""PyTorch checkpoint → flax variables importer.

Maps the reference's state_dict key space (`nets/yolo_mul.py`, `nets/repghost.py`)
onto this package's flax parameter tree, transposing OIHW conv kernels to HWIO.
Also implements the single-modal → dual-modal weight surgery of
`train_mul.py:143-171` (a `backbone.*` key loads into BOTH `backbone_rgb` and
`backbone_nir`), with shape checking and a report of unmatched keys.

The frozen DFL conv (`nets/yolo_mul.py:312-322`, weights = arange(16)) has no
parameters here — DFL is the pure function `models.blocks.dfl_decode`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# key mapping
# ---------------------------------------------------------------------------

_BN_SUFFIX = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# (torch regex, flax path template).  "{bn}" expands per _BN_SUFFIX; "{conv}"
# expands to kernel (+bias when the torch conv has one).
_SHUFFLE_IDX = {  # torch Sequential index → our name
    "branch1.0": "b1_dwconv", "branch1.1": "b1_bn1",
    "branch1.2": "b1_conv2", "branch1.3": "b1_bn2",
    "branch2.0": "b2_conv1", "branch2.1": "b2_bn1",
    "branch2.3": "b2_dwconv", "branch2.4": "b2_bn2",
    "branch2.5": "b2_conv3", "branch2.6": "b2_bn3",
}


def _map_cbam(rest: str) -> Optional[List[str]]:
    # channelattention.fc1.weight / spatialattention.conv1.weight
    m = re.fullmatch(r"(channelattention)\.(fc1|fc2)\.weight", rest)
    if m:
        return [m.group(1), m.group(2), "kernel"]
    m = re.fullmatch(r"(spatialattention)\.conv1\.weight", rest)
    if m:
        return [m.group(1), "conv1", "kernel"]
    return None


def _map_convbn(rest: str, name: str) -> Optional[Tuple[str, List[str]]]:
    """Reference `Conv` block `<name>.conv.weight` / `<name>.bn.*`."""
    m = re.fullmatch(r"conv\.weight", rest)
    if m:
        return ("params", [name, "conv", "kernel"])
    m = re.fullmatch(r"bn\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, [name, "bn", leaf])
    return None


def _map_ghost_module(rest: str) -> Optional[Tuple[str, List[str]]]:
    """RepGhostModule key space (`nets/repghost.py:70-115`)."""
    m = re.fullmatch(r"primary_conv\.0\.weight", rest)
    if m:
        return ("params", ["primary_conv", "kernel"])
    m = re.fullmatch(r"primary_conv\.1\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, ["primary_bn", leaf])
    m = re.fullmatch(r"fusion_bn\.0\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, ["fusion_bn", leaf])
    m = re.fullmatch(r"cheap_operation\.0\.(weight|bias)", rest)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", ["cheap_conv", leaf])
    m = re.fullmatch(r"cheap_operation\.1\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, ["cheap_bn", leaf])
    # deploy-mode checkpoint: cheap_operation is a bare biased conv
    m = re.fullmatch(r"cheap_operation\.(weight|bias)", rest)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", ["cheap_conv", leaf])
    return None


def _map_bottleneck(rest: str) -> Optional[Tuple[str, List[str]]]:
    """RepGhostBottleneck key space (`nets/repghost.py:178-279`)."""
    m = re.fullmatch(r"(ghost1|ghost2)\.(.+)", rest)
    if m:
        sub = _map_ghost_module(m.group(2))
        if sub:
            coll, path = sub
            return (coll, [m.group(1)] + path)
    m = re.fullmatch(r"conv_dw\.weight", rest)
    if m:
        return ("params", ["conv_dw", "kernel"])
    m = re.fullmatch(r"bn_dw\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, ["bn_dw", leaf])
    m = re.fullmatch(r"se\.(conv_reduce|conv_expand)\.(weight|bias)", rest)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("params", ["se", m.group(1), leaf])
    shortcut_idx = {"0": ("sc_dwconv", "conv"), "1": ("sc_bn1", "bn"),
                    "2": ("sc_conv", "conv"), "3": ("sc_bn2", "bn")}
    m = re.fullmatch(r"shortcut\.(\d)\.(\w+)", rest)
    if m and m.group(1) in shortcut_idx:
        name, kind = shortcut_idx[m.group(1)]
        if kind == "conv" and m.group(2) == "weight":
            return ("params", [name, "kernel"])
        if kind == "bn" and m.group(2) in _BN_SUFFIX:
            coll, leaf = _BN_SUFFIX[m.group(2)]
            return (coll, [name, leaf])
    return None


def _map_c2f(rest: str) -> Optional[Tuple[str, List[str]]]:
    """C2f_repghost key space (`nets/repghost.py:308-320`)."""
    m = re.fullmatch(r"(cv1|cv2)\.(.+)", rest)
    if m:
        return _map_convbn(m.group(2), m.group(1))
    m = re.fullmatch(r"m\.(\d+)\.(.+)", rest)
    if m:
        sub = _map_bottleneck(m.group(2))
        if sub:
            coll, path = sub
            return (coll, [f"m{m.group(1)}"] + path)
    return None


def _map_backbone(rest: str) -> Optional[Tuple[str, List[str]]]:
    """Backbone key space (`nets/yolo_mul.py:252-308`)."""
    m = re.fullmatch(r"stem\.conv\.0\.weight", rest)
    if m:
        return ("params", ["stem", "conv", "kernel"])
    m = re.fullmatch(r"stem\.conv\.1\.(\w+)", rest)
    if m and m.group(1) in _BN_SUFFIX:
        coll, leaf = _BN_SUFFIX[m.group(1)]
        return (coll, ["stem", "bn", leaf])
    m = re.fullmatch(r"(dark[2-5])\.0\.(.+)", rest)
    if m:
        return _map_convbn(m.group(2), f"{m.group(1)}_conv")
    m = re.fullmatch(r"(dark[2-5])\.1\.(branch[12]\.\d)\.(\w+)", rest)
    if m and m.group(2) in _SHUFFLE_IDX:
        name = _SHUFFLE_IDX[m.group(2)]
        leaf = m.group(3)
        prefix = [f"{m.group(1)}_shuffle", name]
        if name.endswith(("dwconv", "conv1", "conv2", "conv3")):
            if leaf == "weight":
                return ("params", prefix + ["kernel"])
            if leaf == "bias":
                return ("params", prefix + ["bias"])
        elif leaf in _BN_SUFFIX:
            coll, l = _BN_SUFFIX[leaf]
            return (coll, prefix + [l])
    m = re.fullmatch(r"dark5\.2\.(cv1|cv2)\.(.+)", rest)
    if m:
        sub = _map_convbn(m.group(2), m.group(1))
        if sub:
            coll, path = sub
            return (coll, ["dark5_sppf"] + path)
    m = re.fullmatch(r"dark5\.2\.(cbam[1-4])\.(.+)", rest)
    if m:
        sub = _map_cbam(m.group(2))
        if sub:
            return ("params", ["dark5_sppf", m.group(1)] + sub)
    return None


def torch_key_to_flax(key: str) -> Optional[Tuple[str, Tuple[str, ...]]]:
    """Map one torch state_dict key to (collection, flax path).  None = skip."""
    if key.endswith("num_batches_tracked") or key.startswith("dfl."):
        return None
    m = re.fullmatch(r"(backbone_rgb|backbone_nir)\.(.+)", key)
    if m:
        sub = _map_backbone(m.group(2))
        if sub:
            coll, path = sub
            return (coll, tuple([m.group(1)] + path))
        return None
    m = re.fullmatch(r"(cbam_(?:rgb|nir)_feat[123])\.(.+)", key)
    if m:
        sub = _map_cbam(m.group(2))
        if sub:
            return ("params", tuple([m.group(1)] + sub))
        return None
    if key == "bi_fpn.w":
        return ("params", ("bi_fpn", "w"))
    m = re.fullmatch(r"(conv3_for_(?:up|down)sample[12])\.(.+)", key)
    if m:
        sub = _map_c2f(m.group(2))
        if sub:
            coll, path = sub
            return (coll, tuple([m.group(1)] + path))
        return None
    m = re.fullmatch(r"(down_sample[12])\.(.+)", key)
    if m:
        sub = _map_convbn(m.group(2), m.group(1))
        if sub:
            coll, path = sub
            return (coll, tuple(path))
        return None
    m = re.fullmatch(r"(cv[23])\.(\d)\.([01])\.(.+)", key)
    if m:
        sub = _map_convbn(m.group(4), f"{m.group(1)}_{m.group(2)}_{m.group(3)}")
        if sub:
            coll, path = sub
            return (coll, tuple(path))
        return None
    m = re.fullmatch(r"(cv[23])\.(\d)\.2\.(weight|bias)", key)
    if m:
        leaf = "kernel" if m.group(3) == "weight" else "bias"
        return ("params", (f"{m.group(1)}_{m.group(2)}_2", leaf))
    return None


# ---------------------------------------------------------------------------
# value transforms + tree assembly
# ---------------------------------------------------------------------------


def _to_flax_value(torch_value: np.ndarray, flax_shape: Tuple[int, ...]) -> np.ndarray:
    v = np.asarray(torch_value, dtype=np.float32)
    if v.ndim == 4:  # conv kernel OIHW → HWIO
        v = v.transpose(2, 3, 1, 0)
    if v.shape != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {v.shape} vs flax {tuple(flax_shape)}")
    return v


def import_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables,
    duplicate_single_backbone: bool = True,
    strict: bool = False,
):
    """Fill a flax variables pytree from a torch state_dict.

    duplicate_single_backbone: apply the `train_mul.py:150-159` surgery — a
    checkpoint whose keys start with `backbone.` loads into both modal branches.
    Returns (new_variables, report) where report lists matched / skipped /
    missing keys.  strict=True raises if any model param was not filled.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    filled = dict(flat)
    hit = set()
    matched, skipped = [], []

    expanded: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if duplicate_single_backbone and k.startswith("backbone."):
            rest = k[len("backbone."):]
            expanded[f"backbone_rgb.{rest}"] = v
            expanded[f"backbone_nir.{rest}"] = v
        else:
            expanded[k] = v

    for k, v in expanded.items():
        dest = torch_key_to_flax(k)
        if dest is None:
            skipped.append(k)
            continue
        coll, path = dest
        full_path = (coll,) + path
        if full_path not in flat:
            skipped.append(k)
            continue
        filled[full_path] = _to_flax_value(v, flat[full_path].shape)
        hit.add(full_path)
        matched.append(k)

    missing = [p for p in flat if p not in hit]
    if strict and missing:
        raise ValueError(f"{len(missing)} flax params not filled, e.g. {missing[:5]}")
    new_vars = flax.traverse_util.unflatten_dict(filled)
    report = {"matched": matched, "skipped": skipped, "missing": missing}
    return flax.core.freeze(new_vars) if isinstance(variables, flax.core.FrozenDict) else new_vars, report


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (needs torch) or .npz dump into {key: np.ndarray}."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # host-side tool dependency only; never used in the compute path

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
