"""RepGhost re-parameterization as a pure parameter transform.

The reference implements deploy fusion imperatively (`switch_to_deploy`,
`nets/repghost.py:117-175`) and never calls it from any script; here it is a
first-class pure function `deploy_variables(variables) -> variables'` producing
the parameter tree for `DCFAYolo(cfg, deploy=True)`, with
train-graph ≡ deploy-graph numerics (tested; BASELINE config #4).

Math (per RepGhostModule, all in HWIO depthwise layout (kh, kw, 1, C)):
    fused_kernel = K_dw * g_c/σ_c  +  pad_1x1→3x3(I * g_f/σ_f)
    fused_bias   = (β_c - μ_c g_c/σ_c) + (β_f - μ_f g_f/σ_f)
where (g, β, μ, σ²) are the cheap-BN (c) and fusion-BN (f) parameters/stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_BN_EPS = 1e-5  # RepGhost BNs use the torch default (`nets/repghost.py:100`)


def _fuse_bn(kernel, scale, bias, mean, var, eps=_BN_EPS):
    """Fold BN into a (kh, kw, i, o) kernel along the output-channel axis."""
    std = jnp.sqrt(var + eps)
    t = scale / std
    return kernel * t.reshape(1, 1, 1, -1), bias - mean * t


def _identity_dw_kernel_3x3(c: int, dtype) -> jnp.ndarray:
    """Depthwise identity as a 3x3 kernel (center tap 1), HWIO (3,3,1,C)."""
    k = np.zeros((3, 3, 1, c), dtype=np.float32)
    k[1, 1, 0, :] = 1.0
    return jnp.asarray(k, dtype=dtype)


def _fuse_ghost_module(params: Dict[str, Any], stats: Dict[str, Any]
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fuse one RepGhostModule subtree; returns (deploy_params, deploy_stats)."""
    new_p = dict(params)
    new_s = dict(stats)
    k_dw = params["cheap_conv"]["kernel"]
    c = k_dw.shape[-1]
    cb_p, cb_s = params["cheap_bn"], stats["cheap_bn"]
    kernel, bias = _fuse_bn(k_dw, cb_p["scale"], cb_p["bias"], cb_s["mean"], cb_s["var"])
    if "fusion_bn" in params:
        fb_p, fb_s = params["fusion_bn"], stats["fusion_bn"]
        ident = _identity_dw_kernel_3x3(c, k_dw.dtype)
        k2, b2 = _fuse_bn(ident, fb_p["scale"], fb_p["bias"], fb_s["mean"], fb_s["var"])
        kernel = kernel + k2
        bias = bias + b2
    new_p["cheap_conv"] = {"kernel": kernel, "bias": bias}
    new_p.pop("cheap_bn", None)
    new_p.pop("fusion_bn", None)
    new_s.pop("cheap_bn", None)
    new_s.pop("fusion_bn", None)
    return new_p, new_s


def _walk(params: Any, stats: Any) -> Tuple[Any, Any]:
    if not isinstance(params, dict):
        return params, stats
    if "cheap_conv" in params and "cheap_bn" in params:
        return _fuse_ghost_module(params, stats if isinstance(stats, dict) else {})
    new_p, new_s = {}, {}
    stats = stats if isinstance(stats, dict) else {}
    for k in params:
        p2, s2 = _walk(params[k], stats.get(k))
        new_p[k] = p2
        if s2 is not None and (not isinstance(s2, dict) or s2):
            new_s[k] = s2
    # keep stats-only subtrees (BNs without params shouldn't exist, but be safe)
    for k in stats:
        if k not in new_s and k not in params:
            new_s[k] = stats[k]
    return new_p, new_s


def _shuffle_inv_perm(c: int) -> np.ndarray:
    """Inverse of `channel_shuffle(·, groups=2)` as an index array.

    shuffle emits y[j] = z[(j % 2)·c/2 + j//2]; a consumer of y re-indexed to
    consume the UNSHUFFLED z needs its input-channel rows taken at
    inv[i] = 2i (i < c/2) else 2(i − c/2) + 1, the inverse permutation.
    """
    half = c // 2
    inv = np.empty(c, np.int64)
    inv[:half] = 2 * np.arange(half)
    inv[half:] = 2 * np.arange(half) + 1
    return inv


def shuffle_fold_spec(params):
    """The fold as data: [(path, axis, rows)] with fold = take(leaf, rows, axis).

    Every permutation the fold applies, keyed by the params-tree path it
    applies to, so the SAME spec can transform any params-structured tree —
    the params themselves, the EMA params, and the optimizer moment trees
    (Adam mu/nu, SGD trace mirror the params tree leaf-for-leaf, and the
    optimizer math is elementwise, hence permutation-equivariant).  The
    inverse (`apply_shuffle_spec(..., inverse=True)`) takes at argsort(rows).
    """
    spec = []
    for bk in ("backbone_rgb", "backbone_nir"):
        for consumer in ("dark3_conv", "dark4_conv", "dark5_conv"):
            k = params[bk][consumer]["conv"]["kernel"]
            spec.append(((bk, consumer, "conv", "kernel"), 2,
                         _shuffle_inv_perm(k.shape[2])))
        k = params[bk]["dark5_sppf"]["cv1"]["conv"]["kernel"]
        spec.append(((bk, "dark5_sppf", "cv1", "conv", "kernel"), 2,
                     _shuffle_inv_perm(k.shape[2])))

    for tap in ("feat1", "feat2"):
        for mod in ("rgb", "nir"):
            ca = params[f"cbam_{mod}_{tap}"]["channelattention"]
            inv = _shuffle_inv_perm(ca["fc1"]["kernel"].shape[2])
            spec.append(((f"cbam_{mod}_{tap}", "channelattention", "fc1",
                          "kernel"), 2, inv))
            spec.append(((f"cbam_{mod}_{tap}", "channelattention", "fc2",
                          "kernel"), 3, inv))

    # neck cv1s: concat is (p_up | feat_rgb | feat_nir); feat channel count
    # read from the matching dark conv that consumes the same tap
    for neck, featc in (("conv3_for_upsample2",
                         params["backbone_rgb"]["dark4_conv"]["conv"]["kernel"].shape[2]),
                        ("conv3_for_upsample1",
                         params["backbone_rgb"]["dark5_conv"]["conv"]["kernel"].shape[2])):
        k = params[neck]["cv1"]["conv"]["kernel"]
        ctot = k.shape[2]
        pc = ctot - 2 * featc
        inv = _shuffle_inv_perm(featc)
        rows = np.concatenate([np.arange(pc), pc + inv, pc + featc + inv])
        spec.append(((neck, "cv1", "conv", "kernel"), 2, rows))
    return spec


def _take(leaf, idx, axis):
    if isinstance(leaf, np.ndarray):
        return np.take(leaf, idx, axis=axis)
    return jnp.take(leaf, jnp.asarray(idx), axis=axis)


def apply_shuffle_spec(tree, spec, inverse: bool = False):
    """Apply (or invert) a `shuffle_fold_spec` to a params-structured tree.

    Copy-on-write along each spec path; numpy leaves stay numpy (host-side
    checkpoint transforms must not upload to a device).
    """
    out = dict(tree)
    for path, axis, rows in spec:
        idx = np.argsort(rows) if inverse else rows
        node = out
        for key in path[:-1]:
            node[key] = dict(node[key])
            node = node[key]
        node[path[-1]] = _take(node[path[-1]], idx, axis)
    return out


def fold_shuffle_variables(variables):
    """Absorb the backbones' channel_shuffles into downstream weights.

    Pair with `DCFAYolo(cfg, ..., fold_shuffle=True)`, whose ShuffleNetV2
    blocks skip their final `channel_shuffle` (`nets/yolo_mul.py:164-168`): the
    shuffle is a fixed permutation, so instead of paying a relayout copy per
    block per image on TPU, permute once at load time:

      * dark{3,4,5}_conv and dark5_sppf.cv1 conv kernels: input-channel rows
        taken at the inverse permutation (they consume the previous block's
        shuffled output);
      * the feat1/feat2 tap CBAMs: channel-attention fc1 input rows and fc2
        output rows (spatial attention is channel-order invariant);
      * the neck's conv3_for_upsample{1,2}.cv1 kernels: the feat segments of
        their concatenated input ((p_up, feat_rgb, feat_nir) — the reference
        neck wiring at `nets/yolo_mul.py:428-443`), leaving the p_up rows.

    feat3 is tapped AFTER SPPF-CBAM (which absorbs dark5's shuffle at cv1), so
    nothing downstream of feat3 changes.  BN parameters/stats are untouched
    everywhere: every permuted row is an INPUT-channel row of a consumer whose
    BN normalizes its own (unpermuted) output channels.  Works on
    train-template or deploy-fused variables (disjoint subtrees).  Numerics:
    exact up to floating-point summation order inside the convs (input-channel
    reduction order changes), pinned by tests/test_fold_shuffle.py.
    """
    import flax

    var_dict = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    out = dict(var_dict)
    out["params"] = apply_shuffle_spec(var_dict["params"],
                                       shuffle_fold_spec(var_dict["params"]))
    return out


def unfold_shuffle_variables(variables):
    """Exact inverse of `fold_shuffle_variables` (bitwise: pure permutation).

    Used by folded TRAINING (`train.py --fold-shuffle`) to write checkpoints
    in the canonical (unfolded) layout: a folded tree has identical shapes to
    an unfolded one, so a folded checkpoint would silently load into the
    standard graph and compute the wrong function — every saved artifact must
    therefore be unfolded back first.
    """
    import flax

    var_dict = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    out = dict(var_dict)
    out["params"] = apply_shuffle_spec(var_dict["params"],
                                       shuffle_fold_spec(var_dict["params"]),
                                       inverse=True)
    return out


def fold_opt_state(opt_state, spec, inverse: bool = False):
    """Fold/unfold every params-structured subtree of an optax state.

    Adam's mu/nu and SGD's momentum trace mirror the params tree leaf-for-leaf
    and the optimizer update is elementwise, so training in the folded space
    with folded moments is EXACTLY the unfolded trajectory, permuted
    (grad-clip's global norm is permutation-invariant).  Walks tuples /
    namedtuples (optax chain states) and applies the spec to any dict rooted
    like a params tree; scalar leaves (Adam count, EmptyState) pass through.
    """
    def walk(node):
        if isinstance(node, dict):
            if "backbone_rgb" in node:
                return apply_shuffle_spec(node, spec, inverse)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, tuple):
            vals = [walk(v) for v in node]
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(opt_state)


def deploy_variables(variables):
    """Transform train-graph variables into deploy-graph variables.

    Use with `DCFAYolo(cfg, deploy=True)` (or any module tree built with
    deploy=True): every RepGhostModule's cheap_conv gains a bias and its
    cheap_bn/fusion_bn disappear; everything else is unchanged.
    """
    import flax

    var_dict = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    params = var_dict["params"]
    stats = var_dict.get("batch_stats", {})
    new_params, new_stats = _walk(params, stats)
    out = dict(var_dict)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out


def cast_conv_kernels(variables, dtype=jnp.bfloat16):
    """Pre-cast every 4-D conv `kernel` leaf to the serving compute dtype.

    With `ModelConfig.compute_dtype='bfloat16'` every conv already casts its
    kernel to bfloat16 at apply time (flax promote_dtype), so storing the
    kernels pre-cast is BIT-IDENTICAL output-wise (same round-to-nearest-even,
    pinned by tests/test_cast_weights.py) and halves the host→device upload.
    It is nonetheless OFF by default in the predictor: deviceless v5e
    attribution measured bf16 kernel layouts padding this model's small convs
    to MORE total accessed bytes than f32 (b1 785.1 → 796.9 MB/pair) — the
    same narrow-dtype padding pathology as tools/int8_conv_probe.py.

    Only 4-D kernels are cast: BN scale/bias/mean/var and RepGhost biases are
    consumed in float32 by the per-channel eval-BN fold (ops/norm.py), where a
    pre-cast WOULD change numerics.  Apply AFTER deploy/fold/pair transforms
    (those permute and fuse in f32).
    """
    import flax

    var_dict = (flax.core.unfreeze(variables)
                if hasattr(variables, "unfreeze") else dict(variables))

    def walk(node):
        if isinstance(node, dict):
            return {k: (v.astype(dtype)
                        if k == "kernel" and hasattr(v, "ndim") and v.ndim == 4
                        else walk(v))
                    for k, v in node.items()}
        return node

    out = dict(var_dict)
    out["params"] = walk(dict(var_dict["params"]))
    return out
