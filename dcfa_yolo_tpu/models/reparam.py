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
