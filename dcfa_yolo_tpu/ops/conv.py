"""Convolution / BatchNorm primitives with PyTorch-compatible semantics, NHWC layout.

The reference model mixes two BatchNorm flavours:
  * `Conv` blocks in `nets/yolo_mul.py:197` use eps=1e-3, momentum=0.03;
  * everything else (ShuffleNet BNs, RepGhost BNs, `nets/repghost.py:298`) uses the
    PyTorch defaults eps=1e-5, momentum=0.1.
Torch `momentum` is the weight of the *new* batch statistic; flax's is the weight of
the *old* running statistic, so flax_momentum = 1 - torch_momentum.

All convs run in NHWC with HWIO kernels — the layout XLA tiles best onto the TPU MXU.
Activations may be bfloat16 (`dtype`); params and BN stats stay float32.

`torch_conv`/`torch_batchnorm` are factories returning plain flax modules so the
parameter tree stays flat (`<name>/kernel`, `<name>/{scale,bias,mean,var}`), which
keeps the torch-checkpoint importer a straightforward key mapping.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-style padding used throughout the reference (`nets/yolo_mul.py:171-180`)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def apply_act(x: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "silu":
        return x * nn.sigmoid(x)
    if act == "relu":
        return nn.relu(x)
    if act == "none":
        return x
    raise ValueError(f"unknown activation {act!r}")


def torch_conv(
    features: int,
    kernel_size: int = 1,
    stride: int = 1,
    padding: Optional[int] = None,
    groups: int = 1,
    dilation: int = 1,
    use_bias: bool = False,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """nn.Conv2d equivalent: explicit symmetric padding, optional groups/bias."""
    p = autopad(kernel_size, padding, dilation)
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(p, p), (p, p)],
        feature_group_count=groups,
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def torch_batchnorm(
    eps: float = 1e-5,
    torch_momentum: float = 0.1,
    axis_name: Optional[str] = None,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
):
    """BatchNorm2d with exact torch semantics (incl. the unbiased-variance
    running update flax lacks — see ops/norm.py).

    Call with `use_running_average=not train`.  Under `jit` over a batch-sharded
    mesh the batch moments are *global* automatically (XLA inserts the
    cross-replica reduction), which subsumes the reference's SyncBatchNorm
    conversion (`train_mul.py:193-196`); `axis_name` exists for explicit
    shard_map/pmap code paths.
    """
    from dcfa_yolo_tpu.ops.norm import TorchExactBatchNorm

    return TorchExactBatchNorm(
        eps=eps,
        torch_momentum=torch_momentum,
        axis_name=axis_name,
        dtype=dtype,
        name=name,
    )


class ConvBnAct(nn.Module):
    """The reference's `Conv` block: Conv2d(bias=False) + BN + activation.

    `bn_eps`/`bn_momentum` default to the `nets/yolo_mul.py:197` variant; RepGhost
    call-sites override them to the torch defaults (`nets/repghost.py:298`).
    Param paths: `<name>/conv/kernel`, `<name>/bn/{scale,bias}` (+ batch_stats).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    dilation: int = 1
    act: str = "silu"
    bn_eps: float = 1e-3
    bn_momentum: float = 0.03
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        conv_mod = torch_conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.groups,
            self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )
        if isinstance(x, (tuple, list)):
            # Concat-through-conv: conv(concat(parts)) == Σ conv_i(part_i)
            # with the kernel's input-channel rows sliced per part — the
            # concat buffer (HBM write + conv re-read) disappears; any
            # upstream scale multiplies fuse into each part conv's operand
            # (XLA fuses elementwise chains into conv inputs, but never a
            # multi-operand concatenate).  Exact up to the K-split partial
            # accumulation order (partials in f32, summed in f32, rounded
            # once — the same deviation class as fold_shuffle).  Only valid
            # for 1x1 convs (no cross-channel spatial taps to split).
            if self.kernel_size != 1 or self.groups != 1:
                raise ValueError("parts input needs a 1x1 ungrouped conv")
            if self.is_initializing():
                y = conv_mod(jnp.concatenate(
                    [p.astype(self.dtype) for p in x], axis=-1)
                ).astype(jnp.float32)
            else:
                kern = self.variables["params"]["conv"]["kernel"]
                o, y = 0, None
                for p in x:
                    ci = p.shape[-1]
                    w = kern[:, :, o:o + ci, :].astype(self.dtype)
                    yi = jax.lax.conv_general_dilated(
                        p.astype(self.dtype), w, (self.stride, self.stride),
                        [(0, 0), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    y = yi if y is None else y + yi
                    o += ci
                if o != kern.shape[2]:
                    raise ValueError(
                        f"parts channels {o} != conv in-channels "
                        f"{kern.shape[2]}")
            x = y.astype(self.dtype)
        else:
            x = conv_mod(x)
        x = torch_batchnorm(
            eps=self.bn_eps,
            torch_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x, use_running_average=not train)
        return apply_act(x, self.act)
