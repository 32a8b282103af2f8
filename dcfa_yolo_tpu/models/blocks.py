"""Model blocks (L1 of SURVEY.md §1): CBAM, ShuffleNetV2, SPPF-CBAM, BiFPN-concat,
RepGhost CSP blocks, DFL.

All blocks are functional flax modules in NHWC.  Deliberately-reproduced reference
quirks are marked with their `file:line` citations; see SURVEY.md §7 "quirks".
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcfa_yolo_tpu.ops.conv import ConvBnAct, apply_act, torch_batchnorm, torch_conv
from dcfa_yolo_tpu.ops.pool import global_avg_pool, global_max_pool, max_pool_same


class ChannelAttention(nn.Module):
    """Channel gate: shared 1x1 MLP over avg+max pooled stats
    (`nets/yolo_mul.py:56-73`).  ratio=8 normally; SPPF passes ratio=channels,
    collapsing the bottleneck to 1 channel (`nets/yolo_mul.py:18-21` quirk)."""

    ratio: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        hidden = c // self.ratio
        fc1 = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="fc2")
        avg_out = fc2(nn.relu(fc1(global_avg_pool(x))))
        max_out = fc2(nn.relu(fc1(global_max_pool(x))))
        return nn.sigmoid(avg_out + max_out)


class SpatialAttention(nn.Module):
    """Spatial gate: channel mean+max → kxk conv → sigmoid (`nets/yolo_mul.py:76-90`)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg_out, max_out], axis=-1)
        pad = 3 if self.kernel_size == 7 else 1
        y = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(y)
        return nn.sigmoid(y)


class CBAM(nn.Module):
    """Channel-then-spatial multiplicative attention (`nets/yolo_mul.py:93-102`)."""

    ratio: int = 8
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x * ChannelAttention(self.ratio, dtype=self.dtype, name="channelattention")(x)
        x = x * SpatialAttention(self.kernel_size, dtype=self.dtype, name="spatialattention")(x)
        return x


class _StemConvParam(nn.Module):
    """Declares exactly nn.Conv's kernel param (same path/shape/init) so the
    fused stem backend stays checkpoint-identical to the XLA one."""

    features: int

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, cin, self.features), jnp.float32)


class _StemBnParam(nn.Module):
    """Declares exactly TorchExactBatchNorm's params/stats (ops/norm.py)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        return scale, bias, ra_mean, ra_var


class ConvMaxpool(nn.Module):
    """Stem: 3x3 s1 conv + default-BN + ReLU, then 3x3 s2 maxpool
    (`nets/yolo_mul.py:104-115`).

    backend="pallas" (train graphs): the whole stem runs as ONE Pallas kernel
    pass per modality (ops/pallas_stem_train.py) — conv extrema are pooled
    and BN stat sums accumulated without ever materializing the
    full-resolution conv output in HBM.  The parameter/batch-stats tree is
    bit-identical to the XLA backend (declared via the param holders above),
    so checkpoints are interchangeable.  Eval mode under the pallas backend
    mirrors the XLA eval math op-for-op (serving uses the dedicated eval
    kernel in ops/pallas_stem.py at the pipeline level instead).
    """

    features: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    backend: str = "xla"
    # None = auto: interpret everywhere but a real TPU backend.  Deviceless
    # AOT lowerings for TPU must pass False explicitly (config.py docstring).
    stem_interpret: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.backend == "pallas":
            return self._fused(x, train)
        x = torch_conv(self.features, 3, 1, use_bias=False, dtype=self.dtype,
                       name="conv")(x)
        x = torch_batchnorm(axis_name=self.axis_name, dtype=self.dtype,
                            name="bn")(x, use_running_average=not train)
        x = nn.relu(x)
        return max_pool_same(x, kernel=3, stride=2)

    def _fused(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from dcfa_yolo_tpu.ops.pallas_stem_train import fused_train_stem

        kernel = _StemConvParam(self.features, name="conv")(x.shape[-1])
        scale, bias, ra_mean, ra_var = _StemBnParam(name="bn")(self.features)
        x = x.astype(self.dtype)
        eps = 1e-5  # stem BN is the torch-default flavour (ops/conv.py)
        if train:
            interpret = (jax.default_backend() != "tpu"
                         if self.stem_interpret is None else
                         self.stem_interpret)
            y, mean, var = fused_train_stem(x, kernel, scale, bias, eps,
                                            self.axis_name, interpret)
            if not self.is_initializing():
                # running update mirrors ops/norm.py:68-73 (torch momentum,
                # Bessel-corrected variance)
                n = float(x.shape[0] * x.shape[1] * x.shape[2])
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                m = 0.1
                bessel = n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var * bessel
            return y
        # eval: the XLA eval fast path, op-for-op (ops/norm.py:47-57)
        c = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        inv = jax.lax.rsqrt(ra_var.value + eps) * scale
        shift = bias - ra_mean.value * inv
        c = (c * inv.astype(self.dtype)
             + shift.astype(self.dtype)).astype(self.dtype)
        return max_pool_same(nn.relu(c), kernel=3, stride=2)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """Interleave channel groups (`nets/yolo_mul.py:164-168`), NHWC flavour."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


class ShuffleNetV2Block(nn.Module):
    """ShuffleNetV2 unit (`nets/yolo_mul.py:118-168`).

    stride=1: channel split, identity ∥ (1x1 → 3x3 dw → 1x1), concat, shuffle.
    Quirk kept: the depthwise convs have bias=True (torch default at lines 130/144)
    while the 1x1 convs are bias-free.

    skip_shuffle: serving-time graph with the final channel_shuffle REMOVED —
    the shuffle is a fixed channel permutation, so `reparam.fold_shuffle_variables`
    absorbs it into every consumer's input-channel axis instead (the shuffle's
    transpose is a pure relayout copy on TPU, bytes for nothing).  Only valid
    with correspondingly permuted downstream weights.
    """

    features: int
    stride: int = 1
    skip_shuffle: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        branch_features = self.features // 2
        ura = not train
        bn = lambda name: torch_batchnorm(axis_name=self.axis_name,
                                          dtype=self.dtype, name=name)

        def branch2(inp: jnp.ndarray) -> jnp.ndarray:
            y = torch_conv(branch_features, 1, use_bias=False, dtype=self.dtype,
                           name="b2_conv1")(inp)
            y = nn.relu(bn("b2_bn1")(y, use_running_average=ura))
            y = torch_conv(branch_features, 3, self.stride,
                           groups=branch_features, use_bias=True, dtype=self.dtype,
                           name="b2_dwconv")(y)
            y = bn("b2_bn2")(y, use_running_average=ura)
            y = torch_conv(branch_features, 1, use_bias=False, dtype=self.dtype,
                           name="b2_conv3")(y)
            return nn.relu(bn("b2_bn3")(y, use_running_average=ura))

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            inp = x.shape[-1]
            b1 = torch_conv(inp, 3, self.stride, groups=inp, use_bias=True,
                            dtype=self.dtype, name="b1_dwconv")(x)
            b1 = bn("b1_bn1")(b1, use_running_average=ura)
            b1 = torch_conv(branch_features, 1, use_bias=False, dtype=self.dtype,
                            name="b1_conv2")(b1)
            b1 = nn.relu(bn("b1_bn2")(b1, use_running_average=ura))
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        if self.skip_shuffle:
            return out
        return channel_shuffle(out, 2)


class SPPFCBAM(nn.Module):
    """SPPF with CBAM after the 1x1 reduce and after each pooled scale
    (`nets/yolo_mul.py:10-32`).  Quirk kept: the inner CBAMs are constructed as
    `CBAM(c_, c_)` so their channel-attention ratio equals the channel count."""

    features: int
    pool_kernel: int = 5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, axis_name=self.axis_name, dtype=self.dtype,
                      name="cv1")(x, train=train)
        x = CBAM(ratio=c_, dtype=self.dtype, name="cbam1")(x)
        y1 = max_pool_same(x, self.pool_kernel, 1)
        y1 = CBAM(ratio=c_, dtype=self.dtype, name="cbam2")(y1)
        y2 = max_pool_same(y1, self.pool_kernel, 1)
        y2 = CBAM(ratio=c_, dtype=self.dtype, name="cbam3")(y2)
        y3 = max_pool_same(y2, self.pool_kernel, 1)
        y3 = CBAM(ratio=c_, dtype=self.dtype, name="cbam4")(y3)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, 1, axis_name=self.axis_name,
                         dtype=self.dtype, name="cv2")(out, train=train)


class ConcatBiFPN(nn.Module):
    """Weighted concat of three maps: learnable scalar weights normalized by
    sum+1e-4, inputs scaled then concatenated (`nets/yolo_mul.py:36-51`).

    With `return_parts=True` the scaled inputs are returned as a tuple
    instead of concatenated — the consumer (a C2fRepGhost whose cv1 is a 1×1
    conv) then computes conv(concat) as a sum of sliced-kernel part convs
    (ops/conv.py ConvBnAct parts path), eliminating the concat buffer from
    the serving graph.  Same parameter ('w'), same math."""

    dtype: Any = jnp.float32
    return_parts: bool = False

    @nn.compact
    def __call__(self, xs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]):
        w = self.param("w", nn.initializers.ones, (3,), jnp.float32)
        w = w / (jnp.sum(w) + 1e-4)
        w = w.astype(xs[0].dtype)
        parts = (w[0] * xs[0], w[1] * xs[1], w[2] * xs[2])
        if self.return_parts:
            return parts
        return jnp.concatenate(parts, axis=-1)


def dfl_decode(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss decode: softmax over reg_max bins per side →
    expectation (`nets/yolo_mul.py:312-322`, frozen arange conv ≡ this einsum).

    box_logits: (..., A, 4*reg_max) → (..., A, 4) ltrb distances.
    """
    shape = box_logits.shape
    x = box_logits.reshape(*shape[:-1], 4, reg_max)
    # expectation via two reductions of one exp chain rather than
    # softmax-then-dot: the dot's operand forces the f32 (B, 8400, 4, 16)
    # softmax output into HBM (275 MB write+read at b128 640²), while two
    # reduce consumers let XLA recompute the cheap exp per reduce and only
    # the (B, 8400, 4) numerator/denominator are ever written.  Same formula
    # as softmax·arange up to FP summation order.
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.sum(e * proj, axis=-1) / jnp.sum(e, axis=-1)


class SqueezeExcite(nn.Module):
    """SE block with hard-sigmoid gate (`nets/repghost.py:36-52`).  Dormant in the
    live graph (se_ratio=0 everywhere) but part of the capability surface."""

    se_ratio: float = 0.25
    divisor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        reduced = _make_divisible(c * self.se_ratio, self.divisor)
        s = global_avg_pool(x)
        s = nn.Conv(reduced, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_reduce")(s)
        s = apply_act(s, "silu")
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_expand")(s)
        return x * (nn.relu6(s + 3.0) / 6.0)


def _make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """Channel rounding helper (`nets/repghost.py:8-23`)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class RepGhostModule(nn.Module):
    """RepGhost: primary 1x1 conv+BN(+SiLU) → cheap 3x3 depthwise with a parallel
    re-parameterizable BN branch (`nets/repghost.py:70-115`).

    deploy=False (train graph): cheap = dw-conv(bias-free)+BN, plus fusion-BN of
    the primary output added in.  deploy=True: one biased dw conv — produced from
    train params by `models.reparam.fuse_repghost` (the reference's
    `switch_to_deploy`, `nets/repghost.py:158-175`, recast as a pure transform).
    """

    features: int
    kernel_size: int = 1
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    deploy: bool = False
    reparam_bn: bool = True
    reparam_identity: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ura = not train
        bn = lambda name: torch_batchnorm(axis_name=self.axis_name,
                                          dtype=self.dtype, name=name)
        x1 = torch_conv(self.features, self.kernel_size, self.stride,
                        padding=self.kernel_size // 2, use_bias=False,
                        dtype=self.dtype, name="primary_conv")(x)
        x1 = bn("primary_bn")(x1, use_running_average=ura)
        if self.relu:
            x1 = apply_act(x1, "silu")

        x2 = torch_conv(self.features, self.dw_size, 1, padding=self.dw_size // 2,
                        groups=self.features, use_bias=self.deploy,
                        dtype=self.dtype, name="cheap_conv")(x1)
        if not self.deploy:
            x2 = bn("cheap_bn")(x2, use_running_average=ura)
            if self.reparam_bn:
                x2 = x2 + bn("fusion_bn")(x1, use_running_average=ura)
            if self.reparam_identity:
                x2 = x2 + x1
        if self.relu:
            x2 = apply_act(x2, "silu")
        return x2


class RepGhostBottleneck(nn.Module):
    """RepGhost bottleneck (`nets/repghost.py:178-279`): ghost expand → optional
    s2 depthwise → optional SE → ghost project (no act) → + shortcut."""

    mid_features: int
    features: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    shortcut: bool = True
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        ura = not train
        bn = lambda name: torch_batchnorm(axis_name=self.axis_name,
                                          dtype=self.dtype, name=name)
        residual = x
        x1 = RepGhostModule(self.mid_features, relu=True, deploy=self.deploy,
                            axis_name=self.axis_name, dtype=self.dtype,
                            name="ghost1")(x, train=train)
        y = x1
        if self.stride > 1:
            y = torch_conv(self.mid_features, self.dw_kernel_size, self.stride,
                           padding=(self.dw_kernel_size - 1) // 2,
                           groups=self.mid_features, use_bias=False,
                           dtype=self.dtype, name="conv_dw")(y)
            y = bn("bn_dw")(y, use_running_average=ura)
        if self.se_ratio > 0.0:
            y = SqueezeExcite(self.se_ratio, dtype=self.dtype, name="se")(y)
        y = RepGhostModule(self.features, relu=False, deploy=self.deploy,
                           axis_name=self.axis_name, dtype=self.dtype,
                           name="ghost2")(y, train=train)

        if not self.shortcut and in_chs == self.features and self.stride == 1:
            return y
        if in_chs == self.features and self.stride == 1:
            sc = residual
        else:
            sc = torch_conv(in_chs, self.dw_kernel_size, self.stride,
                            padding=(self.dw_kernel_size - 1) // 2, groups=in_chs,
                            use_bias=False, dtype=self.dtype, name="sc_dwconv")(residual)
            sc = bn("sc_bn1")(sc, use_running_average=ura)
            sc = torch_conv(self.features, 1, 1, padding=0, use_bias=False,
                            dtype=self.dtype, name="sc_conv")(sc)
            sc = bn("sc_bn2")(sc, use_running_average=ura)
        return y + sc


class C2fRepGhost(nn.Module):
    """CSP block over RepGhost bottlenecks (`nets/repghost.py:308-320`).

    Its 1x1 convs use the *default-BN* Conv variant (`nets/repghost.py:291-305`,
    eps 1e-5 / momentum 0.1) — unlike the neck's other Convs.
    """

    features: int
    n: int = 1
    expansion: float = 0.5
    deploy: bool = False
    # Serving option: feed cv2 its concat inputs as PARTS (sum of
    # sliced-kernel 1×1 convs, ops/conv.py) instead of materializing the
    # (n+2)c channel concat; cv1 takes parts whenever the caller passes a
    # tuple (the neck's BiFPN/down-path concat sites).
    split_concats: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        c = int(self.features * self.expansion)
        x = ConvBnAct(2 * c, 1, 1, bn_eps=1e-5, bn_momentum=0.1,
                      axis_name=self.axis_name, dtype=self.dtype, name="cv1")(x, train=train)
        y = list(jnp.split(x, [c], axis=-1))
        for i in range(self.n):
            y.append(
                RepGhostBottleneck(c, c, deploy=self.deploy, axis_name=self.axis_name,
                                   dtype=self.dtype, name=f"m{i}")(y[-1], train=train)
            )
        out = tuple(y) if self.split_concats else jnp.concatenate(y, axis=-1)
        return ConvBnAct(self.features, 1, 1, bn_eps=1e-5, bn_momentum=0.1,
                         axis_name=self.axis_name, dtype=self.dtype,
                         name="cv2")(out, train=train)
