"""Differentiable fused TRAIN-mode stem (Pallas TPU).

The training stem (`models/blocks.py::ConvMaxpool`, reproducing
`/root/reference/nets/yolo_mul.py:104-115`: conv3x3 s1 3→16 + train-BatchNorm
+ ReLU + maxpool3x3 s2) convolves at FULL input resolution, so in the XLA
lowering its conv output is materialized at (B, H, W, 16) and read back by the
BN stat reductions, the normalize+ReLU pass, and the pool — per-module HBM
attribution of the b16 640² train step (tools/train_traffic_aot.py) charges
the two stems 0.93 GB each forward.  This kernel reads the input ONCE and
writes only /2-resolution outputs.

Key trick — train-BN needs batch statistics BEFORE it can normalize, which
naively forces two passes over the conv output.  Instead note that max-pooling
commutes with the per-channel affine y = a·c + b up to the SIGN of a:

    maxpool(a·c + b) = a·maxpool(c) + b   if a ≥ 0
                       a·minpool(c) + b   if a < 0

so ONE kernel pass can emit maxpool(ĉ), minpool(ĉ) and the per-channel
Σĉ / Σĉ² stat sums, and the normalize/ReLU runs OUTSIDE at pool resolution
(B, H/2, W/2, 16) selecting the max or min branch per channel by sign(γ).
ReLU commutes with max-pooling as in the serving kernel (ops/pallas_stem.py),
and the pool's -inf padding is absorbed by the post-pool ReLU clamp.

Exactness vs the XLA path: ĉ is the conv accumulation rounded to the compute
dtype (exactly what flax's bf16 conv emits), both pools select extrema of ĉ,
and rounding/affine are monotone, so max_i bf16(a·ĉ_i+b) = bf16(a·extremum+b):
the fused output equals the XLA stem's output EXACTLY given the same ĉ — the
only divergence is the conv GEMM's f32 summation order and the stat sums'
reduction order (pinned by tests/test_train_stem.py at f32 tolerances).

Backward: `fused_train_stem` carries a custom VJP whose backward rebuilds the
reference XLA decomposition (conv → f32 stats → normalize → ReLU → pool with
ops/pool.py's gradient routing) and differentiates THAT — correct by
construction, and the only residuals saved across fwd→bwd are the stem's raw
inputs (x, kernel, γ, β) instead of two full-resolution activation tensors.

GEMM packing, even/odd row layout, aligned pooling and the lane-deinterleave
are shared with the serving kernel — see ops/pallas_stem.py's docstring for
why this formulation (t-major m = t*16 + co) is the one Mosaic lowers without
scalarized shuffles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcfa_yolo_tpu.ops.pallas_stem import STEM_CO, _deinterleave_even
from dcfa_yolo_tpu.ops.pool import max_pool_same

_BIG = 3.0e38  # -inf stand-in that survives f32 arithmetic


def pack_train_kernel(kernel_hwio: jnp.ndarray, dtype) -> jnp.ndarray:
    """Pack a (3, 3, 3, 16) HWIO kernel into the (2, 3, 96, 128) GEMM layout.

    Same layout as ops/pallas_stem.py::fold_stem_params but WITHOUT the
    eval-BN/input-scale fold (train-BN stats are only known after the pass):
    wd[parity, dx][k = ci*32 + ry, m = t*16 + co] with ry = 2t + parity + dy.
    """
    wd = jnp.zeros((2, 3, 96, 128), jnp.float32)
    kf = kernel_hwio.astype(jnp.float32)
    for dy in range(3):
        blk = kf[dy]                                  # (3dx, 3ci, 16co)
        for t in range(8):
            for parity in range(2):
                ry = 2 * t + parity + dy
                for ci in range(3):
                    wd = wd.at[parity, :, ci * 32 + ry,
                               t * 16:(t + 1) * 16].set(blk[:, ci, :])
    return wd.astype(dtype)


def _train_stem_kernel(x_ref, wd_ref, pmax_ref, pmin_ref, stats_ref, p_ref,
                       cmax_ref, cmin_ref):
    """grid=(B,).  Per image: fori over 16-conv-row groups emitting pooled
    extrema of the rounded conv output plus per-m stat sums (accumulated
    across the whole grid into stats_ref)."""
    w2 = x_ref.shape[3]
    w = w2 - 2
    h = x_ref.shape[2] - 2
    f32 = jnp.float32
    round_dtype = pmax_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        stats_ref[:, :] = jnp.zeros_like(stats_ref)

    # zero once: rows 18..31 of each 32-row ci band stay zero forever
    p_ref[:, :] = jnp.zeros_like(p_ref)
    cmax_ref[:, :] = jnp.full_like(cmax_ref, -_BIG)  # conv row -1 = pool pad
    cmin_ref[:, :] = jnp.full_like(cmin_ref, _BIG)

    def group(g, _):
        for ci in range(3):
            p_ref[pl.ds(ci * 32, 18), :] = x_ref[0, ci, pl.ds(16 * g, 18), :]
        p = p_ref[:, :]
        o_e = jnp.zeros((128, w), f32)
        o_o = jnp.zeros((128, w), f32)
        for dx in range(3):
            pd = lax.slice_in_dim(p, dx, dx + w, axis=1)   # (96, W)
            o_e = o_e + lax.dot_general(
                wd_ref[0, dx], pd, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                # (128, W)
            o_o = o_o + lax.dot_general(
                wd_ref[1, dx], pd, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
        # round exactly like the XLA path's compute-dtype conv output; the
        # stats and both pools all see the ROUNDED values
        if round_dtype != f32:
            o_e = o_e.astype(round_dtype).astype(f32)
            o_o = o_o.astype(round_dtype).astype(f32)

        stats_ref[:, 0:1] += (jnp.sum(o_e, axis=1, keepdims=True)
                              + jnp.sum(o_o, axis=1, keepdims=True))
        stats_ref[:, 1:2] += (jnp.sum(o_e * o_e, axis=1, keepdims=True)
                              + jnp.sum(o_o * o_o, axis=1, keepdims=True))

        # vertical extrema: pool row 8g+t over conv rows (2T-1, 2T, 2T+1) =
        # (odd[t-1], even[t], odd[t]); odd[t-1] is the 16-row-aligned concat
        # of the carried previous block with o_o[0:112]
        zmax = jnp.full((128, 1), -_BIG, f32)
        zmin = jnp.full((128, 1), _BIG, f32)
        for pool, carry_ref, comb, zcol in (
                (pmax_ref, cmax_ref, jnp.maximum, zmax),
                (pmin_ref, cmin_ref, jnp.minimum, zmin)):
            odd_tm1 = jnp.concatenate(
                [carry_ref[:, :], lax.slice_in_dim(o_o, 0, 112, axis=0)],
                axis=0)
            v = comb(comb(odd_tm1, o_e), o_o)              # (128, W)
            vl = jnp.concatenate([v[:, 1:], zcol], axis=1)
            vr = jnp.concatenate([zcol, v[:, : w - 1]], axis=1)
            hv = comb(comb(vr, v), vl)
            he = _deinterleave_even(hv, w)                 # (128, W/2)
            pool[0, pl.ds(8 * g, 8), :, :] = (
                he.astype(round_dtype).reshape(8, 16, w // 2))
        blk = lax.slice_in_dim(o_o, 112, 128, axis=0)
        cmax_ref[:, :] = blk
        cmin_ref[:, :] = blk
        return 0

    lax.fori_loop(0, h // 16, group, 0)


def _stem_pool_stats(x_cf: jnp.ndarray, wd: jnp.ndarray, interpret: bool):
    b, c, h2, w2 = x_cf.shape
    h, w = h2 - 2, w2 - 2
    ct = x_cf.dtype
    return pl.pallas_call(
        _train_stem_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h2, w2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, 96, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h // 2, 16, w // 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h // 2, 16, w // 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index: stays VMEM-resident and accumulates across the
            # sequential grid; initialized at program_id 0
            pl.BlockSpec((128, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), ct),
            jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), ct),
            jax.ShapeDtypeStruct((128, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((96, w2), ct),
            pltpu.VMEM((16, w), jnp.float32),
            pltpu.VMEM((16, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_cf, wd)


@functools.lru_cache(maxsize=None)
def _partitionable_stem_train(interpret: bool):
    """GSPMD wrapper for the fused-step (SyncBN) multi-device path: the
    kernel is batch-parallel, and the stat sums are psum'd across the batch
    shards inside the partition body — so `jnp`-level code downstream sees
    GLOBAL sums and global-batch BN falls out exactly like the XLA stem's
    GSPMD SyncBN (ops/norm.py:15-17).  Mirrors the serving stem's
    `_partitionable_stem` (ops/pallas_stem.py), plus the reduction."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = custom_partitioning(lambda x, w: _stem_pool_stats(x, w, interpret))

    def _bshard(sharding, ndim):
        spec0 = sharding.spec[0] if len(sharding.spec) else None
        return NamedSharding(sharding.mesh, P(spec0, *([None] * (ndim - 1))))

    def _repl(mesh, ndim):
        return NamedSharding(mesh, P(*([None] * ndim)))

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        xsh = arg_shapes[0].sharding
        return (_bshard(xsh, 4), _bshard(xsh, 4), _repl(xsh.mesh, 2))

    def partition(mesh, arg_shapes, result_shape):
        xsh = arg_shapes[0].sharding
        axis = xsh.spec[0]

        def lower(x, w):
            pmax, pmin, sums = _stem_pool_stats(x, w, interpret)
            if axis is not None:
                sums = jax.lax.psum(sums, axis)  # per-shard → global sums
            return pmax, pmin, sums

        return (mesh, lower,
                (_bshard(xsh, 4), _bshard(xsh, 4), _repl(mesh, 2)),
                (_bshard(xsh, 4), _repl(mesh, 4)))

    fn.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        # Shardy rule: only the image batch dim is elementwise; the stat-sums
        # output (t, u) is a cross-batch reduction, kept whole per shard and
        # psum'd in the partition body
        sharding_rule="b c h w, p q k m -> b e s g, b e s g, t u",
        need_replication_factors=("c", "h", "w", "p", "q", "k", "m",
                                  "e", "s", "g", "t", "u"),
    )
    return fn


def _stats_to_moments(sums: jnp.ndarray, n, axis_name: Optional[str]):
    """(128, 2) per-m sums → per-channel (mean, mean2, var); m = t*16 + co
    so per-co totals are sums over the 8 t-slots.  Under shard_map SyncBN the
    moments are pmean'd exactly like ops/norm.py:64-67."""
    per_co = sums.reshape(8, 16, 2).sum(axis=0)        # (16, 2)
    mean = per_co[:, 0] / n
    mean2 = per_co[:, 1] / n
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean2 = lax.pmean(mean2, axis_name)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, mean2, var


def _reference_stem(x, kernel, gamma, beta, eps, axis_name):
    """The exact XLA decomposition the fused kernel replaces: flax-Conv
    semantics (compute-dtype operands), ops/norm.py train-BN math, ReLU,
    ops/pool.py max_pool_same.  Used as the VJP target (and by tests as the
    agreement oracle)."""
    ct = x.dtype
    c = lax.conv_general_dilated(
        x, kernel.astype(ct), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    cf = c.astype(jnp.float32)
    mean = jnp.mean(cf, axis=(0, 1, 2))
    mean2 = jnp.mean(jnp.square(cf), axis=(0, 1, 2))
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean2 = lax.pmean(mean2, axis_name)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    y = (cf - mean) * lax.rsqrt(var + eps) * gamma + beta
    r = jax.nn.relu(y.astype(ct))
    return max_pool_same(r, kernel=3, stride=2), mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_train_stem(x, kernel, gamma, beta, eps: float,
                     axis_name: Optional[str] = None,
                     interpret: bool = False):
    """Fused train-mode stem: returns (y, batch_mean, batch_var_biased).

    x: (B, H, W, 3) in the compute dtype, H % 16 == 0, W even.
    kernel: (3, 3, 3, 16) f32 HWIO; gamma/beta: (16,) f32 BN affine.
    y: (B, H/2, W/2, 16) compute dtype — equals the XLA stem path
    (`ConvMaxpool` train mode) up to conv/stat f32 summation order.
    Differentiable w.r.t. x, kernel, gamma, beta (backward = VJP of the
    reference decomposition; unused cotangent paths are DCE'd by XLA).
    """
    y, mean, var = _fused_fwd_impl(x, kernel, gamma, beta, eps, axis_name,
                                   interpret)
    return y, mean, var


def _fused_fwd_impl(x, kernel, gamma, beta, eps, axis_name, interpret):
    b, h, w, c = x.shape
    if c != 3 or h % 16 or w % 2 or kernel.shape != (3, 3, 3, STEM_CO):
        raise ValueError(f"fused_train_stem needs (B,H,W,3) with H%16==0, "
                         f"W even and a (3,3,3,16) kernel; got {x.shape} / "
                         f"{kernel.shape}")
    ct = x.dtype
    x_cf = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    wd = pack_train_kernel(kernel, ct)
    if axis_name is None and len(jax.devices()) > 1:
        # fused GSPMD (SyncBN) path: batch-partitionable kernel with the stat
        # sums psum'd per shard, so `sums` is GLOBAL here.  Under shard_map
        # (axis_name set) the caller IS the shard — call the kernel directly;
        # likewise with one device (and custom_partitioning needs a live
        # backend, which AOT/chipless compilers can't provide — they use the
        # XLA stem).
        pmax, pmin, sums = _partitionable_stem_train(interpret)(x_cf, wd)
    else:
        pmax, pmin, sums = _stem_pool_stats(x_cf, wd, interpret)
    # local-shard mean first, then pmean — exactly ops/norm.py:61-66 (under
    # the GSPMD path `sums`/n are both global, so this is the global mean)
    mean, _, var = _stats_to_moments(sums, b * h * w, axis_name)
    scale = gamma * lax.rsqrt(var + eps)               # (16,) f32
    shift = beta - mean * scale
    pooled = jnp.where(scale >= 0,
                       jnp.transpose(pmax, (0, 1, 3, 2)),
                       jnp.transpose(pmin, (0, 1, 3, 2)))  # NHWC, dtype ct
    y = jax.nn.relu((pooled.astype(jnp.float32) * scale + shift).astype(ct))
    return y, mean, var


def _fused_fwd(x, kernel, gamma, beta, eps, axis_name, interpret):
    out = _fused_fwd_impl(x, kernel, gamma, beta, eps, axis_name, interpret)
    return out, (x, kernel, gamma, beta)


def _fused_bwd(eps, axis_name, interpret, res, cts):
    x, kernel, gamma, beta = res
    ref = functools.partial(_reference_stem, eps=eps, axis_name=axis_name)
    _, vjp = jax.vjp(lambda *a: ref(*a), x, kernel, gamma, beta)
    return vjp(cts)


fused_train_stem.defvjp(_fused_fwd, _fused_bwd)
