"""Pallas TPU kernel fusing the full backbone stem: conv3x3 s1 (3→16) +
folded eval-BatchNorm (+ /255 input normalization) + ReLU + maxpool3x3 s2.

Why: the reference stem (`/root/reference/nets/yolo_mul.py:104-115`) convolves
at FULL input resolution, so its conv output is the single largest tensor in
the serving graph — bf16[128,640,640,16] = 1.68 GB per backbone at b128.  XLA
cannot fuse a reduce-window with its producer, so the XLA lowering writes the
conv output to HBM and reads it back: measured 9.33 ms / 4.93 GB per backbone
at b128 (tools/stem_probe.py).  This kernel keeps conv rows in VMEM and writes
only the pooled /2-resolution output, cutting the stem's HBM traffic to
input + output (~0.74 GB).

Design (per grid step = one image, fori over groups of 16 conv rows):
  * conv as GEMM with EVEN/ODD row packing: two weight matrices per kernel
    column dx produce O_even[m, x] = conv row 16g+2t and O_odd[m, x] = conv
    row 16g+2t+1, with m = t*16 + co (t-major).  Each is three dot_general
    accumulations of W'[96, 128] against lane-shifted slices of the input
    rows; K rows are placed at 32-aligned per-ci offsets (k = ci*32 + ry).
  * the t-major packing makes the maxpool's VERTICAL reduction three aligned
    full-array maxima: pool row 8g+t needs conv rows (2T-1, 2T, 2T+1) =
    (odd[t-1], even[t], odd[t]), and odd[t-1] is just a 16-row-aligned
    concat of the carried previous block with O_odd[0:112].  No sublane-pair
    reshapes, no 1-row-misaligned concats — Mosaic scalarizes those into
    per-row shuffles (the v1 formulation measured 2.6× SLOWER than XLA
    because of exactly that).
  * eval-BN folds into W' (scale) and a per-m bias; /255 folds into W' too,
    so the kernel consumes RAW 0..255 pixels and the serving pipeline's
    full-resolution /255 pass disappears.
  * ReLU commutes with max-pooling (both monotone), so it is applied once to
    the pooled /2-resolution output; the pool's pad=1 border contributes
    0 = relu(anything ≤ 0), matching torch's -inf padding after the clamp.
  * maxpool horizontal: two single-lane-shifted maxima (native vector
    shifts), then an even-lane deinterleave via tpu.dynamic_gather per
    128-lane chunk (the one lane-gather form Mosaic supports).

Input is channels-first with a 1-pixel ZERO border: (B, 3, H+2, W+2), raw
0..255 — `ops.resize.letterbox_batch_cf` emits exactly this at no extra cost
(the einsum/pad writes happen anyway).  Output is (B, H/2, 16, W/2) — one
transpose away from NHWC, left to XLA.

Numerics: bf16 operands, f32 accumulation — same contract as the XLA path
(bf16 conv with f32 accumulate); agreement pinned by tests/test_pallas_stem.py
and the serving-level detection-agreement test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEM_CO = 16  # stem output channels: the kernel is specialized to 16
# (phi='n''s base_channels); other phis fall back to the XLA stem.

# out[i, j] = x[i, idx[i, j]] — the one lane-gather form Mosaic lowers to
# tpu.dynamic_gather (jax/_src/pallas/mosaic/lowering.py gather rule)
_GATHER_LANES = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def fold_stem_params(kernel_hwio: jnp.ndarray, gamma: jnp.ndarray,
                     beta: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray,
                     eps: float = 1e-5, input_scale: float = 1.0 / 255.0):
    """Fold conv kernel + eval-BN + input normalization into GEMM operands.

    kernel_hwio: (3, 3, 3, 16) HWIO stem conv kernel.
    Returns (wd, bias): wd (2, 3, 96, 128) bf16 — [even/odd][dx] weights with
    rows k = ci*32 + ry (ry = r + dy over the group's 18 input rows) and
    columns m = t*16 + co; bias (128, 1) f32 with bias[t*16+co] = b[co].
    """
    a = gamma / jnp.sqrt(var + eps)
    bias = beta - mean * a                       # (16,)
    scale = a * input_scale                      # (16,)
    wd = jnp.zeros((2, 3, 96, 128), jnp.float32)
    for dy in range(3):
        blk = kernel_hwio[dy].astype(jnp.float32) * scale  # (3dx, 3ci, 16co)
        for t in range(8):
            for parity in range(2):              # conv row 16g + 2t + parity
                ry = 2 * t + parity + dy
                for ci in range(3):
                    # columns t*16 + co: contiguous 16-slice at t*16
                    wd = wd.at[parity, :, ci * 32 + ry,
                               t * 16:(t + 1) * 16].set(blk[:, ci, :])
    bias_m = jnp.tile(bias.astype(jnp.float32), 8)  # m = t*16 + co
    return wd.astype(jnp.bfloat16), bias_m.reshape(128, 1)


def _deinterleave_even(x2d: jnp.ndarray, w: int) -> jnp.ndarray:
    """Even lanes of a (128, w) array → (128, w//2).  tpu.dynamic_gather
    cannot cross vreg boundaries, so gather per 128-lane chunk."""
    parts = []
    for s in range(0, w, 128):
        cw = min(128, w - s)
        chunk = jax.lax.slice_in_dim(x2d, s, s + cw, axis=1)
        idx = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (128, cw), 1) * 2, cw - 1)
        g = jax.lax.gather(chunk, idx[..., None], _GATHER_LANES,
                           slice_sizes=(1, 1),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        parts.append(g[:, : (cw + 1) // 2])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _stem_kernel(x_ref, wd_ref, b_ref, out_ref, p_ref):
    w2 = x_ref.shape[3]
    w = w2 - 2
    h = x_ref.shape[2] - 2
    bias = b_ref[:, :]                            # (128, 1) f32

    # zero once: rows 18..31 of each 32-row ci band stay zero forever
    p_ref[:, :] = jnp.zeros_like(p_ref)

    def group(g, carry):
        # input rows 16g..16g+17 of the zero-bordered image, placed at
        # 32-aligned per-ci offsets so every store/concat is tile-aligned
        for ci in range(3):
            p_ref[pl.ds(ci * 32, 18), :] = x_ref[0, ci, pl.ds(16 * g, 18), :]
        p = p_ref[:, :]                           # (96, W+2) bf16
        o_e = bias
        o_o = bias
        for dx in range(3):
            pd = jax.lax.slice_in_dim(p, dx, dx + w, axis=1)  # (96, W)
            o_e = o_e + jax.lax.dot_general(
                wd_ref[0, dx], pd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (128, W)
            o_o = o_o + jax.lax.dot_general(
                wd_ref[1, dx], pd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # vertical max: pool row 8g+t = max(odd[t-1], even[t], odd[t]);
        # odd[t-1] = 16-row-aligned concat of carry (prev odd[7]) + odd[:112]
        odd_tm1 = jnp.concatenate(
            [carry, jax.lax.slice_in_dim(o_o, 0, 112, axis=0)], axis=0)
        v = jnp.maximum(jnp.maximum(odd_tm1, o_e), o_o)       # (128, W)
        # horizontal max over conv cols (2n-1, 2n, 2n+1): single-lane shifts
        # (zero fill = pool pad, absorbed by the final ReLU clamp)
        zcol = jnp.zeros((128, 1), jnp.float32)
        vl = jnp.concatenate([v[:, 1:], zcol], axis=1)        # v[x+1]
        vr = jnp.concatenate([zcol, v[:, : w - 1]], axis=1)   # v[x-1]
        hmax = jnp.maximum(jnp.maximum(vr, v), vl)            # (128, W)
        he = _deinterleave_even(hmax, w)                      # (128, W/2)
        out_ref[0, pl.ds(8 * g, 8), :, :] = (
            jnp.maximum(he, 0.0).astype(out_ref.dtype)
            .reshape(8, 16, w // 2))
        return jax.lax.slice_in_dim(o_o, 112, 128, axis=0)   # odd[7] block

    carry0 = jnp.zeros((16, w), jnp.float32)
    jax.lax.fori_loop(0, h // 16, group, carry0)


def _stem_call(x_cf: jnp.ndarray, wd: jnp.ndarray, bias: jnp.ndarray,
               interpret: bool) -> jnp.ndarray:
    """Per-shard pallas_call (shapes derived from the shard's x_cf)."""
    b, c, h2, w2 = x_cf.shape
    h, w = h2 - 2, w2 - 2
    out = pl.pallas_call(
        _stem_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h2, w2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, 96, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, 16, w // 2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((96, w2), jnp.bfloat16)],
        # whole-image in/out blocks at 640² exceed the 16 MB default scoped
        # limit with double buffering; well under the v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x_cf.astype(jnp.bfloat16), wd, bias)
    return out


@functools.lru_cache(maxsize=None)
def _partitionable_stem(interpret: bool):
    """Mosaic custom-calls cannot be auto-partitioned by GSPMD/Shardy; the
    stem is trivially batch-parallel (grid=(B,)), so declare batch dim 0 of
    the image passthrough and everything else (weights, bias) replicated —
    batch-sharded DP serving then runs the kernel per-shard, reshard-free."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl = functools.partial(_stem_call, interpret=interpret)
    fn = custom_partitioning(lambda x, w, b: impl(x, w, b))

    def _bshard(sharding, shape):
        spec0 = sharding.spec[0] if len(sharding.spec) else None
        return NamedSharding(sharding.mesh,
                             P(spec0, *([None] * (len(shape.shape) - 1))))

    def _repl(sharding, shape):
        return NamedSharding(sharding.mesh,
                             P(*([None] * len(shape.shape))))

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _bshard(arg_shapes[0].sharding, result_shape)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = (_bshard(arg_shapes[0].sharding, arg_shapes[0]),
                         _repl(arg_shapes[1].sharding, arg_shapes[1]),
                         _repl(arg_shapes[2].sharding, arg_shapes[2]))
        result_sharding = _bshard(arg_shapes[0].sharding, result_shape)
        return mesh, impl, result_sharding, arg_shardings

    fn.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        # Shardy path: only the image batch dim is elementwise; every other
        # dim (image planes, GEMM weights, bias) must stay whole per shard
        sharding_rule="b c h w, p q k m, m u -> b e s g",
        need_replication_factors=("c", "h", "w", "p", "q", "k", "m", "u",
                                  "e", "s", "g"),
    )
    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_stem(x_cf: jnp.ndarray, wd: jnp.ndarray, bias: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Fused stem.  x_cf (B, 3, H+2, W+2) bf16, raw 0..255 with a 1-px zero
    border; wd/bias from `fold_stem_params`.  Returns (B, H/2, 16, W/2) bf16
    (transpose (0, 1, 3, 2) for NHWC — the caller's concern).
    Batch-partitionable under a sharded jit (see _partitionable_stem)."""
    b, c, h2, w2 = x_cf.shape
    h, w = h2 - 2, w2 - 2
    if c != 3 or h % 16 or w % 2:
        raise ValueError(f"pallas_stem needs (B,3,H+2,W+2) with H%16==0, "
                         f"W even; got {x_cf.shape}")
    if len(jax.devices()) > 1:
        return _partitionable_stem(interpret)(
            x_cf.astype(jnp.bfloat16), wd, bias)
    # custom_partitioning needs a live-backend Python callback at compile
    # time, which AOT/chipless compilers (incl. the axon remote-compile
    # helper) cannot provide — and with one device there is nothing to
    # partition
    return _stem_call(x_cf.astype(jnp.bfloat16), wd, bias, interpret)
