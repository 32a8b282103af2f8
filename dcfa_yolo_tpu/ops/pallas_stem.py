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
import numpy as np

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


def chunk5_cw(w: int):
    """Column-chunk width for the v5 stem at model width `w`, or None when no
    suitable divisor of the pooled width exists.  40 keeps the per-program
    VMEM footprint ~20 MB at B=128; smaller widths serve the CPU-mesh tests
    and non-640 scales."""
    half = w // 2
    for cw in (40, 32, 20, 16, 8):
        if half % cw == 0:
            return cw
    return None


def stem_vmem_fit(w: int, h: int) -> bool:
    """Whether the per-image-gridded stem kernels (v2-v4) fit the 64 MB
    scoped-VMEM limit at this resolution: Pallas double-buffers the
    whole-image input and output blocks, so the footprint scales with H·W —
    at 1280² the blocks need ~50 MB (the old 48 MB limit failed by 64 KB at
    compile time, round 5).  Conservative estimate against a 58 MB
    threshold; beyond it `auto` falls back to the XLA stem and explicit
    requests fail loud at resolve time instead of at compile.  (v5 is
    resolution-independent — its blocks scale with cw·B only.)"""
    blk = col_parity_block(w)
    in_b = 3 * (h + 2) * 2 * blk * 2
    out_b = (h // 2) * 16 * ((w // 2 + 127) // 128 * 128) * 2
    scratch = 288 * 2 * blk * 2
    est = 2 * (in_b + out_b) + scratch + 256 * 1024
    return est <= 58 * 1024 * 1024


def col_parity_block(w: int) -> int:
    """Lane-aligned width of one column-parity block of the deinterleaved
    canvas (v3 contract): W/2+1 parity columns rounded up to a 128 multiple.
    For W=640 this is 384, so the (B,3,H+2,768) deinterleaved canvas costs the
    same VMEM as the plain (B,3,H+2,642) one (642 also pads to 768 lanes)."""
    return ((w // 2 + 1) + 127) // 128 * 128


def fold_stem_params_d(kernel_hwio: jnp.ndarray, gamma: jnp.ndarray,
                       beta: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray,
                       eps: float = 1e-5, input_scale: float = 1.0 / 255.0):
    """v3 (gather-free) packing: the two row-parity matrices fused along M.

    Returns (wd3, bias3): wd3 (3, 96, 256) bf16 with wd3[dx][:, 0:128] the
    even-conv-row weights and [:, 128:256] the odd-row weights (same k/m
    conventions as `fold_stem_params`); bias3 (256, 1) f32."""
    wd, bias = fold_stem_params(kernel_hwio, gamma, beta, mean, var,
                                eps=eps, input_scale=input_scale)
    wd3 = jnp.concatenate([wd[0], wd[1]], axis=-1)        # (3, 96, 256)
    return wd3, jnp.tile(bias, (2, 1))


def fold_stem_params_e(kernel_hwio: jnp.ndarray, gamma: jnp.ndarray,
                       beta: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray,
                       eps: float = 1e-5, input_scale: float = 1.0 / 255.0):
    """v4 (compact-K dual-parity) packing: ONE (216, 256) weight matrix,
    bias included.

    Rows k = (dx*3 + ci)*24 + ry with ry = 2t + par + dy (rows 18..23 of each
    24-row band stay zero — 24 keeps every band store 8-sublane-aligned);
    columns m = par*128 + t*16 + co.  The same matrix serves BOTH column-parity
    dots: the weight value for (dx, ci, ry, par, co) does not depend on which
    canvas column parity the operand band holds — only the operand slice under
    band dx differs (even cols: (pe0, po0, pe1); odd cols: (po0, pe1, po1)).

    The BN bias rides in spare row 18: the kernel pins operand scratch rows 18
    (in the even dot's K range [0, 216)) and 90 (= 72 + 18, the odd dot's view
    of the same row index) to 1.0, so both dots accumulate we[18, :] = bias —
    no separate bias operand, no post-dot broadcast add.  Every other spare
    row pairs with a zero weight row (row 90's weight row is band (dx=1,
    ci=0) ry=18, zero by construction), so nothing else changes.

    Packing is one constant-incidence einsum producing the matrix in a single
    contiguous materialization: the on-chip b128 profile of the band-store
    formulation showed XLA eliding the intermediate and uploading 36 separate
    (18, 128) DMAs per iteration (results/round4_ab/kprof_b128_v4.log);
    a single producer uploads once, like the v3 wd3 matrix."""
    a = gamma.astype(jnp.float32) / jnp.sqrt(var.astype(jnp.float32) + eps)
    bias = beta.astype(jnp.float32) - mean.astype(jnp.float32) * a    # (16,)
    blk = kernel_hwio.astype(jnp.float32) * (a * input_scale)  # (dy,dx,ci,co)
    inc = np.zeros((3, 24, 2, 8), np.float32)     # [dy, ry, par, t] incidence
    for dy in range(3):
        for par in range(2):
            for t in range(8):
                inc[dy, 2 * t + par + dy, par, t] = 1.0
    band = jnp.einsum("dwic,drpt->wirptc", blk, jnp.asarray(inc))
    we = band.reshape(216, 256)
    we = we.at[18, :].set(jnp.tile(bias, 16))     # cols (par, t, co)
    return we.astype(jnp.bfloat16)


def _stem_kernel_e(x_ref, w_ref, out_ref, p_ref):
    """v4: same deinterleaved-canvas input as v3, 33% fewer MXU pass-cycles.

    v3 issues 3 dots of (96,256)x(96,W) per 16-row group = 6 weight-tile
    passes x N=W = 3840 column-stream cycles (the kernel is dot-bound:
    tools/stem_split_probe.py).  v4 splits the conv by OUTPUT column parity:
    each parity needs 3x3ci x 18ry = 162 distinct input rows (the three dx
    taps land on parity slices pe0/po0/pe1 for even cols, po0/pe1/po1 for
    odd), packed compactly as nine 24-aligned bands -> K=216 (2 K-tiles), and
    the two parities' operands are OVERLAPPING row slices [0:216) / [72:288)
    of one 12-band scratch.  2 dots x (2 K-tiles x 2 M-tiles) x N=W/2 = 2560
    cycles.  The four parity slices are single-lane shifts of the two canvas
    blocks, so stores stay aligned and gather-free like v3.

    NOT bit-identical to v2/v3: fusing the three dx taps into one K=216
    accumulation changes the f32 summation order (same class of deviation as
    the XLA conv itself and fold_shuffle); pinned by tolerance + serving-level
    detection-agreement tests."""
    blk = x_ref.shape[3] // 2                     # col_parity_block(W)
    hw = out_ref.shape[3]                         # W/2 pooled columns
    h = x_ref.shape[2] - 2

    # zero the scratch with the two bias-ones rows (18 for the even dot's K
    # range, 90 = 72+18 for the odd dot's view of the same index) baked in —
    # one aligned full store; we[18, :] = bias (fold_stem_params_e)
    # arithmetic indicator (no i1 vectors): newer Mosaic rejects the
    # lane-replicated mask relayout an `(ridx==18)|(ridx==90)` select needs
    # ("Invalid relayout: non-singleton dim replicated in destination",
    # first seen 2026-08-20); max(0, 1-|ridx-r|) is layout-trivial
    ridx = jax.lax.broadcasted_iota(jnp.int32, p_ref.shape, 0)
    ind = (jnp.maximum(0, 1 - jnp.abs(ridx - 18))
           + jnp.maximum(0, 1 - jnp.abs(ridx - 90)))
    p_ref[:, :] = ind.astype(jnp.bfloat16)

    def group(g, carry):
        ce, co_ = carry
        for ci in range(3):
            rows = x_ref[0, ci, pl.ds(16 * g, 18), :]     # (18, 2*blk)
            pe0 = jax.lax.slice_in_dim(rows, 0, blk, axis=1)
            po0 = jax.lax.slice_in_dim(rows, blk, 2 * blk, axis=1)
            # pe1/po1 = the parity blocks advanced one lane; pe1's last lane
            # picks up po0[0] (junk) but only operand lanes < hw reach a dot
            pe1 = jax.lax.slice_in_dim(rows, 1, blk + 1, axis=1)
            po1 = jnp.concatenate(
                [jax.lax.slice_in_dim(rows, blk + 1, 2 * blk, axis=1),
                 jnp.zeros((18, 1), rows.dtype)], axis=1)
            p_ref[pl.ds(ci * 24, 18), :] = pe0
            p_ref[pl.ds(72 + ci * 24, 18), :] = po0
            p_ref[pl.ds(144 + ci * 24, 18), :] = pe1
            p_ref[pl.ds(216 + ci * 24, 18), :] = po1
        p = p_ref[:, :]                           # (288, blk) bf16
        a_e = jax.lax.slice(p, (0, 0), (216, hw))     # (pe0, po0, pe1) bands
        a_o = jax.lax.slice(p, (72, 0), (288, hw))    # (po0, pe1, po1) bands
        w = w_ref[:, :]
        o_e = jax.lax.dot_general(
            w, a_e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (256, hw): even cols
        o_o = jax.lax.dot_general(
            w, a_o, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # odd cols
        # bf16 round before the max tree (monotone → exact), as in v3
        e_ev = jax.lax.slice_in_dim(o_e, 0, 128, axis=0).astype(jnp.bfloat16)
        e_od = jax.lax.slice_in_dim(o_e, 128, 256, axis=0).astype(jnp.bfloat16)
        o_ev = jax.lax.slice_in_dim(o_o, 0, 128, axis=0).astype(jnp.bfloat16)
        o_od = jax.lax.slice_in_dim(o_o, 128, 256, axis=0).astype(jnp.bfloat16)
        # vertical max per column parity: pool row 8g+t = max(odd[t-1],
        # even[t], odd[t]); odd[t-1] = aligned concat of carry + odd[0:112]
        v_e = jnp.maximum(jnp.maximum(jnp.concatenate(
            [ce, jax.lax.slice_in_dim(e_od, 0, 112, axis=0)], axis=0),
            e_ev), e_od)                              # (128, hw) even cols
        v_o = jnp.maximum(jnp.maximum(jnp.concatenate(
            [co_, jax.lax.slice_in_dim(o_od, 0, 112, axis=0)], axis=0),
            o_ev), o_od)                              # odd cols
        zcol = jnp.zeros((128, 1), jnp.bfloat16)
        voc_m1 = jnp.concatenate(
            [zcol, jax.lax.slice_in_dim(v_o, 0, hw - 1, axis=1)], axis=1)
        hmax = jnp.maximum(jnp.maximum(voc_m1, v_e), v_o)   # (128, hw)
        out_ref[0, pl.ds(8 * g, 8), :, :] = (
            jnp.maximum(hmax, jnp.bfloat16(0.0)).astype(out_ref.dtype)
            .reshape(8, 16, hw))
        return (jax.lax.slice_in_dim(e_od, 112, 128, axis=0),
                jax.lax.slice_in_dim(o_od, 112, 128, axis=0))

    carry0 = (jnp.zeros((16, hw), jnp.bfloat16),
              jnp.zeros((16, hw), jnp.bfloat16))
    jax.lax.fori_loop(0, h // 16, group, carry0)


def _stem_call_e(w: int, x_cfd: jnp.ndarray, we: jnp.ndarray,
                 interpret: bool) -> jnp.ndarray:
    """Per-shard pallas_call for the v4 kernel — same input/output contract as
    `_stem_call_d` (deinterleaved canvas in, (B, H/2, 16, w/2) out); the bias
    rides inside `we` (fold_stem_params_e), so there is no bias operand."""
    b, c, h2, w2d = x_cfd.shape
    h = h2 - 2
    blk = w2d // 2
    out = pl.pallas_call(
        _stem_kernel_e,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h2, w2d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((216, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, 16, w // 2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((288, blk), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_cfd.astype(jnp.bfloat16), we)
    return out


def _stem_kernel_d(x_ref, wd_ref, b_ref, out_ref, p_ref):
    """v3: zero lane-gathers.  The input canvas arrives column-deinterleaved
    ([even-parity block | odd-parity block], see `col_parity_block` /
    `ops.resize.letterbox_batch_cf(deinterleave_cols=True)`), so the three dx
    GEMM operands are aligned block concats / single-lane shifts, the column
    split after the vertical max is two aligned halves, and the horizontal
    pool is one single-lane shift — the ops Mosaic executes natively.  v2's
    per-vreg `tpu.dynamic_gather` deinterleave (200 gathers per 640² image)
    disappears; executed MXU FLOPs are identical (3 dots of (96,256)x(96,W)
    per 16-row group vs v2's 6 of (96,128)x(96,W))."""
    blk = x_ref.shape[3] // 2                     # col_parity_block(W)
    hw = out_ref.shape[3]                         # W/2 pooled columns
    h = x_ref.shape[2] - 2
    bias = b_ref[:, :]                            # (256, 1) f32

    p_ref[:, :] = jnp.zeros_like(p_ref)

    def group(g, carry):
        for ci in range(3):
            p_ref[pl.ds(ci * 32, 18), :] = x_ref[0, ci, pl.ds(16 * g, 18), :]
        p = p_ref[:, :]                           # (96, 2*blk) bf16
        pe0 = jax.lax.slice_in_dim(p, 0, hw, axis=1)          # canvas 2j
        pe1 = jax.lax.slice_in_dim(p, 1, hw + 1, axis=1)      # canvas 2j+2
        po0 = jax.lax.slice_in_dim(p, blk, blk + hw, axis=1)  # canvas 2j+1
        po1 = jax.lax.slice_in_dim(p, blk + 1, blk + hw + 1, axis=1)
        # dx operands: [even-conv-col sample | odd-conv-col sample], N = W
        a0 = jnp.concatenate([pe0, po0], axis=1)
        a1 = jnp.concatenate([po0, pe1], axis=1)
        a2 = jnp.concatenate([pe1, po1], axis=1)
        o = bias
        for dx, a in enumerate((a0, a1, a2)):
            o = o + jax.lax.dot_general(
                wd_ref[dx], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (256, W)
        # round to bf16 BEFORE the max tree: round-to-nearest is monotone, so
        # round(max(S)) == max(round(S)) and the result is bit-identical to
        # maxing in f32 and rounding last (the output is bf16 either way) —
        # but every max/concat below moves half the vregs
        o_e = jax.lax.slice_in_dim(o, 0, 128, axis=0).astype(jnp.bfloat16)
        o_o = jax.lax.slice_in_dim(o, 128, 256, axis=0).astype(jnp.bfloat16)
        # vertical max (both column parities at once), as in v2
        odd_tm1 = jnp.concatenate(
            [carry, jax.lax.slice_in_dim(o_o, 0, 112, axis=0)], axis=0)
        v = jnp.maximum(jnp.maximum(odd_tm1, o_e), o_o)       # (128, W)
        v_ec = jax.lax.slice_in_dim(v, 0, hw, axis=1)
        v_oc = jax.lax.slice_in_dim(v, hw, 2 * hw, axis=1)
        # pooled col n = max(conv cols 2n-1, 2n, 2n+1) = max(voc[n-1], vec[n],
        # voc[n]); n=0's col -1 is pool pad → 0, absorbed by the ReLU clamp
        zcol = jnp.zeros((128, 1), jnp.bfloat16)
        voc_m1 = jnp.concatenate(
            [zcol, jax.lax.slice_in_dim(v_oc, 0, hw - 1, axis=1)], axis=1)
        hmax = jnp.maximum(jnp.maximum(voc_m1, v_ec), v_oc)   # (128, W/2)
        out_ref[0, pl.ds(8 * g, 8), :, :] = (
            jnp.maximum(hmax, jnp.bfloat16(0.0)).astype(out_ref.dtype)
            .reshape(8, 16, hw))
        return jax.lax.slice_in_dim(o_o, 112, 128, axis=0)

    carry0 = jnp.zeros((16, 2 * hw), jnp.bfloat16)
    jax.lax.fori_loop(0, h // 16, group, carry0)


def _stem_call_d(w: int, x_cfd: jnp.ndarray, wd3: jnp.ndarray,
                 bias3: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Per-shard pallas_call for the v3 kernel: deinterleaved-canvas input
    (B, 3, H+2, 2*col_parity_block(w)) → (B, H/2, 16, w/2).  `w` is explicit
    because one block width serves several pooled widths."""
    b, c, h2, w2d = x_cfd.shape
    h = h2 - 2
    out = pl.pallas_call(
        _stem_kernel_d,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h2, w2d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 96, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, 16, w // 2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((96, w2d), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_cfd.astype(jnp.bfloat16), wd3, bias3)
    return out


def _stem_kernel_f(em_ref, eh_ref, om_ref, oh_ref, w_ref, out_ref,
                   p_ref, ce_ref, co_ref):
    """v5: batch on the LANES, row-group grid, batch-minor output.

    Motivation (round-4/5 b128 profile): the batch-gridded v4 kernel can only
    emit per-image row-major bf16[B,H/2,16,W/2]{3,2,1,0}, and XLA relayouts it
    to the batch-minor {0,2,3,1} the large-batch convs want — 2×1.7 ms of
    SYNCHRONOUS TensorCore copies per b128 iteration (~8% of serving wall).
    v5 grids over (column chunk, row group) instead of batch and flattens
    (column, image) onto the lane dimension, so its output block
    (8, cw, 16, B) IS the batch-minor physical layout — the logical
    (H/2, W/2, 16, B) result is a bitcast away from the conv operand and the
    relayout disappears.  Same dual-parity compact-K dots and weight matrix
    as v4 (`fold_stem_params_e`): each output column's K=216 accumulation
    order is identical, so v5 ≡ v4 bit-exactly.

    Operands (same underlying canvas array, four windows):
      em/om: (3, 16, (cw+2)*B) — even/odd parity block, rows 16g..16g+16
      eh/oh: (3,  8, (cw+2)*B) — halo rows 16g+16..16g+24 (only the first 2
             are used; 8 because Mosaic needs 8-divisible sublane blocks,
             and the canvas carries 6 extra zero rows so the last group's
             window stays in bounds)
    Chunk columns are shifted one left (window col j = parity col w0+j-1,
    `ops.resize._chunk5_col_map`), so the extended dots also produce conv
    column w0-1 for the pooled-column shift; chunk 0's first window column is
    a zero column and its (bias-polluted) conv value is masked arithmetically
    before the horizontal max."""
    g = pl.program_id(1)
    wc = pl.program_id(0)
    cw = out_ref.shape[1]
    nb = out_ref.shape[3]                 # images per column on the lanes
    ni = (cw + 1) * nb                    # operand lanes: cols w0-1..w0+cw

    @pl.when(g == 0)
    def _init():
        # bias-ones rows 18/90 + zeroed spare rows (NaN×0 = NaN otherwise);
        # arithmetic indicator — no i1 vectors (Mosaic relayout, 2026-08-20)
        ridx = jax.lax.broadcasted_iota(jnp.int32, p_ref.shape, 0)
        ind = (jnp.maximum(0, 1 - jnp.abs(ridx - 18))
               + jnp.maximum(0, 1 - jnp.abs(ridx - 90)))
        p_ref[:, :] = ind.astype(jnp.bfloat16)
        ce_ref[:, :] = jnp.zeros_like(ce_ref)
        co_ref[:, :] = jnp.zeros_like(co_ref)

    for ci in range(3):
        for band, (m_ref, h_ref, lo) in enumerate((
                (em_ref, eh_ref, 0), (om_ref, oh_ref, 0),
                (em_ref, eh_ref, nb), (om_ref, oh_ref, nb))):
            r0 = band * 72 + ci * 24
            p_ref[pl.ds(r0, 16), :] = m_ref[ci, :, pl.ds(lo, ni)]
            p_ref[pl.ds(r0 + 16, 2), :] = h_ref[ci, 0:2, pl.ds(lo, ni)]
    p = p_ref[:, :]                       # (288, ni) bf16
    a_e = jax.lax.slice(p, (0, 0), (216, ni))      # (pe0, po0, pe1) bands
    a_o = jax.lax.slice(p, (72, 0), (288, ni))     # (po0, pe1, po1) bands
    w = w_ref[:, :]
    o_e = jax.lax.dot_general(
        w, a_e, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (256, ni): even cols
    o_o = jax.lax.dot_general(
        w, a_o, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # odd cols
    e_ev = jax.lax.slice_in_dim(o_e, 0, 128, axis=0).astype(jnp.bfloat16)
    e_od = jax.lax.slice_in_dim(o_e, 128, 256, axis=0).astype(jnp.bfloat16)
    o_ev = jax.lax.slice_in_dim(o_o, 0, 128, axis=0).astype(jnp.bfloat16)
    o_od = jax.lax.slice_in_dim(o_o, 128, 256, axis=0).astype(jnp.bfloat16)
    ce = ce_ref[:, :]
    co_ = co_ref[:, :]
    v_e = jnp.maximum(jnp.maximum(jnp.concatenate(
        [ce, jax.lax.slice_in_dim(e_od, 0, 112, axis=0)], axis=0),
        e_ev), e_od)                               # (128, ni) even cols
    v_o = jnp.maximum(jnp.maximum(jnp.concatenate(
        [co_, jax.lax.slice_in_dim(o_od, 0, 112, axis=0)], axis=0),
        o_ev), o_od)                               # odd cols
    ce_ref[:, :] = jax.lax.slice_in_dim(e_od, 112, 128, axis=0)
    co_ref[:, :] = jax.lax.slice_in_dim(o_od, 112, 128, axis=0)
    # pooled col n = max(v_o[n-1], v_e[n], v_o[n]); the shift by one pooled
    # column is a shift by nb (≥128) lanes — a full aligned vreg move
    voc_m1 = jax.lax.slice(v_o, (0, 0), (128, cw * nb))
    # col w0-1 is pool padding exactly when wc == 0: zero it arithmetically
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, cw * nb), 1)
    factor = jnp.maximum(jnp.minimum(lane // nb, 1),
                         jnp.minimum(wc, 1)).astype(jnp.bfloat16)
    voc_m1 = voc_m1 * factor
    hmax = jnp.maximum(
        jnp.maximum(voc_m1, jax.lax.slice(v_e, (0, nb), (128, ni))),
        jax.lax.slice(v_o, (0, nb), (128, ni)))    # (128, cw*nb)
    out = jnp.maximum(hmax, jnp.bfloat16(0.0))
    # (t*16+co, w*nb+b) → (t, w, co, b): every dest (16, nb) tile is an
    # aligned source sub-block (sublanes 16t.., lanes nb*w..) — a pure
    # tile-permutation, no intra-vreg shuffles
    out_ref[:] = (out.reshape(8, 16, cw, nb).transpose(0, 2, 1, 3)
                  .astype(out_ref.dtype))


def _stem_call_f(w: int, cw: int, x5: jnp.ndarray, we: jnp.ndarray,
                 interpret: bool) -> jnp.ndarray:
    """Per-shard pallas_call for the v5 kernel.  x5: the batch-minor chunked
    canvas (3, H+8, NC, B) with NC = 2*WC*(cw+2) (`letterbox_batch_cf5`);
    we from `fold_stem_params_e` (same matrix as v4).  Returns the
    batch-minor pooled stem output (H/2, W/2, 16, B)."""
    c, h2, nc, b = x5.shape
    h = h2 - 8
    wcn = (w // 2) // cw
    lw = (cw + 2) * b
    x5f = x5.astype(jnp.bfloat16).reshape(3, h2, nc * b)
    out = pl.pallas_call(
        _stem_kernel_f,
        grid=(wcn, h // 16),
        in_specs=[
            pl.BlockSpec((3, 16, lw), lambda wc, g: (0, g, wc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, lw), lambda wc, g: (0, 2 * g + 2, wc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 16, lw), lambda wc, g, _n=wcn: (0, g, _n + wc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, lw),
                         lambda wc, g, _n=wcn: (0, 2 * g + 2, _n + wc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((216, 256), lambda wc, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, cw, 16, b), lambda wc, g: (g, wc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, 16, b), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((288, (cw + 1) * b), jnp.bfloat16),
            pltpu.VMEM((16, (cw + 1) * b), jnp.bfloat16),
            pltpu.VMEM((16, (cw + 1) * b), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x5f, x5f, x5f, x5f, we)
    return out


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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_cf.astype(jnp.bfloat16), wd, bias)
    return out


@functools.lru_cache(maxsize=None)
def _partitionable_stem(interpret: bool, variant: str = "v2", w: int = 0,
                        cw: int = 0):
    """Mosaic custom-calls cannot be auto-partitioned by GSPMD/Shardy; the
    stem is trivially batch-parallel (grid=(B,)), so declare batch dim 0 of
    the image passthrough and everything else (weights, bias) replicated —
    batch-sharded DP serving then runs the kernel per-shard, reshard-free."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    if variant == "v2":
        impl = functools.partial(_stem_call, interpret=interpret)
        rule = "b c h w, p q k m, m u -> b e s g"
        # Shardy requires need_replication factors in rule-introduction order
        repl = ("c", "h", "w", "p", "q", "k", "m", "u", "e", "s", "g")
        nargs = 3
    elif variant == "v4":
        # no bias operand — it rides inside the weight matrix (v4b)
        impl = functools.partial(_stem_call_e, w, interpret=interpret)
        rule = "b c h w, k m -> b e s g"
        repl = ("c", "h", "w", "k", "m", "e", "s", "g")
        nargs = 2
    elif variant == "v5":
        # batch is the MINOR dim of both canvas and output (pallas_stem_f);
        # cw rides in the second static slot
        impl = functools.partial(_stem_call_f, w, cw, interpret=interpret)
        rule = "c h q b, k m -> p s g b"
        repl = ("c", "h", "q", "k", "m", "p", "s", "g")
        nargs = 2
    else:
        impl = functools.partial(_stem_call_d, w, interpret=interpret)
        rule = "b c h w, q k m, m u -> b e s g"
        repl = ("c", "h", "w", "q", "k", "m", "u", "e", "s", "g")
        nargs = 3
    fn = custom_partitioning(
        (lambda x, w: impl(x, w)) if nargs == 2 else
        (lambda x, w, b: impl(x, w, b)))
    # which axis of the image operand / result carries the batch: dim 0 for
    # the per-image-gridded kernels, the MINOR dim for v5 (batch-on-lanes)
    bdim = -1 if variant == "v5" else 0

    def _bshard(sharding, shape):
        nd = len(shape.shape)
        ax = bdim % nd
        spec_b = (sharding.spec[ax]
                  if len(sharding.spec) > ax else None)
        parts = [None] * nd
        parts[ax] = spec_b
        return NamedSharding(sharding.mesh, P(*parts))

    def _repl(sharding, shape):
        return NamedSharding(sharding.mesh,
                             P(*([None] * len(shape.shape))))

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _bshard(arg_shapes[0].sharding, result_shape)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            [_bshard(arg_shapes[0].sharding, arg_shapes[0])]
            + [_repl(a.sharding, a) for a in arg_shapes[1:]])
        result_sharding = _bshard(arg_shapes[0].sharding, result_shape)
        return mesh, impl, result_sharding, arg_shardings

    fn.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        # Shardy path: only the image batch dim is elementwise; every other
        # dim (image planes, GEMM weights, bias) must stay whole per shard
        sharding_rule=rule,
        need_replication_factors=repl,
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


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def pallas_stem_d(x_cfd: jnp.ndarray, wd3: jnp.ndarray, bias3: jnp.ndarray,
                  w: int, interpret: bool = False) -> jnp.ndarray:
    """v3 fused stem (gather-free; see `_stem_kernel_d`).  x_cfd
    (B, 3, H+2, 2*col_parity_block(w)) bf16: the COLUMN-DEINTERLEAVED
    zero-bordered canvas ([canvas cols 0,2,..,w | zeros | cols 1,3,..,w+1 |
    zeros], `ops.resize.letterbox_batch_cf(deinterleave_cols=True)` emits it
    at zero cost by permuting the horizontal resize matrix's rows); wd3/bias3
    from `fold_stem_params_d`.  Returns (B, H/2, 16, w/2) bf16 — bit-identical
    to `pallas_stem` (tests/test_pallas_stem.py pins it)."""
    b, c, h2, w2d = x_cfd.shape
    h = h2 - 2
    if c != 3 or h % 16 or w % 2 or w2d != 2 * col_parity_block(w):
        raise ValueError(
            f"pallas_stem_d needs (B,3,H+2,2*col_parity_block(w)) with "
            f"H%16==0, w even; got {x_cfd.shape} for w={w}")
    if len(jax.devices()) > 1:
        return _partitionable_stem(interpret, "v3", w)(
            x_cfd.astype(jnp.bfloat16), wd3, bias3)
    return _stem_call_d(w, x_cfd.astype(jnp.bfloat16), wd3, bias3, interpret)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def pallas_stem_e(x_cfd: jnp.ndarray, we: jnp.ndarray,
                  w: int, interpret: bool = False) -> jnp.ndarray:
    """v4 fused stem (compact-K dual-parity dots; see `_stem_kernel_e`).
    Same input contract as `pallas_stem_d` (column-deinterleaved canvas);
    we from `fold_stem_params_e` (bias folded into row 18).  Agreement with
    v2/v3 is tolerance-level, not bit-exact (K-fusion changes the f32
    summation order; the bias rounds to bf16 inside the weight matrix)."""
    b, c, h2, w2d = x_cfd.shape
    h = h2 - 2
    if c != 3 or h % 16 or w % 2 or w2d != 2 * col_parity_block(w):
        raise ValueError(
            f"pallas_stem_e needs (B,3,H+2,2*col_parity_block(w)) with "
            f"H%16==0, w even; got {x_cfd.shape} for w={w}")
    if len(jax.devices()) > 1:
        return _partitionable_stem(interpret, "v4", w)(
            x_cfd.astype(jnp.bfloat16), we)
    return _stem_call_e(w, x_cfd.astype(jnp.bfloat16), we, interpret)


@functools.partial(jax.jit, static_argnames=("w", "cw", "interpret"))
def pallas_stem_f(x5: jnp.ndarray, we: jnp.ndarray, w: int, cw: int = 40,
                  interpret: bool = False) -> jnp.ndarray:
    """v5 fused stem (batch-on-lanes, batch-minor output; `_stem_kernel_f`).

    x5: (3, H+8, 2*WC*(cw+2), B) — the chunked, shifted, duplicated-halo
    batch-minor canvas (`ops.resize.letterbox_batch_cf5`; the last 6 rows
    are zero padding for the 8-row halo windows), raw 0..255.
    we: from `fold_stem_params_e` (the v4 matrix, reused verbatim).
    Returns (H/2, w/2, 16, B) bf16 — physically the batch-minor layout XLA's
    large-batch convs consume, so the NHWC transpose downstream is a bitcast.
    Bit-identical to `pallas_stem_e` per element (same K=216 accumulation
    order per output column).  Needs B % 128 == 0 (lane alignment) and
    (w/2) % cw == 0."""
    c, h2, nc, b = x5.shape
    h = h2 - 8
    wcn = (w // 2) // cw if cw else 0
    if (c != 3 or h % 16 or w % 2 or b % 128 or not cw
            or (w // 2) % cw or nc != 2 * wcn * (cw + 2)):
        raise ValueError(
            f"pallas_stem_f needs (3,H+8,2*WC*(cw+2),B) with H%16==0, "
            f"(w/2)%cw==0, B%128==0; got {x5.shape} for w={w}, cw={cw}")
    if len(jax.devices()) > 1:
        return _partitionable_stem(interpret, "v5", w, cw)(
            x5.astype(jnp.bfloat16), we)
    return _stem_call_f(w, cw, x5.astype(jnp.bfloat16), we, interpret)
