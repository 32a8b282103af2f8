"""Split the v3 stem kernel's on-chip time into MXU (dots) vs VPU (max tree)
components, and test whether double-buffering the row scratch lets Mosaic
overlap them across fori groups.

Standalone v3 measures 9.5 ms/backbone at b128 640² while its MXU pass floor
is ~3.3 ms (240 passes/img × 640 cols / ~6 MXU-equiv) and the VPU vreg count
is ~2.6 ms — if dots-only + tree-only ≈ full, the kernel is serialization-
bound and a software-pipelined variant is the next win; if dots-only ≈ full,
the MXU analysis is wrong and K/M repacking is the lever.

Variants (identical in/out shapes so DMA time cancels):
  full    — the real _stem_kernel_d
  dots    — GEMMs + bias + bf16 cast, pooled output = o_e slice (no max tree)
  vpu     — skip GEMMs (o = broadcast bias), full max tree + stores
  dblbuf  — full kernel with a 2-deep scratch so group g+1's stores/dots can
            overlap group g's max tree (no serializing scratch WAR hazard)
  pipe    — software-pipelined: iteration g issues dots(g+1) into a double-
            buffered o-scratch AND runs tree(g) on the previous slot, so the
            MXU stream and the VPU stream sit in one loop body with no data
            dependency between them — the strongest hint Mosaic can bundle
            them.  Bit-identical output to full.

Run: python tools/stem_split_probe.py [batch] > /tmp/stem_split.log 2>&1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcfa_yolo_tpu.ops import pallas_stem as ps
from dcfa_yolo_tpu.ops.resize import deinterleave_cols_cf
from dcfa_yolo_tpu.utils.profiling import timeit_chained


def make_kernel(variant: str):
    def kernel(x_ref, wd_ref, b_ref, out_ref, p_ref):
        blk = x_ref.shape[3] // 2
        hw = out_ref.shape[3]
        h = x_ref.shape[2] - 2
        bias = b_ref[:, :]
        nbuf = p_ref.shape[0] // 96  # 1 or 2 scratch slots

        p_ref[:, :] = jnp.zeros_like(p_ref)

        def group(g, carry):
            base = (g % nbuf) * 96 if nbuf > 1 else 0
            for ci in range(3):
                p_ref[pl.ds(base + ci * 32, 18), :] = \
                    x_ref[0, ci, pl.ds(16 * g, 18), :]
            p = p_ref[pl.ds(base, 96), :]
            pe0 = jax.lax.slice_in_dim(p, 0, hw, axis=1)
            pe1 = jax.lax.slice_in_dim(p, 1, hw + 1, axis=1)
            po0 = jax.lax.slice_in_dim(p, blk, blk + hw, axis=1)
            po1 = jax.lax.slice_in_dim(p, blk + 1, blk + hw + 1, axis=1)
            a0 = jnp.concatenate([pe0, po0], axis=1)
            a1 = jnp.concatenate([po0, pe1], axis=1)
            a2 = jnp.concatenate([pe1, po1], axis=1)
            if variant == "vpu":
                # no dots; int-iota-anchored so Mosaic materializes real
                # vregs (a broadcast slice crashes its layout pass, and
                # tpu.iota is integer-only), dep on g kept
                o = (jax.lax.broadcasted_iota(jnp.int32, (256, 2 * hw), 1)
                     .astype(jnp.float32) * 1e-30 + bias
                     + jnp.float32(1.0) * g)
            else:
                o = bias
                for dx, a in enumerate((a0, a1, a2)):
                    o = o + jax.lax.dot_general(
                        wd_ref[dx], a, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_e = jax.lax.slice_in_dim(o, 0, 128, axis=0).astype(jnp.bfloat16)
            o_o = jax.lax.slice_in_dim(o, 128, 256, axis=0).astype(jnp.bfloat16)
            if variant == "dots":
                out_ref[0, pl.ds(8 * g, 8), :, :] = (
                    jax.lax.slice_in_dim(o_e, 0, hw, axis=1)
                    .reshape(8, 16, hw))
                return jax.lax.slice_in_dim(o_o, 112, 128, axis=0)
            odd_tm1 = jnp.concatenate(
                [carry, jax.lax.slice_in_dim(o_o, 0, 112, axis=0)], axis=0)
            v = jnp.maximum(jnp.maximum(odd_tm1, o_e), o_o)
            v_ec = jax.lax.slice_in_dim(v, 0, hw, axis=1)
            v_oc = jax.lax.slice_in_dim(v, hw, 2 * hw, axis=1)
            zcol = jnp.zeros((128, 1), jnp.bfloat16)
            voc_m1 = jnp.concatenate(
                [zcol, jax.lax.slice_in_dim(v_oc, 0, hw - 1, axis=1)], axis=1)
            hmax = jnp.maximum(jnp.maximum(voc_m1, v_ec), v_oc)
            out_ref[0, pl.ds(8 * g, 8), :, :] = (
                jnp.maximum(hmax, jnp.bfloat16(0.0)).astype(out_ref.dtype)
                .reshape(8, 16, hw))
            return jax.lax.slice_in_dim(o_o, 112, 128, axis=0)

        carry0 = jnp.zeros((16, 2 * hw), jnp.bfloat16)
        jax.lax.fori_loop(0, h // 16, group, carry0)

    return kernel


def pipe_kernel(x_ref, wd_ref, b_ref, out_ref, p_ref, o_ref, c_ref):
    """Software-pipelined v3: dots(g+1) and tree(g) share one loop body with
    disjoint scratch slots, so the MXU and VPU streams have no data deps."""
    blk = x_ref.shape[3] // 2
    hw = out_ref.shape[3]
    h = x_ref.shape[2] - 2
    ngroups = h // 16
    bias = b_ref[:, :]

    p_ref[:, :] = jnp.zeros_like(p_ref)

    def dots(g):
        slot = g % 2
        for ci in range(3):
            p_ref[pl.ds(slot * 96 + ci * 32, 18), :] = \
                x_ref[0, ci, pl.ds(16 * g, 18), :]
        p = p_ref[pl.ds(slot * 96, 96), :]
        pe0 = jax.lax.slice_in_dim(p, 0, hw, axis=1)
        pe1 = jax.lax.slice_in_dim(p, 1, hw + 1, axis=1)
        po0 = jax.lax.slice_in_dim(p, blk, blk + hw, axis=1)
        po1 = jax.lax.slice_in_dim(p, blk + 1, blk + hw + 1, axis=1)
        o = bias
        for dx, a in enumerate((jnp.concatenate([pe0, po0], axis=1),
                                jnp.concatenate([po0, pe1], axis=1),
                                jnp.concatenate([pe1, po1], axis=1))):
            o = o + jax.lax.dot_general(
                wd_ref[dx], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[pl.ds(slot * 256, 256), :] = o.astype(jnp.bfloat16)

    def tree(g):
        slot = g % 2
        o_e = o_ref[pl.ds(slot * 256, 128), :]
        o_o = o_ref[pl.ds(slot * 256 + 128, 128), :]
        odd_tm1 = jnp.concatenate(
            [c_ref[:, :], jax.lax.slice_in_dim(o_o, 0, 112, axis=0)], axis=0)
        v = jnp.maximum(jnp.maximum(odd_tm1, o_e), o_o)
        v_ec = jax.lax.slice_in_dim(v, 0, hw, axis=1)
        v_oc = jax.lax.slice_in_dim(v, hw, 2 * hw, axis=1)
        zcol = jnp.zeros((128, 1), jnp.bfloat16)
        voc_m1 = jnp.concatenate(
            [zcol, jax.lax.slice_in_dim(v_oc, 0, hw - 1, axis=1)], axis=1)
        hmax = jnp.maximum(jnp.maximum(voc_m1, v_ec), v_oc)
        out_ref[0, pl.ds(8 * g, 8), :, :] = (
            jnp.maximum(hmax, jnp.bfloat16(0.0)).astype(out_ref.dtype)
            .reshape(8, 16, hw))
        c_ref[:, :] = jax.lax.slice_in_dim(o_o, 112, 128, axis=0)

    c_ref[:, :] = jnp.zeros_like(c_ref)
    dots(0)

    def body(g, _):
        @pl.when(g + 1 < ngroups)
        def _():
            dots(g + 1)
        tree(g)
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


def call(variant: str, w: int, x_cfd, wd3, bias3):
    b, c, h2, w2d = x_cfd.shape
    h = h2 - 2
    nbuf = 2 if variant == "dblbuf" else 1
    if variant == "pipe":
        kern = pipe_kernel
        scratch = [pltpu.VMEM((192, w2d), jnp.bfloat16),
                   pltpu.VMEM((512, w), jnp.bfloat16),
                   pltpu.VMEM((16, w), jnp.bfloat16)]
    else:
        kern = make_kernel("full" if variant == "dblbuf" else variant)
        scratch = [pltpu.VMEM((96 * nbuf, w2d), jnp.bfloat16)]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h2, w2d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 96, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, 16, w // 2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, 16, w // 2), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x_cfd.astype(jnp.bfloat16), wd3, bias3)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = 640
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  b{batch} {size}^2",
          flush=True)

    rng = np.random.Generator(np.random.PCG64(0))
    img = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3)),
                      jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16)), jnp.float32)
    gamma = jnp.ones(16); beta = jnp.zeros(16)
    mean = jnp.zeros(16); var = jnp.ones(16)
    wd3, bias3 = ps.fold_stem_params_d(kern, gamma, beta, mean, var)

    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1))).astype(jnp.bfloat16)
    x_cfd = jax.jit(deinterleave_cols_cf)(x_cf)
    jax.block_until_ready(x_cfd)
    print(f"canvas: {x_cfd.shape} {x_cfd.dtype}", flush=True)

    ref = None
    for variant in ("full", "dblbuf", "pipe", "dots", "vpu"):
        fn = jax.jit(lambda x, v=variant: call(v, size, x, wd3, bias3))
        out = fn(x_cfd)
        jax.block_until_ready(out)
        if variant == "full":
            ref = np.asarray(out)
        if variant in ("dblbuf", "pipe"):
            same = bool(np.array_equal(np.asarray(out), ref))
            print(f"{variant} bit-identical to full: {same}", flush=True)
        dt = timeit_chained(fn, (x_cfd,), iters=20, trials=3, warmup=10)
        print(f"{variant:7s}: {dt * 1e3:7.3f} ms  "
              f"({dt / batch * 1e6:6.2f} us/img)", flush=True)


if __name__ == "__main__":
    main()
