"""A/B the Pallas fused stem against the XLA stem sequence on the real TPU.

Compares numerics (vs a bf16 XLA reference with the same operand dtypes) and
chained-dependency timing at serving shapes.  See ops/pallas_stem.py for the
design and tools/stem_probe.py for the XLA-side cost that motivated it.

Run on the real TPU:  python tools/stem_pallas_ab.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

from dcfa_yolo_tpu.ops.pallas_stem import fold_stem_params, pallas_stem


def xla_stem_bf16(img, k, a, b):
    """bf16 XLA stem on raw 0..255 NHWC input (same contract as the kernel)."""
    x = (img.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16), 0.0)
    return jax.lax.reduce_window(
        y, -jnp.asarray(np.inf, jnp.bfloat16), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])


def timeit_chained(f, x, iters=20):
    def step(x):
        y = f(x)
        return x + jnp.max(y).astype(x.dtype) * 1e-12

    step = jax.jit(step)
    fetch = jax.jit(lambda z: jnp.max(z[0, 0, 0]))
    z = x
    for _ in range(12):
        z = step(z)
    np.asarray(jax.device_get(fetch(z)))
    t0 = time.perf_counter()
    for _ in range(iters):
        z = step(z)
    np.asarray(jax.device_get(fetch(z)))
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    be = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mu = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)
    a = g / jnp.sqrt(var + 1e-5)
    bb = be - mu * a
    wd, bias = fold_stem_params(k, g, be, mu, var)

    # numerics on a slice
    ref = jax.jit(lambda x: xla_stem_bf16(x, k, a, bb))(img[:2])
    xcf = jnp.pad(jnp.transpose(img[:2], (0, 3, 1, 2)),
                  ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = pallas_stem(xcf.astype(jnp.bfloat16), wd, bias)
    out_nhwc = jnp.transpose(out, (0, 1, 3, 2))
    d = np.abs(np.asarray(out_nhwc, np.float32) - np.asarray(ref, np.float32))
    ref_f = np.abs(np.asarray(ref, np.float32))
    print(f"numerics vs bf16 XLA stem: max abs {d.max():.5f}  "
          f"max rel(>0.1) {(d / np.maximum(ref_f, 0.1)).max():.5f}", flush=True)

    # timing: XLA stem from raw NHWC, Pallas stem from CF-bordered input
    t_xla = timeit_chained(
        lambda x: xla_stem_bf16(x, k, a, bb).astype(jnp.float32), img)
    xcf_full = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                       ((0, 0), (0, 0), (1, 1), (1, 1))).astype(jnp.bfloat16)
    t_pal = timeit_chained(
        lambda x: pallas_stem(x, wd, bias).astype(jnp.float32), xcf_full)
    # v3: gather-free kernel on the column-deinterleaved canvas (the product
    # letterbox emits that layout for free; here a one-time device gather)
    from dcfa_yolo_tpu.ops.pallas_stem import fold_stem_params_d, pallas_stem_d
    from dcfa_yolo_tpu.ops.resize import deinterleave_cols_cf

    wd3, bias3 = fold_stem_params_d(k, g, be, mu, var)
    xcfd_full = jax.jit(deinterleave_cols_cf)(xcf_full)
    o2 = pallas_stem(xcf_full[:2], wd, bias)
    o3 = pallas_stem_d(xcfd_full[:2], wd3, bias3, w=W)
    same = bool(jnp.array_equal(o2, o3))
    t_pal3 = timeit_chained(
        lambda x: pallas_stem_d(x, wd3, bias3, w=W).astype(jnp.float32),
        xcfd_full)
    print(f"v3 (gather-free) stem: {t_pal3*1e3:.2f} ms   "
          f"bit-identical to v2 on-chip: {same}", flush=True)
    # v4: compact-K dual-parity dots (2560 vs 3840 MXU pass-cycles/group);
    # tolerance-level agreement only (K fusion reorders the f32 accumulation)
    from dcfa_yolo_tpu.ops.pallas_stem import fold_stem_params_e, pallas_stem_e

    we4 = fold_stem_params_e(k, g, be, mu, var)
    o4 = pallas_stem_e(xcfd_full[:2], we4, w=W)
    d4 = np.abs(np.asarray(o3, np.float32) - np.asarray(o4, np.float32))
    eq4 = float((np.asarray(o3) == np.asarray(o4)).mean())
    t_pal4 = timeit_chained(
        lambda x: pallas_stem_e(x, we4, w=W).astype(jnp.float32),
        xcfd_full)
    print(f"v4 (compact-K) stem: {t_pal4*1e3:.2f} ms   vs v3: max abs "
          f"{d4.max():.5f}, exact-frac {eq4:.5f}", flush=True)
    # v5: batch-on-lanes, batch-minor output (needs B % 128 == 0); same dots
    # as v4 -> bit-equal on-chip.  Standalone timing EXCLUDES its real win
    # (the downstream relayout removal) — the pipeline A/B is the decider.
    if B % 128 == 0:
        from dcfa_yolo_tpu.ops.pallas_stem import chunk5_cw, pallas_stem_f
        from dcfa_yolo_tpu.ops.resize import chunk5_cols_cf

        cw5 = chunk5_cw(W)
        if cw5:
            x5_full = jax.jit(lambda x: chunk5_cols_cf(x, cw5))(xcf_full)
            o5 = pallas_stem_f(x5_full, we4, w=W, cw=cw5)
            eq5 = float((np.asarray(jnp.transpose(o5, (3, 0, 2, 1)))
                         == np.asarray(pallas_stem_e(xcfd_full, we4, w=W))
                         ).mean())
            t_pal5 = timeit_chained(
                lambda x: pallas_stem_f(x, we4, w=W, cw=cw5)
                .astype(jnp.float32), x5_full)
            print(f"v5 (batch-minor) stem: {t_pal5*1e3:.2f} ms   vs v4 "
                  f"on-chip exact-frac {eq5:.5f}", flush=True)
    # end-to-end equivalent: include the NHWC raw → CF-bordered arrangement
    def pal_e2e(x):
        xc = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                     ((0, 0), (0, 0), (1, 1), (1, 1))).astype(jnp.bfloat16)
        return pallas_stem(xc, wd, bias).astype(jnp.float32)
    t_pal_e2e = timeit_chained(pal_e2e, img)
    print(f"b{B} {H}x{W}:  XLA stem {t_xla*1e3:.2f} ms   "
          f"pallas stem {t_pal*1e3:.2f} ms (kernel only)   "
          f"{t_pal_e2e*1e3:.2f} ms (incl. NHWC→CF arrange)   "
          f"speedup {t_xla/t_pal_e2e:.2f}x", flush=True)

    if os.environ.get("STEM_AB_PIPELINE") == "1":
        pipeline_ab(B)


def pipeline_ab(batch):
    """Full fused serving pipeline (bench.py's exact configuration) with the
    XLA stem vs the Pallas stem."""
    import time

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import deploy_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    model = DCFAYolo(cfg, deploy=True)
    variables = jax.jit(deploy_variables)(variables)
    rng = np.random.Generator(np.random.PCG64(0))
    rgb = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (batch, 480, 602, 3)), jnp.float32)
    image_hw = jnp.asarray(np.tile([480.0, 602.0], (batch, 1)), jnp.float32)

    for backend in ("xla", "pallas"):
        fn = jax.jit(lambda r, n: detect_batch(
            model, variables, r, n, image_hw, conf_thres=0.5, iou_thres=0.3,
            letterbox=True, max_det=300, pre_nms_topk=512,
            nms_backend="pallas", stem_backend=backend))

        def step(x):
            r, n = x
            res = fn(r, n)
            bump = jnp.max(res.scores).astype(jnp.float32) * 1e-12
            return (r + bump, n + bump)

        step = jax.jit(step)
        z = (rgb, nir)
        for _ in range(12):
            z = step(z)
        np.asarray(jax.device_get(z[0][0, 0, 0, :1]))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            z = step(z)
        np.asarray(jax.device_get(z[0][0, 0, 0, :1]))
        dt = (time.perf_counter() - t0) / iters
        print(f"pipeline b{batch} stem={backend}: {dt*1e3:.2f} ms  "
              f"{batch/dt:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
