"""On-chip Pallas kernel smoke: compile + correctness of every kernel.

The axon container's libtpu/Mosaic version can change BETWEEN sessions; a
kernel that was settled on-chip can silently stop compiling (2026-08-20: the
v4 stem's `(ridx==18)|(ridx==90)` i1 mask init hit "Invalid relayout:
non-singleton dim replicated in destination" on a newer Mosaic — the CPU
interpret-mode tests cannot catch this class).  This tool runs EVERY Pallas
kernel at tiny shapes on the live backend (interpret=False) and checks each
against its interpret-mode reference, printing one PASS/FAIL line per kernel
and exiting nonzero on any failure → run it first whenever a fresh container
gets a chip grant, before trusting 'auto' defaults.

Usage: python tools/kernel_smoke.py          (~3 min incl. compiles)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, fn):
    try:
        fn()
        print(f"PASS  {name}", flush=True)
    except Exception as e:
        FAILED.append(name)
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL  {name}: {msg}", flush=True)
        if os.environ.get("SMOKE_TRACE"):
            traceback.print_exc()


def stem_cases():
    from dcfa_yolo_tpu.ops.pallas_stem import (
        col_parity_block, fold_stem_params, fold_stem_params_d,
        fold_stem_params_e, pallas_stem, pallas_stem_d, pallas_stem_e,
        pallas_stem_f)
    from dcfa_yolo_tpu.ops.resize import chunk5_cols_cf, deinterleave_cols_cf

    B, H, W = 1, 32, 64
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(16) + 0.5, jnp.float32)
    x_cf = jnp.pad(jnp.transpose(img, (0, 3, 1, 2)),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))
    x_cfd = deinterleave_cols_cf(x_cf)
    assert x_cfd.shape[3] == 2 * col_parity_block(W)

    p2 = fold_stem_params(k, gamma, beta, mean, var)
    p3 = fold_stem_params_d(k, gamma, beta, mean, var)
    we = fold_stem_params_e(k, gamma, beta, mean, var)

    def v2():
        got = np.asarray(pallas_stem(x_cf, *p2, interpret=False))
        ref = np.asarray(pallas_stem(x_cf, *p2, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def v3():
        got = np.asarray(pallas_stem_d(x_cfd, *p3, w=W, interpret=False))
        ref = np.asarray(pallas_stem_d(x_cfd, *p3, w=W, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def v4():
        got = np.asarray(pallas_stem_e(x_cfd, we, w=W, interpret=False),
                         np.float32)
        ref = np.asarray(pallas_stem_e(x_cfd, we, w=W, interpret=True),
                         np.float32)
        # MXU K-fused accumulation order may differ from the interpret dot
        np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.02)
        frac = (got == ref).mean()
        assert frac > 0.99, f"only {frac:.4f} of elements bit-equal"

    def v5():
        # batch-on-lanes kernel: needs B % 128 == 0.  On-chip it shares v4's
        # MXU K-fused accumulation (vs the interpret dot), so interpret
        # agreement is tolerance-level; on-chip v5 ≡ on-chip v4 bit-exactly.
        b5 = 128
        img5 = jnp.asarray(rng.integers(0, 256, (b5, H, W, 3)), jnp.float32)
        x_cf5 = jnp.pad(jnp.transpose(img5, (0, 3, 1, 2)),
                        ((0, 0), (0, 0), (1, 1), (1, 1)))
        x5 = chunk5_cols_cf(x_cf5, 8)
        got5 = np.asarray(pallas_stem_f(x5, we, w=W, cw=8, interpret=False),
                          np.float32)
        ref = np.asarray(pallas_stem_f(x5, we, w=W, cw=8, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got5, ref, atol=0.05, rtol=0.02)
        frac = (got5 == ref).mean()
        assert frac > 0.99, f"only {frac:.4f} of elements bit-equal"
        x_cfd5 = deinterleave_cols_cf(x_cf5)
        v4chip = np.asarray(pallas_stem_e(x_cfd5, we, w=W, interpret=False),
                            np.float32)
        got_bhcw = np.transpose(got5, (3, 0, 2, 1))
        np.testing.assert_array_equal(got_bhcw, v4chip)

    check("stem v2 (pallas)", v2)
    check("stem v3 (pallas_d)", v3)
    check("stem v4 (pallas_e)", v4)
    check("stem v5 (pallas_f)", v5)


def nms_cases():
    from dcfa_yolo_tpu.ops.pallas_nms import (_BATCHED_MIN_B,
                                              pallas_greedy_suppress)

    rng = np.random.default_rng(5)

    def mk(b, k):
        xy = rng.random((b, k, 2)) * 100
        wh = rng.random((b, k, 2)) * 30 + 1
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
        n = rng.integers(1, k, b)
        alive = jnp.asarray(np.arange(k)[None, :] < n[:, None])
        return boxes, alive

    def per_image():
        boxes, alive = mk(2, 128)
        got = np.asarray(pallas_greedy_suppress(boxes, alive, 0.3,
                                                interpret=False))
        ref = np.asarray(pallas_greedy_suppress(boxes, alive, 0.3,
                                                interpret=True))
        np.testing.assert_array_equal(got, ref)

    def lane_batched():
        b = max(8, _BATCHED_MIN_B)
        boxes, alive = mk(b, 128)
        got = np.asarray(pallas_greedy_suppress(boxes, alive, 0.3,
                                                interpret=False))
        ref = np.asarray(pallas_greedy_suppress(boxes, alive, 0.3,
                                                interpret=True))
        np.testing.assert_array_equal(got, ref)

    check("nms per-image kernel", per_image)
    check("nms lane-batched kernel", lane_batched)


def train_stem_case():
    from dcfa_yolo_tpu.ops.pallas_stem_train import fused_train_stem

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16) * 0.2, jnp.float32)

    def loss(interp):
        def f(x, k, g, b):
            y, m, v = fused_train_stem(x, k, g, b, 1e-5, interpret=interp)
            return (y.astype(jnp.float32).sum()
                    + m.sum() + v.sum())
        return f

    def fwd_bwd():
        got = jax.value_and_grad(loss(False), argnums=(0, 1, 2, 3))(
            x, k, gamma, beta)
        ref = jax.value_and_grad(loss(True), argnums=(0, 1, 2, 3))(
            x, k, gamma, beta)
        np.testing.assert_allclose(float(got[0]), float(ref[0]),
                                   rtol=1e-4)
        for g, r in zip(got[1], ref[1]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-3, atol=1e-3)

    check("train stem fwd+bwd", fwd_bwd)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}  "
          f"devices: {[d.device_kind for d in jax.devices()]}", flush=True)
    if backend not in ("tpu", "axon"):
        # Off-chip every kernel FAILs for an unrelated reason (no Mosaic
        # lowering on CPU) and the verdict would misread as toolchain
        # breakage — the smoke is only meaningful on TPU.
        print("NOT ON TPU — kernel smoke is only meaningful on-chip; "
              "get a chip grant first (exit 2).", flush=True)
        sys.exit(2)
    stem_cases()
    nms_cases()
    train_stem_case()
    if FAILED:
        print(f"SMOKE FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("SMOKE OK: all Pallas kernels compile + match on this backend",
          flush=True)


if __name__ == "__main__":
    main()
