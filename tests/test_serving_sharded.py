"""DP serving over a device mesh: batch-sharded detect_batch, collective-free.

The training side's multi-device story is pinned elsewhere (dryrun +
test_fused_multidevice + the AOT v5e:2x4 artifact).  This pins the SERVING
side: the full fused pipeline (letterbox → dual forward → decode → NMS →
unmap) jitted with the batch sharded over all 8 virtual devices must

  * produce bit-identical results to the single-device program, and
  * contain NO collectives — every stage is per-image (the NMS class-offset
    reduction is deliberately kept inside the per-image vmap, ops/nms.py), so
    DP serving scales over ICI with zero cross-chip traffic.

The reference has no multi-GPU inference story beyond nn.DataParallel
(`/root/reference/yolo_mul.py:61`); this is its mesh-native replacement.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.infer.pipeline import detect_batch
from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
from dcfa_yolo_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(num_classes=2, phi="n", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.Generator(np.random.PCG64(3))
    b = 8
    rgb = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([48.0, 72.0], (b, 1)), jnp.float32)

    def fn(r, n, h):
        return detect_batch(model, variables, r, n, h, conf_thres=0.3,
                            iou_thres=0.5, letterbox=True, max_det=20,
                            pre_nms_topk=64)

    return fn, rgb, nir, hw


def test_sharded_serving_matches_single_device(setup):
    fn, rgb, nir, hw = setup
    assert len(jax.devices()) == 8

    single = jax.jit(fn)(rgb, nir, hw)

    mesh = make_mesh(8)
    dat = NamedSharding(mesh, P("data"))
    sharded_fn = jax.jit(fn, in_shardings=(dat, dat, dat), out_shardings=dat)
    sharded = sharded_fn(jax.device_put(rgb, dat), jax.device_put(nir, dat),
                         jax.device_put(hw, dat))

    # int/bool outputs (classes, valid, counts) must be exact; float outputs
    # may differ by ~1 ULP — GSPMD partitioning changes fusion order
    for a, b_, name in zip(single, sharded, single._fields):
        a, b_ = np.asarray(a), np.asarray(b_)
        if a.dtype.kind in "biu":
            np.testing.assert_array_equal(a, b_, err_msg=name)
        else:
            np.testing.assert_allclose(a, b_, rtol=1e-6, atol=1e-6,
                                       err_msg=name)


@pytest.mark.parametrize("fold,stem", [(False, "pallas"), (True, "pallas"),
                                       (True, "pallas_d"), (True, "pallas_e")],
                         ids=["nofold", "fold", "fold-v3", "fold-v4"])
def test_sharded_serving_pallas_backends(setup, fold, stem):
    """Mosaic custom-calls cannot be auto-partitioned; the custom_partitioning
    wrappers (ops/pallas_nms.py, ops/pallas_stem.py) declare the kernels
    batch-parallel.  A batch-sharded pipeline with BOTH Pallas backends forced
    (and, parametrized, channel-shuffle folding and the v3 stem on top) must
    run and match the single-device result."""
    cfg = ModelConfig(num_classes=2, phi="n", input_shape=(64, 64),
                      compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    if fold:
        from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables

        model = DCFAYolo(cfg, fold_shuffle=True)
        variables = fold_shuffle_variables(variables)
    rng = np.random.Generator(np.random.PCG64(7))
    b = 8
    rgb = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    nir = jnp.asarray(rng.integers(0, 255, (b, 48, 72, 3)), jnp.float32)
    hw = jnp.asarray(np.tile([48.0, 72.0], (b, 1)), jnp.float32)

    def fn(r, n, h):
        return detect_batch(model, variables, r, n, h, conf_thres=0.3,
                            iou_thres=0.5, letterbox=True, max_det=20,
                            pre_nms_topk=64, nms_backend="pallas",
                            stem_backend=stem)

    single = jax.jit(fn)(rgb, nir, hw)
    mesh = make_mesh(8)
    dat = NamedSharding(mesh, P("data"))
    sharded = jax.jit(fn, in_shardings=(dat, dat, dat), out_shardings=dat)(
        jax.device_put(rgb, dat), jax.device_put(nir, dat),
        jax.device_put(hw, dat))
    for a, b_, name in zip(single, sharded, single._fields):
        a, b_ = np.asarray(a), np.asarray(b_)
        if a.dtype.kind in "biu":
            np.testing.assert_array_equal(a, b_, err_msg=name)
        else:
            # bf16 pipeline: partitioning changes fusion order around the
            # kernels; a few box coords move by ~1e-5 px
            np.testing.assert_allclose(a, b_, rtol=5e-3, atol=1e-3,
                                       err_msg=name)


def test_sharded_serving_has_no_collectives_on_tpu_target():
    """Deviceless XLA:TPU lowering for a v5e:2x4 mesh: zero collectives.

    The assertion is made on the TPU target, not the CPU test backend:
    XLA:CPU lowers per-image top_k to an unpartitioned TopK custom-call and
    all-gathers the batch around it — a CPU-backend artifact, absent from the
    TPU lowering (verified: all collective counts 0).
    """
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
    cfg = ModelConfig(num_classes=2, phi="n", input_shape=(64, 64))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    b = 8
    dat = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def sds(shape, dtype, sh):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    vs = jax.tree_util.tree_map(
        lambda a: sds(a.shape, a.dtype, rep), variables)
    rgb = sds((b, 48, 72, 3), jnp.float32, dat)
    hw = sds((b, 2), jnp.float32, dat)

    def fn(v, r, n, h):
        # backend pinned to 'xla': 'auto' resolves by the RUNTIME backend
        # (cpu here), and the deviceless TPU lowering must not depend on it
        return detect_batch(model, v, r, n, h, conf_thres=0.3,
                            iou_thres=0.5, letterbox=True, max_det=20,
                            pre_nms_topk=64, nms_backend="xla")

    hlo = jax.jit(fn, out_shardings=dat).lower(vs, rgb, rgb, hw) \
        .compile().as_text()
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        assert not re.search(rf"\b{op}(?:-start)?\(", hlo), (
            f"TPU serving program contains {op} — DP serving should be "
            f"collective-free (per-image NMS offset regressed?)")
