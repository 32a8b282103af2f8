"""Export the fused serving pipeline as a portable StableHLO artifact.

The reference ships serving as "load the .pth into Python and call the
class" (`/root/reference/yolo_mul.py:51-62`); the TPU-native analogue of a
deployable model is a serialized StableHLO program: the WHOLE fused pipeline
(uint8 pair -> letterbox -> dual-backbone forward on the RepGhost-fused
deploy graph -> DFL decode -> fixed-shape NMS -> original-image boxes) is
exported with `jax.export`, weights baked in as constants, callable from any
runtime that speaks StableHLO (TF/TFLite converters, IREE, a C++ XLA runner,
or jax.export.deserialize in another process with no model code present).

Usage:
  python tools/export_stablehlo.py out.stablehlo [--model-path ckpt]
      [--batch 8] [--size 640] [--conf 0.5] [--nms-iou 0.3]
      [--classes-path model_data/voc_classes.txt]

Verifies the artifact by deserializing and comparing outputs against the
in-process pipeline before writing.  NMS uses the pure-XLA backend so the
artifact contains no TPU-specific custom calls (the Pallas kernel stays a
runtime-selectable fast path, not a serialization dependency).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_exported(variables, cfg, batch: int, conf: float, nms_iou: float,
                   max_det: int = 300, fold_shuffle: bool = False):
    """Export detect_batch (deploy graph, weights as constants) for
    (B,H,W,3)xu8 pairs at the model input size.  Returns jax.export.Exported."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from dcfa_yolo_tpu.infer.pipeline import detect_batch
    from dcfa_yolo_tpu.models.reparam import deploy_variables
    from dcfa_yolo_tpu.models.yolo import DCFAYolo
    from dcfa_yolo_tpu.ops.nms import NMSResult

    try:  # output pytree type must be registered for serialization
        jexport.register_namedtuple_serialization(
            NMSResult, serialized_name="dcfa_yolo_tpu.NMSResult")
    except ValueError:
        pass  # already registered in this process

    model = DCFAYolo(cfg, deploy=True, fold_shuffle=fold_shuffle)
    dvars = jax.jit(deploy_variables)(variables)
    if fold_shuffle:
        from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables

        dvars = jax.jit(fold_shuffle_variables)(dvars)

    def serve(rgb, nir, image_hw):
        # Pure-StableHLO backends only: 'auto' on a TPU host would resolve
        # Pallas stems/NMS, baking Mosaic custom calls into the artifact —
        # platform-version-pinned and rejected by jax.export's safety checks.
        # The artifact trades the kernels' speed for portability; a consumer
        # re-running on TPU gets the kernels by serving in-process instead.
        return detect_batch(model, dvars, rgb, nir, image_hw,
                            conf_thres=conf, iou_thres=nms_iou,
                            letterbox=True, max_det=max_det,
                            nms_backend="xla", stem_backend="xla")

    h, w = cfg.input_shape
    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    hw_spec = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    return jexport.export(jax.jit(serve))(spec, spec, hw_spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--model-path", default="",
                    help="checkpoint to bake in (random init if omitted)")
    ap.add_argument("--classes-path", default="model_data/voc_classes.txt")
    ap.add_argument("--phi", default="n")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--nms-iou", type=float, default=0.3)
    ap.add_argument("--fold-shuffle", action="store_true",
                    help="bake in channel-shuffle folding (fewer relayout "
                         "copies in the artifact; exact up to FP sum order)")
    args = ap.parse_args()

    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    from jax import export as jexport

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.infer.predictor import get_classes
    from dcfa_yolo_tpu.models.yolo import init_model

    if os.path.exists(args.classes_path):
        _, num_classes = get_classes(args.classes_path)
    else:
        num_classes = 1
    cfg = ModelConfig(num_classes=num_classes, phi=args.phi,
                      input_shape=(args.size, args.size),
                      compute_dtype="bfloat16")
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    if args.model_path:
        from dcfa_yolo_tpu.utils.checkpoint import load_variables

        variables = load_variables(args.model_path, variables)

    exported = build_exported(variables, cfg, args.batch, args.conf,
                              args.nms_iou, fold_shuffle=args.fold_shuffle)
    blob = exported.serialize()

    # roundtrip check: artifact output == in-process pipeline output
    rng = np.random.Generator(np.random.PCG64(0))
    rgb = rng.integers(0, 255, (args.batch, args.size, args.size, 3),
                       dtype=np.uint8)
    nir = rng.integers(0, 255, (args.batch, args.size, args.size, 3),
                       dtype=np.uint8)
    hw = np.tile([float(args.size), float(args.size)],
                 (args.batch, 1)).astype(np.float32)
    want = exported.call(rgb, nir, hw)
    got = jexport.deserialize(blob).call(rgb, nir, hw)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {args.output}: {len(blob)/1e6:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"inputs=(2x uint8[{args.batch},{args.size},{args.size},3], "
          f"f32[{args.batch},2]), roundtrip verified")


if __name__ == "__main__":
    main()
