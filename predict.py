"""Inference CLI — counterpart of `predict_mul.py` (modes: predict / fps /
dir_predict / heatmap)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="DCFA-YOLO TPU inference")
    p.add_argument("--mode", default="predict",
                   choices=["predict", "fps", "dir_predict", "heatmap"])
    p.add_argument("--model-path", default="", help=".ckpt/.pth/.npz weights")
    p.add_argument("--classes-path", default="model_data/voc_classes.txt")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--phi", default="n")
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--nms-iou", type=float, default=0.3)
    p.add_argument("--rgb", default="img/sample_rgb.png",
                   help="RGB image path (predict/fps/heatmap)")
    p.add_argument("--nir", default="img/sample_nir.png",
                   help="NIR image path (predict/fps/heatmap)")
    p.add_argument("--test-interval", type=int, default=100)
    p.add_argument("--dir-origin-path", default="img/")
    p.add_argument("--dir-save-path", default="img_out/")
    p.add_argument("--heatmap-save-path", default="model_data/heatmap_vision.png")
    p.add_argument("--output", default="", help="save annotated image here")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--deploy", action="store_true",
                   help="use the re-parameterized (fused RepGhost) graph")
    p.add_argument("--nms-backend", default="auto", choices=["auto", "xla", "pallas", "pallas_d"],
                   help="greedy-suppression backend: XLA fori-loop or the "
                        "Pallas TPU kernel (identical outputs, verified "
                        "on-chip)")
    p.add_argument("--batch-size", type=int, default=1,
                   help="dir_predict: device batch size (1 = per-image; >1 "
                        "batches same-sized pairs through the fused pipeline)")
    p.add_argument("--stem-backend", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_d", "pallas_e"],
                   help="backbone-stem backend: XLA conv+maxpool or the fused "
                        "Pallas VMEM kernel (ops/pallas_stem.py; bf16 only)")
    p.add_argument("--fold-shuffle", action="store_true",
                   help="serve with channel_shuffles folded into downstream "
                        "weights (reparam.fold_shuffle_variables; exact up to "
                        "FP summation order)")
    p.add_argument("--pair-backbones", action="store_true",
                   help="serve both backbones as ONE doubled-channel stream "
                        "with block-diagonal weights (models/pairing.py; "
                        "small-batch option, implies --fold-shuffle)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.mode in ("predict", "fps", "heatmap") and not (args.rgb and args.nir):
        raise SystemExit(
            f"--mode {args.mode} needs --rgb and --nir image paths")
    from PIL import Image
    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor

    predictor = YOLOPredictor(
        model_path=args.model_path or None, classes_path=args.classes_path,
        input_shape=tuple(args.input_shape), phi=args.phi,
        confidence=args.confidence, nms_iou=args.nms_iou,
        compute_dtype=args.compute_dtype, deploy=args.deploy,
        nms_backend=args.nms_backend, stem_backend=args.stem_backend,
        fold_shuffle=args.fold_shuffle or args.pair_backbones,
        pair_backbones=args.pair_backbones)
    # deploy=True re-parameterizes inside the predictor (train-graph
    # checkpoint -> fused serving weights); no external transform needed

    def load_pair(rgb_path, nir_path):
        return Image.open(rgb_path), Image.open(nir_path)

    if args.mode == "predict":
        rgb, nir = load_pair(args.rgb, args.nir)
        out = predictor.detect_image(rgb, nir)
        dest = args.output or "img_out/sample_prediction.png"
        if not args.output:
            os.makedirs("img_out", exist_ok=True)
        out.save(dest)
        print(f"saved {dest}")
    elif args.mode == "fps":
        rgb, nir = load_pair(args.rgb, args.nir)
        tact = predictor.get_fps(rgb, nir, args.test_interval)
        print(f"{tact:.6f} seconds, {1 / tact:.2f} FPS, @batch_size 1")
    elif args.mode == "dir_predict":
        os.makedirs(args.dir_save_path, exist_ok=True)
        rgb_dir = os.path.join(args.dir_origin_path, "rgb")
        nir_dir = os.path.join(args.dir_origin_path, "nir")
        names = [n for n in sorted(os.listdir(rgb_dir)) if n.lower().endswith(
            (".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff"))]
        if args.batch_size <= 1:
            for name in names:
                rgb = Image.open(os.path.join(rgb_dir, name))
                nir = Image.open(os.path.join(nir_dir, name))
                out = predictor.detect_image(rgb, nir)
                out.save(os.path.join(args.dir_save_path, name), quality=95,
                         subsampling=0)
                print(name)
        else:
            # throughput path: ONE device dispatch per batch of same-sized
            # pairs (grouped by size — the compiled program's shapes are
            # static), results drawn per image on the host
            from dcfa_yolo_tpu.infer.predictor import pil_to_rgb_array

            groups = {}
            for name in names:
                rgb = Image.open(os.path.join(rgb_dir, name))
                groups.setdefault(rgb.size, []).append(name)
            for size, group in groups.items():
                for i in range(0, len(group), args.batch_size):
                    chunk = group[i:i + args.batch_size]
                    rgbs = [Image.open(os.path.join(rgb_dir, n)) for n in chunk]
                    nirs = [Image.open(os.path.join(nir_dir, n)) for n in chunk]
                    # pad the ragged tail by repeating the last pair: the
                    # compiled program has ONE static batch shape
                    pad = args.batch_size - len(chunk)
                    dets = predictor.detect_batch(
                        np.stack([pil_to_rgb_array(im) for im in rgbs + [rgbs[-1]] * pad]),
                        np.stack([pil_to_rgb_array(im) for im in nirs + [nirs[-1]] * pad]))
                    for n, im, (boxes, scores, labels) in zip(chunk, rgbs, dets):
                        out = predictor.draw_detections(im, boxes, scores, labels)
                        out.save(os.path.join(args.dir_save_path, n),
                                 quality=95, subsampling=0)
                        print(n)
    elif args.mode == "heatmap":
        rgb, nir = load_pair(args.rgb, args.nir)
        predictor.detect_heatmap(rgb, nir, args.heatmap_save_path)


if __name__ == "__main__":
    main()
