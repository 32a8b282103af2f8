"""VOC/COCO mAP evaluation CLI — counterpart of `get_map_mul.py`.

map_mode: 0 = full pipeline (predict + gt + VOC mAP), 1 = predictions only,
2 = ground-truth only, 3 = compute VOC mAP from existing txt, 4 = COCO AP
(native COCOeval-protocol implementation; the container has no pycocotools).
"""

from __future__ import annotations

import argparse
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="DCFA-YOLO TPU mAP evaluation")
    p.add_argument("--map-mode", type=int, default=0, choices=[0, 1, 2, 3, 4])
    p.add_argument("--classes-path", default="model_data/voc_classes.txt")
    p.add_argument("--model-path", default="")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--phi", default="n")
    p.add_argument("--minoverlap", type=float, default=0.5)
    p.add_argument("--confidence", type=float, default=0.001)
    p.add_argument("--nms-iou", type=float, default=0.5)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--vocdevkit-path", default="VOCdevkit")
    p.add_argument("--map-out-path", default="map_out")
    p.add_argument("--image-set", default="test")
    p.add_argument("--batch-size", type=int, default=1,
                   help="device batch for the prediction pass (>1 batches "
                        "same-sized pairs; identical txt outputs)")
    p.add_argument("--stem-backend", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_d", "pallas_e"],
                   help="backbone-stem backend (see ops/pallas_stem.py)")
    p.add_argument("--fold-shuffle", action="store_true",
                   help="serve with channel_shuffles folded into downstream "
                        "weights (reparam.fold_shuffle_variables)")
    p.add_argument("--pair-backbones", action="store_true",
                   help="serve both backbones as ONE doubled-channel stream "
                        "(models/pairing.py; small-batch option, implies "
                        "--fold-shuffle)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--max-det", type=int, default=300,
                   help="per-image NMS survivor cap. The reference CLI is "
                        "uncapped (`yolo_mul.py:213-257`) — 300 is the "
                        "fixed-shape stand-in; pass 100 to reproduce the "
                        "in-training EvalCallback protocol "
                        "(`callbacks_mul.py:103`, EvalConfig.max_detections)")
    p.add_argument("--pre-nms-topk", type=int, default=1024,
                   help="pre-NMS candidate cap (fixed-shape stand-in for the "
                        "reference's uncapped NMS); auto-raised when it binds")
    p.add_argument("--no-auto-raise", action="store_true",
                   help="fail instead of auto-raising bound NMS caps")
    return p.parse_args()


def main():
    args = parse_args()
    from dcfa_yolo_tpu.infer.predictor import get_classes
    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    class_names, _ = get_classes(args.classes_path)
    image_ids_path = os.path.join(args.vocdevkit_path,
                                  "VOC2007/ImageSets/Main", f"{args.image_set}.txt")
    with open(image_ids_path) as f:
        image_ids = f.read().strip().split()

    os.makedirs(os.path.join(args.map_out_path, "ground-truth"), exist_ok=True)
    os.makedirs(os.path.join(args.map_out_path, "detection-results"), exist_ok=True)

    if args.map_mode in (0, 1):
        from PIL import Image

        from dcfa_yolo_tpu.infer.predictor import YOLOPredictor

        print("Load model.")
        # The reference NMS is uncapped (`utils/utils_bbox.py:106-149`); our
        # fixed-shape caps (pre_nms_topk / max_det) are a protocol deviation
        # whenever they bind.  Count every image where they do and AUTO-RAISE
        # the caps (redoing the pass) until they no longer bind, so the
        # emitted detections match uncapped reference semantics.
        pre_nms_topk, max_det = args.pre_nms_topk, args.max_det
        for attempt in range(3):
            predictor = YOLOPredictor(
                model_path=args.model_path or None,
                classes_path=args.classes_path,
                input_shape=tuple(args.input_shape), phi=args.phi,
                confidence=args.confidence, nms_iou=args.nms_iou,
                compute_dtype=args.compute_dtype, max_det=max_det,
                pre_nms_topk=pre_nms_topk,
                stem_backend=args.stem_backend,
                fold_shuffle=args.fold_shuffle or args.pair_backbones,
                pair_backbones=args.pair_backbones)
            print(f"Get predict result (pre_nms_topk={pre_nms_topk}, "
                  f"max_det={max_det}).")
            def _load(image_id):
                rgb = Image.open(os.path.join(
                    args.vocdevkit_path, "VOC2007/JPEGImages_rgb", image_id + ".png"))
                nir = Image.open(os.path.join(
                    args.vocdevkit_path, "VOC2007/JPEGImages_nir", image_id + ".png"))
                return rgb, nir

            bs = args.batch_size
            if bs <= 1:
                for image_id in image_ids:
                    rgb, nir = _load(image_id)
                    predictor.get_map_txt(image_id, rgb, nir, class_names,
                                          args.map_out_path)
            else:
                # one fused-pipeline dispatch per batch of same-sized pairs;
                # byte-identical txts at a fixed stem backend (under 'auto'
                # a b%128 batch resolves the v5 stem — ±1-LSB letterbox
                # ties, mAP-invisible; see get_map_txt_batch docstring)
                groups = {}
                for image_id in image_ids:
                    rgb, nir = _load(image_id)
                    groups.setdefault(rgb.size, []).append((image_id, rgb, nir))
                for group in groups.values():
                    ids = [g[0] for g in group]
                    rgbs = [g[1] for g in group]
                    nirs = [g[2] for g in group]
                    if len(group) % bs:
                        pad = bs - len(group) % bs
                        rgbs += [rgbs[-1]] * pad
                        nirs += [nirs[-1]] * pad
                    for i in range(0, len(rgbs), bs):
                        predictor.get_map_txt_batch(
                            ids[i:i + bs], rgbs[i:i + bs], nirs[i:i + bs],
                            class_names, args.map_out_path)
            cs = predictor.cap_stats
            print(f"[caps] {cs['images']} images, max conf-candidates "
                  f"{cs['max_candidates']}, pre_nms_topk bound on "
                  f"{cs['topk_bound']}, max_det saturated on "
                  f"{cs['max_det_saturated']}")
            if not (cs["topk_bound"] or cs["max_det_saturated"]):
                break
            if args.no_auto_raise:
                raise SystemExit(
                    "[caps] fixed NMS caps bound — results deviate from the "
                    "uncapped reference protocol (rerun with larger "
                    "--pre-nms-topk/--max-det, or drop --no-auto-raise)")
            if cs["topk_bound"]:
                while pre_nms_topk <= cs["max_candidates"]:
                    pre_nms_topk *= 2
            if cs["max_det_saturated"]:
                max_det *= 4
            print(f"[caps] auto-raising and redoing the prediction pass")
        print("Get predict result done.")

    if args.map_mode in (0, 2):
        print("Get ground truth result.")
        for image_id in image_ids:
            xml_path = os.path.join(args.vocdevkit_path, "VOC2007/Annotations",
                                    image_id + ".xml")
            with open(os.path.join(args.map_out_path, "ground-truth",
                                   image_id + ".txt"), "w") as new_f:
                root = ET.parse(xml_path).getroot()
                for obj in root.findall("object"):
                    difficult_flag = False
                    if obj.find("difficult") is not None:
                        difficult_flag = int(obj.find("difficult").text) == 1
                    obj_name = obj.find("name").text
                    if obj_name not in class_names:
                        continue
                    bndbox = obj.find("bndbox")
                    left = bndbox.find("xmin").text
                    top = bndbox.find("ymin").text
                    right = bndbox.find("xmax").text
                    bottom = bndbox.find("ymax").text
                    if difficult_flag:
                        new_f.write(f"{obj_name} {left} {top} {right} {bottom} difficult\n")
                    else:
                        new_f.write(f"{obj_name} {left} {top} {right} {bottom}\n")
        print("Get ground truth result done.")

    if args.map_mode in (0, 3):
        from dcfa_yolo_tpu.evalmap.voc_map import get_map

        print("Get map.")
        get_map(args.minoverlap, True, score_threshold=args.score_threshold,
                path=args.map_out_path)
        print("Get map done.")

    if args.map_mode == 4:
        from dcfa_yolo_tpu.evalmap.coco_map import get_coco_map

        print("Get map (COCO protocol).")
        ap, ap50 = get_coco_map(class_names, path=args.map_out_path)
        print(f"AP@0.5:0.95 = {ap:.4f} | AP@0.5 = {ap50:.4f}")
        print("Get map done.")


if __name__ == "__main__":
    main()
