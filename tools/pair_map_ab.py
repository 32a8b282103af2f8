"""Full-set mAP + per-image detection A/B for paired dual-backbone serving.

Runs the public detection-txt protocol (`YOLOPredictor.get_map_txt`, the same
surface `get_map.py` drives and the reference's `yolo_mul.py:213-257` defines)
over an entire VOC image set twice — fold_shuffle baseline vs
`pair_backbones=True` (models/pairing.py) — with the SAME trained weights
(the committed f16 A/B fixture), then reports per-image txt agreement and the
mAP@0.5 of both passes through `evalmap.voc_map`.

Extends the single-image agreement test (tests/test_pair_backbones.py) to the
full 103-image synth test set: pairing is exact up to FP summation order, so
counts must match and coordinates agree to ~1 px after rounding.

Usage:
    python tools/pair_map_ab.py [--vocdevkit /tmp/synth1k/VOCdevkit]
                                [--image-set test] [--conf 0.5]

Recorded run (2026-08-18, 103-image synth test set, f32, conf 0.5): zero
mismatched images, max coord delta 0.0 px, mAP@0.5 base 0.976 == pair 0.976
(delta 0.0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


def run_pass(pair: bool, image_ids, voc, class_names, args, out_dir):
    from PIL import Image

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor
    from dcfa_yolo_tpu.models.reparam import fold_shuffle_variables
    from dcfa_yolo_tpu.models.pairing import pair_backbone_variables
    from tools.make_ab_fixture import unflatten

    with np.load(os.path.join(REPO, "tests/fixtures/ab_weights_f16.npz")) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    fvars = fold_shuffle_variables(unflatten(flat))
    variables = pair_backbone_variables(fvars) if pair else fvars

    predictor = YOLOPredictor(
        class_names=class_names, input_shape=(640, 640), phi="n",
        confidence=args.conf, nms_iou=0.5, max_det=300, pre_nms_topk=1024,
        variables=variables, compute_dtype=args.compute_dtype,
        fold_shuffle=True, pair_backbones=pair)

    os.makedirs(out_dir, exist_ok=True)
    for image_id in image_ids:
        rgb = Image.open(os.path.join(voc, "JPEGImages_rgb", image_id + ".png"))
        nir = Image.open(os.path.join(voc, "JPEGImages_nir", image_id + ".png"))
        predictor.get_map_txt(image_id, rgb, nir, class_names, out_dir)
    return os.path.join(out_dir, "detection-results")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocdevkit", default="/tmp/synth1k/VOCdevkit")
    ap.add_argument("--image-set", default="test")
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--out-dir", default="/tmp/pair_map_ab")
    args = ap.parse_args()

    voc = os.path.join(args.vocdevkit, "VOC2007")
    with open(os.path.join(voc, "ImageSets/Main", args.image_set + ".txt")) as f:
        image_ids = f.read().split()
    classes_file = os.path.join(os.path.dirname(args.vocdevkit),
                                "model_data", "voc_classes.txt")
    with open(classes_file) as f:
        class_names = [ln.strip() for ln in f if ln.strip()]
    print(f"{len(image_ids)} images, classes={class_names}", flush=True)

    dirs = {}
    for pair in (False, True):
        tag = "pair" if pair else "base"
        dirs[pair] = run_pass(pair, image_ids, voc, class_names, args,
                              os.path.join(args.out_dir, tag))
        print(f"{tag} pass done", flush=True)

    # per-image txt agreement
    mismatches, max_px = [], 0.0
    for image_id in image_ids:
        rows = {}
        for pair in (False, True):
            with open(os.path.join(dirs[pair], image_id + ".txt")) as f:
                rows[pair] = sorted(ln.split() for ln in f.read().splitlines())
        a, b = rows[False], rows[True]
        if len(a) != len(b) or any(r[0] != s[0] for r, s in zip(a, b)):
            mismatches.append(image_id)
            continue
        for r, s in zip(a, b):
            max_px = max(max_px, max(abs(float(x) - float(y))
                                     for x, y in zip(r[2:], s[2:])))
            if abs(float(r[1]) - float(s[1])) > 1e-2:
                mismatches.append(image_id)
                break

    # mAP of both passes via the rebuilt harness
    from dcfa_yolo_tpu.evalmap.voc_map import get_map as voc_get_map
    maps = {}
    for pair in (False, True):
        import shutil

        map_out = os.path.join(args.out_dir, f"map_{'pair' if pair else 'base'}")
        dr = os.path.join(map_out, "detection-results")
        gt = os.path.join(map_out, "ground-truth")
        os.makedirs(dr, exist_ok=True)
        os.makedirs(gt, exist_ok=True)
        for image_id in image_ids:
            shutil.copy(os.path.join(dirs[pair], image_id + ".txt"), dr)
        # ground truth from the VOC annotations
        import xml.etree.ElementTree as ET

        for image_id in image_ids:
            root = ET.parse(
                os.path.join(voc, "Annotations", image_id + ".xml")).getroot()
            with open(os.path.join(gt, image_id + ".txt"), "w") as f:
                for obj in root.findall("object"):
                    name = obj.find("name").text
                    bb = obj.find("bndbox")
                    coords = [bb.find(k).text
                              for k in ("xmin", "ymin", "xmax", "ymax")]
                    diff = obj.find("difficult")
                    tag = (" difficult"
                           if diff is not None and int(diff.text) else "")
                    f.write(f"{name} {' '.join(coords)}{tag}\n")
        maps[pair] = voc_get_map(0.5, False, score_threshold=args.conf,
                                 path=map_out)
        print(f"mAP@0.5 {'pair' if pair else 'base'}: {maps[pair]:.5f}",
              flush=True)

    result = {
        "images": len(image_ids),
        "mismatched_images": mismatches,
        "max_coord_delta_px": max_px,
        "map_base": maps[False],
        "map_pair": maps[True],
        "map_delta": abs(maps[False] - maps[True]),
        "passed": not mismatches and max_px <= 1.0
                  and abs(maps[False] - maps[True]) < 1e-3,
    }
    print(json.dumps(result))
    with open(os.path.join(args.out_dir, "pair_map_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    sys.exit(0 if result["passed"] else 1)


if __name__ == "__main__":
    main()
