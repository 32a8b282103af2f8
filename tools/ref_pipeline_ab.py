"""Full-pipeline A/B: the reference's public mAP pipeline vs ours, SHARED weights.

The north-star bit-faithfulness claim, tested end-to-end for the first time:
the same trained checkpoint is exported to a PyTorch ``.pth``
(`models/torch_export.py`), loaded by the REFERENCE's own ``YOLO`` facade
(`/root/reference/yolo_mul.py:16-257`), and driven through the reference's own
``get_map_mul.py`` protocol (`/root/reference/get_map_mul.py:11-86`) — while
the SAME images go through OUR fused TPU pipeline (`get_map.py`).  Both
detection sets are then scored by BOTH mAP harnesses (reference
`utils/utils_map.py:309` and ours `evalmap/voc_map.py`), and the per-image
detections are matched box-by-box.

The only piece the reference needs that this container lacks is
``torchvision.ops.nms`` — shimmed here in ~20 lines of numpy with exact
torchvision semantics (score-descending greedy suppression, strict
``iou > thr`` removal, area = (x2-x1)*(y2-y1) with no +1).

Run (CPU-safe, does not touch the TPU):
    JAX_PLATFORMS=cpu python tools/ref_pipeline_ab.py \
        --vocdevkit-path /tmp/synth1k/VOCdevkit \
        --classes-path /tmp/synth1k/model_data/voc_classes.txt \
        --checkpoint /tmp/demo1k_b16/best_epoch_weights.ckpt

Outputs one JSON line with both pipelines' mAPs, the per-image agreement
stats, and pass/fail.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision.ops.nms shim (the reference's only missing native dep here)
def _numpy_nms(boxes, scores, iou_threshold):
    """Exact `torchvision.ops.nms` semantics on CPU tensors.

    Greedy keep in score-descending order; a box is suppressed when its IoU
    with an already-kept box exceeds ``iou_threshold`` (strictly greater —
    torchvision keeps ties at exactly the threshold).
    """
    import torch

    b = boxes.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy().astype(np.float64)
    order = np.argsort(-s, kind="stable")
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(b[i, 0], b[rest, 0])
        yy1 = np.maximum(b[i, 1], b[rest, 1])
        xx2 = np.minimum(b[i, 2], b[rest, 2])
        yy2 = np.minimum(b[i, 3], b[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas[rest] - inter + 1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.int64)


def install_reference_stubs() -> None:
    """Make the reference importable: real-NMS torchvision stub + misc."""
    for mod in ("torchvision", "torchvision.ops", "terminaltables"):
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    sys.modules["torchvision.ops"].nms = _numpy_nms
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]

    class _AsciiTable:  # only constructed by the reference's COCO path
        def __init__(self, data, *a, **k):
            self.table = "\n".join(" | ".join(map(str, row)) for row in data)

    sys.modules["terminaltables"].AsciiTable = _AsciiTable
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            # version-compare stub (reference only calls parse_version >=/==,
            # `/root/reference/utils/utils_bbox.py:4`)
            pr = types.ModuleType("pkg_resources")

            class _V:
                def __init__(self, s):
                    self.s = str(s)

                def _key(self):
                    return [int("".join(c for c in p if c.isdigit()) or 0)
                            for p in self.s.split("+")[0].split(".")]

                def __ge__(self, other):
                    return self._key() >= other._key()

                def __eq__(self, other):
                    return self._key() == other._key()

            pr.parse_version = _V
            sys.modules["pkg_resources"] = pr
    if REF not in sys.path:
        sys.path.insert(0, REF)


# ---------------------------------------------------------------------------
def write_ground_truth(vocdevkit, image_ids, class_names, map_out):
    """The gt-txt side of `get_map_mul.py:52-76` (shared by both pipelines)."""
    import xml.etree.ElementTree as ET

    os.makedirs(os.path.join(map_out, "ground-truth"), exist_ok=True)
    for image_id in image_ids:
        xml_path = os.path.join(vocdevkit, "VOC2007/Annotations", image_id + ".xml")
        with open(os.path.join(map_out, "ground-truth", image_id + ".txt"), "w") as f:
            root = ET.parse(xml_path).getroot()
            for obj in root.findall("object"):
                difficult = (obj.find("difficult") is not None
                             and int(obj.find("difficult").text) == 1)
                name = obj.find("name").text
                if name not in class_names:
                    continue
                bb = obj.find("bndbox")
                coords = [bb.find(k).text for k in ("xmin", "ymin", "xmax", "ymax")]
                suffix = " difficult" if difficult else ""
                f.write(f"{name} {' '.join(coords)}{suffix}\n")


def parse_det_txt(path):
    """detection-results txt → (names, scores, boxes xyxy int) sorted by score."""
    dets = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 6:
                    continue
                dets.append((parts[0], float(parts[1]),
                             [int(v) for v in parts[2:]]))
    dets.sort(key=lambda d: -d[1])
    return dets


def match_images(ref_dir, our_dir, image_ids):
    """Per-image greedy score-order matching of the two detection sets."""
    stats = dict(images=len(image_ids), count_equal=0, ref_total=0, our_total=0,
                 matched=0, max_coord_delta=0, max_score_delta=0.0,
                 count_mismatches=[])
    for image_id in image_ids:
        ref = parse_det_txt(os.path.join(ref_dir, "detection-results", image_id + ".txt"))
        ours = parse_det_txt(os.path.join(our_dir, "detection-results", image_id + ".txt"))
        stats["ref_total"] += len(ref)
        stats["our_total"] += len(ours)
        if len(ref) == len(ours):
            stats["count_equal"] += 1
        else:
            stats["count_mismatches"].append(
                dict(id=image_id, ref=len(ref), ours=len(ours)))
        used = set()
        for name, score, box in ref:
            # nearest unused same-class box of ours by center distance
            best, best_d = None, 1e18
            for j, (n2, s2, b2) in enumerate(ours):
                if j in used or n2 != name:
                    continue
                d = sum(abs(a - b) for a, b in zip(box, b2))
                if d < best_d:
                    best, best_d = j, d
            if best is None:
                continue
            used.add(best)
            _, s2, b2 = ours[best]
            cd = max(abs(a - b) for a, b in zip(box, b2))
            if cd <= 2:  # integer-truncated coords: ±1 px is numerics, not logic
                stats["matched"] += 1
                stats["max_coord_delta"] = max(stats["max_coord_delta"], cd)
                stats["max_score_delta"] = max(stats["max_score_delta"],
                                               abs(score - s2))
    return stats


# ---------------------------------------------------------------------------
def run_reference_pipeline(args, image_ids, class_names, pth_path, map_out):
    """Drive `/root/reference/yolo_mul.py` get_map_txt over the val images."""
    install_reference_stubs()
    from PIL import Image

    from yolo_mul import YOLO  # noqa: reference import (after stubs)

    yolo = YOLO(model_path=pth_path, classes_path=args.classes_path,
                confidence=args.confidence, nms_iou=args.nms_iou, cuda=False)
    os.makedirs(os.path.join(map_out, "detection-results"), exist_ok=True)
    for image_id in image_ids:
        rgb = Image.open(os.path.join(args.vocdevkit_path,
                                      "VOC2007/JPEGImages_rgb", image_id + ".png"))
        nir = Image.open(os.path.join(args.vocdevkit_path,
                                      "VOC2007/JPEGImages_nir", image_id + ".png"))
        yolo.get_map_txt(image_id, rgb, nir, class_names, map_out)


def run_our_pipeline(args, image_ids, class_names, map_out):
    from PIL import Image

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor

    predictor = YOLOPredictor(
        model_path=args.checkpoint, classes_path=args.classes_path,
        input_shape=(640, 640), phi="n", confidence=args.confidence,
        nms_iou=args.nms_iou, compute_dtype="float32", max_det=args.max_det)
    for image_id in image_ids:
        rgb = Image.open(os.path.join(args.vocdevkit_path,
                                      "VOC2007/JPEGImages_rgb", image_id + ".png"))
        nir = Image.open(os.path.join(args.vocdevkit_path,
                                      "VOC2007/JPEGImages_nir", image_id + ".png"))
        predictor.get_map_txt(image_id, rgb, nir, class_names, map_out)
    print(f"[ours] cap stats: {predictor.cap_stats}")
    return predictor


def score_with_both_harnesses(map_out, score_threshold):
    """(reference get_map, our get_map) on one detections+gt directory."""
    install_reference_stubs()
    import matplotlib

    matplotlib.use("Agg")
    from utils.utils_map import get_map as ref_get_map  # reference harness

    from dcfa_yolo_tpu.evalmap.voc_map import get_map as our_get_map

    # the reference harness writes .temp_files/results into `path`, EXCEPT
    # voc_ap which hardcodes ./map_out/results in the CWD regardless of `path`
    # (`/root/reference/utils/utils_map.py:107-108,152`) — pre-create it, and
    # only clean it up if this run created it (a user's own ./map_out from a
    # prior get_map.py run must survive).
    cwd_map_out = os.path.join(os.getcwd(), "map_out")
    created_cwd_map_out = not os.path.exists(cwd_map_out)
    os.makedirs(os.path.join(cwd_map_out, "results"), exist_ok=True)
    ref_map = ref_get_map(0.5, False, score_threhold=score_threshold, path=map_out)
    shutil.rmtree(os.path.join(map_out, ".temp_files"), ignore_errors=True)
    if created_cwd_map_out:
        shutil.rmtree(cwd_map_out, ignore_errors=True)
    our_map = our_get_map(0.5, False, score_threshold=score_threshold, path=map_out)
    return float(ref_map), float(our_map)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--vocdevkit-path", default="/tmp/synth1k/VOCdevkit")
    p.add_argument("--classes-path", default="/tmp/synth1k/model_data/voc_classes.txt")
    p.add_argument("--checkpoint", required=True, help="our trained .ckpt")
    p.add_argument("--image-set", default="test")
    p.add_argument("--confidence", type=float, default=0.001)
    p.add_argument("--nms-iou", type=float, default=0.5)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--max-images", type=int, default=0,
                   help="cap the image count (0 = all)")
    p.add_argument("--out-dir", default="/tmp/ref_ab")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from dcfa_yolo_tpu.infer.predictor import get_classes

    class_names, _ = get_classes(args.classes_path)
    with open(os.path.join(args.vocdevkit_path, "VOC2007/ImageSets/Main",
                           args.image_set + ".txt")) as f:
        image_ids = f.read().strip().split()
    if args.max_images:
        image_ids = image_ids[: args.max_images]

    ref_out = os.path.join(args.out_dir, "ref")
    our_out = os.path.join(args.out_dir, "ours")
    for d in (ref_out, our_out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    # ---- our pipeline (also loads the checkpoint we then export)
    print(f"[ours] {len(image_ids)} images through the fused JAX pipeline")
    predictor = run_our_pipeline(args, image_ids, class_names, our_out)

    # ---- shared weights → reference .pth
    from dcfa_yolo_tpu.models.torch_export import export_state_dict

    sd_np = export_state_dict(predictor.variables, num_classes=len(class_names))
    import torch

    pth_path = os.path.join(args.out_dir, "shared_weights.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd_np.items()}, pth_path)
    print(f"[export] wrote {pth_path} ({len(sd_np)} tensors)")

    # ---- reference pipeline with the same weights
    print("[ref] same images through /root/reference yolo_mul.py (torch CPU)")
    run_reference_pipeline(args, image_ids, class_names, pth_path, ref_out)

    # ---- ground truth (identical for both)
    write_ground_truth(args.vocdevkit_path, image_ids, class_names, ref_out)
    write_ground_truth(args.vocdevkit_path, image_ids, class_names, our_out)

    # ---- score 2 detection sets × 2 harnesses
    ref_ref, ref_ours = score_with_both_harnesses(ref_out, args.score_threshold)
    our_ref, our_ours = score_with_both_harnesses(our_out, args.score_threshold)

    agree = match_images(ref_out, our_out, image_ids)
    n_cands = max(agree["ref_total"], 1)
    result = dict(
        images=len(image_ids),
        map_ref_pipeline_ref_harness=ref_ref,
        map_ref_pipeline_our_harness=ref_ours,
        map_our_pipeline_ref_harness=our_ref,
        map_our_pipeline_our_harness=our_ours,
        map_delta_pipelines=abs(ref_ref - our_ref),
        map_delta_harnesses=abs(ref_ref - ref_ours),
        agreement=agree,
        match_rate=agree["matched"] / n_cands,
        passed=bool(abs(ref_ref - our_ref) < 0.001
                    and abs(ref_ref - ref_ours) < 1e-6
                    and agree["matched"] / n_cands > 0.97),
    )
    print(json.dumps(result))
    if not result["passed"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
