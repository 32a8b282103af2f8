"""Public-pipeline A/B vs the reference with shared weights, as a regression test.

A miniature of tools/ref_pipeline_ab.py (which recorded the 103-image run in
RESULTS.md): deterministic synthesized weights (tests/goldens manifest) are
exported to a ``.pth``, the REFERENCE's own ``YOLO.get_map_txt``
(`/root/reference/yolo_mul.py:213-257`) and OUR ``YOLOPredictor.get_map_txt``
run over the same synthetic image pairs, and the emitted detection files must
agree box-for-box: same per-image counts, integer coords within 2 px, scores
within 1e-3.  ``pre_nms_topk`` is raised to the full anchor count so the
fixed-shape caps cannot bind (uncapped reference semantics,
`/root/reference/utils/utils_bbox.py:106-149`).
"""

from __future__ import annotations

import os
import sys
import glob

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout absent")


@pytest.fixture(scope="module")
def synth_images(tmp_path_factory):
    from tools.make_synth_dataset import main as make_synth

    root = tmp_path_factory.mktemp("ab_data")
    make_synth(str(root), n_images=3, size=(480, 360))
    voc = os.path.join(root, "VOCdevkit", "VOC2007")
    ids = sorted(os.path.splitext(os.path.basename(p))[0]
                 for p in glob.glob(os.path.join(voc, "Annotations", "*.xml")))
    assert len(ids) == 3
    # the dataset's own classes file ("tomato_bunch") — NOT the repo's
    # reference-mirroring model_data/voc_classes.txt ("cherry_tomato"): the
    # reference facade drops detections whose class name is absent from the
    # caller's class_names list (`/root/reference/yolo_mul.py:252-253`)
    classes_path = os.path.join(root, "model_data", "voc_classes.txt")
    return voc, ids, classes_path


@pytest.fixture(scope="module")
def shared_weights():
    """TRAINED variables (committed f16 fixture, tools/make_ab_fixture.py).

    Trained weights are essential here: with untrained weights every anchor
    scores within ~0.01 of the conf threshold and sub-LSB preprocessing
    differences flip borderline boxes.  Both pipelines load the SAME
    f16-rounded values, so the shared-weights premise is exact.
    """
    from tools.make_ab_fixture import unflatten

    with np.load(os.path.join(REPO, "tests/fixtures/ab_weights_f16.npz")) as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    return unflatten(flat)


def test_detection_txt_agreement(synth_images, shared_weights, tmp_path):
    from PIL import Image

    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor
    from dcfa_yolo_tpu.models.torch_export import export_state_dict
    from tools.ref_pipeline_ab import (install_reference_stubs, match_images,
                                       parse_det_txt)

    voc, ids, classes_path = synth_images
    class_names = ["tomato_bunch"]
    our_out, ref_out = str(tmp_path / "ours"), str(tmp_path / "ref")
    os.makedirs(os.path.join(our_out, "detection-results"))
    os.makedirs(os.path.join(ref_out, "detection-results"))

    # ---- ours: fused pipeline, caps raised to the uncapped regime
    predictor = YOLOPredictor(
        class_names=class_names, input_shape=(640, 640), phi="n",
        confidence=0.5, nms_iou=0.5, max_det=300, pre_nms_topk=8400,
        variables=shared_weights, compute_dtype="float32")
    pairs = {}
    for image_id in ids:
        rgb = Image.open(os.path.join(voc, "JPEGImages_rgb", image_id + ".png"))
        nir = Image.open(os.path.join(voc, "JPEGImages_nir", image_id + ".png"))
        pairs[image_id] = (rgb, nir)
        predictor.get_map_txt(image_id, rgb, nir, class_names, our_out)
    assert predictor.cap_stats["topk_bound"] == 0
    assert predictor.cap_stats["max_det_saturated"] == 0

    # ---- shared weights -> .pth -> the reference's own facade
    install_reference_stubs()
    import torch

    sd_np = export_state_dict(shared_weights, num_classes=1)
    pth = str(tmp_path / "shared.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd_np.items()}, pth)

    from yolo_mul import YOLO  # reference import (after stubs)

    ref_yolo = YOLO(model_path=pth, classes_path=classes_path,
                    confidence=0.5, nms_iou=0.5, cuda=False)
    for image_id in ids:
        rgb, nir = pairs[image_id]
        ref_yolo.get_map_txt(image_id, rgb, nir, class_names, ref_out)

    # ---- box-for-box agreement
    stats = match_images(ref_out, our_out, ids)
    assert stats["ref_total"] > 0, "degenerate test: reference emitted nothing"
    assert stats["count_equal"] == len(ids), stats["count_mismatches"]
    assert stats["matched"] == stats["ref_total"], stats
    assert stats["max_coord_delta"] <= 2
    assert stats["max_score_delta"] < 1e-3
    # spot-check one file parses and is score-sorted
    dets = parse_det_txt(
        os.path.join(ref_out, "detection-results", ids[0] + ".txt"))
    assert dets == sorted(dets, key=lambda d: -d[1])
