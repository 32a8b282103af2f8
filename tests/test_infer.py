"""Decode + NMS + pipeline tests.

NMS semantics are checked against a numpy reimplementation of the reference's
per-class greedy NMS (torchvision semantics: score-descending, suppress
IoU > threshold) — torchvision itself is not in this container.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dcfa_yolo_tpu.infer.decode import correct_boxes_yxyx, decode_box
from dcfa_yolo_tpu.ops.nms import batched_nms, nms_single


def np_greedy_nms_per_class(boxes, scores, classes, conf_thres, iou_thres):
    """Reference semantics (`utils/utils_bbox.py:106-149`) in numpy."""
    keep_all = []
    mask = scores >= conf_thres
    idx_all = np.where(mask)[0]
    for c in np.unique(classes[idx_all]):
        idx = idx_all[classes[idx_all] == c]
        idx = idx[np.argsort(-scores[idx], kind="stable")]
        kept = []
        while len(idx):
            i = idx[0]
            kept.append(i)
            if len(idx) == 1:
                break
            rest = idx[1:]
            xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a1 + a2 - inter + 1e-7)
            idx = rest[iou <= iou_thres]
        keep_all.extend(kept)
    return set(keep_all)


def random_detections(n, nc, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    cxy = rng.uniform(0.2, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, nc, n).astype(np.int32)
    return boxes, scores, classes


class TestNMS:
    @pytest.mark.parametrize("seed,nc", [(0, 1), (1, 3), (2, 8)])
    def test_matches_reference_semantics(self, seed, nc):
        boxes, scores, classes = random_detections(200, nc, seed)
        ref_keep = np_greedy_nms_per_class(boxes, scores, classes, 0.3, 0.5)
        out_boxes, out_scores, out_classes, valid = nms_single(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            conf_thres=0.3, iou_thres=0.5, pre_nms_topk=256, max_det=200)
        n_mine = int(np.asarray(valid).sum())
        assert n_mine == len(ref_keep)
        # kept detections match by score multiset (scores are unique w.h.p.)
        ref_scores = np.sort(scores[list(ref_keep)])
        mine_scores = np.sort(np.asarray(out_scores)[np.asarray(valid)])
        np.testing.assert_allclose(mine_scores, ref_scores, rtol=1e-6)

    def test_empty(self):
        boxes, scores, classes = random_detections(50, 2, 3)
        out = nms_single(jnp.asarray(boxes), jnp.asarray(scores * 0.0),
                         jnp.asarray(classes), conf_thres=0.5, iou_thres=0.5,
                         pre_nms_topk=64, max_det=10)
        assert int(np.asarray(out[3]).sum()) == 0

    def test_fewer_candidates_than_max_det(self):
        """max_det > candidate count must pad, not crash: top_k(x, max_det)
        needs len(x) >= max_det (e.g. tiny inputs: 96x96 -> 189 anchors
        < the default max_det=300)."""
        boxes, scores, classes = random_detections(40, 2, 5)
        res = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                          jnp.asarray(classes[None]), conf_thres=0.0,
                          iou_thres=1.1,  # keep everything
                          pre_nms_topk=16, max_det=300)
        assert res.boxes.shape == (1, 300, 4)
        assert int(np.asarray(res.valid).sum()) == 16  # all 16 candidates kept
        # padded slots are marked invalid with zeroed boxes
        v = np.asarray(res.valid[0])
        assert not v[16:].any()
        np.testing.assert_array_equal(np.asarray(res.boxes[0][16:]), 0.0)

    def test_batched(self):
        boxes, scores, classes = random_detections(100, 2, 4)
        res = batched_nms(jnp.asarray(boxes[None].repeat(3, 0)),
                          jnp.asarray(scores[None].repeat(3, 0)),
                          jnp.asarray(classes[None].repeat(3, 0)),
                          conf_thres=0.3, iou_thres=0.5, pre_nms_topk=128,
                          max_det=50)
        v = np.asarray(res.valid)
        assert (v[0] == v[1]).all() and (v[0] == v[2]).all()


class TestDecode:
    def test_decode_box_matches_reference(self, golden_model_fwd, golden_ops):
        z = golden_model_fwd
        dbox = np.transpose(z["dbox"], (0, 2, 1))  # (1, A, 4)
        cls = np.transpose(z["cls"], (0, 2, 1))
        anchors = z["anchors"].T  # (A, 2)
        strides = z["strides"].T  # (A, 1)
        y = decode_box(jnp.asarray(dbox), jnp.asarray(cls),
                       jnp.asarray(anchors), jnp.asarray(strides), (640, 640))
        np.testing.assert_allclose(
            np.asarray(y), golden_ops["decoded_y"], rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("letterbox,key", [(True, "cb_letterbox"),
                                               (False, "cb_plain")])
    def test_correct_boxes(self, golden_ops, letterbox, key):
        xy, wh = golden_ops["cb_xy"], golden_ops["cb_wh"]
        boxes_xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
        out = correct_boxes_yxyx(jnp.asarray(boxes_xyxy), (640, 640),
                                 np.array([480.0, 602.0]), letterbox=letterbox)
        np.testing.assert_allclose(np.asarray(out), golden_ops[key],
                                   rtol=1e-5, atol=1e-4)


class TestPipeline:
    def test_detect_batch_end_to_end(self):
        """Smoke: full fused pipeline on raw uint8 pairs at a non-square size."""
        import jax

        from dcfa_yolo_tpu.config import ModelConfig
        from dcfa_yolo_tpu.infer.pipeline import detect_batch
        from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model

        cfg = ModelConfig(num_classes=2, phi="n", input_shape=(128, 128))
        model = DCFAYolo(cfg)
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.Generator(np.random.PCG64(0))
        rgb = rng.integers(0, 255, (2, 96, 120, 3), dtype=np.uint8)
        nir = rng.integers(0, 255, (2, 96, 120, 3), dtype=np.uint8)
        image_hw = np.array([[96.0, 120.0]] * 2, dtype=np.float32)
        res = detect_batch(model, variables, jnp.asarray(rgb), jnp.asarray(nir),
                           image_hw, conf_thres=0.01, iou_thres=0.5,
                           max_det=20, pre_nms_topk=64)
        assert res.boxes.shape == (2, 20, 4)
        assert res.scores.shape == (2, 20)
        v = np.asarray(res.valid)
        b = np.asarray(res.boxes)
        # valid boxes are inside the original image (y1,x1,y2,x2)
        if v.any():
            bb = b[v]
            assert (bb[:, 2] >= bb[:, 0]).all() and (bb[:, 3] >= bb[:, 1]).all()
