"""Fixed-shape NMS cap accounting vs the reference's uncapped semantics.

The reference NMS has no candidate or output caps
(`/root/reference/utils/utils_bbox.py:106-149`: every box over conf goes to
torchvision nms; every survivor is emitted).  Our fixed-shape pipeline caps at
pre_nms_topk/max_det, so (a) `NMSResult.n_candidates` must report the true
uncapped candidate count so callers can detect binding caps, and (b) raising
the caps above the candidate count must reproduce uncapped greedy-NMS results
exactly (numpy oracle with torchvision semantics below).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dcfa_yolo_tpu.ops.nms import batched_nms


def numpy_reference_nms(boxes, scores, classes, conf, iou_thr):
    """Uncapped per-class greedy NMS, torchvision semantics
    (score-descending; suppress on iou > thr; no +1 in areas)."""
    keep_idx = []
    mask = scores >= conf
    for c in np.unique(classes[mask]):
        idx = np.where(mask & (classes == c))[0]
        order = idx[np.argsort(-scores[idx], kind="stable")]
        b = boxes
        areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        while order.size:
            i = order[0]
            keep_idx.append(i)
            rest = order[1:]
            xx1 = np.maximum(b[i, 0], b[rest, 0])
            yy1 = np.maximum(b[i, 1], b[rest, 1])
            xx2 = np.minimum(b[i, 2], b[rest, 2])
            yy2 = np.minimum(b[i, 3], b[rest, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            iou = inter / (areas[i] + areas[rest] - inter + 1e-12)
            order = rest[iou <= iou_thr]
    keep_idx.sort(key=lambda i: -scores[i])
    return np.array(keep_idx, int)


def _dense_scene(n=600, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, :2] = rng.uniform(0, 500, (n, 2))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 80, (n, 2))
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    classes = rng.integers(0, 3, n).astype(np.int32)
    return boxes, scores, classes


class TestCandidateCounter:
    def test_counts_above_conf(self):
        boxes, scores, classes = _dense_scene()
        conf = 0.25
        res = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                          jnp.asarray(classes[None]), conf, 0.5)
        expected = int((scores >= conf).sum())
        assert int(res.n_candidates[0]) == expected

    def test_counter_sees_past_the_topk_cap(self):
        """n_candidates reports the TRUE count even when pre_nms_topk < it."""
        boxes, scores, classes = _dense_scene()
        res = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                          jnp.asarray(classes[None]), 0.001, 0.5,
                          pre_nms_topk=64, max_det=32)
        assert int(res.n_candidates[0]) == 600
        assert int(res.valid[0].sum()) == 32  # max_det saturated — detectable


class TestUncappedParity:
    def test_raised_caps_reproduce_uncapped_reference(self):
        """With caps above the candidate count, fixed-shape NMS == the
        uncapped torchvision-semantics oracle (same keeps, same order)."""
        boxes, scores, classes = _dense_scene(n=400, seed=11)
        conf, iou_thr = 0.05, 0.5
        ref_keep = numpy_reference_nms(boxes, scores, classes, conf, iou_thr)
        res = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                          jnp.asarray(classes[None]), conf, iou_thr,
                          pre_nms_topk=512, max_det=512)
        n = int(res.valid[0].sum())
        assert n == len(ref_keep)
        np.testing.assert_allclose(np.asarray(res.scores[0][:n]),
                                   scores[ref_keep], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(res.boxes[0][:n]),
                                   boxes[ref_keep], rtol=1e-6)

    def test_binding_topk_deviates_then_recovers(self):
        """The cap visibly changes results when it binds; auto-raise fixes it
        (the get_map.py loop's premise)."""
        boxes, scores, classes = _dense_scene(n=400, seed=11)
        conf, iou_thr = 0.001, 0.5
        ref_keep = numpy_reference_nms(boxes, scores, classes, conf, iou_thr)
        capped = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                             jnp.asarray(classes[None]), conf, iou_thr,
                             pre_nms_topk=32, max_det=512)
        raised = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
                             jnp.asarray(classes[None]), conf, iou_thr,
                             pre_nms_topk=512, max_det=512)
        assert int(capped.n_candidates[0]) == 400 > 32  # cap bound, flagged
        assert int(capped.valid[0].sum()) < len(ref_keep)  # and it DID deviate
        assert int(raised.valid[0].sum()) == len(ref_keep)
