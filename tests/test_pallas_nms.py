"""Pallas greedy-NMS kernel vs the XLA reference implementation.

Runs the kernel in Pallas interpreter mode (tests are on CPU); on TPU the same
kernel was verified bit-identical and benchmarked at parity with the XLA
fori_loop path (see ops/pallas_nms.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.nms import _greedy_suppress, pairwise_iou_xyxy
from dcfa_yolo_tpu.ops.pallas_nms import pallas_greedy_suppress


def xla_keep(bx, al, thres=0.5):
    iou = pairwise_iou_xyxy(bx, bx)
    return _greedy_suppress(iou, al, thres) & al


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla(self, seed):
        b, k = 2, 256
        rng = np.random.Generator(np.random.PCG64(seed))
        cxy = rng.uniform(0.2, 0.8, (b, k, 2))
        wh = rng.uniform(0.05, 0.4, (b, k, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype("float32")
        scores = np.sort(rng.uniform(0, 1, (b, k)).astype("float32"))[:, ::-1]
        alive = scores > 0.4
        ref = np.asarray(jax.vmap(xla_keep)(jnp.asarray(boxes), jnp.asarray(alive)))
        out = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(alive), 0.5, interpret=True))
        out = out & alive
        np.testing.assert_array_equal(out, ref)

    def test_all_dead(self):
        b, k = 1, 128
        boxes = np.zeros((b, k, 4), np.float32)
        alive = np.zeros((b, k), bool)
        out = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(alive), 0.5, interpret=True))
        assert not out.any()
