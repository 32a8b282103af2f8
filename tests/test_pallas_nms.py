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

    @pytest.mark.parametrize("b,k", [(16, 256), (9, 128)])
    def test_batched_kernel_matches_xla(self, b, k):
        """b >= _BATCHED_MIN_B takes the lane-batched (K, B) kernel."""
        from dcfa_yolo_tpu.ops.pallas_nms import _BATCHED_MIN_B

        assert b >= _BATCHED_MIN_B
        rng = np.random.Generator(np.random.PCG64(b))
        cxy = rng.uniform(0.2, 0.8, (b, k, 2))
        wh = rng.uniform(0.05, 0.4, (b, k, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype("float32")
        scores = np.sort(rng.uniform(0, 1, (b, k)).astype("float32"))[:, ::-1]
        alive = scores > 0.4
        ref = np.asarray(jax.vmap(xla_keep)(jnp.asarray(boxes), jnp.asarray(alive)))
        out = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(alive), 0.5, interpret=True))
        np.testing.assert_array_equal(out & alive, ref)

    def test_batched_bitexact_vs_per_image(self):
        """The two kernel shapes must agree bit-for-bit, including keep values
        past each image's own alive prefix (tile trip count = per-tile max)."""
        from dcfa_yolo_tpu.ops.pallas_nms import _suppress_planes_batched

        b, k = 8, 128
        rng = np.random.Generator(np.random.PCG64(3))
        cxy = rng.uniform(0.2, 0.8, (b, k, 2))
        wh = rng.uniform(0.05, 0.4, (b, k, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype("float32")
        # ragged alive prefixes across the batch
        n_alive = rng.integers(0, k + 1, (b,))
        alive = (np.arange(k)[None, :] < n_alive[:, None])
        planes = [jnp.asarray(boxes[..., j])[:, None, :] for j in range(4)]
        alive_p = jnp.asarray(alive.astype("float32"))[:, None, :]
        batched = np.asarray(_suppress_planes_batched(
            *planes, alive_p, iou_thres=0.5, interpret=True))
        per_img = []
        for i in range(b):  # b=1 < _BATCHED_MIN_B → per-image kernel
            per_img.append(np.asarray(pallas_greedy_suppress(
                jnp.asarray(boxes[i:i + 1]), jnp.asarray(alive[i:i + 1]),
                0.5, interpret=True)))
        np.testing.assert_array_equal(batched[:, 0, :] > 0.5,
                                      np.concatenate(per_img, 0))

    def test_all_dead(self):
        b, k = 1, 128
        boxes = np.zeros((b, k, 4), np.float32)
        alive = np.zeros((b, k), bool)
        out = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(alive), 0.5, interpret=True))
        assert not out.any()
