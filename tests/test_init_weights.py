"""Reference weights_init transform tests."""

import numpy as np
import pytest

import jax

from dcfa_yolo_tpu.train.init_weights import reference_weights_init


def make_params():
    rng = np.random.Generator(np.random.PCG64(0))
    return {
        "conv": {"kernel": np.zeros((3, 3, 16, 32), np.float32),
                 "bias": np.ones(32, np.float32)},
        "bn": {"scale": np.zeros(32, np.float32),
               "bias": np.ones(32, np.float32)},
        "w": np.ones(3, np.float32),  # BiFPN-style raw param, untouched
    }


class TestReferenceInit:
    def test_normal(self):
        out = reference_weights_init(make_params(), seed=1, init_type="normal",
                                     init_gain=0.02)
        k = np.asarray(out["conv"]["kernel"])
        assert abs(k.std() - 0.02) < 0.002 and abs(k.mean()) < 0.002
        s = np.asarray(out["bn"]["scale"])
        assert abs(s.mean() - 1.0) < 0.01 and abs(s.std() - 0.02) < 0.005
        assert (np.asarray(out["bn"]["bias"]) == 0).all()
        np.testing.assert_array_equal(np.asarray(out["w"]), np.ones(3))

    def test_kaiming_scale(self):
        out = reference_weights_init(make_params(), seed=2, init_type="kaiming")
        k = np.asarray(out["conv"]["kernel"])
        expected_std = np.sqrt(2.0 / (3 * 3 * 16))
        assert abs(k.std() - expected_std) / expected_std < 0.1

    def test_orthogonal_shape(self):
        out = reference_weights_init(make_params(), seed=3,
                                     init_type="orthogonal", init_gain=1.0)
        k = np.asarray(out["conv"]["kernel"]).reshape(-1, 32)
        gram = k.T @ k
        np.testing.assert_allclose(gram, np.eye(32), atol=1e-4)

    def test_orthogonal_wide_kernel(self):
        """fan_in < cout (e.g. depthwise (3,3,1,16)) used to crash with a
        broadcast error in the sign correction; rows must come out
        orthonormal (torch orthogonal_ on the transposed view)."""
        params = {"dw": {"kernel": np.zeros((3, 3, 1, 16), np.float32)}}
        out = reference_weights_init(params, seed=4, init_type="orthogonal",
                                     init_gain=1.0)
        k = np.asarray(out["dw"]["kernel"]).reshape(9, 16)
        np.testing.assert_allclose(k @ k.T, np.eye(9), atol=1e-4)

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            reference_weights_init(make_params(), init_type="nope")
