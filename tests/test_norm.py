"""Torch-exact BatchNorm semantics: unbiased running-var update."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfa_yolo_tpu.ops.conv import torch_batchnorm


class TestTorchExactBN:
    def test_running_stats_match_torch_semantics(self):
        """running_var uses the unbiased (n/(n-1)) batch variance, running_mean
        the plain mean — exact torch `F.batch_norm` training behavior."""
        rng = np.random.Generator(np.random.PCG64(7))
        x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        bn = torch_batchnorm(eps=1e-5, torch_momentum=0.1)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            use_running_average=False)
        y, mut = bn.apply(variables, jnp.asarray(x), use_running_average=False,
                          mutable=["batch_stats"])
        n = 4 * 8 * 8
        batch_mean = x.mean(axis=(0, 1, 2))
        batch_var = x.var(axis=(0, 1, 2))
        exp_mean = 0.9 * 0.0 + 0.1 * batch_mean
        exp_var = 0.9 * 1.0 + 0.1 * batch_var * n / (n - 1)
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                                   exp_mean, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                                   exp_var, rtol=1e-5, atol=1e-7)
        # normalization itself uses the biased variance
        exp_y = (x - batch_mean) / np.sqrt(batch_var + 1e-5)
        np.testing.assert_allclose(np.asarray(y), exp_y, rtol=1e-4, atol=1e-5)

    def test_eval_uses_running_stats(self):
        x = np.ones((2, 4, 4, 2), np.float32) * 3.0
        bn = torch_batchnorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            use_running_average=True)
        y = bn.apply(variables, jnp.asarray(x), use_running_average=True)
        # running stats are (0, 1) at init → y = x / sqrt(1 + eps)
        np.testing.assert_allclose(np.asarray(y), x / np.sqrt(1 + 1e-5),
                                   rtol=1e-6)
