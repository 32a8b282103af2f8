"""Checkpoint save/load roundtrip, including optax tuple states."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dcfa_yolo_tpu.utils.checkpoint import (
    load_checkpoint,
    load_variables,
    restore_into,
    save_checkpoint,
)


class TestCheckpointRoundtrip:
    def test_full_training_payload(self, tmp_path):
        params = {"layer": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
        tx = optax.chain(optax.trace(0.9, nesterov=True), optax.scale(-1.0))
        opt_state = tx.init(params)
        payload = {
            "params": params,
            "batch_stats": {"layer": {"bn": {"mean": jnp.zeros(3)}}},
            "ema": {"params": params},
            "ema_updates": 7,
            "opt_state": opt_state,
            "epoch": 3,
        }
        path = str(tmp_path / "ck.ckpt")
        save_checkpoint(path, payload)
        loaded = load_checkpoint(path)
        assert loaded["epoch"] == 3
        np.testing.assert_array_equal(loaded["params"]["layer"]["kernel"],
                                      np.ones((3, 3)))
        restored_opt = restore_into(opt_state, loaded["opt_state"])
        tr = restored_opt[0].trace["layer"]["kernel"]
        np.testing.assert_array_equal(np.asarray(tr), np.zeros((3, 3)))

    def test_load_variables_prefers_ema(self, tmp_path):
        payload = {
            "params": {"w": jnp.zeros(2)},
            "batch_stats": {},
            "ema": {"params": {"w": jnp.ones(2)},
                    "batch_stats": {}},
        }
        path = str(tmp_path / "ck.ckpt")
        save_checkpoint(path, payload)
        variables = load_variables(path)
        np.testing.assert_array_equal(variables["params"]["w"], np.ones(2))
