"""Torch-format export roundtrip: flax → state_dict → flax is the identity."""

import numpy as np
import pytest

import jax

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.torch_export import export_state_dict
from dcfa_yolo_tpu.models.torch_import import import_state_dict
from dcfa_yolo_tpu.models.yolo import init_model


class TestExportRoundtrip:
    def test_roundtrip_identity(self):
        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
        _, variables = init_model(cfg, jax.random.PRNGKey(42))
        sd = export_state_dict(variables, num_classes=1)
        # importer consumes exactly what the exporter produces
        restored, report = import_state_dict(sd, variables, strict=True)
        assert not report["missing"]
        flat_a = jax.tree_util.tree_leaves(variables)
        flat_b = jax.tree_util.tree_leaves(restored)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_key_space_matches_reference_manifest(self, manifest):
        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        sd = export_state_dict(variables, num_classes=1)
        assert set(sd.keys()) == set(manifest.keys())
        for k, shape in manifest.items():
            assert tuple(sd[k].shape) == tuple(shape), k
