"""--pretrained backbone path: offline resolver + single→dual partial load
(reference `nets/yolo_mul.py:283-293`, `train_mul.py:136-141`)."""

import os

import numpy as np
import pytest

import jax

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.torch_import import import_state_dict, load_torch_checkpoint
from dcfa_yolo_tpu.models.yolo import init_model
from dcfa_yolo_tpu.utils.general import download_weights
from dcfa_yolo_tpu.utils.golden import load_manifest, synth_state_dict

GOLDEN_MANIFEST = os.path.join(os.path.dirname(__file__), "goldens",
                               "manifest.json")


class TestDownloadWeights:
    def test_resolves_local_file(self, tmp_path):
        f = tmp_path / "yolov8_n_backbone_weights.pth"
        f.write_bytes(b"x")
        assert download_weights("n", str(tmp_path)) == str(f)

    def test_raises_with_url_when_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="yolov8_s_backbone"):
            download_weights("s", str(tmp_path))


class TestPretrainedBackboneImport:
    def test_partial_load_fills_both_branches(self, tmp_path):
        """A backbone-namespace weights file loads into backbone_rgb AND
        backbone_nir (strict=False: head/neck params untouched)."""
        sd_full = synth_state_dict(load_manifest(GOLDEN_MANIFEST), seed=0)
        bb = {k[len("backbone_rgb."):]: v for k, v in sd_full.items()
              if k.startswith("backbone_rgb.")}
        path = tmp_path / "yolov8_n_backbone_weights.npz"
        np.savez(path, **bb)

        cfg = ModelConfig(num_classes=1, phi="n", input_shape=(64, 64))
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        sd = {f"backbone.{k}": v for k, v in load_torch_checkpoint(str(path)).items()}
        new_vars, report = import_state_dict(sd, variables, strict=False)

        assert len(report["matched"]) > 200  # both branches filled
        same = jax.tree_util.tree_map(
            lambda a, b: bool(np.array_equal(a, b)),
            new_vars["params"]["backbone_rgb"], new_vars["params"]["backbone_nir"])
        assert jax.tree_util.tree_all(same)
        # changed vs the random init
        changed = not np.array_equal(
            new_vars["params"]["backbone_rgb"]["stem"]["conv"]["kernel"],
            variables["params"]["backbone_rgb"]["stem"]["conv"]["kernel"])
        assert changed
        # head untouched (strict=False partial load)
        assert np.array_equal(new_vars["params"]["cv3_0_2"]["kernel"],
                              variables["params"]["cv3_0_2"]["kernel"])
