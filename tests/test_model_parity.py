"""Full-model numerical parity against the PyTorch reference (synthetic weights).

The golden tensors were produced by `tools/gen_goldens.py` running the reference
implementation (torch CPU) with deterministically synthesized weights; here the
same weights are regenerated from the manifest, imported into the flax model,
and the eval-mode forward is compared end to end plus at intermediate taps.
"""

import numpy as np
import pytest

import jax

from dcfa_yolo_tpu.config import ModelConfig
from dcfa_yolo_tpu.models.torch_import import import_state_dict
from dcfa_yolo_tpu.models.yolo import DCFAYolo, count_params, init_model
from dcfa_yolo_tpu.utils.golden import synth_input, synth_state_dict


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def model_and_vars(manifest):
    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    sd = synth_state_dict(manifest, seed=0)
    variables, report = import_state_dict(sd, variables, strict=True)
    return cfg, model, variables, report


@pytest.fixture(scope="module")
def fwd(model_and_vars):
    cfg, model, variables, _ = model_and_vars
    rgb = nchw_to_nhwc(synth_input("rgb", (1, 3, 640, 640), seed=0))
    nir = nchw_to_nhwc(synth_input("nir", (1, 3, 640, 640), seed=0))
    apply = jax.jit(lambda v, r, n: model.apply(v, r, n, train=False))
    return jax.tree_util.tree_map(np.asarray, apply(variables, rgb, nir))


class TestImport:
    def test_all_params_filled(self, model_and_vars):
        _, _, _, report = model_and_vars
        assert not report["missing"], report["missing"][:10]

    def test_only_expected_keys_skipped(self, model_and_vars):
        _, _, _, report = model_and_vars
        unexpected = [k for k in report["skipped"]
                      if not (k.endswith("num_batches_tracked") or k.startswith("dfl."))]
        assert not unexpected, unexpected[:10]

    def test_param_count_matches_reference(self, model_and_vars):
        # reference: 2,678,866 including the 16 frozen DFL weights (BASELINE.md)
        _, _, variables, _ = model_and_vars
        assert count_params(variables) == 2_678_866 - 16


class TestForwardParity:
    def test_intermediate_taps(self, fwd, golden_model_fwd, model_and_vars):
        """fp16-stored taps localize any divergence layer by layer."""
        # taps are compared through a fresh apply with capture of intermediates:
        # the cheapest sufficient check is the three raw head maps below; here we
        # check backbone/neck taps via their own forward capture.
        cfg, model, variables, _ = model_and_vars
        rgb = nchw_to_nhwc(synth_input("rgb", (1, 3, 640, 640), seed=0))
        nir = nchw_to_nhwc(synth_input("nir", (1, 3, 640, 640), seed=0))
        _, intermediates = model.apply(
            variables, rgb, nir, train=False,
            capture_intermediates=lambda mdl, _: mdl.name in (
                "backbone_rgb", "backbone_nir", "conv3_for_upsample1",
                "conv3_for_upsample2", "conv3_for_downsample1",
                "conv3_for_downsample2"),
        )
        inter = intermediates["intermediates"]

        def get(name):
            return inter[name]["__call__"][0]

        checks = {
            "neck_p4_up1": get("conv3_for_upsample1"),
            "neck_p3": get("conv3_for_upsample2"),
            "neck_p4_down": get("conv3_for_downsample1"),
            "neck_p5": get("conv3_for_downsample2"),
            "backbone_rgb_feat1": get("backbone_rgb")[0],
            "backbone_rgb_feat2": get("backbone_rgb")[1],
            "backbone_nir_feat1": get("backbone_nir")[0],
        }
        for name, mine in checks.items():
            ref = nchw_to_nhwc(golden_model_fwd[f"tap_{name}"].astype(np.float32))
            np.testing.assert_allclose(
                np.asarray(mine), ref, rtol=5e-2, atol=5e-3,
                err_msg=f"tap {name} diverged")

    def test_raw_head_maps(self, fwd, golden_model_fwd):
        for level, key in enumerate(["feat_p3", "feat_p4", "feat_p5"]):
            ref = nchw_to_nhwc(golden_model_fwd[key])
            np.testing.assert_allclose(
                fwd.feats[level], ref, rtol=1e-3, atol=2e-4,
                err_msg=f"head map {key}")

    def test_dbox(self, fwd, golden_model_fwd):
        ref = np.transpose(golden_model_fwd["dbox"], (0, 2, 1))  # (1,4,A)→(1,A,4)
        np.testing.assert_allclose(fwd.dbox, ref, rtol=1e-3, atol=5e-4)

    def test_cls(self, fwd, golden_model_fwd):
        ref = np.transpose(golden_model_fwd["cls"], (0, 2, 1))
        np.testing.assert_allclose(fwd.cls, ref, rtol=1e-3, atol=2e-4)


class TestTrainModeBN:
    def test_batch_stats_update_semantics(self, model_and_vars):
        """One train-mode forward must update running stats with torch momentum
        semantics: new = (1-m)*old + m*batch (m=0.03 or 0.1 per BN variant)."""
        cfg, model, variables, _ = model_and_vars
        rgb = nchw_to_nhwc(synth_input("rgb", (2, 3, 640, 640), seed=1))
        nir = nchw_to_nhwc(synth_input("nir", (2, 3, 640, 640), seed=1))
        out, mutated = model.apply(
            variables, rgb, nir, train=True, mutable=["batch_stats"])
        old = variables["batch_stats"]["backbone_rgb"]["stem"]["bn"]["mean"]
        new = mutated["batch_stats"]["backbone_rgb"]["stem"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))
