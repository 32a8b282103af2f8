"""Interop check: export flax weights → load into the PyTorch reference →
compare forward outputs.  The strongest possible evidence that
`models/torch_export.py` produces reference-loadable checkpoints.

Run: python tools/check_export_interop.py   (needs /root/reference + torch CPU)
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

# stub native deps the reference imports (same as tools/gen_goldens.py)
for _mod in ("torchvision", "torchvision.ops", "terminaltables"):
    if _mod not in sys.modules:
        stub = types.ModuleType(_mod)
        if _mod == "torchvision.ops":
            stub.nms = None
        sys.modules[_mod] = stub
if "torchvision" in sys.modules:
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
try:
    import pkg_resources  # noqa: F401
except ImportError:
    pr = types.ModuleType("pkg_resources")

    class _V:
        def __init__(self, s):
            self.s = s

        def __ge__(self, o):
            return True

        def __eq__(self, o):
            return False

    pr.parse_version = _V
    sys.modules["pkg_resources"] = pr


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.models.torch_export import export_state_dict
    from dcfa_yolo_tpu.models.yolo import init_model
    from dcfa_yolo_tpu.utils.golden import synth_input

    cfg = ModelConfig(num_classes=1, phi="n", input_shape=(640, 640))
    model, variables = init_model(cfg, jax.random.PRNGKey(123))
    sd_np = export_state_dict(variables, num_classes=1)

    import torch
    from nets.yolo_mul import YoloBody

    ref = YoloBody(input_shape=(640, 640), num_classes=1, phi="n")
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()},
        strict=True,
    ), None
    ref.eval()

    rgb = synth_input("interop_rgb", (1, 3, 640, 640), seed=9)
    nir = synth_input("interop_nir", (1, 3, 640, 640), seed=9)
    with torch.no_grad():
        dbox_t, cls_t, *_ = ref(torch.from_numpy(rgb), torch.from_numpy(nir))

    out = model.apply(variables, rgb.transpose(0, 2, 3, 1),
                      nir.transpose(0, 2, 3, 1), train=False)
    dbox_j = np.transpose(np.asarray(out.dbox), (0, 2, 1))
    cls_j = np.transpose(np.asarray(out.cls), (0, 2, 1))

    d_dbox = np.abs(dbox_j - dbox_t.numpy()).max()
    d_cls = np.abs(cls_j - cls_t.numpy()).max()
    print(f"export interop: dbox maxdiff {d_dbox:.2e}, cls maxdiff {d_cls:.2e}")
    assert d_dbox < 2e-3 and d_cls < 2e-3, "export interop FAILED"
    print("OK — reference loads exported weights and agrees numerically")


if __name__ == "__main__":
    main()
