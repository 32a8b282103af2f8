"""Generate golden parity tensors from the PyTorch reference at /root/reference.

Run once per golden-set change (host-side tool; torch CPU):
    python tools/gen_goldens.py

Outputs under tests/goldens/:
    manifest.json       — state_dict key → shape for the full model (phi='n', nc=1)
    model_fwd.npz       — eval-mode forward outputs + intermediate taps at 640x640
    ops.npz             — pure-op goldens (bilinear align-corners resize, maxpool,
                          PIL bicubic letterbox)

The synthetic weights/inputs come from `dcfa_yolo_tpu.utils.golden`, so the JAX
tests can regenerate them without torch or this repo's reference checkout.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

import torch  # noqa: E402

# The container has no torchvision; the reference only needs `torchvision.ops.nms`
# (unused by the forward pass we exercise here).  Stub it before importing nets.
import types  # noqa: E402

if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = None
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops

if "pkg_resources" not in sys.modules:
    try:
        import pkg_resources  # noqa: F401
    except ImportError:
        pr = types.ModuleType("pkg_resources")

        class _V:
            def __init__(self, s):
                self.s = str(s)

            def _key(self):
                out = []
                for part in self.s.split("+")[0].split("."):
                    digits = "".join(ch for ch in part if ch.isdigit())
                    out.append(int(digits) if digits else 0)
                return out

            def __ge__(self, other):
                return self._key() >= other._key()

            def __eq__(self, other):
                return self._key() == other._key()

        pr.parse_version = _V
        sys.modules["pkg_resources"] = pr
from dcfa_yolo_tpu.utils.golden import (  # noqa: E402
    save_manifest,
    synth_input,
    synth_state_dict,
    synth_value,
)

SEED = 0


def build_reference_model():
    from nets.yolo_mul import YoloBody

    torch.manual_seed(0)
    model = YoloBody(input_shape=(640, 640), num_classes=1, phi="n")
    model.eval()
    return model


def main() -> None:
    model = build_reference_model()
    sd = model.state_dict()
    manifest = {k: list(v.shape) for k, v in sd.items()}
    save_manifest(os.path.join(OUT, "manifest.json"), manifest)

    synth = synth_state_dict(manifest, seed=SEED)
    # keep the frozen DFL projection (arange(16)) — it is architecture, not a weight
    synth["dfl.conv.weight"] = sd["dfl.conv.weight"].numpy()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in synth.items()})
    model.eval()

    rgb = torch.from_numpy(synth_input("rgb", (1, 3, 640, 640), seed=SEED))
    nir = torch.from_numpy(synth_input("nir", (1, 3, 640, 640), seed=SEED))

    taps = {}

    def tap(name):
        def hook(_m, _i, out):
            t = out[0] if isinstance(out, tuple) else out
            taps[name] = t.detach().numpy().astype(np.float16)
        return hook

    # NOTE: YoloBody calls `backbone.forward(x)` directly (`nets/yolo_mul.py:399`),
    # which bypasses module hooks on the Backbone itself — hook its stages instead.
    model.backbone_rgb.dark3.register_forward_hook(tap("backbone_rgb_feat1"))
    model.backbone_rgb.dark4.register_forward_hook(tap("backbone_rgb_feat2"))
    model.backbone_nir.dark3.register_forward_hook(tap("backbone_nir_feat1"))
    model.cbam_rgb_feat1.register_forward_hook(tap("cbam_rgb_feat1"))
    model.cbam_nir_feat3.register_forward_hook(tap("cbam_nir_feat3"))
    model.conv3_for_upsample1.register_forward_hook(tap("neck_p4_up1"))
    model.conv3_for_upsample2.register_forward_hook(tap("neck_p3"))
    model.conv3_for_downsample1.register_forward_hook(tap("neck_p4_down"))
    model.conv3_for_downsample2.register_forward_hook(tap("neck_p5"))
    model.backbone_rgb.stem.register_forward_hook(tap("rgb_stem"))
    model.backbone_rgb.dark2.register_forward_hook(tap("rgb_dark2"))
    model.backbone_rgb.dark5.register_forward_hook(tap("rgb_dark5"))

    with torch.no_grad():
        dbox, cls, x, anchors, strides = model(rgb, nir)

    np.savez_compressed(
        os.path.join(OUT, "model_fwd.npz"),
        dbox=dbox.numpy(),
        cls=cls.numpy(),
        feat_p3=x[0].numpy(),
        feat_p4=x[1].numpy(),
        feat_p5=x[2].numpy(),
        anchors=anchors.numpy(),
        strides=strides.numpy(),
        **{f"tap_{k}": v for k, v in taps.items()},
    )
    print("model_fwd.npz written; dbox", dbox.shape, "cls", cls.shape)

    # ---- pure-op goldens ----
    ops = {}
    x_in = synth_input("resize_in", (2, 7, 13, 20), seed=SEED)  # NCHW
    t = torch.from_numpy(x_in)
    ops["resize_in"] = x_in
    ops["resize_out_40x40"] = torch.nn.functional.interpolate(
        t, size=(40, 40), mode="bilinear", align_corners=True).numpy()
    ops["resize_out_3x5"] = torch.nn.functional.interpolate(
        t, size=(3, 5), mode="bilinear", align_corners=True).numpy()

    p_in = synth_input("pool_in", (2, 5, 17, 19), seed=SEED)
    ops["pool_in"] = p_in
    ops["pool_k5s1"] = torch.nn.functional.max_pool2d(
        torch.from_numpy(p_in), 5, 1, 2).numpy()
    ops["pool_k3s2"] = torch.nn.functional.max_pool2d(
        torch.from_numpy(p_in), 3, 2, 1).numpy()

    # PIL bicubic letterbox golden (`utils/utils.py:24-37`)
    from PIL import Image

    rng_img = (synth_input("letterbox", (480, 602, 3), seed=SEED) * 255).astype(np.uint8)
    pil = Image.fromarray(rng_img)
    iw, ih = pil.size
    w, h = 640, 640
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = pil.resize((nw, nh), Image.BICUBIC)
    canvas = Image.new("RGB", (w, h), (128, 128, 128))
    canvas.paste(resized, ((w - nw) // 2, (h - nh) // 2))
    ops["letterbox_in"] = rng_img
    ops["letterbox_out"] = np.asarray(canvas, dtype=np.uint8)

    # DecodeBox goldens (`utils/utils_bbox.py:42-85`) from the model outputs
    from utils.utils_bbox import DecodeBox

    decoder = DecodeBox(1, (640, 640))
    y = decoder.decode_box((dbox, cls, x, anchors, strides))
    ops["decoded_y"] = y.numpy()

    rng = np.random.Generator(np.random.PCG64(7))
    box_xy = rng.uniform(0.2, 0.8, size=(50, 2)).astype(np.float32)
    box_wh = rng.uniform(0.05, 0.3, size=(50, 2)).astype(np.float32)
    ops["cb_xy"], ops["cb_wh"] = box_xy, box_wh
    # yolo_correct_boxes mutates box_wh in place (`box_hw *= scale` on a reversed
    # view, `utils/utils_bbox.py:79`) — pass copies so the saved inputs stay pristine.
    ops["cb_letterbox"] = decoder.yolo_correct_boxes(
        box_xy.copy(), box_wh.copy(), (640, 640), (480, 602), True)
    ops["cb_plain"] = decoder.yolo_correct_boxes(
        box_xy.copy(), box_wh.copy(), (640, 640), (480, 602), False)

    np.savez_compressed(os.path.join(OUT, "ops.npz"), **ops)
    print("ops.npz written")


if __name__ == "__main__":
    main()
