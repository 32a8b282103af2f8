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

for _mod in ("terminaltables", "pycocotools", "pycocotools.coco",
             "pycocotools.cocoeval"):
    if _mod not in sys.modules:
        stub = types.ModuleType(_mod)
        if _mod == "terminaltables":
            stub.AsciiTable = lambda data: types.SimpleNamespace(table=str(data))
        sys.modules[_mod] = stub

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

    gen_loss_goldens()


def gen_loss_goldens() -> None:
    """Assigner + full-loss goldens from the reference training criterion."""
    from nets.yolo_training import Loss, TaskAlignedAssigner
    from nets.yolo_mul import YoloBody

    tr = {}
    rng = np.random.Generator(np.random.PCG64(11))

    # ---- assigner golden (b=2, A=336, nc=3, M=8) ----
    b, a, nc, m = 2, 336, 3, 8
    pd_scores = rng.uniform(0, 1, (b, a, nc)).astype(np.float32)
    anc = rng.uniform(0, 128, (a, 2)).astype(np.float32)
    cxy = rng.uniform(10, 118, (b, a, 2)).astype(np.float32)
    wh = rng.uniform(4, 60, (b, a, 2)).astype(np.float32)
    pd_bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    gxy = rng.uniform(20, 100, (b, m, 2)).astype(np.float32)
    gwh = rng.uniform(10, 50, (b, m, 2)).astype(np.float32)
    gt_bboxes = np.concatenate([gxy - gwh / 2, gxy + gwh / 2], -1)
    gt_labels = rng.integers(0, nc, (b, m, 1)).astype(np.float32)
    # pad out the tail rows like the reference's preprocess does
    gt_bboxes[0, 6:] = 0
    gt_bboxes[1, 3:] = 0
    mask_gt = (gt_bboxes.sum(2, keepdims=True) > 0).astype(np.float32)
    gt_labels = gt_labels * mask_gt

    assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0,
                                   roll_out_thr=64)
    t_labels, t_bboxes, t_scores, fg, t_idx = assigner(
        torch.from_numpy(pd_scores), torch.from_numpy(pd_bboxes),
        torch.from_numpy(anc), torch.from_numpy(gt_labels),
        torch.from_numpy(gt_bboxes), torch.from_numpy(mask_gt))
    tr.update(
        as_pd_scores=pd_scores, as_anc=anc, as_pd_bboxes=pd_bboxes,
        as_gt_bboxes=gt_bboxes, as_gt_labels=gt_labels, as_mask_gt=mask_gt,
        as_t_bboxes=t_bboxes.numpy(), as_t_scores=t_scores.numpy(),
        as_fg=fg.numpy(), as_t_labels=t_labels.numpy())

    # ---- full loss golden at 128x128, nc=3, b=2 ----
    model = YoloBody(input_shape=(128, 128), num_classes=nc, phi="n")
    criterion = Loss(model)
    feats = [
        (rng.standard_normal((2, 64 + nc, 16, 16)) * 2).astype(np.float32),
        (rng.standard_normal((2, 64 + nc, 8, 8)) * 2).astype(np.float32),
        (rng.standard_normal((2, 64 + nc, 4, 4)) * 2).astype(np.float32),
    ]
    n_boxes = [5, 3]
    rows = []
    for j, nb in enumerate(n_boxes):
        cx = rng.uniform(0.2, 0.8, nb)
        cy = rng.uniform(0.2, 0.8, nb)
        w = rng.uniform(0.05, 0.3, nb)
        h = rng.uniform(0.05, 0.3, nb)
        cls = rng.integers(0, nc, nb)
        for i in range(nb):
            rows.append([j, cls[i], cx[i], cy[i], w[i], h[i]])
    targets = np.array(rows, dtype=np.float32)
    loss_val = criterion([torch.from_numpy(f) for f in feats],
                         torch.from_numpy(targets))
    tr.update(loss_feat_p3=feats[0], loss_feat_p4=feats[1], loss_feat_p5=feats[2],
              loss_targets=targets, loss_total=np.float32(loss_val.item()))

    # empty-target variant (zero boxes for the whole batch)
    loss_empty = criterion([torch.from_numpy(f) for f in feats],
                           torch.from_numpy(np.zeros((0, 6), np.float32)))
    tr["loss_total_empty"] = np.float32(loss_empty.item())

    # ---- LR schedule goldens (`get_lr_scheduler`, nets/yolo_training.py:500-536) ----
    from nets.yolo_training import get_lr_scheduler

    cos_fn = get_lr_scheduler("cos", 0.01, 0.0001, 200)
    step_fn = get_lr_scheduler("step", 0.01, 0.0001, 200)
    epochs = np.arange(200, dtype=np.float64)
    tr["lr_cos"] = np.array([cos_fn(e) for e in epochs], np.float64)
    tr["lr_step"] = np.array([step_fn(e) for e in epochs], np.float64)

    np.savez_compressed(os.path.join(OUT, "train.npz"), **tr)
    print("train.npz written; loss =", float(loss_val), "empty =", float(loss_empty))

    gen_map_golden()


def gen_map_golden() -> None:
    """Golden mAP value from the reference `get_map` on a synthetic det set."""
    import json
    import shutil

    rng = np.random.Generator(np.random.PCG64(3))
    tmp = os.path.join("/tmp", "map_golden")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "ground-truth"))
    os.makedirs(os.path.join(tmp, "detection-results"))
    classes = ["tomato", "leaf"]
    n_images = 12
    for i in range(n_images):
        fid = f"{i:06d}"
        with open(os.path.join(tmp, "ground-truth", fid + ".txt"), "w") as f:
            for _ in range(int(rng.integers(0, 5))):
                c = classes[int(rng.integers(0, 2))]
                x1, y1 = rng.integers(0, 400, 2)
                w, h = rng.integers(20, 200, 2)
                suffix = " difficult" if rng.random() < 0.15 else ""
                f.write(f"{c} {x1} {y1} {x1 + w} {y1 + h}{suffix}\n")
        with open(os.path.join(tmp, "detection-results", fid + ".txt"), "w") as f:
            for _ in range(int(rng.integers(0, 8))):
                c = classes[int(rng.integers(0, 2))]
                x1, y1 = rng.integers(0, 400, 2)
                w, h = rng.integers(20, 200, 2)
                conf = rng.random()
                f.write(f"{c} {conf:.6f} {x1} {y1} {x1 + w} {y1 + h}\n")
    # jittered copies of gt as extra detections so some TPs exist
    for i in range(n_images):
        fid = f"{i:06d}"
        with open(os.path.join(tmp, "ground-truth", fid + ".txt")) as f:
            gt_lines = [l.split() for l in f if l.strip()]
        with open(os.path.join(tmp, "detection-results", fid + ".txt"), "a") as f:
            for parts in gt_lines:
                if rng.random() < 0.7:
                    name = parts[0]
                    coords = [float(x) for x in parts[1:5]]
                    jit = rng.normal(0, 6, 4)
                    conf = rng.random() * 0.5 + 0.5
                    f.write(f"{name} {conf:.6f} " +
                            " ".join(str(int(c + j)) for c, j in zip(coords, jit)) + "\n")

    from utils import utils_map

    cwd = os.getcwd()
    os.chdir("/tmp")  # reference writes ./map_out relative paths in voc_ap
    os.makedirs("/tmp/map_out/results", exist_ok=True)
    try:
        ref_map = utils_map.get_map(0.5, False, score_threhold=0.5, path=tmp)
    finally:
        os.chdir(cwd)
    # snapshot the txt files into the goldens dir for the JAX-side test
    golden_dir = os.path.join(OUT, "map_files")
    shutil.rmtree(golden_dir, ignore_errors=True)
    shutil.copytree(tmp, golden_dir, ignore=shutil.ignore_patterns("results", ".temp*"))
    # reference results.txt (AP blocks + gt/detection count sections) as the
    # golden for the rebuilt harness's report surface
    shutil.copy(os.path.join(tmp, "results", "results.txt"),
                os.path.join(OUT, "map_results_golden.txt"))
    with open(os.path.join(OUT, "map_golden.json"), "w") as f:
        json.dump({"map50": float(ref_map)}, f)
    print("map golden:", ref_map)


if __name__ == "__main__":
    main()
