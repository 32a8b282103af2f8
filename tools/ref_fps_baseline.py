"""Measure the reference's OWN full-pipeline FPS protocol in-container.

`/root/reference/yolo_mul.py:132-166` (`YOLO.get_FPS`): mean seconds over
`test_interval` iterations of forward + decode + per-class NMS at batch 1 —
the repo's canonical perf protocol (`predict_mul.py:25,44-47`).  BASELINE.md
previously only had a forward-only CPU orientation number; with the numpy
`torchvision.ops.nms` shim (tools/ref_pipeline_ab.py) the complete protocol
runs, making bench.py's `vs_baseline` apples-to-apples for the same hardware
class (torch CPU in this container — labeled as such, NOT a GPU number).

Run: python tools/ref_fps_baseline.py [--test-interval 20] [--weights x.pth]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ref_pipeline_ab import install_reference_stubs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-interval", type=int, default=20,
                   help="iterations (reference default 100; CPU is ~0.3 s/it)")
    p.add_argument("--weights", default="",
                   help=".pth to load (default: random-init exported weights)")
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--nms-iou", type=float, default=0.3)
    args = p.parse_args()

    install_reference_stubs()
    import torch
    from PIL import Image

    if args.weights:
        pth = args.weights
    else:
        # synthesize a loadable checkpoint from a fresh flax init (the FPS
        # protocol's timing does not depend on weight values)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        from dcfa_yolo_tpu.config import ModelConfig
        from dcfa_yolo_tpu.models.torch_export import export_state_dict
        from dcfa_yolo_tpu.models.yolo import init_model

        _, variables = init_model(
            ModelConfig(num_classes=1, phi="n"), jax.random.PRNGKey(0))
        sd = export_state_dict(variables, num_classes=1)
        pth = "/tmp/ref_fps_weights.pth"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, pth)

    from yolo_mul import YOLO  # reference import (after stubs)

    torch.set_num_threads(os.cpu_count() or 1)
    classes = os.path.join(REPO, "model_data", "voc_classes.txt")
    yolo = YOLO(model_path=pth, classes_path=classes, cuda=False,
                confidence=args.confidence, nms_iou=args.nms_iou)
    rgb = Image.open(os.path.join(REPO, "img", "sample_rgb.png"))
    nir = Image.open(os.path.join(REPO, "img", "sample_nir.png"))
    tact = yolo.get_FPS(rgb, nir, args.test_interval)
    print(json.dumps({
        "metric": "reference_full_pipeline_b1",
        "seconds_per_pair": round(tact, 4),
        "fps": round(1.0 / tact, 3),
        "hardware": "torch CPU (this container, 1 core)",
        "protocol": "yolo_mul.py:132-166 forward+decode+NMS x"
                    f"{args.test_interval}",
    }))


if __name__ == "__main__":
    main()
