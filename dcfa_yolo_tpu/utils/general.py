"""General utilities (`utils/utils.py` counterparts)."""

from __future__ import annotations

import os
import random
from typing import List, Tuple


def seed_everything(seed: int = 11) -> None:
    """Seed python/numpy RNGs (`utils/utils.py:58-65`).  JAX keys are explicit
    (passed as PRNGKey) so there is no global JAX seed to set; XLA itself is
    deterministic for a fixed program."""
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def show_config(**kwargs) -> None:
    """Console config table (`utils/utils.py:81-89`)."""
    print("Configurations:")
    print("-" * 70)
    print("|%25s | %40s|" % ("keys", "values"))
    print("-" * 70)
    for key, value in kwargs.items():
        print("|%25s | %40s|" % (str(key), str(value)))
    print("-" * 70)


def download_weights(phi: str, model_dir: str = "./model_data") -> str:
    """Pretrained-backbone fetch (`utils/utils.py:91-107`).

    This container has no network egress; the function resolves a local file
    `{model_dir}/yolov8_{phi}_backbone_weights.pth` (place it there manually)
    and returns its path, raising with the original URL otherwise.
    """
    urls = {
        p: f"https://github.com/bubbliiiing/yolov8-pytorch/releases/download/v1.0/yolov8_{p}_backbone_weights.pth"
        for p in "nsmlx"
    }
    local = os.path.join(model_dir, f"yolov8_{phi}_backbone_weights.pth")
    if os.path.exists(local):
        return local
    raise FileNotFoundError(
        f"pretrained backbone not found at {local}; download it from "
        f"{urls.get(phi, '<no URL: unknown phi ' + repr(phi) + '>')} "
        "on a networked machine and place it there")
