"""Deterministic synthetic-weight machinery for parity testing.

The reference repo ships no weights (BASELINE.md), so parity against the PyTorch
implementation is checked with *synthesized* state_dicts: every tensor is filled
from a numpy PRNG seeded by (global seed, key name), making the values
reproducible on both sides without committing a 10 MB checkpoint.  The torch-side
tool (`tools/gen_goldens.py`) fills the reference model with these values and
records its outputs; the JAX tests regenerate the same state_dict from the
committed key/shape manifest and compare.
"""

from __future__ import annotations

import json
import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _rng_for(key: str, seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed * 1_000_003 + zlib.crc32(key.encode())))


def synth_value(key: str, shape: Sequence[int], seed: int = 0) -> np.ndarray:
    """Deterministic value for one state_dict entry.

    Distribution choices make the network numerically lively but stable in eval
    mode: conv weights N(0, 0.05), BN scale N(1, 0.1), biases N(0, 0.05),
    running means N(0, 0.2), running vars U(0.5, 1.5), BiFPN weights U(0.5, 1.5).
    """
    rng = _rng_for(key, seed)
    shape = tuple(int(s) for s in shape)
    if key.endswith("running_var"):
        return rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
    if key.endswith("running_mean"):
        return (rng.standard_normal(shape) * 0.2).astype(np.float32)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, dtype=np.int64)
    if key == "bi_fpn.w":
        return rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
    if len(shape) == 1:
        if key.endswith("weight"):  # BN gamma
            return (1.0 + rng.standard_normal(shape) * 0.1).astype(np.float32)
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)  # biases
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)  # conv kernels


def synth_state_dict(manifest: Dict[str, List[int]], seed: int = 0) -> Dict[str, np.ndarray]:
    return {k: synth_value(k, shape, seed) for k, shape in manifest.items()}


def synth_input(name: str, shape: Sequence[int], seed: int = 0) -> np.ndarray:
    """Deterministic input tensor in [0, 1) (images are /255-normalized)."""
    rng = _rng_for("input:" + name, seed)
    return rng.uniform(0.0, 1.0, size=tuple(int(s) for s in shape)).astype(np.float32)


def save_manifest(path: str, manifest: Dict[str, List[int]]) -> None:
    with open(path, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)


def load_manifest(path: str) -> Dict[str, List[int]]:
    with open(path) as f:
        return json.load(f)
