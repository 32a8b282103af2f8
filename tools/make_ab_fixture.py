"""Distill a trained checkpoint into the committed A/B test fixture.

tests/test_ref_pipeline_ab.py needs TRAINED weights: with untrained weights
every anchor scores within ~0.01 of the conf threshold and sub-LSB
preprocessing differences (PIL BICUBIC vs the on-device matched resize) flip
borderline boxes, so exact count agreement is only meaningful with decisive
margins.  This script takes the inference variables a predictor would use
(EMA params + BN stats, utils/checkpoint.load_variables semantics), rounds
them to float16 (both pipelines then load the SAME rounded values — shared
weights stay bit-identical), and writes a flat compressed npz.

Usage:
    python tools/make_ab_fixture.py <trained.ckpt> tests/fixtures/ab_weights_f16.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dcfa_yolo_tpu.utils.checkpoint import load_variables

    variables = load_variables(src)
    flat = flatten(variables)
    f16 = {k: v.astype(np.float16) for k, v in flat.items()}
    # refuse silently-lossy conversion: trained DCFA weights fit f16 range
    for k, v in flat.items():
        if np.isfinite(v).all() and not np.isfinite(f16[k].astype(np.float32)).all():
            raise SystemExit(f"{k} overflows float16 — fixture would be lossy")
    np.savez_compressed(dst, **f16)
    print(f"wrote {dst}: {len(f16)} arrays, "
          f"{os.path.getsize(dst) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
