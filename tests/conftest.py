"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (pjit / shard_map over a Mesh) are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize pre-registers the axon TPU PJRT plugin at
# interpreter startup, which overrides the env var — override it back before any
# backend is initialized.  Tests always run on the virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def golden_ops():
    with np.load(GOLDEN_DIR / "ops.npz") as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def golden_model_fwd():
    with np.load(GOLDEN_DIR / "model_fwd.npz") as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def manifest():
    from dcfa_yolo_tpu.utils.golden import load_manifest

    return load_manifest(str(GOLDEN_DIR / "manifest.json"))
