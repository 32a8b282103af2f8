"""Device mesh + sharding helpers.

The reference distributes with DataParallel/DDP wrappers, NCCL process groups,
DistributedSampler and SyncBatchNorm (`train_mul.py:117-206`, SURVEY §2.6).
The TPU-native equivalent is one jit-compiled program over a `jax.sharding.Mesh`:

  * batch axis sharded over the "data" mesh axis (replaces DDP + the sampler);
  * params/optimizer state replicated (XLA all-reduces gradients over ICI —
    the compiled analogue of NCCL all-reduce);
  * BatchNorm moments reduce over the *global* batch inside jit, so SyncBN is
    automatic rather than a module conversion.

Multi-host extension: `jax.distributed.initialize()` then the same program —
the mesh just spans hosts, gradient reductions ride ICI intra-slice / DCN
across slices.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
