"""Device-mesh utilities: data-parallel sharding of simplicial batches.

Replaces the reference's DDP/NCCL layer (SURVEY.md §2 parallelism
inventory): batches are sharded over a ``data`` mesh axis with
NamedSharding, parameters are replicated, and XLA inserts the gradient
all-reduce (psum) during jit — the DistributedDataParallel equivalent with
collectives riding ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array leaf of a batch pytree along its leading (batch)
    dimension over the mesh's data axis."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
