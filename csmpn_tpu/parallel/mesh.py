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
    dimension over the mesh's data axis.

    Single-process: a plain sharded ``device_put``.  Multi-process (the DDP
    equivalent, reference md17.py:141-172 DistributedSampler + DDP): each
    process holds only ITS loader shard of the global batch, so leaves are
    assembled into global arrays with
    ``jax.make_array_from_process_local_data`` — the local (per-process)
    batch becomes this process's slice of the global (world * local) batch
    and XLA's gradient psum runs over all hosts."""
    sharding = batch_sharding(mesh, axis_name)
    multiproc = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def shard_stacked(stacked, mesh: Mesh, axis_name: str = "data"):
    """Shard a scan-grouped [k, batch, ...] pytree along axis 1 (the batch
    axis) — the grouped-dispatch variant of :func:`shard_batch`."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    multiproc = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, stacked)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) over the mesh.  Multi-process:
    every process holds the full (identical, same-seed) array, declared as
    fully-replicated process-local data."""
    if jax.process_count() > 1:
        sharding = replicated(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, replicated(mesh))
