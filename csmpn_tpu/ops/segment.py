"""Segment (scatter/gather) reductions for simplicial message passing.

TPU-native replacement for the reference's torch-scatter/PyG backend
(SURVEY.md C20; `EGCL.propagate` at cegnn_utils.py:279).  TPUs have no fast
scatter-atomics, so the idiomatic design is: sort edges by target simplex at
preprocessing time, then reduce with contiguous segment sums
(``jax.ops.segment_sum`` with ``indices_are_sorted=True``), which XLA lowers
to an efficient one-pass reduction.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int, indices_are_sorted: bool = False,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked segment sum. data: (E, ...), segment_ids: (E,)."""
    if mask is not None:
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)),
                         data, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int, indices_are_sorted: bool = False,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked segment mean with PyG ``aggr="mean"`` semantics: divide by the
    in-degree; empty segments yield 0, not NaN (SURVEY.md §7.3)."""
    total = segment_sum(data, segment_ids, num_segments,
                        indices_are_sorted, mask)
    ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments,
                        indices_are_sorted, mask)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - 1))


def masked_mean(data: jnp.ndarray, mask: jnp.ndarray,
                axis: int) -> jnp.ndarray:
    """Mean over ``axis`` counting only masked-in entries (padding-safe)."""
    mask = mask.astype(data.dtype)
    mask = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    total = jnp.sum(data * mask, axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return total / count


@partial(jax.jit, static_argnames=("k", "exclude_self"))
def knn_graph(pos: jnp.ndarray, k: int, exclude_self: bool = True):
    """Device-side k-nearest-neighbour edge list, replacing torch-cluster's
    ``knn_graph`` (SURVEY.md C21; used by md17.py:64, nba.py:48).

    pos: (N, D).  Returns edge_index (2, N*k) int32 rows [source, target]
    where source = neighbour, target = the node (PyG convention: edges point
    from the k neighbours j to node i).  If k >= N-1 the graph is fully
    connected (matching the reference's k=10000 usage).
    """
    n = pos.shape[0]
    k = min(k, n - 1 if exclude_self else n)
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    if exclude_self:
        d2 = d2 + jnp.eye(n, dtype=d2.dtype) * jnp.inf
    _, nbrs = jax.lax.top_k(-d2, k)          # (N, k) neighbour indices
    target = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    source = nbrs.astype(jnp.int32).reshape(-1)
    return jnp.stack([source, target], axis=0)


def sort_edges_by_target(edge_index, *edge_payloads):
    """Sort an edge list by (target, source) so segment reductions can use
    ``indices_are_sorted=True``.  Host-side (numpy) preprocessing helper."""
    import numpy as np

    ei = np.asarray(edge_index)
    order = np.lexsort((ei[0], ei[1]))
    out = [ei[:, order]]
    for p in edge_payloads:
        out.append(np.asarray(p)[order])
    return out[0] if not edge_payloads else tuple(out)
