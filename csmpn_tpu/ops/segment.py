"""Segment (scatter/gather) reductions for simplicial message passing.

TPU-native replacement for the reference's torch-scatter/PyG backend
(SURVEY.md C20; `EGCL.propagate` at cegnn_utils.py:279).  TPUs have no fast
scatter-atomics — XLA lowers scatter-add to a serialized per-row loop
(measured: seconds for 131k rows).  The idiomatic design: edges are sorted
by target simplex at preprocessing time, and the reduction becomes

    prefix = cumsum(data)                     # log-depth, vectorized
    out[s] = prefix[end(s) - 1] - prefix[end(s-1) - 1]   # two gathers

where ``end(s) = searchsorted(ids, s, 'right')``.  Empty segments yield 0
naturally.  The backward pass is a pure gather (``g[ids]``), installed via
custom_vjp so autodiff never materializes a scatter.

A fused Pallas kernel (single pass over HBM) backs the hot path on TPU —
see ops/pallas_segment.py; this module provides the portable XLA fallback
and dispatch.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Global aggregation precision mode.  "exact": f32 bit-accurate segment sums
# (HIGHEST-precision MXU matmuls — the default, used by tests and parity
# checks).  "fast": one bf16 MXU pass with f32 accumulation (~1e-3 relative
# input rounding; the intended large-scale-training mode, like bf16
# activations).  Trace-time switch: set before jit/compile.
_AGGREGATION_MODE = "exact"


def set_aggregation_mode(mode: str) -> None:
    global _AGGREGATION_MODE
    assert mode in ("exact", "fast"), mode
    _AGGREGATION_MODE = mode


def aggregation_exact() -> bool:
    return _AGGREGATION_MODE == "exact"


# ---------------------------------------------------------------- core sums

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sorted_segment_sum_cumsum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                               num_segments: int) -> jnp.ndarray:
    """Cumulative-sum formulation for SORTED segment ids (TPU fast path)."""
    prefix = jnp.cumsum(data.astype(jnp.float32), axis=0)
    ends = jnp.searchsorted(segment_ids,
                            jnp.arange(num_segments, dtype=segment_ids.dtype),
                            side="right")
    # prefix row at end-1; end==0 -> row 0 masked to zero via where
    gathered = jnp.take(prefix, jnp.maximum(ends - 1, 0), axis=0)
    gathered = jnp.where((ends > 0).reshape((-1,) + (1,) * (data.ndim - 1)),
                         gathered, 0.0)
    # difference against the previous segment's end
    prev = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    prev_rows = jnp.take(prefix, jnp.maximum(prev - 1, 0), axis=0)
    prev_rows = jnp.where(
        (prev > 0).reshape((-1,) + (1,) * (data.ndim - 1)), prev_rows, 0.0)
    return (gathered - prev_rows).astype(data.dtype)


def _cumsum_fwd(data, segment_ids, num_segments):
    return (_sorted_segment_sum_cumsum(data, segment_ids, num_segments),
            segment_ids)


def _cumsum_bwd(num_segments, segment_ids, g):
    # d/d data[e] = g[segment_ids[e]] — a pure gather
    return (jnp.take(g, segment_ids, axis=0), None)


_sorted_segment_sum_cumsum.defvjp(_cumsum_fwd, _cumsum_bwd)


def sorted_segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Segment sum for ids sorted ascending.  Dispatches to the Pallas
    kernel on TPU (XLA's scatter lowering serializes per-row there) or
    XLA's native path elsewhere."""
    if _on_tpu():
        from .pallas_segment import sorted_segment_sum_pallas

        flat = data.reshape(data.shape[0], -1)
        out = sorted_segment_sum_pallas(flat, segment_ids, num_segments,
                                        128, 1024, aggregation_exact())
        return out.reshape((num_segments,) + data.shape[1:])
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=True)


def segment_counts(segment_ids: jnp.ndarray, num_segments: int,
                   mask: Optional[jnp.ndarray] = None,
                   indices_are_sorted: bool = True) -> jnp.ndarray:
    """In-degree per segment.  For sorted ids this is a pure searchsorted
    difference (no reduction at all)."""
    if indices_are_sorted and mask is None:
        r = jnp.arange(num_segments, dtype=segment_ids.dtype)
        ends = jnp.searchsorted(segment_ids, r, side="right")
        starts = jnp.searchsorted(segment_ids, r, side="left")
        return (ends - starts).astype(jnp.float32)
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    if indices_are_sorted:
        # cumsum/gather on every platform: ids (and often the mask) are
        # jit-time constants, and XLA constant-folds a scatter-add with a
        # serialized per-row loop (minutes at ~1M edges on CPU)
        return _sorted_segment_sum_cumsum(ones, segment_ids, num_segments)
    return jax.ops.segment_sum(ones, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


# ------------------------------------------------------- scatter-free take

@jax.custom_vjp
def take_rows(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather whose BACKWARD never scatters.

    ``jnp.take``'s VJP is a scatter-add — serialized per-row on TPU.  Here
    the cotangent is accumulated by sorting the row indices (one XLA sort)
    and running the sorted segment sum (Pallas kernel on TPU).
    """
    return jnp.take(h, idx, axis=0)


def _take_rows_fwd(h, idx):
    return jnp.take(h, idx, axis=0), (idx, h.shape[0])


def _permute_rows_flat(g, order):
    """Row permutation of a cotangent as a FLAT 2-D gather, cast to the
    aggregation stream dtype FIRST.

    Keeping the (E, C, nb) shape here lets XLA pick an edge-minor
    layout ({0,2,1}) for the fused cast+gather, which degrades the row
    gather ~20x (measured 15 ms vs 0.8 ms for the same 134 MB at the
    bench shape).  Flattening to (E, D) pins the row-major layout, and
    casting before the gather halves its traffic in fast mode."""
    flat = g.reshape(g.shape[0], -1)
    if not aggregation_exact():
        flat = flat.astype(jnp.bfloat16)
    return jnp.take(flat, order, axis=0)


def _take_rows_bwd(res, g):
    idx, n = res
    order = jnp.argsort(idx)
    ids_sorted = jnp.take(idx, order)
    if _on_tpu():
        flat = _permute_rows_flat(g, order)
        from .pallas_segment import sorted_segment_sum_pallas

        d_h = sorted_segment_sum_pallas(flat, ids_sorted, n, 128, 1024,
                                        aggregation_exact())
        d_h = d_h.astype(g.dtype).reshape((n,) + g.shape[1:])
    else:
        g_sorted = jnp.take(g, order, axis=0)
        d_h = jax.ops.segment_sum(g_sorted, ids_sorted, num_segments=n,
                                  indices_are_sorted=True)
    return d_h, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def take_rows_presorted(h: jnp.ndarray, idx: jnp.ndarray,
                        order: jnp.ndarray,
                        idx_sorted: jnp.ndarray) -> jnp.ndarray:
    """Row gather with a PRECOMPUTED sort of the gather indices.

    ``order``/``idx_sorted`` satisfy ``idx[order] == idx_sorted`` with
    idx_sorted ascending — computed once at preprocessing time (edge lists
    are static per batch), so the backward pass is permute + sorted segment
    sum with no in-graph argsort.
    """
    del order, idx_sorted
    return jnp.take(h, idx, axis=0)


def _take_rows_ps_fwd(h, idx, order, idx_sorted):
    return jnp.take(h, idx, axis=0), (order, idx_sorted, h.shape[0])


def _take_rows_ps_bwd(res, g):
    order, idx_sorted, n = res
    if _on_tpu():
        from .pallas_segment import sorted_segment_sum_pallas

        flat = _permute_rows_flat(g, order)
        d_h = sorted_segment_sum_pallas(flat, idx_sorted, n, 128, 1024,
                                        aggregation_exact())
        d_h = d_h.astype(g.dtype).reshape((n,) + g.shape[1:])
    else:
        g_sorted = jnp.take(g, order, axis=0)
        d_h = jax.ops.segment_sum(g_sorted, idx_sorted, num_segments=n,
                                  indices_are_sorted=True)
    return d_h, None, None, None


take_rows_presorted.defvjp(_take_rows_ps_fwd, _take_rows_ps_bwd)


@jax.custom_vjp
def take_rows_sorted_idx(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather whose indices are ALREADY ascending (e.g. edge targets):
    backward is the sorted segment sum directly."""
    return jnp.take(h, idx, axis=0)


def _take_rows_si_fwd(h, idx):
    return jnp.take(h, idx, axis=0), (idx, h.shape[0])


def _take_rows_si_bwd(res, g):
    idx, n = res
    if _on_tpu():
        from .pallas_segment import sorted_segment_sum_pallas

        flat = g.reshape(g.shape[0], -1)
        d_h = sorted_segment_sum_pallas(flat, idx, n)
        d_h = d_h.reshape((n,) + g.shape[1:])
    else:
        d_h = jax.ops.segment_sum(g, idx, num_segments=n,
                                  indices_are_sorted=True)
    return d_h, None


take_rows_sorted_idx.defvjp(_take_rows_si_fwd, _take_rows_si_bwd)


@jax.custom_vjp
def batched_take(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample row gather h[b, idx[b]] with a one-hot-matmul BACKWARD
    (scatter-free; the per-sample row count is small in task batches, so
    the (B, I, N) one-hot fits easily and runs on the MXU).

    h: (B, N, ...); idx: (B, ...I) int -> out (B, ...I, ...)."""
    return jax.vmap(lambda f, i: f[i])(h, idx)


def _batched_take_fwd(h, idx):
    return batched_take(h, idx), (idx, h.shape)


def _batched_take_bwd(res, g):
    idx, h_shape = res
    b, n = h_shape[0], h_shape[1]
    feat_shape = h_shape[2:]
    idx_flat = idx.reshape(b, -1)                       # (B, I)
    g_flat = g.reshape(b, idx_flat.shape[1], -1)        # (B, I, D)
    onehot = jax.nn.one_hot(idx_flat, n, axis=-1, dtype=g_flat.dtype)
    d_h = jnp.einsum("bin,bid->bnd", onehot, g_flat)
    return d_h.reshape(h_shape), None


batched_take.defvjp(_batched_take_fwd, _batched_take_bwd)


# ---------------------------------------------------- batched matmul path

@jax.custom_vjp
def _onehot_matmul_fast(onehot: jnp.ndarray,
                        data_b: jnp.ndarray) -> jnp.ndarray:
    """``einsum("bne,bed->bnd")`` as ONE bf16 MXU pass (f32 accumulation)
    in BOTH directions.  The 0/1 membership tensor is exact in bf16 and
    the data rounding is the same error class as the flat fast path's
    stream rounding; the custom_vjp exists because the autodiff transpose
    of a bf16 einsum with an f32 cotangent promotes back to the ~2.8x
    slower f32 MXU path (NOTES.md machine envelope)."""
    return jnp.einsum(
        "bne,bed->bnd", onehot.astype(jnp.bfloat16),
        data_b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)


def _onehot_matmul_fast_fwd(onehot, data_b):
    # residuals must be JAX values: carry the data dtype as a 0-d array
    return _onehot_matmul_fast(onehot, data_b), (
        onehot, jnp.zeros((), data_b.dtype))


def _onehot_matmul_fast_bwd(res, g):
    onehot, dt_proxy = res
    dt = dt_proxy.dtype
    d_data = jnp.einsum(
        "bne,bnd->bed", onehot.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32).astype(dt)
    # onehot is built from integer ids / a bool mask and wrapped in
    # stop_gradient at the call site — this cotangent is dead (DCE'd).
    return jnp.zeros_like(onehot), d_data


_onehot_matmul_fast.defvjp(_onehot_matmul_fast_fwd, _onehot_matmul_fast_bwd)


def _batched_onehot_agg(data: jnp.ndarray, segment_ids: jnp.ndarray,
                        batch_shape, mask: Optional[jnp.ndarray],
                        mean: bool) -> jnp.ndarray:
    """Aggregation as a batched one-hot matmul (TPU fast path for batches
    of small graphs — the dominant task-model case).

    The big-graph arrays are flat with static per-sample offsets b*N
    (batching.py); reshaping to (B, E) and building a (B, N, E) one-hot
    membership tensor turns scatter into an MXU-batched matmul.  In fast
    mode the matmul feeds the MXU bf16 operands with f32 accumulation
    (one pass — ~2.8x the f32 rate on the measured machine envelope);
    the in-degree counts stay f32-exact either way.
    """
    b, n, e = batch_shape
    d = int(np.prod(data.shape[1:]))
    data_b = data.reshape(b, e, d)
    local = segment_ids.reshape(b, e) - (
        jnp.arange(b, dtype=segment_ids.dtype) * n)[:, None]
    onehot = jax.nn.one_hot(local, n, axis=1,
                            dtype=jnp.float32)           # (B, N, E)
    if mask is not None:
        onehot = onehot * mask.reshape(b, 1, e).astype(jnp.float32)
    onehot = jax.lax.stop_gradient(onehot)  # non-diff (ids/mask)
    if aggregation_exact():
        out = jnp.einsum("bne,bed->bnd", onehot.astype(data.dtype), data_b,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = _onehot_matmul_fast(onehot, data_b)
    if mean:
        count = jnp.maximum(jnp.sum(onehot, axis=2), 1.0)       # (B, N)
        out = out / count[..., None].astype(out.dtype)
    return out.reshape((b * n,) + data.shape[1:])


# ------------------------------------------------------------- public API

# The batched one-hot path materializes a (B, N, E) membership tensor:
# above this element count (1 GiB at f32) it would silently OOM on larger
# batched graphs, so dispatch falls back to the sorted-segment path (the
# stacked layout keeps global targets ascending).
ONEHOT_ELEMS_LIMIT = 1 << 28


def _fits_onehot(batch_shape) -> bool:
    b, n, e = batch_shape
    return b * n * e <= ONEHOT_ELEMS_LIMIT


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int, indices_are_sorted: bool = False,
                mask: Optional[jnp.ndarray] = None,
                batch_shape=None) -> jnp.ndarray:
    """Masked segment sum. data: (E, ...), segment_ids: (E,).

    ``batch_shape=(B, N, E)`` marks data as B stacked graphs with static
    layout (node b*N+i); on TPU this dispatches to the batched one-hot
    matmul path (size-guarded by ONEHOT_ELEMS_LIMIT).
    """
    if batch_shape is not None and _on_tpu() and _fits_onehot(batch_shape):
        return _batched_onehot_agg(data, segment_ids, batch_shape, mask,
                                   mean=False)
    if mask is not None:
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)),
                         data, 0)
    if indices_are_sorted:
        return sorted_segment_sum(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int, indices_are_sorted: bool = False,
                 mask: Optional[jnp.ndarray] = None,
                 batch_shape=None) -> jnp.ndarray:
    """Masked segment mean with PyG ``aggr="mean"`` semantics: divide by the
    in-degree; empty segments yield 0, not NaN (SURVEY.md §7.3)."""
    if batch_shape is not None and _on_tpu() and _fits_onehot(batch_shape):
        return _batched_onehot_agg(data, segment_ids, batch_shape, mask,
                                   mean=True)
    total = segment_sum(data, segment_ids, num_segments,
                        indices_are_sorted, mask)
    count = segment_counts(segment_ids, num_segments, mask,
                           indices_are_sorted)
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
    ei = np.asarray(edge_index)
    order = np.lexsort((ei[0], ei[1]))
    out = [ei[:, order]]
    for p in edge_payloads:
        out.append(np.asarray(p)[order])
    return out[0] if not edge_payloads else tuple(out)
