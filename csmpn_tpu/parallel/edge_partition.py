"""Edge-partitioned simplicial message passing over a device mesh.

The beyond-reference scaling capability (SURVEY.md §7.1 step 6, BASELINE.md
north star): for complexes too large to replicate (>=10M simplices), the
incidence structure is partitioned by TARGET simplex — shard s owns the
contiguous node range [s*N/n, (s+1)*N/n) and ALL edges targeting it (edges
are already sorted by target, so shards are contiguous edge ranges).

Inside ``shard_map`` each step is:
  1. all_gather the node-feature slab over the mesh axis (ICI collective) —
     source gathers may touch any shard;
  2. local gather -> edge CEMLP -> sorted local segment reduce;
  3. local node CEMLP update on owned nodes only.

Compute (edge/node MLPs) is fully partitioned; only the feature all-gather
is replicated traffic.  A halo-exchange variant (exchanging only boundary
simplices via ppermute) is the planned refinement for higher efficiency at
large N.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..nn.egcl import EGCL


@dataclass(frozen=True)
class EdgePartition:
    """Per-shard edge slabs, stacked: arrays lead with the shard axis."""

    edge_index: np.ndarray   # (n_shards * e_shard, 2) [source, target-global]
    edge_mask: np.ndarray    # (n_shards * e_shard,)
    n_shards: int
    e_shard: int
    nodes_per_shard: int
    # slab slot -> ORIGINAL edge id (-1 for padding); lets per-edge payloads
    # (edge_attr) follow their edges into slab order (permute_edge_payload)
    edge_perm: Optional[np.ndarray] = None


def permute_edge_payload(part, payload: np.ndarray) -> np.ndarray:
    """Reorder a per-edge payload (e.g. edge_attr, original edge order)
    into the partition's padded slab layout; padded slots are zero."""
    payload = np.asarray(payload)
    perm = part.edge_perm
    out = np.zeros((perm.shape[0],) + payload.shape[1:], payload.dtype)
    valid = perm >= 0
    out[valid] = payload[perm[valid]]
    return out


def partition_edges(edge_index: np.ndarray, n_nodes: int,
                    n_shards: int) -> EdgePartition:
    """Partition a target-sorted (2, E) edge list into contiguous per-shard
    slabs padded to a common length."""
    assert n_nodes % n_shards == 0, "pad nodes to a multiple of n_shards"
    nps = n_nodes // n_shards
    ei = np.asarray(edge_index)
    order = np.lexsort((ei[0], ei[1]))
    ei = ei[:, order]
    # shard slabs are CONTIGUOUS ranges of the target-sorted edge list:
    # searchsorted boundaries instead of per-shard boolean masks (which
    # are O(n_shards * E) — ~20 min of host time at 64 x 80M edges)
    starts = np.searchsorted(ei[1], np.arange(n_shards + 1) * nps,
                             side="left")
    slabs = [ei[:, starts[s]:starts[s + 1]] for s in range(n_shards)]
    perms = [order[starts[s]:starts[s + 1]] for s in range(n_shards)]
    e_shard = max(s.shape[1] for s in slabs)
    # round up for alignment
    e_shard = int(-(-e_shard // 8) * 8)
    out = np.zeros((n_shards, e_shard, 2), dtype=np.int32)
    mask = np.zeros((n_shards, e_shard), dtype=bool)
    perm = np.full((n_shards, e_shard), -1, dtype=np.int64)
    for s, slab in enumerate(slabs):
        k = slab.shape[1]
        out[s, :k, 0] = slab[0]
        out[s, :k, 1] = slab[1]
        # padded edges self-target the shard's LAST node (masked out):
        # targets must stay sorted within the slab — the sorted segment
        # reduce windows ids with searchsorted, and a first-node pad after
        # the real edges breaks that for the tail segments
        out[s, k:, 1] = (s + 1) * nps - 1
        mask[s, :k] = True
        perm[s, :k] = perms[s]
    return EdgePartition(out.reshape(-1, 2), mask.reshape(-1), n_shards,
                         e_shard, nps, perm.reshape(-1))


def sharded_egcl_apply(
    egcl: EGCL,
    params,
    h: jnp.ndarray,                 # (N, C, nb) node features (global)
    part: EdgePartition,
    mesh: Mesh,
    axis: str = "data",
    node_attr: Optional[jnp.ndarray] = None,
    edge_attr: Optional[jnp.ndarray] = None,  # (n_shards*e_shard, Ce, nb)
    arrays=None,   # optional (edge_index, edge_mask) device args
):
    """One EGCL layer over the partitioned complex.  Returns updated (N, C,
    nb) node features, node-sharded over ``axis``.

    ``arrays``: pass the partition's (edge_index, edge_mask) as explicit
    jit ARGUMENTS when calling under an outer jax.jit — closed-over numpy
    arrays become jaxpr constants that XLA constant-folds with a
    serialized scatter loop and duplicates into the compiled module."""
    npshard = part.nodes_per_shard
    has_na = node_attr is not None
    has_ea = edge_attr is not None

    def shard_fn(h_local, edges_local, mask_local, *rest):
        it = iter(rest)
        na_local = next(it) if has_na else None
        ea_local = next(it) if has_ea else None
        # (1) feature slab exchange over ICI
        h_full = jax.lax.all_gather(h_local, axis, axis=0, tiled=True)
        src = edges_local[:, 0]
        dst = edges_local[:, 1]
        h_j = jnp.take(h_full, src, axis=0)
        h_i = jnp.take(h_full, dst, axis=0)
        # (2) local messages + sorted local segment reduce
        msg = egcl.apply(params, h_i, h_j, ea_local, method=EGCL.message)
        local_dst = dst - jax.lax.axis_index(axis) * npshard
        agg = egcl.apply(params, msg, local_dst, npshard, mask_local,
                         method=EGCL.aggregate)
        # (3) local node update
        return egcl.apply(params, h_local, agg, na_local,
                          method=EGCL.update)

    ei_arr, mask_arr = arrays if arrays is not None else (
        jnp.asarray(part.edge_index), jnp.asarray(part.edge_mask))
    args = [h, ei_arr, mask_arr]
    specs = [P(axis), P(axis), P(axis)]
    if has_na:
        args.append(node_attr)
        specs.append(P(axis))
    if has_ea:
        args.append(edge_attr)
        specs.append(P(axis))
    from jax import shard_map as _shard_map

    fn = _shard_map(shard_fn, mesh=mesh, in_specs=tuple(specs),
                    out_specs=P(axis))
    return fn(*args)


@dataclass(frozen=True)
class HaloPartition:
    """Edge partition with precomputed halo-exchange index structure.

    Shard s owns nodes [s*nps, (s+1)*nps).  For every ordered shard pair
    (o -> s), ``send_idx[o, s]`` lists the LOCAL node indices shard o must
    ship to shard s (padded with 0, masked by ``send_mask``).  After the
    all_to_all, shard s sees the received halo as a dense
    (n_shards, h_max, ...) buffer where row (o, p) is o's p-th sent node;
    slab source indices are pre-remapped into the concatenated
    [local nodes | halo] layout:
        local src v        -> v - s*nps
        remote src (o, p)  -> nps + o*h_max + p
    """

    edge_index: np.ndarray    # (n_shards * e_shard, 2) [src_remapped, dst]
    edge_mask: np.ndarray     # (n_shards * e_shard,)
    send_idx: np.ndarray      # (n_shards, n_shards, h_max) local ids
    send_mask: np.ndarray     # (n_shards, n_shards, h_max)
    n_shards: int
    e_shard: int
    h_max: int
    nodes_per_shard: int
    # slab slot -> ORIGINAL edge id (-1 padding); see permute_edge_payload
    edge_perm: Optional[np.ndarray] = None


def partition_edges_halo(edge_index: np.ndarray, n_nodes: int,
                         n_shards: int) -> HaloPartition:
    """Partition edges by target shard and precompute the boundary-feature
    exchange lists (the halo).  Communication volume becomes
    sum(|halo|) instead of n_shards * N (the all_gather fallback)."""
    assert n_nodes % n_shards == 0
    nps = n_nodes // n_shards
    ei = np.asarray(edge_index)
    order = np.lexsort((ei[0], ei[1]))
    ei = ei[:, order]
    # contiguous shard slabs via searchsorted (see partition_edges)
    starts = np.searchsorted(ei[1], np.arange(n_shards + 1) * nps,
                             side="left")
    slabs = [ei[:, starts[s]:starts[s + 1]] for s in range(n_shards)]
    perms = [order[starts[s]:starts[s + 1]] for s in range(n_shards)]
    e_shard = int(-(-max(s.shape[1] for s in slabs) // 8) * 8)

    # per (owner o -> consumer s): sorted unique remote node ids
    send_lists = [[[] for _ in range(n_shards)] for _ in range(n_shards)]
    remote_pos = [dict() for _ in range(n_shards)]  # per consumer s
    for s in range(n_shards):
        src = slabs[s][0]
        lo, hi = s * nps, (s + 1) * nps
        remotes = np.unique(src[(src < lo) | (src >= hi)])
        for v in remotes:
            o = int(v // nps)
            p = len(send_lists[o][s])
            send_lists[o][s].append(int(v - o * nps))
            remote_pos[s][int(v)] = (o, p)

    h_max = max((len(send_lists[o][s]) for o in range(n_shards)
                 for s in range(n_shards)), default=0)
    h_max = max(int(-(-h_max // 8) * 8), 8)
    send_idx = np.zeros((n_shards, n_shards, h_max), dtype=np.int32)
    send_mask = np.zeros((n_shards, n_shards, h_max), dtype=bool)
    for o in range(n_shards):
        for s in range(n_shards):
            lst = send_lists[o][s]
            send_idx[o, s, :len(lst)] = lst
            send_mask[o, s, :len(lst)] = True

    out = np.zeros((n_shards, e_shard, 2), dtype=np.int32)
    mask = np.zeros((n_shards, e_shard), dtype=bool)
    perm = np.full((n_shards, e_shard), -1, dtype=np.int64)
    for s, slab in enumerate(slabs):
        k = slab.shape[1]
        lo = s * nps
        src = slab[0]
        src_remap = np.where(
            (src >= lo) & (src < lo + nps), src - lo, 0).astype(np.int32)
        for i in np.nonzero((src < lo) | (src >= lo + nps))[0]:
            o, p = remote_pos[s][int(src[i])]
            src_remap[i] = nps + o * h_max + p
        out[s, :k, 0] = src_remap
        out[s, :k, 1] = slab[1] - lo          # local target ids
        out[s, k:, 1] = nps - 1               # padded: last local node
        mask[s, :k] = True
        perm[s, :k] = perms[s]
    return HaloPartition(out.reshape(-1, 2), mask.reshape(-1), send_idx,
                         send_mask, n_shards, e_shard, h_max, nps,
                         perm.reshape(-1))


def sharded_egcl_apply_halo(
    egcl: EGCL,
    params,
    h: jnp.ndarray,                 # (N, C, nb) node features (global)
    part: HaloPartition,
    mesh: Mesh,
    axis: str = "data",
    node_attr: Optional[jnp.ndarray] = None,  # (N, C_n, nb)
    edge_attr: Optional[jnp.ndarray] = None,  # (n_shards*e_shard, Ce, nb)
    arrays=None,   # optional (edge_index, edge_mask, send_idx, send_mask)
):
    """One EGCL layer with halo exchange: ship only the boundary-simplex
    features each shard actually reads (all_to_all over ICI), overlapping
    naturally with the local gather/MLP work XLA schedules around it.

    ``node_attr`` partitions like ``h`` (node rows); ``edge_attr`` must be
    in the partition's padded slab order — use ``permute_edge_payload``
    (attrs are NOT optional in the reference EGCL, cegnn_utils.py:254-275,
    so conditioned task models run edge-partitioned through here too).

    ``arrays``: see sharded_egcl_apply — pass the partition tables as jit
    arguments under an outer jax.jit."""
    nps = part.nodes_per_shard
    has_na = node_attr is not None
    has_ea = edge_attr is not None

    def shard_fn(h_local, edges_local, mask_local, send_idx_local,
                 send_mask_local, *rest):
        it = iter(rest)
        na_local = next(it) if has_na else None
        ea_local = next(it) if has_ea else None
        # (1) build this shard's send buffer: rows for every destination
        sidx = send_idx_local[0]                       # (n_shards, H)
        smask = send_mask_local[0]
        buf = jnp.take(h_local, sidx.reshape(-1), axis=0)
        buf = buf * smask.reshape(-1)[:, None, None].astype(h_local.dtype)
        buf = buf.reshape(part.n_shards, part.h_max, *h_local.shape[1:])
        # (2) boundary exchange: received[o] = what shard o sent to me
        halo = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        halo = halo.reshape(part.n_shards * part.h_max, *h_local.shape[1:])
        h_ext = jnp.concatenate([h_local, halo], axis=0)
        # (3) local messages + sorted local segment reduce + update
        src = edges_local[:, 0]
        dst = edges_local[:, 1]
        h_j = jnp.take(h_ext, src, axis=0)
        h_i = jnp.take(h_local, dst, axis=0)
        msg = egcl.apply(params, h_i, h_j, ea_local, method=EGCL.message)
        agg = egcl.apply(params, msg, dst, nps, mask_local,
                         method=EGCL.aggregate)
        return egcl.apply(params, h_local, agg, na_local,
                          method=EGCL.update)

    from jax import shard_map as _shard_map

    # send tables are per-shard: shard them so each device gets its own
    # row (wrapped with a leading length-1 axis per shard)
    if arrays is not None:
        ei_arr, mask_arr, send_idx, send_mask = arrays
    else:
        ei_arr = jnp.asarray(part.edge_index)
        mask_arr = jnp.asarray(part.edge_mask)
        send_idx = jnp.asarray(part.send_idx)
        send_mask = jnp.asarray(part.send_mask)
    args = [h, ei_arr, mask_arr, send_idx, send_mask]
    specs = [P(axis)] * 5
    if has_na:
        args.append(node_attr)
        specs.append(P(axis))
    if has_ea:
        args.append(edge_attr)
        specs.append(P(axis))
    fn = _shard_map(shard_fn, mesh=mesh, in_specs=tuple(specs),
                    out_specs=P(axis))
    return fn(*args)


def streaming_egcl_apply(
    egcl: EGCL,
    params,
    h: jnp.ndarray,                 # (N, C, nb) node features (global)
    part: EdgePartition,
    arrays=None,                    # optional (edge_index, edge_mask)
    remat: bool = True,
    node_attr: Optional[jnp.ndarray] = None,  # (N, C_n, nb)
    edge_attr: Optional[jnp.ndarray] = None,  # slab order (S*e_shard,...)
    chunk_reduce=None,              # optional out-chunk -> scalar
):
    """One EGCL layer over a complex whose EDGE MESSAGES exceed device
    memory, on a single device: ``lax.scan`` over the partition's
    contiguous node/edge slabs, so peak HBM is the node features plus ONE
    slab's messages instead of all E of them (>=10M-simplex workload:
    80M edges x 128 lanes of f32 messages is 41 GB — 10x a v5e's HBM; a
    64-chunk stream needs ~0.6 GB of transient).

    The chunk body dispatches through ``EGCL.message_aggregate`` — the
    single-pass fused kernel in TPU fast mode (messages never touch HBM
    at all), the composed path otherwise (VERDICT r3 weak #3: composing
    the exact GP at this scale materializes (E_chunk, C, nb, nb)-class
    intermediates and OOMs the 10M workload).

    Reuses the multi-device ``EdgePartition`` tables (shards = chunks).
    ``remat=True`` wraps the chunk body in ``jax.checkpoint`` so the
    backward pass also recomputes messages chunk-by-chunk instead of
    storing them all.

    ``chunk_reduce``: map each chunk's (nps, C_out, nb) output to a
    SCALAR accumulated over the scan (e.g. a loss term) — the full (N,
    C_out, nb) output array is then never materialized (it alone is
    9.5 GB of f32 at 10M x 256 lanes).  Applied INSIDE the remat'd body
    so the backward recomputes it per chunk too.  Returns the f32 scalar
    sum instead of the output array."""
    nps = part.nodes_per_shard
    S, E2 = part.n_shards, part.e_shard
    if arrays is not None:
        ei_arr, mask_arr = arrays
    else:
        ei_arr = jnp.asarray(part.edge_index)
        mask_arr = jnp.asarray(part.edge_mask)
    ei3 = ei_arr.reshape(S, E2, 2)
    mask2 = mask_arr.reshape(S, E2)
    has_ea = edge_attr is not None
    ea3 = (edge_attr.reshape(S, E2, *edge_attr.shape[1:])
           if has_ea else None)

    def chunk_fn(params, h, node_attr, edges, m, ea, s):
        src = edges[:, 0]
        dst = edges[:, 1]                      # global target ids
        h_j = jnp.take(h, src, axis=0)
        local_dst = dst - s * nps              # sorted within the slab
        h_own = jax.lax.dynamic_slice_in_dim(h, s * nps, nps, axis=0)
        agg = egcl.apply(params, h_own, h_j, ea, local_dst, nps, m,
                         method=EGCL.message_aggregate)
        na_own = (jax.lax.dynamic_slice_in_dim(node_attr, s * nps, nps,
                                               axis=0)
                  if node_attr is not None else None)
        out = egcl.apply(params, h_own, agg, na_own, method=EGCL.update)
        if chunk_reduce is not None:
            return chunk_reduce(out)
        return out

    if remat:
        chunk_fn = jax.checkpoint(chunk_fn, static_argnums=())

    def body(acc, xs):
        if has_ea:
            edges, m, ea, s = xs
        else:
            (edges, m, s), ea = xs, None
        res = chunk_fn(params, h, node_attr, edges, m, ea, s)
        if chunk_reduce is not None:
            return acc + res, None
        return acc, res

    xs = (ei3, mask2, ea3, jnp.arange(S)) if has_ea \
        else (ei3, mask2, jnp.arange(S))
    acc, outs = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
    if chunk_reduce is not None:
        return acc
    return outs.reshape(S * nps, *outs.shape[2:])


@dataclass(frozen=True)
class HaloStreamPartition:
    """Two-level partition for complexes that are BOTH too large to
    replicate and too large per shard for one dispatch: the node space is
    sharded over ``n_shards`` mesh devices (halo exchange at the device
    level, as in HaloPartition), and each device's contiguous edge slab is
    further split into ``n_chunks`` target-contiguous chunk slabs that the
    device ``lax.scan``s (streaming at the chunk level).  This is
    BASELINE.json configs[4] as written: the >=10M-simplex complex sharded
    over N>=2 devices, each streaming its shard.

    Layout: device s owns nodes [s*nps, (s+1)*nps); chunk c of device s
    owns local nodes [c*ncs, (c+1)*ncs).  ``edge_index`` rows are
    [src_remapped, dst_local]: sources in the per-device concatenated
    [local nodes | halo] layout (identical to HaloPartition — the halo is
    exchanged ONCE per layer, then every chunk gathers from it), targets
    local to the device and ascending within each chunk slab.
    """

    edge_index: np.ndarray    # (n_shards*n_chunks*e_chunk, 2)
    edge_mask: np.ndarray     # (n_shards*n_chunks*e_chunk,)
    send_idx: np.ndarray      # (n_shards, n_shards, h_max) local ids
    send_mask: np.ndarray     # (n_shards, n_shards, h_max)
    n_shards: int
    n_chunks: int
    e_chunk: int
    h_max: int
    nodes_per_shard: int
    nodes_per_chunk: int
    # slab slot -> ORIGINAL edge id (-1 padding); see permute_edge_payload
    edge_perm: Optional[np.ndarray] = None


def partition_edges_halo_stream(edge_index: np.ndarray, n_nodes: int,
                                n_shards: int,
                                n_chunks: int) -> HaloStreamPartition:
    """Build the two-level (device halo x chunk streaming) partition by
    re-chunking each device slab of ``partition_edges_halo`` along its
    (sorted) local-target axis."""
    halo = partition_edges_halo(edge_index, n_nodes, n_shards)
    nps = halo.nodes_per_shard
    assert nps % n_chunks == 0, "pad nodes so nps is a multiple of n_chunks"
    ncs = nps // n_chunks
    ei = halo.edge_index.reshape(n_shards, halo.e_shard, 2)
    mask = halo.edge_mask.reshape(n_shards, halo.e_shard)
    perm = halo.edge_perm.reshape(n_shards, halo.e_shard)

    slabs = []   # (s, c) -> (k, 2) valid rows
    perms = []
    for s in range(n_shards):
        valid = mask[s]
        rows = ei[s][valid]            # local dst ascending
        prm = perm[s][valid]
        starts = np.searchsorted(rows[:, 1], np.arange(n_chunks + 1) * ncs,
                                 side="left")
        slabs.append([rows[starts[c]:starts[c + 1]]
                      for c in range(n_chunks)])
        perms.append([prm[starts[c]:starts[c + 1]]
                      for c in range(n_chunks)])

    e_chunk = max(s.shape[0] for dev in slabs for s in dev)
    e_chunk = max(int(-(-e_chunk // 8) * 8), 8)
    out = np.zeros((n_shards, n_chunks, e_chunk, 2), dtype=np.int32)
    omask = np.zeros((n_shards, n_chunks, e_chunk), dtype=bool)
    operm = np.full((n_shards, n_chunks, e_chunk), -1, dtype=np.int64)
    for s in range(n_shards):
        for c in range(n_chunks):
            rows = slabs[s][c]
            k = rows.shape[0]
            out[s, c, :k] = rows
            # padded targets: the chunk's LAST local node keeps the slab's
            # target order ascending (the sorted segment reduce windows
            # ids with searchsorted)
            out[s, c, k:, 1] = (c + 1) * ncs - 1
            omask[s, c, :k] = True
            operm[s, c, :k] = perms[s][c]
    return HaloStreamPartition(
        out.reshape(-1, 2), omask.reshape(-1), halo.send_idx,
        halo.send_mask, n_shards, n_chunks, e_chunk, halo.h_max, nps, ncs,
        operm.reshape(-1))


def sharded_streaming_egcl_apply(
    egcl: EGCL,
    params,
    h: jnp.ndarray,                 # (N, C, nb) node features (global)
    part: HaloStreamPartition,
    mesh: Mesh,
    axis: str = "data",
    node_attr: Optional[jnp.ndarray] = None,  # (N, C_n, nb)
    edge_attr: Optional[jnp.ndarray] = None,  # slab order (S*nC*eC, ...)
    arrays=None,   # optional (edge_index, edge_mask, send_idx, send_mask)
    remat: bool = True,
    chunk_reduce=None,              # optional out-chunk -> scalar
):
    """One EGCL layer over a complex sharded over the mesh AND streamed
    per device: each device exchanges its halo ONCE (all_to_all over ICI),
    then ``lax.scan``s its contiguous chunk slabs, so per-device peak HBM
    is its node-feature shard plus ONE chunk's transients — the multi-chip
    composition of ``sharded_egcl_apply_halo`` and ``streaming_egcl_apply``
    (VERDICT r4 missing #2 / BASELINE.json configs[4]).

    The chunk body dispatches through ``EGCL.message_aggregate`` — the
    single-pass fused Pallas kernel in TPU fast mode — and is wrapped in
    ``jax.checkpoint`` when ``remat`` so the backward also recomputes
    chunk-by-chunk.

    ``chunk_reduce``: reduce each (ncs, C_out, nb) output chunk to a
    scalar accumulated over the scan and psum'd over the mesh — the full
    (N, C_out, nb) output is then never materialized.  Returns the
    replicated f32 scalar instead of the node-sharded output array."""
    nps, ncs = part.nodes_per_shard, part.nodes_per_chunk
    nC, eC = part.n_chunks, part.e_chunk
    has_na = node_attr is not None
    has_ea = edge_attr is not None

    def shard_fn(h_local, ei_local, mask_local, send_idx_local,
                 send_mask_local, *rest):
        it = iter(rest)
        na_local = next(it) if has_na else None
        ea_local = next(it) if has_ea else None
        # (1) halo exchange, ONCE per layer (identical to the non-streaming
        # halo path): every chunk then gathers sources from [local | halo]
        sidx = send_idx_local[0]                       # (n_shards, H)
        smask = send_mask_local[0]
        buf = jnp.take(h_local, sidx.reshape(-1), axis=0)
        buf = buf * smask.reshape(-1)[:, None, None].astype(h_local.dtype)
        buf = buf.reshape(part.n_shards, part.h_max, *h_local.shape[1:])
        halo = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        halo = halo.reshape(part.n_shards * part.h_max, *h_local.shape[1:])
        h_ext = jnp.concatenate([h_local, halo], axis=0)
        # (2) stream the device's chunk slabs
        ei3 = ei_local.reshape(nC, eC, 2)
        m2 = mask_local.reshape(nC, eC)
        ea3 = (ea_local.reshape(nC, eC, *ea_local.shape[1:])
               if has_ea else None)

        def chunk_fn(params, h_ext, h_local, na_local, edges, m, ea, c):
            src = edges[:, 0]
            dst = edges[:, 1]                  # device-local target ids
            h_j = jnp.take(h_ext, src, axis=0)
            local_dst = dst - c * ncs          # sorted within the slab
            h_own = jax.lax.dynamic_slice_in_dim(h_local, c * ncs, ncs,
                                                 axis=0)
            agg = egcl.apply(params, h_own, h_j, ea, local_dst, ncs, m,
                             method=EGCL.message_aggregate)
            na_own = (jax.lax.dynamic_slice_in_dim(na_local, c * ncs, ncs,
                                                   axis=0)
                      if na_local is not None else None)
            out = egcl.apply(params, h_own, agg, na_own,
                             method=EGCL.update)
            if chunk_reduce is not None:
                return chunk_reduce(out)
            return out

        if remat:
            chunk_fn = jax.checkpoint(chunk_fn, static_argnums=())

        def body(acc, xs):
            if has_ea:
                edges, m, ea, c = xs
            else:
                (edges, m, c), ea = xs, None
            res = chunk_fn(params, h_ext, h_local, na_local, edges, m,
                           ea, c)
            if chunk_reduce is not None:
                return acc + res, None
            return acc, res

        xs = (ei3, m2, ea3, jnp.arange(nC)) if has_ea \
            else (ei3, m2, jnp.arange(nC))
        # the carry becomes device-varying after the first chunk (it sums
        # shard-local data); mark the init accordingly for shard_map's
        # varying-manual-axes check
        acc0 = jax.lax.pcast(jnp.zeros((), jnp.float32), (axis,),
                             to="varying")
        acc, outs = jax.lax.scan(body, acc0, xs)
        if chunk_reduce is not None:
            return jax.lax.psum(acc, axis)
        return outs.reshape(nC * ncs, *outs.shape[2:])

    if arrays is not None:
        ei_arr, mask_arr, send_idx, send_mask = arrays
    else:
        ei_arr = jnp.asarray(part.edge_index)
        mask_arr = jnp.asarray(part.edge_mask)
        send_idx = jnp.asarray(part.send_idx)
        send_mask = jnp.asarray(part.send_mask)
    args = [h, ei_arr, mask_arr, send_idx, send_mask]
    specs = [P(axis)] * 5
    if has_na:
        args.append(node_attr)
        specs.append(P(axis))
    if has_ea:
        args.append(edge_attr)
        specs.append(P(axis))
    from jax import shard_map as _shard_map

    out_spec = P() if chunk_reduce is not None else P(axis)
    fn = _shard_map(shard_fn, mesh=mesh, in_specs=tuple(specs),
                    out_specs=out_spec)
    return fn(*args)


def sharded_streaming_egcl_apply_allgather(
    egcl: EGCL,
    params,
    h: jnp.ndarray,                 # (N, C, nb) node features (global)
    part: EdgePartition,            # built with n_shards = n_dev * n_chunks
    mesh: Mesh,
    n_devices: int,
    axis: str = "data",
    node_attr: Optional[jnp.ndarray] = None,
    edge_attr: Optional[jnp.ndarray] = None,  # slab order
    arrays=None,                    # optional (edge_index, edge_mask)
    remat: bool = True,
    chunk_reduce=None,
):
    """All-gather counterpart of ``sharded_streaming_egcl_apply`` (the
    baseline the halo exchange is measured against): each device
    all_gathers the FULL node-feature array once per layer, then scans its
    chunk slabs with GLOBAL source ids.  Reuses ``partition_edges`` with
    ``n_shards = n_devices * n_chunks`` — device d owns chunk slabs
    [d*n_chunks, (d+1)*n_chunks), the same node ownership as
    ``partition_edges_halo_stream``.  Communication is (n-1)*N feature
    rows per layer regardless of complex locality."""
    assert part.n_shards % n_devices == 0
    n_chunks = part.n_shards // n_devices
    ncs = part.nodes_per_shard            # nodes per CHUNK here
    eC = part.e_shard
    has_na = node_attr is not None
    has_ea = edge_attr is not None

    def shard_fn(h_local, ei_local, mask_local, *rest):
        it = iter(rest)
        na_local = next(it) if has_na else None
        ea_local = next(it) if has_ea else None
        h_full = jax.lax.all_gather(h_local, axis, axis=0, tiled=True)
        dev = jax.lax.axis_index(axis)
        ei3 = ei_local.reshape(n_chunks, eC, 2)
        m2 = mask_local.reshape(n_chunks, eC)
        ea3 = (ea_local.reshape(n_chunks, eC, *ea_local.shape[1:])
               if has_ea else None)

        def chunk_fn(params, h_full, h_local, na_local, edges, m, ea, c):
            src = edges[:, 0]                 # GLOBAL ids
            dst = edges[:, 1]                 # GLOBAL ids (sorted)
            h_j = jnp.take(h_full, src, axis=0)
            local_dst = dst - (dev * n_chunks + c) * ncs
            h_own = jax.lax.dynamic_slice_in_dim(h_local, c * ncs, ncs,
                                                 axis=0)
            agg = egcl.apply(params, h_own, h_j, ea, local_dst, ncs, m,
                             method=EGCL.message_aggregate)
            na_own = (jax.lax.dynamic_slice_in_dim(na_local, c * ncs, ncs,
                                                   axis=0)
                      if na_local is not None else None)
            out = egcl.apply(params, h_own, agg, na_own,
                             method=EGCL.update)
            if chunk_reduce is not None:
                return chunk_reduce(out)
            return out

        if remat:
            chunk_fn = jax.checkpoint(chunk_fn, static_argnums=())

        def body(acc, xs):
            if has_ea:
                edges, m, ea, c = xs
            else:
                (edges, m, c), ea = xs, None
            res = chunk_fn(params, h_full, h_local, na_local, edges, m,
                           ea, c)
            if chunk_reduce is not None:
                return acc + res, None
            return acc, res

        xs = (ei3, m2, ea3, jnp.arange(n_chunks)) if has_ea \
            else (ei3, m2, jnp.arange(n_chunks))
        acc0 = jax.lax.pcast(jnp.zeros((), jnp.float32), (axis,),
                             to="varying")
        acc, outs = jax.lax.scan(body, acc0, xs)
        if chunk_reduce is not None:
            return jax.lax.psum(acc, axis)
        return outs.reshape(n_chunks * ncs, *outs.shape[2:])

    if arrays is not None:
        ei_arr, mask_arr = arrays
    else:
        ei_arr = jnp.asarray(part.edge_index)
        mask_arr = jnp.asarray(part.edge_mask)
    args = [h, ei_arr, mask_arr]
    specs = [P(axis)] * 3
    if has_na:
        args.append(node_attr)
        specs.append(P(axis))
    if has_ea:
        args.append(edge_attr)
        specs.append(P(axis))
    from jax import shard_map as _shard_map

    out_spec = P() if chunk_reduce is not None else P(axis)
    fn = _shard_map(shard_fn, mesh=mesh, in_specs=tuple(specs),
                    out_specs=out_spec)
    return fn(*args)


def make_synthetic_complex(n_nodes: int, avg_degree: int,
                           seed: int = 0,
                           locality: Optional[int] = None) -> np.ndarray:
    """Target-sorted synthetic incidence list for scaling benchmarks
    (the >=10M-simplex workload generator).

    ``locality``: when set, each source lies within +-locality of its
    target (mod n_nodes) — the structure of real lifted complexes, where
    geometrically nearby simplices get nearby ids after sorting.  Boundary
    sets (and hence halo traffic) then scale with ``locality``, not with
    the full shard size.  None = fully random (worst case: every node is
    a boundary node of every shard)."""
    rng = np.random.RandomState(seed)
    n_edges = n_nodes * avg_degree
    dst = rng.randint(0, n_nodes, size=n_edges, dtype=np.int64)
    if locality is None:
        src = rng.randint(0, n_nodes, size=n_edges, dtype=np.int64)
    else:
        off = rng.randint(-locality, locality + 1, size=n_edges)
        src = (dst + off) % n_nodes
    # no self-loops: real lifted complexes connect DISTINCT simplices
    # (boundary/coboundary/0-0 augmentation all exclude i==i), and a
    # self-loop's message input is exactly 0 — the smooth-abs-sqrt kink
    # (clifford.py eps=1e-16) where f32 gradients are ill-conditioned
    # (~1e8 intermediate cotangents that cancel in exact arithmetic but
    # leave O(1) f32 residue, order-dependent across partitionings)
    src = np.where(src == dst, (src + 1) % n_nodes, src)
    order = np.lexsort((src, dst))
    return np.stack([src[order], dst[order]])
