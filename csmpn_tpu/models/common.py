"""Shared model machinery for the CSMPN task models.

The four reference task models are near-clones of one skeleton
(SURVEY.md §1.3).  This module hosts the shared pieces, redesigned for the
static-section batch layout:

  * permutation-summed Clifford embedding of simplices
    (reference embed_simplicial_complex, e.g. hulls_cssmpnn.py:96-125) —
    the ragged (d+1)! expansion becomes a static unrolled gather per
    dimension section (at most 6 permutations for d <= 2, SURVEY.md §7.3);
  * simplex-type conditioning (one-hot or learned embedding) and the
    derived edge attributes (e.g. hulls_cssmpnn.py:127-140);
  * masked global pooling and mean-centering.
"""
from __future__ import annotations

import itertools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.clifford import CliffordAlgebra
from ..data.batching import PaddingSpec, SimplicialBatch
from ..nn.modules import CEMLP, MVLinear
from ..ops.segment import (
    batched_take,
    masked_mean,
    take_rows_presorted,
    take_rows_sorted_idx,
)


def section_slices(spec: PaddingSpec) -> List[slice]:
    off = spec.offsets
    return [slice(int(off[d]), int(off[d + 1]))
            for d in range(len(spec.counts_max))]


def gather_vertex_features(feat: jnp.ndarray, x_ind: jnp.ndarray,
                           d: int) -> jnp.ndarray:
    """feat: (B, N, ...) node-level; x_ind: (B, N_d, >=d+1) vertex ids.
    Returns (B, N_d, d+1, ...)."""
    idx = x_ind[:, :, : d + 1]
    return batched_take(feat, idx)


def permutation_expand(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(B, S, d+1, ...) -> (B, S, P, d+1, ...) over all (d+1)! vertex orders
    (reference: itertools.permutations at hulls_cssmpnn.py:114-116)."""
    perms = np.asarray(list(itertools.permutations(range(d + 1))),
                       dtype=np.int32)
    return x[:, :, perms]


class SimplexEmbedding(nn.Module):
    """Per-dimension Clifford feature embedding with permutation symmetry.

    For each simplex dimension d, every vertex-order permutation of the
    simplex's per-vertex features is embedded (grade 1 for geometric
    features, grade 0 for scalars), pushed through a per-dim network
    (MVLinear for d=0, CEMLP(n_layers=d) for d>=1 — reference
    cl_feature_embedding, hulls_cssmpnn.py:34-52), and summed over
    permutations.

    feature_spec: list of (name, grade) — features are taken from
    ``batch.features[name]`` with shape (B, N, F, dim) or (B, N, dim)
    (geometric) / (..., 1) (scalar).
    """

    algebra: CliffordAlgebra
    spec: PaddingSpec
    feature_spec: Sequence[Tuple[str, int]]
    num_input: int            # per-vertex channel count over all features
    num_hidden: int
    max_dim: int = 2
    out_channels: Optional[int] = None  # per-dim output channels; default hidden
    net_builder: Optional[Callable] = None  # (d, in_feats, out_ch) -> Module

    @nn.compact
    def __call__(self, batch: SimplicialBatch,
                 features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        alg = self.algebra
        out_ch = self.out_channels or self.num_hidden
        secs = section_slices(self.spec)
        outs = []
        for d in range(self.max_dim + 1):
            sl = secs[d]
            if sl.start == sl.stop:
                continue
            x_ind_d = batch.x_ind[:, sl]
            chans = []
            for name, grade in self.feature_spec:
                f = features[name]
                if f.ndim == 3:           # (B, N, dim) -> (B, N, 1, dim)
                    f = f[:, :, None, :]
                g = gather_vertex_features(f, x_ind_d, d)  # (B,S,d+1,F,dim)
                g = permutation_expand(g, d)               # (B,S,P,d+1,F,dim)
                B, S, P = g.shape[:3]
                g = g.reshape(B, S, P, (d + 1) * g.shape[4], g.shape[5])
                chans.append(alg.embed_grade(g, grade))
            feats = jnp.concatenate(chans, axis=-2)  # (B,S,P,(d+1)*num_input,nb)
            if self.net_builder is not None:
                net = self.net_builder(d, (d + 1) * self.num_input, out_ch)
            elif d == 0:
                net = MVLinear(alg, self.num_input, out_ch,
                               subspaces=False, name="embed_0")
            else:
                net = CEMLP(alg, (d + 1) * self.num_input, self.num_hidden,
                            out_ch, n_layers=d, normalization_init=0.0,
                            name=f"embed_{d}")
            emb = net(feats).sum(axis=2)             # sum over permutations
            outs.append(emb)
        return jnp.concatenate(outs, axis=1)          # (B, N, out_ch, nb)


class SimplexTypeConditioning(nn.Module):
    """Node/edge conditioning on the simplex dimension.

    mode="onehot": F.one_hot (hulls, hulls_cssmpnn.py:127-131);
    mode="embed": learned nn.Embedding (motion/md17/nba, e.g.
    motion_cssmpnn.py:55-58).  Embedded at grade 0.
    Returns (node_attr_flat, edge_attr_flat) for the flattened big graph.
    """

    algebra: CliffordAlgebra
    num_types: int
    mode: str = "onehot"

    @nn.compact
    def __call__(self, node_types_flat: jnp.ndarray,
                 edge_index_flat: jnp.ndarray, src_sort=None):
        alg = self.algebra
        if self.num_types == 0:          # condition=False
            return None, None
        if self.mode == "onehot":
            attr = jax.nn.one_hot(node_types_flat, self.num_types)
        else:
            table = self.param(
                "embedding", nn.initializers.normal(stddev=1.0),
                (self.num_types, self.num_types))
            attr = jnp.take(table, node_types_flat, axis=0)
        node_attr = alg.embed_grade(attr[..., None], 0)  # (BN, T, nb)
        src, dst = edge_index_flat[0], edge_index_flat[1]
        gathered_src = (take_rows_presorted(node_attr, src, *src_sort)
                        if src_sort is not None
                        else jnp.take(node_attr, src, axis=0))
        edge_attr = jnp.concatenate(
            [gathered_src, take_rows_sorted_idx(node_attr, dst)], axis=1)
        return node_attr, edge_attr


def flatten_graph(batch: SimplicialBatch):
    """Flatten (B, N) node space and (B, E) edges to global ids.

    Per-sample offsets are static (b * N); per-sample target-sorted edge
    order is preserved globally, so downstream segment reductions keep
    ``indices_are_sorted=True``.
    """
    B, N = batch.node_types.shape
    E = batch.edge_index.shape[1]
    offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    ei = batch.edge_index + offs                     # (B, E, 2)
    ei_flat = ei.reshape(B * E, 2).T                 # (2, B*E)
    edge_mask = batch.edge_mask.reshape(B * E)
    # global source-sort from the per-sample precomputed orders: per-sample
    # sorted blocks are globally sorted because global src = b*N + local
    order = batch.edge_src_order + (
        jnp.arange(B, dtype=jnp.int32) * E)[:, None]
    src_sorted = jnp.take_along_axis(
        batch.edge_index[..., 0], batch.edge_src_order, axis=1) + (
        jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    src_sort = (order.reshape(B * E), src_sorted.reshape(B * E))
    return ei_flat, edge_mask, src_sort


def center_vertex_positions(pos: jnp.ndarray, vertex_mask: jnp.ndarray):
    """Subtract the per-graph mean vertex position (reference
    hulls_cssmpnn.py:145-148).  pos: (B, N, ..., D); mask: (B, N).
    Returns (centered_pos_for_vertices, mean)."""
    mean = masked_mean(pos, vertex_mask, axis=1)      # (B, ..., D)
    centered = pos - mean[:, None]
    m = vertex_mask.reshape(vertex_mask.shape + (1,) * (pos.ndim - 2))
    return jnp.where(m, centered, pos), mean


def global_mean_pool_masked(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N, ...) masked mean over nodes (reference global_mean_pool over
    all simplices, hulls_cssmpnn.py:158)."""
    return masked_mean(x, mask, axis=1)
