"""EGCL — the Clifford-equivariant graph convolution layer.

TPU-native redesign of the reference's PyG ``MessagePassing`` subclass
(cegnn_utils.py:216-284): instead of framework-driven propagate/scatter, the
layer is an explicit gather -> edge-CEMLP -> sorted-segment-reduce ->
node-CEMLP pipeline over statically-shaped, padded big-graph arrays.

Semantics preserved from the reference:
  * message input is ``h_target - h_source`` (++ edge_attr) — PyG
    ``h_i - h_j`` with flow source_to_target (cegnn_utils.py:254-262);
  * aggregation "mean" divides by in-degree, empty segments give 0;
  * update input is ``concat(h, agg, node_attr)`` with a residual
    (cegnn_utils.py:264-275).

The layer is written setup-style with ``message``/``update`` as addressable
methods so the edge-partitioned multi-chip path (parallel/edge_partition.py)
can drive the same parameters inside shard_map with local edge/node slabs.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..algebra.clifford import CliffordAlgebra
from ..ops.segment import (
    segment_mean,
    segment_sum,
    take_rows,
    take_rows_presorted,
    take_rows_sorted_idx,
)
from .modules import CEMLP


class EGCL(nn.Module):
    algebra: CliffordAlgebra
    in_features: int
    hidden_features: int
    out_features: int
    edge_attr_features: int = 0
    node_attr_features: int = 0
    residual: bool = True
    normalization_init: Optional[float] = 0.0
    aggr: str = "mean"
    edges_sorted: bool = True
    # None = auto: fused whole-block CEMLP Pallas kernel on TPU for
    # small-blade algebras (ops/cemlp_kernel.py)
    fused_mlp: Optional[bool] = None
    # bf16 INTER-LAYER hand-off (NOTES backlog #6 leftover): in TPU fast
    # mode return the updated node features as bf16 so the next layer's
    # gathers/residual read bf16 N-rows instead of f32 (task models set
    # this on every layer but the last, keeping the readout f32).  Exact
    # mode ignores it.
    bf16_out: bool = False

    def setup(self):
        self.edge_model = CEMLP(
            self.algebra,
            self.in_features + self.edge_attr_features,
            self.hidden_features,
            self.out_features,
            normalization_init=self.normalization_init,
            fused=self.fused_mlp,
        )
        self.node_model = CEMLP(
            self.algebra,
            self.in_features + self.out_features + self.node_attr_features,
            self.hidden_features,
            self.out_features,
            normalization_init=self.normalization_init,
            fused=self.fused_mlp,
        )

    def _use_fused_mp(self, batch_shape) -> bool:
        """Fused gather->CEMLP->reduce kernel (ops/fused_egcl.py) on the
        flat big-graph path: TPU fast mode, small-blade algebras.  The
        stacked-small-graph path (batch_shape) keeps the batched one-hot
        aggregation; forcing ``fused_mlp=False`` also disables it."""
        if self.fused_mlp is False or not self.edges_sorted \
                or batch_shape is not None:
            return False
        from ..ops.fused_egcl import fused_mp_supported

        return fused_mp_supported(self.algebra, self.edge_model)

    def message(self, h_i: jnp.ndarray, h_j: jnp.ndarray,
                edge_attr: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Per-edge message: edge CEMLP on (h_target - h_source ++ attr)."""
        msg_in = h_i - h_j
        if edge_attr is not None:
            msg_in = jnp.concatenate([msg_in, edge_attr], axis=1)
        return self.edge_model(msg_in)

    def aggregate(self, msg: jnp.ndarray, dst: jnp.ndarray, num_nodes: int,
                  edge_mask: Optional[jnp.ndarray] = None,
                  indices_are_sorted: Optional[bool] = None,
                  batch_shape=None) -> jnp.ndarray:
        sorted_ = (self.edges_sorted if indices_are_sorted is None
                   else indices_are_sorted)
        reduce = segment_mean if self.aggr == "mean" else segment_sum
        return reduce(msg, dst, num_nodes, indices_are_sorted=sorted_,
                      mask=edge_mask, batch_shape=batch_shape)

    def message_aggregate(self, h: jnp.ndarray, h_j: jnp.ndarray,
                          edge_attr: Optional[jnp.ndarray],
                          dst: jnp.ndarray, num_nodes: int,
                          edge_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
        """Edge side of the layer — ``reduce_dst(message(h[dst] - h_j))``
        — with ``dst`` sorted ascending and ``h_j`` pre-gathered.  Takes
        the single-pass fused kernel when supported (TPU fast mode), the
        composed target-gather path otherwise.  This is the chunk body of
        the streaming (>=10M-simplex) path, which must NOT compose the
        exact GP at scale (VERDICT r3 weak #3)."""
        if self._use_fused_mp(None):
            from ..ops.fused_egcl import fused_message_aggregate

            return fused_message_aggregate(
                self.edge_model, h, h_j, edge_attr, dst,
                edge_mask=edge_mask, mean=(self.aggr == "mean"))
        h_i = take_rows_sorted_idx(h, dst)
        msg = self.message(h_i, h_j, edge_attr)
        return self.aggregate(msg, dst, num_nodes, edge_mask)

    def update(self, h: jnp.ndarray, agg: jnp.ndarray,
               node_attr: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        upd_in = [h, agg]
        if node_attr is not None:
            upd_in.append(node_attr)
        out = self.node_model(jnp.concatenate(upd_in, axis=1))
        if self.residual:
            out = h + out
        return out

    def __call__(
        self,
        h: jnp.ndarray,               # (N, C, n_blades)
        edge_index: jnp.ndarray,      # (2, E) int32 rows [source, target]
        edge_attr: Optional[jnp.ndarray] = None,   # (E, C_e, n_blades)
        node_attr: Optional[jnp.ndarray] = None,   # (N, C_n, n_blades)
        edge_mask: Optional[jnp.ndarray] = None,   # (E,) bool
        batch_shape=None,  # static (B, N, E) for stacked small graphs
        src_sort=None,     # precomputed (order, sorted_ids) for sources
    ) -> jnp.ndarray:
        num_nodes = h.shape[0]
        src, dst = edge_index[0], edge_index[1]
        if self._use_fused_mp(batch_shape):
            from ..ops.fused_egcl import fused_message_aggregate

            # bf16 activation storage in fast mode: the kernel rounds
            # every use of h/h_j/attr to bf16 anyway, so casting BEFORE
            # the source gather moves the same values while halving the
            # E-row HBM traffic of the gather and the kernel streams.
            # The update below still sees the f32 h for the residual.
            from ..ops.segment import aggregation_exact

            if aggregation_exact():     # forced-on dispatch (tests)
                h_s, ea_s = h, edge_attr
            else:
                h_s = h.astype(jnp.bfloat16)
                ea_s = (edge_attr.astype(jnp.bfloat16)
                        if edge_attr is not None else None)
            if src_sort is not None:
                h_j = take_rows_presorted(h_s, src, *src_sort)
            else:
                h_j = take_rows(h_s, src)
            agg = fused_message_aggregate(
                self.edge_model, h_s, h_j, ea_s, dst,
                edge_mask=edge_mask, mean=(self.aggr == "mean"))
            return self._finish(self.update(h, agg, node_attr))
        # bf16 activation storage on every non-fused TPU path in fast
        # mode — both the batched (stacked-small-graph) task path and the
        # flat big-graph fallback (batch_shape=None, e.g. edges_sorted=
        # False or algebras the fused kernel doesn't support): the
        # edge-row gathers, their scatter VJPs, and the message stream
        # into the aggregation all move bf16 rows (the fused CEMLP kernel
        # and the aggregation matmul round to bf16 internally anyway —
        # this just halves the HBM traffic of moving the same values).
        # The update below still sees the f32 h for the residual.
        from ..ops.segment import _on_tpu, aggregation_exact

        if aggregation_exact() or not _on_tpu():
            h_s, ea_s = h, edge_attr
        else:
            h_s = h.astype(jnp.bfloat16)
            ea_s = (edge_attr.astype(jnp.bfloat16)
                    if edge_attr is not None else None)
        if self.edges_sorted:
            h_i = take_rows_sorted_idx(h_s, dst)   # targets (sorted ids)
        else:
            h_i = take_rows(h_s, dst)
        if src_sort is not None:
            h_j = take_rows_presorted(h_s, src, *src_sort)
        else:
            h_j = take_rows(h_s, src)
        msg = self.message(h_i, h_j, ea_s)
        agg = self.aggregate(msg, dst, num_nodes, edge_mask,
                             batch_shape=batch_shape)
        agg = agg.astype(h.dtype)
        return self._finish(self.update(h, agg, node_attr))

    def _finish(self, out: jnp.ndarray) -> jnp.ndarray:
        """bf16 inter-layer hand-off (see ``bf16_out``)."""
        from ..ops.segment import _on_tpu, aggregation_exact

        if self.bf16_out and not aggregation_exact() and _on_tpu():
            return out.astype(jnp.bfloat16)
        return out
