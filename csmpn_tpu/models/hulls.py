"""Convex-hulls volume regression model, Cl(5,0).

TPU-native redesign of the reference
``HullsCliffordSharedSimplicialMPNN`` (csmpn/models/hulls_cssmpnn.py:12-164):
same architecture (per-dim permutation-sum Clifford embedding, one-hot
simplex-type conditioning, 3x EGCL with mean aggregation, scalar-blade
projection, global mean pool over ALL simplices, MSE), operating on
statically padded SimplicialBatch arrays.
"""
from __future__ import annotations

import flax.linen as nn

from ..algebra.clifford import CliffordAlgebra, get_algebra
from ..data.batching import PaddingSpec, SimplicialBatch
from ..nn.egcl import EGCL
from ..nn.modules import MVLinear
from .common import (
    SimplexEmbedding,
    SimplexTypeConditioning,
    center_vertex_positions,
    flatten_graph,
    global_mean_pool_masked,
)


class HullsModel(nn.Module):
    metric_names = ("loss",)

    spec: PaddingSpec
    in_features: int = 1
    hidden_features: int = 28
    out_features: int = 1
    num_layers: int = 3
    normalization_init: float = 0.0
    residual: bool = True
    aggr: str = "mean"
    condition: bool = True
    max_dim: int = 2

    @property
    def algebra(self) -> CliffordAlgebra:
        return get_algebra((1.0,) * 5)

    @nn.compact
    def __call__(self, batch: SimplicialBatch, step: int = 0,
                 mode: str = "train"):
        alg = self.algebra
        num_types = self.max_dim + 1 if self.condition else 0
        B, N = batch.node_types.shape

        # mean-center vertex positions per graph (hulls_cssmpnn.py:145-148)
        vertex_mask = (batch.node_types == 0) & batch.node_mask
        pos, _ = center_vertex_positions(
            batch.features["input"], vertex_mask)

        x = SimplexEmbedding(
            alg, self.spec, (("input", 1),),
            num_input=self.in_features, num_hidden=self.hidden_features,
            max_dim=self.max_dim, name="cl_feature_embedding",
        )(batch, {"input": pos})
        x = x * batch.node_mask[..., None, None]
        x = x.reshape(B * N, self.hidden_features, alg.n_blades)

        ei_flat, edge_mask, src_sort = flatten_graph(batch)
        node_attr, edge_attr = SimplexTypeConditioning(
            alg, num_types, mode="onehot", name="sim_type",
        )(batch.node_types.reshape(-1), ei_flat, src_sort=src_sort)

        for i in range(self.num_layers):
            x = EGCL(
                alg, self.hidden_features, self.hidden_features,
                self.hidden_features,
                edge_attr_features=2 * num_types,
                node_attr_features=num_types,
                residual=self.residual,
                normalization_init=self.normalization_init,
                aggr=self.aggr, name=f"egcl_{i}",
                bf16_out=(i + 1 < self.num_layers),
            )(x, ei_flat, edge_attr, node_attr, edge_mask=edge_mask,
               batch_shape=(B, N, batch.edge_index.shape[1]),
               src_sort=src_sort)

        pred = MVLinear(alg, self.hidden_features, self.out_features,
                        name="projection")(x)
        pred = pred[:, :, 0].reshape(B, N, self.out_features)
        pred = global_mean_pool_masked(pred, batch.node_mask)  # (B, 1)

        target = batch.targets["target"]
        loss = (pred.squeeze(-1) - target) ** 2                # (B,)
        return loss.mean(), {"loss": loss}
