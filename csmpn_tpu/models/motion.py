"""Human-motion prediction model, Cl(3,0).

TPU-native redesign of the reference
``MotionCliffordSharedSimplicialMPNN`` (csmpn/models/motion_cssmpnn.py:12-171):
pos+vel permutation-sum embedding, learned simplex-type embedding
conditioning, 4x EGCL mean aggregation, vector-blade readout on the
0-simplices as a residual displacement from the input positions, MSE.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..algebra.clifford import CliffordAlgebra, get_algebra
from ..data.batching import PaddingSpec, SimplicialBatch
from ..nn.egcl import EGCL
from ..nn.modules import MVLinear
from .common import (
    SimplexEmbedding,
    SimplexTypeConditioning,
    center_vertex_positions,
    flatten_graph,
)


class MotionModel(nn.Module):
    metric_names = ("loss",)

    spec: PaddingSpec
    max_dim: int = 2
    num_input: int = 2          # pos + vel per vertex
    num_hidden: int = 28
    num_out: int = 1
    num_layers: int = 4
    condition: bool = True
    n_vertices: int = 31

    @property
    def algebra(self) -> CliffordAlgebra:
        return get_algebra((1.0, 1.0, 1.0))

    @nn.compact
    def __call__(self, batch: SimplicialBatch, step: int = 0,
                 mode: str = "train"):
        alg = self.algebra
        num_types = self.max_dim + 1 if self.condition else 0
        B, N = batch.node_types.shape

        # original vertex positions (readout residual base,
        # motion_cssmpnn.py:142,161)
        node_pos = batch.features["pos"][:, : self.n_vertices]   # (B,31,3)

        vertex_mask = (batch.node_types == 0) & batch.node_mask
        pos, _ = center_vertex_positions(batch.features["pos"], vertex_mask)

        x = SimplexEmbedding(
            alg, self.spec, (("pos", 1), ("vel", 1)),
            num_input=self.num_input, num_hidden=self.num_hidden,
            max_dim=self.max_dim, name="cl_feature_embedding",
        )(batch, {"pos": pos, "vel": batch.features["vel"]})
        x = x * batch.node_mask[..., None, None]
        x = x.reshape(B * N, self.num_hidden, alg.n_blades)

        ei_flat, edge_mask, src_sort = flatten_graph(batch)
        node_attr, edge_attr = SimplexTypeConditioning(
            alg, num_types, mode="embed", name="sim_type_embedding",
        )(batch.node_types.reshape(-1), ei_flat, src_sort=src_sort)

        for i in range(self.num_layers):
            x = EGCL(
                alg, self.num_hidden, self.num_hidden, self.num_hidden,
                edge_attr_features=2 * num_types,
                node_attr_features=num_types,
                aggr="mean", normalization_init=0.0, name=f"egcl_{i}",
                bf16_out=(i + 1 < self.num_layers),
            )(x, ei_flat, edge_attr, node_attr, edge_mask=edge_mask,
               batch_shape=(B, N, batch.edge_index.shape[1]),
               src_sort=src_sort)

        out = x.reshape(B, N, self.num_hidden, alg.n_blades)
        out = out[:, : self.n_vertices]                  # 0-simplices
        proj = MVLinear(alg, self.num_hidden, self.num_out,
                        name="projection")(out)
        pred = proj[..., 0, 1:4]                         # vector blades
        pred = node_pos + pred                           # residual

        targets = batch.targets["y"]                     # (B, 31, 3)
        loss = jnp.mean((pred - targets) ** 2, axis=-1).reshape(-1)
        return loss.mean(), {"loss": loss}
