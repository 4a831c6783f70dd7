"""MD17 atomic-motion prediction model, Cl(3,0).

TPU-native redesign of the reference ``CliffordSharedSimplicialMPNN_md17``
(csmpn/models/md17_cssmpnn.py:11-179): 10-frame pos/vel/charge embedding
(grade 1/1/0), featurization fusing node_attr, 5x EGCL sum aggregation,
CEMLP+MVLinear projection to a 10-frame displacement readout, with
loss/ADE/FDE metrics.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..algebra.clifford import CliffordAlgebra, get_algebra
from ..data.batching import PaddingSpec, SimplicialBatch
from ..nn.egcl import EGCL
from ..nn.modules import CEMLP, MVLinear
from ..ops.segment import masked_mean
from .common import (
    SimplexEmbedding,
    SimplexTypeConditioning,
    flatten_graph,
)

PAST_FRAMES = 10


class MD17Model(nn.Module):
    metric_names = ("loss", "ade_loss", "fde_loss")

    spec: PaddingSpec
    n_vertices: int                 # heavy-atom count of the molecule
    max_dim: int = 2
    num_input: int = 30             # 10 frames x (pos + vel + charges)
    num_hidden: int = 32
    num_out: int = 10
    num_layers: int = 5
    condition: bool = True

    @property
    def algebra(self) -> CliffordAlgebra:
        return get_algebra((1.0, 1.0, 1.0))

    @nn.compact
    def __call__(self, batch: SimplicialBatch, step: int = 0,
                 mode: str = "train"):
        alg = self.algebra
        num_types = self.max_dim + 1 if self.condition else 0
        B, N = batch.node_types.shape
        n0 = self.n_vertices

        loc = batch.features["loc"]                     # (B, N, 10, 3)
        loc_node = loc[:, :n0]                          # original positions

        # per-graph mean over vertices AND frames (md17_cssmpnn.py:140-153)
        vertex_mask = (batch.node_types == 0) & batch.node_mask
        mean_nf = masked_mean(loc, vertex_mask, axis=1)  # (B, 10, 3)
        mean = jnp.mean(mean_nf, axis=1, keepdims=True)  # (B, 1, 3)
        pos = loc - mean[:, None]                        # centered

        x = SimplexEmbedding(
            alg, self.spec, (("pos", 1), ("vel", 1), ("charges", 0)),
            num_input=self.num_input, num_hidden=self.num_hidden,
            max_dim=self.max_dim, name="cl_feature_embedding",
        )(batch, {"pos": pos, "vel": batch.features["vel"],
                  "charges": batch.features["charges"]})
        x = x * batch.node_mask[..., None, None]
        x = x.reshape(B * N, self.num_hidden, alg.n_blades)

        ei_flat, edge_mask, src_sort = flatten_graph(batch)
        node_attr, edge_attr = SimplexTypeConditioning(
            alg, num_types, mode="embed", name="sim_type_embedding",
        )(batch.node_types.reshape(-1), ei_flat, src_sort=src_sort)

        # featurization: concat node_attr, fuse (md17_cssmpnn.py:135-138)
        x = MVLinear(alg, self.num_hidden + num_types, self.num_hidden,
                     subspaces=False, name="feature_embedding")(
            jnp.concatenate([x, node_attr], axis=1))

        for i in range(self.num_layers):
            x = EGCL(
                alg, self.num_hidden, self.num_hidden, self.num_hidden,
                edge_attr_features=2 * num_types,
                node_attr_features=num_types,
                aggr="sum", normalization_init=0.0, name=f"egcl_{i}",
                bf16_out=(i + 1 < self.num_layers),
            )(x, ei_flat, edge_attr, node_attr, edge_mask=edge_mask,
               batch_shape=(B, N, batch.edge_index.shape[1]),
               src_sort=src_sort)

        out = x.reshape(B, N, self.num_hidden, alg.n_blades)[:, :n0]
        proj = CEMLP(alg, self.num_hidden, self.num_hidden,
                     self.num_hidden, n_layers=1, name="projection_mlp")(out)
        proj = MVLinear(alg, self.num_hidden, self.num_out,
                        name="projection")(proj)
        pred = proj[..., 1:4]                            # (B, n0, 10, 3)
        loc_pred = loc_node + pred

        targets = batch.targets["y"]                     # (B, n0, 10, 3)
        err2 = jnp.sum((loc_pred - targets) ** 2, axis=-1)  # (B, n0, 10)
        ade = jnp.sqrt(err2).mean(axis=-1).mean(axis=-1)    # (B,)
        fde = jnp.sqrt(err2[..., -1]).mean(axis=-1)         # (B,)
        loss = err2.reshape(B, -1).mean(axis=-1)            # (B,)
        return loss.mean(), {"loss": loss, "ade_loss": ade,
                             "fde_loss": fde}
