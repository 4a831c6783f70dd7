"""NBA trajectory prediction model, Cl(2,0).

TPU-native redesign of the reference ``NBACliffordSharedSimplicialMPNN``
(csmpn/models/nba_cssmpnn.py:12-194): 10-frame 2-D pos/vel embedding with
the NBA-specific per-dim embedding stack (nba_cssmpnn.py:28-61),
featurization, 4x EGCL sum aggregation, 40-frame trajectory readout for 5
players (dropping the appended reference point), ADE as training loss.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..algebra.clifford import CliffordAlgebra, get_algebra
from ..data.batching import PaddingSpec, SimplicialBatch
from ..nn.egcl import EGCL
from ..nn.modules import CEMLP, MVLinear
from .common import (
    SimplexEmbedding,
    SimplexTypeConditioning,
    flatten_graph,
)

OBS_FRAMES = 10
N_NODES = 6  # 5 players + reference point


class NBAModel(nn.Module):
    metric_names = ("loss", "ade_loss", "fde_loss")

    spec: PaddingSpec
    max_dim: int = 2
    num_input: int = 20             # 10 frames x (pos + vel)
    num_hidden: int = 40
    num_out: int = 40
    num_layers: int = 4
    condition: bool = True

    @property
    def algebra(self) -> CliffordAlgebra:
        return get_algebra((1.0, 1.0))

    def _embed_net(self, d: int, in_feats: int, out_ch: int):
        """The NBA-specific per-dim embedding stack
        (nba_cssmpnn.py:28-61)."""
        alg = self.algebra
        if d == 0:
            return MVLinear(alg, self.num_input, self.num_input,
                            subspaces=False, name="embed_0")
        if d == 1:
            return CEMLP(alg, 2 * self.num_input, self.num_hidden,
                         self.num_input, n_layers=1,
                         normalization_init=0.0, name="embed_1")

        class _Stack(nn.Module):
            algebra: CliffordAlgebra
            num_input: int
            num_hidden: int

            @nn.compact
            def __call__(self, x):
                x = CEMLP(self.algebra, 3 * self.num_input,
                          self.num_hidden, self.num_hidden, n_layers=1,
                          normalization_init=0.0, name="a")(x)
                return CEMLP(self.algebra, self.num_hidden,
                             self.num_hidden, self.num_input, n_layers=1,
                             normalization_init=0.0, name="b")(x)

        return _Stack(alg, self.num_input, self.num_hidden, name="embed_2")

    @nn.compact
    def __call__(self, batch: SimplicialBatch, step: int = 0,
                 mode: str = "train"):
        alg = self.algebra
        num_types = self.max_dim + 1 if self.condition else 0
        B, N = batch.node_types.shape
        num_frames = OBS_FRAMES

        x = SimplexEmbedding(
            alg, self.spec, (("pos", 1), ("vel", 1)),
            num_input=self.num_input, num_hidden=self.num_hidden,
            max_dim=self.max_dim, out_channels=self.num_input,
            net_builder=self._embed_net, name="cl_feature_embedding",
        )(batch, {"pos": batch.features["pos"],
                  "vel": batch.features["vel"]})
        x = x * batch.node_mask[..., None, None]
        x = x.reshape(B * N, self.num_input, alg.n_blades)

        ei_flat, edge_mask, src_sort = flatten_graph(batch)
        node_attr, edge_attr = SimplexTypeConditioning(
            alg, num_types, mode="embed", name="sim_type_embedding",
        )(batch.node_types.reshape(-1), ei_flat, src_sort=src_sort)

        x = MVLinear(alg, self.num_input + num_types, self.num_hidden,
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

        out = x.reshape(B, N, self.num_hidden, alg.n_blades)[:, :N_NODES]
        proj = MVLinear(alg, self.num_hidden, self.num_out,
                        name="projection")(out)        # (B, 6, 40, 4)
        pred = proj[..., 1:3]                          # (B, 6, 40, 2)
        # drop the appended reference point (nba_cssmpnn.py:180-183)
        loc_pred = pred.reshape(B, N_NODES, num_frames * 4, 2)[:, :-1]
        loc_pred = loc_pred.reshape(B, N_NODES - 1, self.num_out, 2)

        targets = batch.targets["y"]                   # (B, 5, 40, 2)
        err2 = jnp.sum((loc_pred - targets) ** 2, axis=-1)  # (B, 5, 40)
        # reference reshape groups (players*frames)/num_frames
        # (nba_cssmpnn.py:186): ADE averages over frames then the rest
        ade = jnp.sqrt(err2).reshape(B, -1, num_frames).mean(
            axis=-1).mean(axis=-1)
        # FDE: last predicted frame per player, mean over players
        # (nba_cssmpnn.py:187)
        fde = jnp.sqrt(err2[:, :, -1]).mean(axis=-1)
        loss = ade
        return loss.mean(), {"loss": loss, "ade_loss": ade,
                             "fde_loss": fde}
