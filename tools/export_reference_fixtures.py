"""Export per-layer activation fixtures from the REFERENCE PyTorch
implementation for allclose parity testing (BASELINE.md north star).

Run with the reference repo on PYTHONPATH (torch is enough — a minimal
stand-in for ``torch_geometric.nn.MessagePassing`` is installed
automatically when PyG itself is absent, which unlocks every layer
including EGCL in this container):

    PYTHONPATH=/root/reference python tools/export_reference_fixtures.py \
        --out tests/fixtures

It records, for fixed seeds and inputs:
  * the Cl(2)/Cl(3)/Cl(5) Cayley tensors;
  * per-layer outputs of MVLinear / MVSiLU / NormalizationLayer /
    MVLayerNorm / SteerableGeometricProductLayer (Cl(3));
  * CEMLP (2 blocks) outputs for Cl(3) and Cl(5), with full state dicts;
  * EGCL forwards (aggr mean and sum, with edge/node attributes) on a
    small fixed graph that includes an isolated node (empty-segment
    semantics).

tests/test_reference_parity.py consumes the .npz files when present and
skips otherwise, so the suite stays green in environments where the
reference stack cannot be loaded.
"""
from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np


def install_pyg_stub():
    """Provide torch_geometric.nn.MessagePassing when PyG is absent.

    Implements exactly the subset EGCL uses (reference
    cegnn_utils.py:216-284): keyword propagate with flow
    source_to_target (h_i = h[edge_index[1]], h_j = h[edge_index[0]]),
    scatter mean/sum aggregation by target with empty segments -> 0,
    then ``update(aggregated, h, node_attr)``.
    """
    try:
        import torch_geometric.nn  # noqa: F401
        return
    except ImportError:
        pass

    import torch

    class MessagePassing(torch.nn.Module):
        def __init__(self, aggr="mean"):
            super().__init__()
            self.aggr = aggr

        def propagate(self, edge_index, h, edge_attr=None, node_attr=None):
            src, dst = edge_index[0], edge_index[1]
            msg = self.message(h_i=h[dst], h_j=h[src], edge_attr=edge_attr)
            n = h.shape[0]
            agg = msg.new_zeros(n, msg.shape[1])
            agg.index_add_(0, dst, msg)
            if self.aggr == "mean":
                cnt = msg.new_zeros(n)
                cnt.index_add_(0, dst, torch.ones_like(dst, dtype=msg.dtype))
                agg = agg / cnt.clamp(min=1).unsqueeze(-1)
            return self.update(agg, h=h, node_attr=node_attr)

    def global_mean_pool(x, batch, size=None):
        n = int(batch.max().item()) + 1 if size is None else size
        out = x.new_zeros((n,) + x.shape[1:])
        out.index_add_(0, batch, x)
        cnt = x.new_zeros(n)
        cnt.index_add_(0, batch, torch.ones_like(batch, dtype=x.dtype))
        return out / cnt.clamp(min=1).reshape((n,) + (1,) * (x.dim() - 1))

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_nn.global_mean_pool = global_mean_pool
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn


def state_dict_arrays(module, prefix="sd."):
    # drop the CliffordAlgebra buffers (cayley/metric/...): they are
    # re-registered by every submodule holding the shared algebra instance
    # and balloon the fixtures; the parity tests rebuild them from the
    # metric signature (and the Cayley tables have their own fixtures).
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()
            if "algebra." not in k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    install_pyg_stub()
    import torch

    from csmpn.algebra.cliffordalgebra import CliffordAlgebra
    from csmpn.models.cegnn_utils import (
        CEMLP,
        EGCL,
        MVLayerNorm,
        MVLinear,
        MVSiLU,
        NormalizationLayer,
        SteerableGeometricProductLayer,
    )

    torch.manual_seed(0)
    for metric, tag in [((1.0, 1.0), "cl2"), ((1.0, 1.0, 1.0), "cl3"),
                        ((1.0,) * 5, "cl5")]:
        alg = CliffordAlgebra(metric)
        np.savez(os.path.join(args.out, f"cayley_{tag}.npz"),
                 cayley=alg.cayley.numpy())

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(5, 4, 8).astype(np.float32))

    fixtures = {}
    lin = MVLinear(alg, 4, 6)
    fixtures["mvlinear"] = dict(
        x=x.numpy(), weight=lin.weight.detach().numpy(),
        bias=lin.bias.detach().numpy(), out=lin(x).detach().numpy())

    silu = MVSiLU(alg, 4)
    with torch.no_grad():
        silu.a.copy_(torch.tensor(rng.randn(1, 4, 4).astype(np.float32)))
        silu.b.copy_(torch.tensor(rng.randn(1, 4, 4).astype(np.float32)))
    fixtures["mvsilu"] = dict(
        x=x.numpy(), a=silu.a.detach().numpy(), b=silu.b.detach().numpy(),
        out=silu(x).detach().numpy())

    norm = NormalizationLayer(alg, 4)
    with torch.no_grad():
        norm.a.copy_(torch.tensor(rng.randn(4, 4).astype(np.float32)))
    fixtures["normalization"] = dict(
        x=x.numpy(), a=norm.a.detach().numpy(),
        out=norm(x).detach().numpy())

    ln = MVLayerNorm(alg, 4)
    fixtures["mvlayernorm"] = dict(
        x=x.numpy(), a=ln.a.detach().numpy(), out=ln(x).detach().numpy())

    sgp = SteerableGeometricProductLayer(alg, 4)
    fixtures["sgp"] = dict(
        x=x.numpy(),
        weight=sgp.weight.detach().numpy(),
        linear_right=sgp.linear_right.weight.detach().numpy(),
        linear_left=sgp.linear_left.weight.detach().numpy(),
        linear_left_bias=sgp.linear_left.bias.detach().numpy(),
        norm_a=sgp.normalization.a.detach().numpy(),
        out=sgp(x).detach().numpy())

    # CEMLP: the composed MVLinear -> MVSiLU -> SGP -> MVLayerNorm stack,
    # two blocks (reference cegnn_utils.py:160-213), for Cl(3) and Cl(5).
    mlp = CEMLP(alg, 4, 8, 6, n_layers=2)
    fixtures["cemlp"] = dict(
        x=x.numpy(), out=mlp(x).detach().numpy(),
        **state_dict_arrays(mlp))

    alg5 = CliffordAlgebra((1.0,) * 5)
    x5 = torch.tensor(rng.randn(5, 3, 32).astype(np.float32))
    mlp5 = CEMLP(alg5, 3, 4, 3, n_layers=2)
    fixtures["cemlp_cl5"] = dict(
        x=x5.numpy(), out=mlp5(x5).detach().numpy(),
        **state_dict_arrays(mlp5))

    # EGCL on a small fixed graph.  Node 6 has no incoming edge (tests
    # mean-aggregation's empty-segment -> 0 semantics); edges are sorted
    # by target to match the TPU hot path.
    n_nodes, c = 7, 4
    h = torch.tensor(rng.randn(n_nodes, c, 8).astype(np.float32))
    edges = np.array(
        [[1, 0], [2, 0], [0, 1], [3, 1], [4, 2], [6, 2], [2, 3], [5, 4],
         [0, 5], [1, 5]], dtype=np.int64)
    order = np.argsort(edges[:, 1], kind="stable")
    edge_index = torch.tensor(edges[order].T)  # (2, E) rows [src, dst]
    edge_attr = torch.tensor(
        rng.randn(edge_index.shape[1], 2, 8).astype(np.float32))
    node_attr = torch.tensor(rng.randn(n_nodes, 2, 8).astype(np.float32))
    for aggr in ("mean", "sum"):
        egcl = EGCL(alg, c, 8, c, edge_attr_features=2,
                    node_attr_features=2, aggr=aggr)
        out = egcl(h, edge_index, edge_attr=edge_attr, node_attr=node_attr)
        fixtures[f"egcl_{aggr}"] = dict(
            h=h.numpy(), edge_index=edge_index.numpy(),
            edge_attr=edge_attr.numpy(), node_attr=node_attr.numpy(),
            out=out.detach().numpy(), **state_dict_arrays(egcl))

    # Full hulls model forward (hulls_cssmpnn.py:12-164) on a 2-graph
    # batch.  Topology comes from OUR hull lift (deterministic Qhull
    # faces; the lift itself is parity-tested separately) and is handed
    # to the reference model through a PyG-collated-batch-shaped
    # namespace, so both sides see identical graphs.
    export_hulls_model(args.out, rng)

    for name, data in fixtures.items():
        np.savez(os.path.join(args.out, f"layer_{name}.npz"), **data)
    print(f"wrote {len(fixtures) + 4} fixtures to {args.out}")


def export_hulls_model(out_dir, rng):
    import torch
    from scipy.spatial import ConvexHull

    from csmpn.models.hulls_cssmpnn import HullsCliffordSharedSimplicialMPNN
    from csmpn_tpu.data.lifting import flatten_complex, hull_lift

    torch.manual_seed(1)
    points = rng.randn(2, 8, 5).astype(np.float32)
    volumes = np.asarray([ConvexHull(p).volume for p in points],
                         dtype=np.float32)
    bigs = [flatten_complex(hull_lift(p, 2)) for p in points]

    # collate into the reference's PyG batch layout (follow_batch on
    # node_types/x_ind; hulls.py:110): global node ids, per-node graph id,
    # cumulative node pointers
    inputs, x_ind, node_types, batch_vec, eis, ptr = [], [], [], [], [], [0]
    off = 0
    for gi, (big, p) in enumerate(zip(bigs, points)):
        n = big.num_nodes
        inp = np.zeros((n, 5), dtype=np.float32)
        inp[:8] = p                      # vertices come first per sample
        inputs.append(inp)
        x_ind.append(big.x_ind)          # values are sample-local vertex ids
        node_types.append(big.node_types)
        batch_vec.append(np.full(n, gi, dtype=np.int64))
        eis.append(big.edge_index + off)
        off += n
        ptr.append(off)

    batch = types.SimpleNamespace(
        input=torch.tensor(np.concatenate(inputs)),
        x_ind=torch.tensor(np.concatenate(x_ind)),
        node_types=torch.tensor(np.concatenate(node_types)),
        batch=torch.tensor(np.concatenate(batch_vec)),
        edge_index=torch.tensor(np.concatenate(eis, axis=1)),
        ptr=torch.tensor(np.asarray(ptr, dtype=np.int64)),
        x_ind_ptr=torch.tensor(np.asarray(ptr, dtype=np.int64)),
        x_ind_batch=torch.tensor(np.concatenate(batch_vec)),
        target=torch.tensor(volumes),
    )

    model = HullsCliffordSharedSimplicialMPNN(hidden_features=8)
    with torch.no_grad():
        backprop_loss, outputs = model(batch, 0, "test")
    np.savez(
        os.path.join(out_dir, "model_hulls.npz"),
        points=points, target=volumes,
        backprop_loss=backprop_loss.numpy(),
        loss=outputs["loss"].numpy(),
        **state_dict_arrays(model))


if __name__ == "__main__":
    main()
