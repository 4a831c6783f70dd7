"""Per-layer allclose parity vs recorded reference activations
(BASELINE.md north star; SURVEY.md §4 item 3).

Fixtures are produced by tools/export_reference_fixtures.py in an
environment with the reference PyTorch/PyG stack; tests skip when absent.
The Cayley-table fixtures double-check the blade-order/sign conventions
end to end.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from csmpn_tpu.algebra import CliffordAlgebra

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def fixture(name):
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not present (run "
                    f"tools/export_reference_fixtures.py in a reference "
                    f"environment)")
    return np.load(path)


@pytest.mark.parametrize("metric,tag", [
    ((1.0, 1.0), "cl2"), ((1.0, 1.0, 1.0), "cl3"), ((1.0,) * 5, "cl5")])
def test_cayley_tables_match(metric, tag):
    z = fixture(f"cayley_{tag}.npz")
    alg = CliffordAlgebra(metric)
    np.testing.assert_array_equal(alg.cayley, z["cayley"])


def test_mvlinear_parity():
    z = fixture("layer_mvlinear.npz")
    from csmpn_tpu.nn import MVLinear

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = MVLinear(alg, 4, 6)
    params = {"params": {
        "weight": jnp.asarray(z["weight"]),
        # reference bias shape (1, out, 1) -> ours (out, 1)
        "bias": jnp.asarray(z["bias"][0]),
    }}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=1e-5,
                               atol=1e-5)


def test_mvsilu_parity():
    z = fixture("layer_mvsilu.npz")
    from csmpn_tpu.nn import MVSiLU

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = MVSiLU(alg, 4)
    params = {"params": {"a": jnp.asarray(z["a"][0]),
                         "b": jnp.asarray(z["b"][0])}}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=1e-5,
                               atol=1e-5)


def test_normalization_parity():
    z = fixture("layer_normalization.npz")
    from csmpn_tpu.nn import NormalizationLayer

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = NormalizationLayer(alg, 4)
    params = {"params": {"a": jnp.asarray(z["a"])}}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=1e-5,
                               atol=1e-5)


def test_mvlayernorm_parity():
    z = fixture("layer_mvlayernorm.npz")
    from csmpn_tpu.nn import MVLayerNorm

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = MVLayerNorm(alg, 4)
    params = {"params": {"a": jnp.asarray(z["a"][0])}}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=1e-5,
                               atol=1e-5)


def test_sgp_parity():
    z = fixture("layer_sgp.npz")
    from csmpn_tpu.nn import SteerableGeometricProductLayer

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = SteerableGeometricProductLayer(alg, 4)
    params = {"params": {
        "weight": jnp.asarray(z["weight"]),
        "linear_right": {"weight": jnp.asarray(z["linear_right"])},
        "linear_left": {"weight": jnp.asarray(z["linear_left"]),
                        "bias": jnp.asarray(z["linear_left_bias"][0])},
        "normalization": {"a": jnp.asarray(z["norm_a"])},
    }}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=1e-4,
                               atol=1e-5)


def cemlp_params(z, prefix, n_layers=2):
    """Map a reference CEMLP state dict (keys ``{prefix}layers.{i}.{j}.*``,
    cegnn_utils.py:160-213) onto our flax CEMLP param tree."""
    p = {}
    for i in range(n_layers):
        b = f"{prefix}layers.{i}."
        p[f"linear_{i}"] = {"weight": jnp.asarray(z[b + "0.weight"]),
                            "bias": jnp.asarray(z[b + "0.bias"][0])}
        p[f"silu_{i}"] = {"a": jnp.asarray(z[b + "1.a"][0]),
                          "b": jnp.asarray(z[b + "1.b"][0])}
        p[f"gp_{i}"] = {
            "weight": jnp.asarray(z[b + "2.weight"]),
            "linear_right": {
                "weight": jnp.asarray(z[b + "2.linear_right.weight"])},
            "linear_left": {
                "weight": jnp.asarray(z[b + "2.linear_left.weight"]),
                "bias": jnp.asarray(z[b + "2.linear_left.bias"][0])},
            "normalization": {
                "a": jnp.asarray(z[b + "2.normalization.a"])},
        }
        p[f"norm_{i}"] = {"a": jnp.asarray(z[b + "3.a"][0])}
    return p


@pytest.mark.parametrize("tag,metric,feats", [
    ("cemlp", (1.0, 1.0, 1.0), (4, 8, 6)),
    ("cemlp_cl5", (1.0,) * 5, (3, 4, 3)),
])
def test_cemlp_parity(tag, metric, feats):
    z = fixture(f"layer_{tag}.npz")
    from csmpn_tpu.nn import CEMLP

    alg = CliffordAlgebra(metric)
    m = CEMLP(alg, *feats, n_layers=2)
    params = {"params": cemlp_params(z, "sd.")}
    out = m.apply(params, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=2e-4,
                               atol=1e-5)


def test_hulls_model_parity():
    """Full hulls model forward (embedding -> conditioning -> 3x EGCL ->
    projection -> global mean pool -> MSE) vs the reference
    HullsCliffordSharedSimplicialMPNN (hulls_cssmpnn.py:12-164) on a
    2-graph batch with identical hull-lift topology."""
    z = fixture("model_hulls.npz")
    from csmpn_tpu.data.batching import (collate, pad_big_graph,
                                         spec_from_graphs)
    from csmpn_tpu.data.lifting import flatten_complex, hull_lift
    from csmpn_tpu.models.hulls import HullsModel

    points = z["points"]
    bigs = [flatten_complex(hull_lift(p, 2)) for p in points]
    spec = spec_from_graphs(bigs)
    samples = [pad_big_graph(b, spec, {"input": p.astype(np.float32)})
               for b, p in zip(bigs, points)]
    tgts = [{"target": np.float32(t)} for t in z["target"]]
    batch = collate(samples, tgts)

    params = {
        "cl_feature_embedding": {
            "embed_0": {
                "weight": jnp.asarray(z["sd.cl_feature_embedding.0.weight"]),
                "bias": jnp.asarray(z["sd.cl_feature_embedding.0.bias"][0]),
            },
            "embed_1": cemlp_params(z, "sd.cl_feature_embedding.1.", 1),
            "embed_2": cemlp_params(z, "sd.cl_feature_embedding.2.", 2),
        },
        "projection": {
            "weight": jnp.asarray(z["sd.projection.0.weight"]),
            "bias": jnp.asarray(z["sd.projection.0.bias"][0]),
        },
    }
    for i in range(3):
        params[f"egcl_{i}"] = {
            "edge_model": cemlp_params(z, f"sd.layers.{i}.edge_model."),
            "node_model": cemlp_params(z, f"sd.layers.{i}.node_model."),
        }

    model = HullsModel(spec=spec, hidden_features=8)
    backprop_loss, outputs = model.apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(outputs["loss"]), z["loss"],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(backprop_loss),
                               float(z["backprop_loss"]), rtol=2e-4)


@pytest.mark.parametrize("aggr", ["mean", "sum"])
@pytest.mark.parametrize("edges_sorted", [True, False])
def test_egcl_parity(aggr, edges_sorted):
    """Full EGCL forward (gather -> edge CEMLP -> segment reduce -> node
    CEMLP + residual) vs the reference MessagePassing pipeline
    (cegnn_utils.py:216-284), incl. an isolated node (empty segment)."""
    z = fixture(f"layer_egcl_{aggr}.npz")
    from csmpn_tpu.nn import EGCL

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    m = EGCL(alg, 4, 8, 4, edge_attr_features=2, node_attr_features=2,
             aggr=aggr, edges_sorted=edges_sorted)
    params = {"params": {
        "edge_model": cemlp_params(z, "sd.edge_model."),
        "node_model": cemlp_params(z, "sd.node_model."),
    }}
    out = m.apply(params, jnp.asarray(z["h"]),
                  jnp.asarray(z["edge_index"], dtype=jnp.int32),
                  edge_attr=jnp.asarray(z["edge_attr"]),
                  node_attr=jnp.asarray(z["node_attr"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], rtol=2e-4,
                               atol=1e-5)
