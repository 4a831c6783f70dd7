"""Layer tests: shapes, semantics, and O(n)-equivariance of every
equivariant module (SURVEY.md §4 items 2-3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmpn_tpu.algebra import CliffordAlgebra
from csmpn_tpu.nn import (
    CEMLP,
    EGCL,
    MVLayerNorm,
    MVLinear,
    MVSiLU,
    NormalizationLayer,
    SteerableGeometricProductLayer,
)

ALG3 = CliffordAlgebra((1.0, 1.0, 1.0))


def rand_mv(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       dtype=jnp.float32)


def rotor_action(alg, w, x):
    """Apply versor action blade-wise to (..., C, n_blades) activations."""
    return alg.rho(w, x)


@pytest.fixture(scope="module")
def rotor():
    return ALG3.versor(jax.random.PRNGKey(3))


def assert_equivariant(module, params, x, rotor, alg=ALG3, atol=1e-4,
                       **kwargs):
    out = module.apply(params, x, **kwargs)
    out_rot = alg.rho(rotor, out)
    x_rot = alg.rho(rotor, x)
    out_of_rot = module.apply(params, x_rot, **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_rot), np.asarray(out_of_rot), rtol=2e-3, atol=atol)


class TestMVLinear:
    def test_shape_and_bias(self):
        m = MVLinear(ALG3, 4, 6)
        x = rand_mv((5, 4, 8))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (5, 6, 8)
        # bias hits only the scalar blade: zero input -> bias on blade 0
        z = m.apply(params, jnp.zeros_like(x))
        assert np.allclose(np.asarray(z)[..., 1:], 0.0)

    def test_subspaces_weight_sharing(self):
        """Per-grade weights must act identically on blades of one grade."""
        m = MVLinear(ALG3, 2, 3, use_bias=False)
        x = rand_mv((1, 2, 8), seed=1)
        params = m.init(jax.random.PRNGKey(1), x)
        w = params["params"]["weight"]  # (3, 2, 4)
        y = m.apply(params, x)
        # manually compute for blade 2 (grade 1) and blade 3 (grade 1)
        manual = jnp.einsum("m,nm->n", x[0, :, 2], w[:, :, 1])
        np.testing.assert_allclose(np.asarray(y[0, :, 2]), np.asarray(manual),
                                   rtol=1e-5)

    def test_equivariance(self, rotor):
        m = MVLinear(ALG3, 3, 5)
        x = rand_mv((4, 3, 8), seed=2)
        params = m.init(jax.random.PRNGKey(2), x)
        assert_equivariant(m, params, x, rotor)

    def test_no_subspaces_plain_matmul(self):
        m = MVLinear(ALG3, 3, 2, subspaces=False, use_bias=False)
        x = rand_mv((4, 3, 8), seed=3)
        params = m.init(jax.random.PRNGKey(3), x)
        y = m.apply(params, x)
        w = params["params"]["weight"]
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(jnp.einsum("bmi,nm->bni", x, w)),
            rtol=1e-5)


class TestMVSiLU:
    def test_gate_bounded(self):
        m = MVSiLU(ALG3, 4)
        x = rand_mv((6, 4, 8), seed=4)
        params = m.init(jax.random.PRNGKey(4), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)

    def test_equivariance(self, rotor):
        m = MVSiLU(ALG3, 3)
        x = rand_mv((4, 3, 8), seed=5)
        params = m.init(jax.random.PRNGKey(5), x)
        assert_equivariant(m, params, x, rotor)


class TestNormalization:
    def test_interpolation_at_init(self):
        """init=0 -> sigmoid=0.5: divisor (norm+1)/2 + EPS."""
        m = NormalizationLayer(ALG3, 2, init_scale=0.0)
        x = rand_mv((3, 2, 8), seed=6)
        params = m.init(jax.random.PRNGKey(6), x)
        y = m.apply(params, x)
        norms = ALG3.norms_cat(x)
        divisor = 0.5 * (norms - 1) + 1
        expected = x / (divisor[..., ALG3.blade_to_grade] + 1e-6)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                                   rtol=1e-5)

    def test_equivariance(self, rotor):
        m = NormalizationLayer(ALG3, 3)
        x = rand_mv((4, 3, 8), seed=7)
        params = m.init(jax.random.PRNGKey(7), x)
        assert_equivariant(m, params, x, rotor)


class TestMVLayerNorm:
    def test_mean_norm_one(self):
        m = MVLayerNorm(ALG3, 5)
        x = rand_mv((4, 5, 8), seed=8)
        params = m.init(jax.random.PRNGKey(8), x)
        y = m.apply(params, x)
        # with a=1 init, channel-mean norm of output ~= 1
        mean_norm = jnp.mean(ALG3.norm(y), axis=-2)
        np.testing.assert_allclose(np.asarray(mean_norm), 1.0, rtol=1e-2)

    def test_equivariance(self, rotor):
        m = MVLayerNorm(ALG3, 3)
        x = rand_mv((4, 3, 8), seed=9)
        params = m.init(jax.random.PRNGKey(9), x)
        assert_equivariant(m, params, x, rotor)


class TestSGP:
    def test_shape(self):
        m = SteerableGeometricProductLayer(ALG3, 4)
        x = rand_mv((5, 4, 8), seed=10)
        params = m.init(jax.random.PRNGKey(10), x)
        assert m.apply(params, x).shape == (5, 4, 8)

    def test_weighted_gp_reduces_to_plain_gp(self):
        """With all path weights = 1 and no first-order/normalization branch,
        the layer computes the plain geometric product x * (W x)."""
        m = SteerableGeometricProductLayer(
            ALG3, 2, include_first_order=False, normalization_init=None)
        x = rand_mv((3, 2, 8), seed=11)
        params = m.init(jax.random.PRNGKey(11), x)
        p = params["params"]
        ones_w = jnp.ones_like(p["weight"])
        new = {"params": {**p, "weight": ones_w}}
        y = m.apply(new, x)
        wx = jnp.einsum("...mi,nmi->...ni", x,
                        p["linear_right"]["weight"][..., ALG3.blade_to_grade])
        expected = ALG3.geometric_product(x, wx)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_equivariance(self, rotor):
        m = SteerableGeometricProductLayer(ALG3, 3)
        x = rand_mv((4, 3, 8), seed=12)
        params = m.init(jax.random.PRNGKey(12), x)
        assert_equivariant(m, params, x, rotor)


class TestCEMLP:
    def test_shapes_and_layer_count(self):
        m = CEMLP(ALG3, 3, 7, 5, n_layers=2)
        x = rand_mv((4, 3, 8), seed=13)
        params = m.init(jax.random.PRNGKey(13), x)
        assert m.apply(params, x).shape == (4, 5, 8)
        names = set(params["params"].keys())
        assert {"linear_0", "silu_0", "gp_0", "norm_0",
                "linear_1", "silu_1", "gp_1", "norm_1"} <= names

    def test_equivariance(self, rotor):
        m = CEMLP(ALG3, 3, 4, 3, n_layers=2)
        x = rand_mv((4, 3, 8), seed=14)
        params = m.init(jax.random.PRNGKey(14), x)
        assert_equivariant(m, params, x, rotor, atol=5e-4)


class TestEGCL:
    def _toy_graph(self):
        # 4 nodes, edges sorted by target: (1->0),(2->0),(0->1),(3->2)
        h = rand_mv((4, 3, 8), seed=15)
        edge_index = jnp.asarray(
            [[1, 2, 0, 3], [0, 0, 1, 2]], dtype=jnp.int32)
        return h, edge_index

    def test_shapes_and_residual(self):
        h, ei = self._toy_graph()
        m = EGCL(ALG3, 3, 4, 3)
        params = m.init(jax.random.PRNGKey(15), h, ei)
        out = m.apply(params, h, ei)
        assert out.shape == h.shape

    def test_mean_aggregation_isolated_node(self):
        """Node 3 has no incoming edges: aggregated message must be 0, and
        the residual path keeps it finite."""
        h, ei = self._toy_graph()
        m = EGCL(ALG3, 3, 4, 3)
        params = m.init(jax.random.PRNGKey(16), h, ei)
        out = m.apply(params, h, ei)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_edge_mask_drops_messages(self):
        h, ei = self._toy_graph()
        m = EGCL(ALG3, 3, 4, 3, aggr="sum")
        params = m.init(jax.random.PRNGKey(17), h, ei)
        full = m.apply(params, h, ei,
                       edge_mask=jnp.asarray([True, True, True, True]))
        # masking edge (2->0) must equal removing it
        masked = m.apply(params, h, ei,
                         edge_mask=jnp.asarray([True, False, True, True]))
        ei_drop = jnp.asarray([[1, 0, 3], [0, 1, 2]], dtype=jnp.int32)
        dropped = m.apply(params, h, ei_drop)
        np.testing.assert_allclose(np.asarray(masked), np.asarray(dropped),
                                   rtol=1e-4, atol=1e-5)
        assert not np.allclose(np.asarray(full), np.asarray(masked))

    def test_equivariance(self, rotor):
        h, ei = self._toy_graph()
        m = EGCL(ALG3, 3, 4, 3)
        params = m.init(jax.random.PRNGKey(18), h, ei)
        out = m.apply(params, h, ei)
        out_rot = ALG3.rho(rotor, out)
        h_rot = ALG3.rho(rotor, h)
        out_of_rot = m.apply(params, h_rot, ei)
        np.testing.assert_allclose(np.asarray(out_rot),
                                   np.asarray(out_of_rot),
                                   rtol=2e-3, atol=1e-4)

    def test_sum_vs_mean(self):
        h, ei = self._toy_graph()
        m_sum = EGCL(ALG3, 3, 4, 3, aggr="sum")
        m_mean = EGCL(ALG3, 3, 4, 3, aggr="mean")
        params = m_sum.init(jax.random.PRNGKey(19), h, ei)
        out_sum = m_sum.apply(params, h, ei)
        out_mean = m_mean.apply(params, h, ei)
        # node 0 has 2 incoming edges -> sum != mean there
        assert not np.allclose(np.asarray(out_sum)[0],
                               np.asarray(out_mean)[0])
        # node 1 has exactly 1 incoming edge -> identical
        np.testing.assert_allclose(np.asarray(out_sum)[1],
                                   np.asarray(out_mean)[1], rtol=1e-5)


class TestSGPPairImpl:
    @pytest.mark.parametrize("metric", [(1.0, 1.0), (1.0, 1.0, 1.0),
                                        (1.0,) * 5])
    def test_pair_matches_dense(self, metric):
        """The sparse pair formulation must match the dense nb^3 einsum."""
        alg = CliffordAlgebra(metric)
        x = rand_mv((5, 3, alg.n_blades), seed=21)
        dense = SteerableGeometricProductLayer(alg, 3, impl="dense")
        pair = SteerableGeometricProductLayer(alg, 3, impl="pair")
        params = dense.init(jax.random.PRNGKey(21), x)
        np.testing.assert_allclose(
            np.asarray(pair.apply(params, x)),
            np.asarray(dense.apply(params, x)), rtol=1e-4, atol=1e-5)

    def test_pair_tables_consistent(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        i_of, coeff = alg.gp_pair_tables
        # reconstruct the dense cayley from the pair tables
        dense = np.zeros_like(alg.cayley)
        for j in range(8):
            for k in range(8):
                dense[i_of[j, k], j, k] = coeff[j, k]
        np.testing.assert_array_equal(dense, alg.cayley)


class TestEGCLBatchedFastStorage:
    """Fast mode on the batched (stacked-small-graph) task path stores the
    gathered edge rows and message stream in bf16 and runs the one-hot
    aggregation as one bf16 MXU pass — the result must stay within the
    fast-mode error class of exact (forward only here: the gather VJP
    dispatches to the Pallas kernel, which needs the TPU)."""

    def test_fast_close_to_exact(self, monkeypatch):
        from csmpn_tpu.ops import segment

        rng = np.random.RandomState(33)
        B, N = 2, 4
        h = rand_mv((B * N, 3, 8), seed=34)
        # per-graph sorted targets, stacked with +b*N offsets
        ei_local = np.asarray([[1, 2, 0, 3], [0, 0, 1, 2]])
        ei = np.concatenate(
            [ei_local + b * N for b in range(B)], axis=1).astype(np.int32)
        mask = jnp.asarray(rng.rand(ei.shape[1]) > 0.2)
        m = EGCL(ALG3, 3, 4, 3)
        params = m.init(jax.random.PRNGKey(35), h, jnp.asarray(ei))
        exact = m.apply(params, h, jnp.asarray(ei), edge_mask=mask,
                        batch_shape=(B, N, ei_local.shape[1]))
        monkeypatch.setattr(segment, "_AGGREGATION_MODE", "fast")
        monkeypatch.setattr(segment, "_on_tpu", lambda: True)
        fast = m.apply(params, h, jnp.asarray(ei), edge_mask=mask,
                       batch_shape=(B, N, ei_local.shape[1]))
        assert fast.dtype == h.dtype
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=5e-2, atol=5e-2)
