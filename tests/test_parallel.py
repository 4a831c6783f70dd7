"""Multi-device tests on the virtual CPU mesh (SURVEY.md §4 item 5):
data-parallel equivalence and edge-partitioned aggregation equivalence."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: mesh/train/CLI integration tier

import jax
import jax.numpy as jnp

from csmpn_tpu.algebra import CliffordAlgebra
from csmpn_tpu.nn.egcl import EGCL
from csmpn_tpu.parallel.edge_partition import (
    EdgePartition,
    make_synthetic_complex,
    partition_edges,
    sharded_egcl_apply,
)
from csmpn_tpu.parallel.mesh import make_mesh, shard_batch

ALG = CliffordAlgebra((1.0, 1.0, 1.0))


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh(4)


class TestPartitionEdges:
    def test_ownership_and_masks(self):
        ei = make_synthetic_complex(16, 4, seed=1)
        part = partition_edges(ei, 16, 4)
        assert part.n_shards == 4 and part.nodes_per_shard == 4
        edges = part.edge_index.reshape(4, part.e_shard, 2)
        mask = part.edge_mask.reshape(4, part.e_shard)
        total = 0
        for s in range(4):
            real = edges[s][mask[s]]
            assert ((real[:, 1] // 4) == s).all()
            total += mask[s].sum()
        assert total == ei.shape[1]

    def test_all_edges_preserved(self):
        ei = make_synthetic_complex(8, 3, seed=2)
        part = partition_edges(ei, 8, 2)
        edges = part.edge_index[part.edge_mask]
        got = sorted(map(tuple, edges))
        want = sorted(map(tuple, np.asarray(ei).T))
        assert got == want


class TestEdgePartitionedEGCL:
    def test_matches_single_device(self, mesh):
        n_nodes, deg = 16, 4
        ei = make_synthetic_complex(n_nodes, deg, seed=3)
        rng = np.random.RandomState(0)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)

        egcl = EGCL(ALG, 3, 4, 3, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(0), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))

        part = partition_edges(ei, n_nodes, 4)
        out = sharded_egcl_apply(egcl, params, h, part, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_sum_aggregation(self, mesh):
        n_nodes = 8
        ei = make_synthetic_complex(n_nodes, 3, seed=4)
        rng = np.random.RandomState(1)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="sum")
        params = egcl.init(jax.random.PRNGKey(1), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 4)
        out = sharded_egcl_apply(egcl, params, h, part, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestDataParallel:
    def test_hulls_loss_matches_single_device(self, mesh, tmp_path):
        import os

        os.environ["DATAROOT"] = str(tmp_path)
        from csmpn_tpu.data.hulls import ConvexHullDataset
        from csmpn_tpu.models.hulls import HullsModel

        ds = ConvexHullDataset(num_samples=8, batch_size=8,
                               num_val_samples=4)
        model = HullsModel(spec=ds.spec, hidden_features=4, num_layers=1)
        batch = next(iter(ds.train_loader()))
        params = model.init(jax.random.PRNGKey(0), batch)
        loss_single, _ = jax.jit(
            lambda p, b: model.apply(p, b))(params, batch)

        sharded = shard_batch(batch, mesh)
        from csmpn_tpu.parallel.mesh import replicate

        params_r = replicate(params, mesh)
        loss_dp, _ = jax.jit(lambda p, b: model.apply(p, b))(params_r,
                                                             sharded)
        np.testing.assert_allclose(float(loss_dp), float(loss_single),
                                   rtol=1e-4)

    def test_gradients_match(self, mesh, tmp_path):
        import os

        os.environ["DATAROOT"] = str(tmp_path)
        from csmpn_tpu.data.hulls import ConvexHullDataset
        from csmpn_tpu.models.hulls import HullsModel

        ds = ConvexHullDataset(num_samples=8, batch_size=4,
                               num_val_samples=4)
        model = HullsModel(spec=ds.spec, hidden_features=4, num_layers=1)
        batch = next(iter(ds.train_loader()))
        params = model.init(jax.random.PRNGKey(0), batch)
        grad_fn = jax.jit(jax.grad(lambda p, b: model.apply(p, b)[0]))
        g1 = grad_fn(params, batch)
        from csmpn_tpu.parallel.mesh import replicate

        g2 = grad_fn(replicate(params, mesh), shard_batch(batch, mesh))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)


class TestHaloPartition:
    def test_halo_structure(self):
        from csmpn_tpu.parallel.edge_partition import partition_edges_halo

        ei = make_synthetic_complex(16, 4, seed=7)
        part = partition_edges_halo(ei, 16, 4)
        # every real edge's target is local to its shard
        edges = part.edge_index.reshape(4, part.e_shard, 2)
        mask = part.edge_mask.reshape(4, part.e_shard)
        for s in range(4):
            real = edges[s][mask[s]]
            assert (real[:, 1] < 4).all()  # local target ids
            # remapped sources either local (<nps) or halo slots
            assert (real[:, 0] < 4 + 4 * part.h_max).all()

    def test_matches_single_device(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo,
            sharded_egcl_apply_halo,
        )

        n_nodes, deg = 16, 4
        ei = make_synthetic_complex(n_nodes, deg, seed=8)
        rng = np.random.RandomState(3)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(5), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))
        part = partition_edges_halo(ei, n_nodes, 4)
        out = sharded_egcl_apply_halo(egcl, params, h, part, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_halo_grad_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo,
            sharded_egcl_apply_halo,
        )

        n_nodes = 8
        ei = make_synthetic_complex(n_nodes, 3, seed=9)
        rng = np.random.RandomState(4)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="sum")
        params = egcl.init(jax.random.PRNGKey(6), h, jnp.asarray(ei))
        part = partition_edges_halo(ei, n_nodes, 4)

        g_ref = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, h, jnp.asarray(ei)) ** 2))(params)
        g_halo = jax.grad(lambda p: jnp.mean(
            sharded_egcl_apply_halo(egcl, p, h, part, mesh) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5)


class TestStreamingEGCL:
    """Single-device chunked EGCL (lax.scan over partition slabs) for
    complexes whose edge messages exceed HBM — must match the monolithic
    layer exactly, forward and gradients, remat on and off."""

    def test_matches_monolithic(self):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            streaming_egcl_apply,
        )

        n_nodes = 24
        ei = make_synthetic_complex(n_nodes, 4, seed=11)
        rng = np.random.RandomState(2)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(5), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 6)
        for remat in (True, False):
            out = streaming_egcl_apply(egcl, params, h, part, remat=remat)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-5)

    def test_grad_matches(self):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            streaming_egcl_apply,
        )

        n_nodes = 12
        ei = make_synthetic_complex(n_nodes, 3, seed=13)
        rng = np.random.RandomState(3)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="sum")
        params = egcl.init(jax.random.PRNGKey(6), h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 4)

        g_ref = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, h, jnp.asarray(ei)) ** 2))(params)
        g_str = jax.grad(lambda p: jnp.mean(
            streaming_egcl_apply(egcl, p, h, part) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_str)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5)


    def test_chunk_reduce_matches_full_output(self):
        """``chunk_reduce`` (the carry-reduced streaming loss that keeps
        the (N, C, nb) output off HBM in the >=10M-simplex run) must give
        the same scalar and h-gradient as reducing the full output."""
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            streaming_egcl_apply,
        )

        n_nodes = 18
        ei = make_synthetic_complex(n_nodes, 3, seed=17)
        rng = np.random.RandomState(4)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(7), h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 3)

        def red(out):
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_full(hh):
            return red(streaming_egcl_apply(egcl, params, hh, part))

        def loss_reduced(hh):
            return streaming_egcl_apply(egcl, params, hh, part,
                                        chunk_reduce=red)

        v_full, g_full = jax.value_and_grad(loss_full)(h)
        v_red, g_red = jax.value_and_grad(loss_reduced)(h)
        np.testing.assert_allclose(float(v_red), float(v_full), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_red), np.asarray(g_full),
                                   rtol=5e-4, atol=1e-5)


class TestPartitionedAttrs:
    """Conditioned task models edge-partitioned (VERDICT r2 next-round #6):
    edge_attr/node_attr threaded through the halo and streaming variants
    must reproduce the monolithic conditioned EGCL (in the reference,
    attrs are not optional — cegnn_utils.py:254-275)."""

    def _setup(self, n_nodes, deg, seed):
        from csmpn_tpu.parallel.edge_partition import make_synthetic_complex

        ei = make_synthetic_complex(n_nodes, deg, seed=seed)
        rng = np.random.RandomState(seed)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        ea = jnp.asarray(rng.randn(ei.shape[1], 2, 8), jnp.float32)
        na = jnp.asarray(rng.randn(n_nodes, 1, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, edge_attr_features=2,
                    node_attr_features=1, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(seed), h, jnp.asarray(ei),
                           ea, na)
        ref = egcl.apply(params, h, jnp.asarray(ei), ea, na)
        return ei, h, ea, na, egcl, params, ref

    def test_halo_with_attrs_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo,
            permute_edge_payload,
            sharded_egcl_apply_halo,
        )

        n_nodes = 16
        ei, h, ea, na, egcl, params, ref = self._setup(n_nodes, 4, 21)
        part = partition_edges_halo(ei, n_nodes, 4)
        ea_slab = jnp.asarray(permute_edge_payload(part, ea))
        out = sharded_egcl_apply_halo(egcl, params, h, part, mesh,
                                      node_attr=na, edge_attr=ea_slab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_halo_with_attrs_grad_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo,
            permute_edge_payload,
            sharded_egcl_apply_halo,
        )

        n_nodes = 8
        ei, h, ea, na, egcl, params, ref = self._setup(n_nodes, 3, 22)
        part = partition_edges_halo(ei, n_nodes, 4)
        ea_slab = jnp.asarray(permute_edge_payload(part, ea))
        g_ref = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, h, jnp.asarray(ei), ea, na) ** 2))(params)
        g_halo = jax.grad(lambda p: jnp.mean(
            sharded_egcl_apply_halo(egcl, p, h, part, mesh, node_attr=na,
                                    edge_attr=ea_slab) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5)

    def test_streaming_with_attrs_matches(self):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            permute_edge_payload,
            streaming_egcl_apply,
        )

        n_nodes = 24
        ei, h, ea, na, egcl, params, ref = self._setup(n_nodes, 4, 23)
        part = partition_edges(ei, n_nodes, 6)
        ea_slab = jnp.asarray(permute_edge_payload(part, ea))
        for remat in (True, False):
            out = streaming_egcl_apply(egcl, params, h, part, remat=remat,
                                       node_attr=na, edge_attr=ea_slab)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-5)

    def test_streaming_with_attrs_grad_matches(self):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            permute_edge_payload,
            streaming_egcl_apply,
        )

        n_nodes = 12
        ei, h, ea, na, egcl, params, ref = self._setup(n_nodes, 3, 24)
        part = partition_edges(ei, n_nodes, 4)
        ea_slab = jnp.asarray(permute_edge_payload(part, ea))
        g_ref = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, h, jnp.asarray(ei), ea, na) ** 2))(params)
        g_str = jax.grad(lambda p: jnp.mean(
            streaming_egcl_apply(egcl, p, h, part, node_attr=na,
                                 edge_attr=ea_slab) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_str)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5)


class TestShardedStreaming:
    """Two-level partition (device halo x chunk streaming) — the
    BASELINE.json configs[4] composition (>=10M-simplex complex sharded
    over N>=2 devices, each streaming its shard): must reproduce the
    monolithic EGCL forward, gradients, and carry-reduced loss."""

    def test_partition_structure(self):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo_stream,
        )

        ei = make_synthetic_complex(32, 4, seed=31)
        part = partition_edges_halo_stream(ei, 32, 4, 2)
        assert part.n_shards == 4 and part.n_chunks == 2
        assert part.nodes_per_shard == 8 and part.nodes_per_chunk == 4
        edges = part.edge_index.reshape(4, 2, part.e_chunk, 2)
        mask = part.edge_mask.reshape(4, 2, part.e_chunk)
        total = 0
        for s in range(4):
            for c in range(2):
                real_dst = edges[s, c][mask[s, c]][:, 1]
                # chunk owns device-local targets [c*ncs, (c+1)*ncs)
                assert ((real_dst // 4) == c).all()
                # targets ascending within the chunk slab (incl. padding)
                assert (np.diff(edges[s, c][:, 1]) >= 0).all()
                total += mask[s, c].sum()
        assert total == ei.shape[1]

    def test_matches_monolithic(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo_stream,
            sharded_streaming_egcl_apply,
        )

        n_nodes = 32
        ei = make_synthetic_complex(n_nodes, 4, seed=33)
        rng = np.random.RandomState(5)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(8), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))
        part = partition_edges_halo_stream(ei, n_nodes, 4, 2)
        for remat in (True, False):
            out = sharded_streaming_egcl_apply(egcl, params, h, part, mesh,
                                               remat=remat)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-5)

    def test_grad_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo_stream,
            sharded_streaming_egcl_apply,
        )

        n_nodes = 16
        ei = make_synthetic_complex(n_nodes, 3, seed=34)
        rng = np.random.RandomState(6)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="sum")
        params = egcl.init(jax.random.PRNGKey(9), h, jnp.asarray(ei))
        part = partition_edges_halo_stream(ei, n_nodes, 4, 2)
        g_ref = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, h, jnp.asarray(ei)) ** 2))(params)
        g_ss = jax.grad(lambda p: jnp.mean(
            sharded_streaming_egcl_apply(egcl, p, h, part, mesh) ** 2))(
                params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ss)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5)

    def test_chunk_reduce_matches_full_output(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges_halo_stream,
            sharded_streaming_egcl_apply,
        )

        n_nodes = 24
        ei = make_synthetic_complex(n_nodes, 3, seed=35)
        rng = np.random.RandomState(7)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(10), h, jnp.asarray(ei))
        part = partition_edges_halo_stream(ei, n_nodes, 4, 3)

        def red(out):
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_full(hh):
            return red(sharded_streaming_egcl_apply(egcl, params, hh, part,
                                                    mesh))

        def loss_reduced(hh):
            return sharded_streaming_egcl_apply(egcl, params, hh, part,
                                                mesh, chunk_reduce=red)

        v_full, g_full = jax.value_and_grad(loss_full)(h)
        v_red, g_red = jax.value_and_grad(loss_reduced)(h)
        np.testing.assert_allclose(float(v_red), float(v_full), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_red), np.asarray(g_full),
                                   rtol=5e-4, atol=1e-5)

    def test_with_attrs_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            make_synthetic_complex,
            partition_edges_halo_stream,
            permute_edge_payload,
            sharded_streaming_egcl_apply,
        )

        n_nodes = 32
        ei = make_synthetic_complex(n_nodes, 4, seed=36)
        rng = np.random.RandomState(36)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        ea = jnp.asarray(rng.randn(ei.shape[1], 2, 8), jnp.float32)
        na = jnp.asarray(rng.randn(n_nodes, 1, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, edge_attr_features=2,
                    node_attr_features=1, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(36), h, jnp.asarray(ei),
                           ea, na)
        ref = egcl.apply(params, h, jnp.asarray(ei), ea, na)
        part = partition_edges_halo_stream(ei, n_nodes, 4, 2)
        ea_slab = jnp.asarray(permute_edge_payload(part, ea))
        out = sharded_streaming_egcl_apply(egcl, params, h, part, mesh,
                                           node_attr=na, edge_attr=ea_slab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_allgather_streaming_matches(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            sharded_streaming_egcl_apply_allgather,
        )

        n_nodes = 32
        ei = make_synthetic_complex(n_nodes, 4, seed=37)
        rng = np.random.RandomState(8)
        h = jnp.asarray(rng.randn(n_nodes, 3, 8), jnp.float32)
        egcl = EGCL(ALG, 3, 4, 3, aggr="mean")
        params = egcl.init(jax.random.PRNGKey(11), h, jnp.asarray(ei))
        ref = egcl.apply(params, h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 4 * 2)   # 4 devices x 2 chunks
        out = sharded_streaming_egcl_apply_allgather(
            egcl, params, h, part, mesh, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_allgather_streaming_grad_and_reduce(self, mesh):
        from csmpn_tpu.parallel.edge_partition import (
            partition_edges,
            sharded_streaming_egcl_apply_allgather,
        )

        n_nodes = 16
        ei = make_synthetic_complex(n_nodes, 3, seed=38)
        rng = np.random.RandomState(9)
        h = jnp.asarray(rng.randn(n_nodes, 2, 8), jnp.float32)
        egcl = EGCL(ALG, 2, 3, 2, aggr="sum")
        params = egcl.init(jax.random.PRNGKey(12), h, jnp.asarray(ei))
        part = partition_edges(ei, n_nodes, 4 * 2)

        def red(out):
            return jnp.sum(out.astype(jnp.float32) ** 2)

        v_ref, g_ref = jax.value_and_grad(lambda hh: red(
            egcl.apply(params, hh, jnp.asarray(ei))))(h)
        v_ag, g_ag = jax.value_and_grad(
            lambda hh: sharded_streaming_egcl_apply_allgather(
                egcl, params, hh, part, mesh, 4, chunk_reduce=red))(h)
        np.testing.assert_allclose(float(v_ag), float(v_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_ag), np.asarray(g_ref),
                                   rtol=5e-4, atol=1e-5)
