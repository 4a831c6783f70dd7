"""Native (C++) lifting core vs the pure-Python oracle: identical
complexes and adjacency multisets on randomized inputs."""
import numpy as np
import pytest

from csmpn_tpu.data import lifting
from csmpn_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lifting lib unavailable")


def as_multiset(adj):
    return {k: sorted(map(tuple, np.asarray(v).T)) for k, v in adj.items()}


def assert_complex_equal(a, b):
    assert a.counts == b.counts
    for d in a.x:
        if len(a.x[d]):
            np.testing.assert_array_equal(a.x[d], b.x[d])
    assert as_multiset(a.adj) == as_multiset(b.adj)


class TestRipsNative:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_point_clouds(self, seed):
        rng = np.random.RandomState(seed)
        pts = rng.randn(10, 3) * 1.5
        py = lifting.rips_lift(pts, 2, 2.0)
        cc = native.rips_lift_native(pts, 2, 2.0)
        assert_complex_equal(py, cc)

    def test_complete_complex(self):
        pts = np.random.RandomState(9).randn(6, 2)
        py = lifting.rips_lift(pts, 2, 1e4)
        cc = native.rips_lift_native(pts, 2, 1e4)
        assert_complex_equal(py, cc)
        assert cc.counts == [6, 15, 20]

    def test_no_edges(self):
        pts = np.asarray([[0.0, 0], [10, 0], [0, 10]])
        py = lifting.rips_lift(pts, 2, 1.0)
        cc = native.rips_lift_native(pts, 2, 1.0)
        assert_complex_equal(py, cc)


class TestCliqueNative:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_graphs(self, seed):
        rng = np.random.RandomState(seed)
        n = 9
        pts = rng.randn(n, 3)
        # random undirected graph as a directed edge list
        pairs = [(i, j) for i in range(n) for j in range(n)
                 if i != j and rng.rand() < 0.4]
        ei = np.asarray(pairs).T
        py = lifting.clique_lift(pts, ei, edge_th=2.0, tri_th=1.0)
        cc = native.clique_lift_native(pts, ei, edge_th=2.0, tri_th=1.0)
        assert_complex_equal(py, cc)

    def test_resurrection(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.]])
        ei = np.array([[0, 1, 2, 3, 0, 1, 2, 3, 0, 2],
                       [1, 2, 3, 0, 3, 0, 1, 2, 2, 0]])
        py = lifting.clique_lift(pts, ei, edge_th=1.2, tri_th=0.6)
        cc = native.clique_lift_native(pts, ei, edge_th=1.2, tri_th=0.6)
        assert_complex_equal(py, cc)
