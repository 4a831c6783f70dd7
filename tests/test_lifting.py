"""Lifting golden tests on small enumerable complexes (SURVEY.md §4 item 4)."""
import numpy as np
import pytest

from csmpn_tpu.data.lifting import (
    BigGraph,
    SimplexStore,
    clique_lift,
    flatten_complex,
    hull_lift,
    rips_lift,
)
from csmpn_tpu.data.batching import (
    PaddingSpec,
    collate,
    pad_big_graph,
    spec_from_graphs,
)


def edge_set(adj):
    return set(map(tuple, np.asarray(adj).T))


class TestSimplexStore:
    def test_insert_inserts_faces(self):
        s = SimplexStore(2)
        s.insert((2, 0, 1))
        s.freeze()
        assert s.simplices(0) == [(0,), (1,), (2,)]
        assert s.simplices(1) == [(0, 1), (0, 2), (1, 2)]
        assert s.simplices(2) == [(0, 1, 2)]


class TestRipsLift:
    def test_triangle_plus_far_point(self):
        """3 close points forming a triangle + 1 far point."""
        pts = np.array([[0, 0], [1, 0], [0, 1], [10, 10.]])
        c = rips_lift(pts, dim=2, dis=2.0)
        assert c.counts == [4, 3, 1]
        assert set(map(tuple, c.x[1])) == {(0, 1), (0, 2), (1, 2)}
        assert tuple(c.x[2][0]) == (0, 1, 2)

    def test_flag_semantics(self):
        """Triangles require ALL three edges within range (flag complex =
        GUDHI Rips for dim<=2)."""
        pts = np.array([[0, 0], [1, 0], [0.5, 1.2]])
        # edge (0,1) length 1; edges to vertex 2 length ~1.3
        c = rips_lift(pts, dim=2, dis=1.1)
        assert c.counts == [3, 1, 0]

    def test_fully_connected_quirk(self):
        """Reference utils.py:91-96: for an existing edge {i,j} (i<j), the
        (j,i) ordered pair is inserted again on top of the coface-derived
        0-0 adjacency; non-edges get both directions once."""
        pts = np.array([[0, 0], [1, 0], [10, 0.]])
        c = rips_lift(pts, dim=2, dis=2.0)  # only edge (0,1)
        pairs = list(map(tuple, c.adj[(0, 0)].T))
        # coface-derived: (0,1) and (1,0) once each
        # augmentation: all ordered pairs except (0,1) -> adds (1,0) again
        assert pairs.count((0, 1)) == 1
        assert pairs.count((1, 0)) == 2
        assert pairs.count((0, 2)) == 1
        assert pairs.count((2, 0)) == 1

    def test_boundary_and_coboundary(self):
        pts = np.array([[0, 0], [1, 0], [0, 1.]])
        c = rips_lift(pts, dim=2, dis=2.0)
        # each vertex -> each incident edge
        b01 = edge_set(c.adj[(0, 1)])
        assert (0, 0) in b01 and (1, 0) in b01  # vertices 0,1 -> edge (0,1)=idx0
        # edges -> triangle
        b12 = edge_set(c.adj[(1, 2)])
        assert b12 == {(0, 0), (1, 0), (2, 0)}
        # upper adjacency of edges through the triangle: all ordered pairs
        assert len(c.adj[(1, 1)].T) == 6


class TestCliqueLift:
    def test_thresholds_and_resurrection(self):
        # square + one diagonal: nodes 0-3, edges of length 1 and diag ~1.41
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.]])
        ei = np.array([[0, 1, 2, 3, 0, 1, 2, 3, 0, 2],
                       [1, 2, 3, 0, 3, 0, 1, 2, 2, 0]])
        # edge_th=1.2 drops the diagonal (0,2); triangle (0,1,2) area .5 kept
        c = clique_lift(pts, ei, edge_th=1.2, tri_th=0.6)
        # diagonal resurrected by surviving triangles (0,1,2) and (0,2,3)
        assert (0, 2) in set(map(tuple, c.x[1]))
        assert c.counts[2] == 2
        # strict triangle threshold removes triangles AND the diagonal stays
        # dropped (no resurrection)
        c2 = clique_lift(pts, ei, edge_th=1.2, tri_th=0.1)
        assert c2.counts[2] == 0
        assert (0, 2) not in set(map(tuple, c2.x[1]))
        assert c2.counts[1] == 4

    def test_no_fc_augmentation(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5.]])
        ei = np.array([[0], [1]])
        c = clique_lift(pts, ei, edge_th=10, tri_th=10)
        # only coface-derived 0-0 pairs (0,1),(1,0); no (0,2) etc.
        assert edge_set(c.adj[(0, 0)]) == {(0, 1), (1, 0)}


class TestHullLift:
    def test_tetrahedron(self):
        """Hull of a tetrahedron in 3-D: every face is on the hull."""
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.]])
        c = hull_lift(pts, dim=2)
        assert c.counts == [4, 6, 4]

    def test_interior_point_excluded_from_faces(self):
        pts = np.array([[0, 0, 0], [4, 0, 0], [0, 4, 0], [0, 0, 4],
                        [0.5, 0.5, 0.5]])
        c = hull_lift(pts, dim=2)
        # interior point 4 is a 0-simplex but appears in no hull edge
        assert c.counts[0] == 5
        assert not any(4 in e for e in map(tuple, c.x[1]))

    def test_5d_points(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(8, 5)
        c = hull_lift(pts, dim=2)
        assert c.counts[0] == 8
        # 5-D hull facets are 4-simplices: plenty of edges/triangles
        assert c.counts[1] > 8 and c.counts[2] > 8


class TestFlatten:
    def test_offsets_and_types(self):
        pts = np.array([[0, 0], [1, 0], [0, 1.]])
        big = flatten_complex(rips_lift(pts, dim=2, dis=2.0))
        assert big.counts == [3, 3, 1]
        assert list(big.node_types) == [0, 0, 0, 1, 1, 1, 2]
        # x_ind rows for edges carry 2 vertex ids, triangles 3
        assert big.x_ind[3, :2].tolist() == [0, 1]
        assert big.x_ind[6].tolist() == [0, 1, 2]

    def test_reverse_edges_present(self):
        pts = np.array([[0, 0], [1, 0], [0, 1.]])
        big = flatten_complex(rips_lift(pts, dim=2, dis=2.0))
        es = set(map(tuple, big.edge_index.T))
        # vertex 0 (id 0) -> edge (0,1) (id 3)  and the reverse
        assert (0, 3) in es and (3, 0) in es
        # edge (0,1) (id 3) -> triangle (id 6) and reverse
        assert (3, 6) in es and (6, 3) in es


class TestPadding:
    def _bigs(self):
        out = []
        for seed in range(3):
            rng = np.random.RandomState(seed)
            pts = rng.randn(6, 2) * 1.2
            out.append((pts, flatten_complex(rips_lift(pts, 2, 1.5))))
        return out

    def test_spec_covers(self):
        bigs = self._bigs()
        spec = spec_from_graphs([b for _, b in bigs])
        for _, b in bigs:
            for d in range(3):
                assert b.counts[d] <= spec.counts_max[d]
            assert b.edge_index.shape[1] <= spec.e_max

    def test_pad_and_collate(self):
        bigs = self._bigs()
        spec = spec_from_graphs([b for _, b in bigs])
        samples, targets = [], []
        for pts, b in bigs:
            feats = {"input": pts.astype(np.float32)}
            samples.append(pad_big_graph(b, spec, feats))
            targets.append({"target": np.float32(1.0)})
        batch = collate(samples, targets)
        B, N = batch.node_types.shape
        assert B == 3 and N == spec.n_total
        assert batch.edge_index.shape == (3, spec.e_max, 2)
        # edges sorted by target within the real range
        for i, (_, b) in enumerate(bigs):
            e = b.edge_index.shape[1]
            tgt = batch.edge_index[i, :e, 1]
            assert (np.diff(tgt) >= 0).all()
            assert batch.edge_mask[i, :e].all()
            assert not batch.edge_mask[i, e:].any()

    def test_features_relocated_per_section(self):
        """A feature value attached to the first edge-simplex must move to
        the (static) edge-section offset."""
        pts = np.array([[0, 0], [1, 0], [0, 1.]])
        big = flatten_complex(rips_lift(pts, 2, 2.0))
        spec = PaddingSpec((4, 8, 4), 64)
        n_old = big.num_nodes
        feat = np.zeros((n_old, 1), dtype=np.float32)
        feat[3] = 7.0  # first edge simplex in original layout
        s = pad_big_graph(big, spec, {"f": feat})
        assert s["features"]["f"][4, 0] == 7.0  # new edge section starts at 4
        assert s["node_mask"][:3].all() and not s["node_mask"][3]
        assert s["node_types"][4] == 1
