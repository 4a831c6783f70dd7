"""Simplicial lifting: graph/point-cloud -> simplicial complex -> big graph.

Self-contained host-side replacement for the reference's GUDHI/Qhull/networkx
pipeline (SURVEY.md C16-C19; `csmpn/data/modules/utils.py`), producing flat
numpy incidence arrays ready for static-shape TPU batching.

Semantics preserved from the reference (validated in tests/test_lifting.py):
  * Rips lift = flag complex over the distance graph (equivalent to GUDHI's
    RipsComplex for dim <= 2, utils.py:128-130);
  * boundary/coboundary adjacency + same-dim upper adjacency through shared
    cofaces (utils.py:63-88);
  * the fully-connected 0-0 augmentation INCLUDING its ordered-pair quirk:
    the reference checks membership against sorted pairs only, so for
    connected node pairs the (hi, lo) direction is inserted twice
    (utils.py:91-96) — degree distributions depend on this;
  * clique lift (aspirin): edge-length / triangle-area thresholds, where
    inserting a surviving triangle resurrects its boundary edges
    (gudhi insert semantics, utils.py:183-200), and NO fully-connected
    augmentation (utils.py:322-375);
  * convex-hull lift: all k-faces of Qhull facets, k <= dim
    (utils.py:210-248), with the fully-connected augmentation.
"""
from __future__ import annotations

import itertools
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# lightweight simplex store (replaces gudhi.SimplexTree for dim <= 2 usage)
# --------------------------------------------------------------------------

class SimplexStore:
    """Simplices by dimension, as sorted vertex tuples with stable indices.

    Insertion follows gudhi semantics: inserting a simplex inserts all of
    its faces.  Index order within a dimension is sorted-lexicographic over
    the final simplex set (assigned at freeze time).
    """

    def __init__(self, max_dim: int = 2):
        self.max_dim = max_dim
        self._sets: List[set] = [set() for _ in range(max_dim + 1)]
        self._index: Optional[List[Dict[tuple, int]]] = None

    def insert(self, simplex) -> None:
        simplex = tuple(sorted(int(v) for v in simplex))
        d = len(simplex) - 1
        if d > self.max_dim:
            raise ValueError(f"simplex dim {d} > max_dim {self.max_dim}")
        for k in range(d + 1):
            for face in itertools.combinations(simplex, k + 1):
                self._sets[k].add(face)

    def freeze(self) -> None:
        self._index = [
            {s: i for i, s in enumerate(sorted(self._sets[d]))}
            for d in range(self.max_dim + 1)
        ]

    def simplices(self, d: int) -> List[tuple]:
        assert self._index is not None, "freeze() first"
        return sorted(self._sets[d])

    def index(self, simplex: tuple) -> int:
        return self._index[len(simplex) - 1][tuple(simplex)]

    def contains(self, simplex) -> bool:
        simplex = tuple(sorted(simplex))
        return simplex in self._sets[len(simplex) - 1]

    def counts(self) -> List[int]:
        return [len(self._sets[d]) for d in range(self.max_dim + 1)]


# --------------------------------------------------------------------------
# adjacency generation
# --------------------------------------------------------------------------

def _boundaries(simplex: tuple):
    if len(simplex) == 1:
        return
    for i in range(len(simplex)):
        yield simplex[:i] + simplex[i + 1:]


def generate_adjacencies(
    store: SimplexStore, fully_connect_nodes: bool
) -> Dict[Tuple[int, int], np.ndarray]:
    """Boundary + upper (shared-coface) adjacency dictionaries.

    Returns {(dim_src, dim_dst): (2, n) int64} with the same content as the
    reference's ``generate_adjacencies_single`` (utils.py:63-103) /
    ``generate_adjacencies`` (utils.py:322-375).  Coboundary (downward)
    relations are added later by the flattening step, mirroring
    ``SimplicialTransform.add_missing_adj`` (simplicial_data.py:105-110).
    """
    adj: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def add(key, pair):
        adj.setdefault(key, []).append(pair)

    max_dim = store.max_dim
    # cofaces map: for each d-simplex, the (d+1)-simplices containing it
    for d in range(max_dim + 1):
        simplices_d = store.simplices(d)
        # upper adjacency through shared codim-1 cofaces
        if d + 1 <= max_dim:
            for coface in store.simplices(d + 1):
                for s in _boundaries(coface):
                    s_idx = store.index(s)
                    for s2 in _boundaries(coface):
                        if s2 != s:
                            add((d, d), (store.index(s2), s_idx))
        # boundary adjacency (d-1 -> d)
        if d >= 1:
            for s in simplices_d:
                s_idx = store.index(s)
                for b in _boundaries(s):
                    add((d - 1, d), (store.index(b), s_idx))

    if fully_connect_nodes:
        # Reference quirk (utils.py:91-96): membership is tested against
        # sorted pairs only, so (i, j) is added whenever NOT (i < j and
        # {i, j} is an edge) — duplicating the (hi, lo) direction of real
        # edges on top of the coface-derived 0-0 adjacency.
        n0 = len(store.simplices(0))
        edge_set = store._sets[1]
        for i in range(n0):
            for j in range(n0):
                if i != j and not (i < j and (i, j) in edge_set):
                    add((0, 0), (i, j))

    out = {}
    for k, pairs in adj.items():
        out[k] = np.asarray(pairs, dtype=np.int64).T  # (2, n)
    return out


# --------------------------------------------------------------------------
# complex container + lifts
# --------------------------------------------------------------------------

@dataclass
class SimplicialComplex:
    """x_dict: {dim: (n_d, dim+1) vertex-index matrix};
    adj: {(src_dim, dst_dim): (2, n)} with within-dim indices."""

    max_dim: int
    x: Dict[int, np.ndarray]
    adj: Dict[Tuple[int, int], np.ndarray]

    @property
    def counts(self) -> List[int]:
        return [len(self.x.get(d, ())) for d in range(self.max_dim + 1)]


def _store_to_complex(store: SimplexStore,
                      fully_connect_nodes: bool) -> SimplicialComplex:
    store.freeze()
    x = {}
    for d in range(store.max_dim + 1):
        simp = store.simplices(d)
        x[d] = np.asarray(simp, dtype=np.int64).reshape(len(simp), d + 1)
    adj = generate_adjacencies(store, fully_connect_nodes)
    return SimplicialComplex(store.max_dim, x, adj)


def rips_lift(points: np.ndarray, dim: int, dis: float,
              backend: str = "auto") -> SimplicialComplex:
    """Vietoris-Rips flag complex up to ``dim`` at scale ``dis``
    (reference rips_lift, utils.py:106-136).

    For dim <= 2 the flag construction (edges = pairs within ``dis``,
    triangles = triples whose three edges all exist) is exactly GUDHI's
    Rips complex.  ``backend="auto"`` uses the native C++ core when
    available (same output, tests/test_native.py); "python" forces the
    pure-Python path.
    """
    if backend == "auto" and dim <= 2 and not os.environ.get(
            "CSMPN_NO_NATIVE"):
        from . import native
        if native.available():
            return native.rips_lift_native(points, dim, dis)
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    store = SimplexStore(dim)
    for v in range(n):
        store.insert((v,))
    d2 = np.sum((points[:, None] - points[None, :]) ** 2, axis=-1)
    within = d2 <= dis * dis
    iu, ju = np.triu_indices(n, k=1)
    edges = [(int(i), int(j)) for i, j in zip(iu, ju) if within[i, j]]
    for e in edges:
        store.insert(e)
    if dim >= 2:
        for i, j in edges:
            for k in range(j + 1, n):
                if within[i, k] and within[j, k]:
                    store.insert((i, j, k))
    return _store_to_complex(store, fully_connect_nodes=True)


def clique_lift(points: np.ndarray, edge_index: np.ndarray,
                edge_th: float = 1e4, tri_th: float = 1e4,
                max_dim: int = 2, backend: str = "auto") -> SimplicialComplex:
    """Clique lift with edge-length / triangle-area thresholds
    (reference simplicial_lift, utils.py:151-207; used for MD17 aspirin).

    Triangles that pass the area filter resurrect their boundary edges even
    when those were dropped by the length filter (gudhi insert semantics).
    No fully-connected 0-0 augmentation on this path.
    """
    if backend == "auto" and max_dim == 2 and not os.environ.get(
            "CSMPN_NO_NATIVE"):
        from . import native
        if native.available():
            return native.clique_lift_native(points, edge_index, edge_th,
                                             tri_th, max_dim)
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    ei = np.asarray(edge_index)
    und = set()
    for s, t in zip(ei[0], ei[1]):
        if s != t:
            und.add((min(int(s), int(t)), max(int(s), int(t))))
    und = sorted(und)

    # triangles = 3-cliques of the undirected graph
    nbrs: Dict[int, set] = {v: set() for v in range(n)}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    triangles = []
    for a, b in und:
        for c in sorted(nbrs[a] & nbrs[b]):
            if c > b:
                triangles.append((a, b, c))

    store = SimplexStore(max_dim)
    for v in range(n):
        store.insert((v,))
    for a, b in und:
        if np.linalg.norm(points[a] - points[b]) <= edge_th:
            store.insert((a, b))
    for a, b, c in triangles:
        v1 = points[b] - points[a]
        v2 = points[c] - points[a]
        if points.shape[1] == 3:
            area = 0.5 * np.linalg.norm(np.cross(v1, v2))
        else:
            gram = np.array([[v1 @ v1, v1 @ v2], [v1 @ v2, v2 @ v2]])
            area = 0.5 * np.sqrt(max(np.linalg.det(gram), 0.0))
        if area <= tri_th:
            store.insert((a, b, c))
    return _store_to_complex(store, fully_connect_nodes=False)


def hull_lift(points: np.ndarray, dim: int = 2) -> SimplicialComplex:
    """Convex-hull lift: all k-faces (k <= dim) of the hull facets
    (reference simplicial_lift_hulls, utils.py:210-248)."""
    from scipy.spatial import ConvexHull  # Qhull, same backend as reference

    points = np.asarray(points, dtype=np.float64)
    hull = ConvexHull(points)
    store = SimplexStore(dim)
    for v in range(len(points)):
        store.insert((v,))
    for k in range(1, dim + 1):
        faces = set()
        for facet in hull.simplices:
            for subset in itertools.combinations(sorted(map(int, facet)),
                                                 k + 1):
                faces.add(subset)
        for f in faces:
            store.insert(f)
    return _store_to_complex(store, fully_connect_nodes=True)


# --------------------------------------------------------------------------
# big-graph flattening
# --------------------------------------------------------------------------

@dataclass
class BigGraph:
    """One simplicial complex flattened into a single graph over all
    simplices (the reference's SimplicialTransform output contract:
    simplicial_data.py:112-157, 177-251)."""

    edge_index: np.ndarray   # (2, E) int64, [source, target] big-graph ids
    edge_types: np.ndarray   # (E, 2) int64 [src_dim, dst_dim]
    node_types: np.ndarray   # (N,) int64 simplex dimension per big-graph node
    x_ind: np.ndarray        # (N, max_dim+1) int64 padded vertex indices
    counts: List[int] = field(default_factory=list)  # simplices per dim

    @property
    def num_nodes(self) -> int:
        return len(self.node_types)


def flatten_complex(cplx: SimplicialComplex) -> BigGraph:
    """Merge per-dim simplex sets into one node space with per-dim offsets,
    emitting edge_index over all adjacency relations (upward, downward,
    same-dim) plus x_ind / node_types."""
    max_dim = cplx.max_dim
    counts = cplx.counts
    offsets = np.concatenate([[0], np.cumsum(counts)])

    adj = dict(cplx.adj)
    # downward (coboundary) relations = transposed boundary relations
    for d in range(max_dim):
        if (d, d + 1) in adj:
            adj[(d + 1, d)] = adj[(d, d + 1)][[1, 0]].copy()

    edge_blocks, type_blocks = [], []
    for ds in range(max_dim + 1):
        for dt in range(max_dim + 1):
            if (ds, dt) in adj:
                block = adj[(ds, dt)].copy()
                block[0] += offsets[ds]
                block[1] += offsets[dt]
                edge_blocks.append(block)
                type_blocks.append(
                    np.tile([[ds], [dt]], (1, block.shape[1])).T)
    edge_index = (np.concatenate(edge_blocks, axis=1)
                  if edge_blocks else np.zeros((2, 0), dtype=np.int64))
    edge_types = (np.concatenate(type_blocks, axis=0)
                  if type_blocks else np.zeros((0, 2), dtype=np.int64))

    n = int(offsets[-1])
    node_types = np.zeros(n, dtype=np.int64)
    x_ind = np.zeros((n, max_dim + 1), dtype=np.int64)
    for d in range(max_dim + 1):
        sl = slice(int(offsets[d]), int(offsets[d + 1]))
        node_types[sl] = d
        if counts[d]:
            x_ind[sl, : d + 1] = cplx.x[d]
    return BigGraph(edge_index, edge_types, node_types, x_ind,
                    counts=list(counts))
