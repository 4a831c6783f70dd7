"""ctypes bindings for the native (C++) lifting core ``native/csmpn_lift.cpp``
(the GUDHI/networkx replacement, SURVEY.md C22).

The C ABI uses caller-allocated buffers; this wrapper sizes them from the
combinatorial upper bounds, retries nothing (the bounds are exact maxima),
and reshapes the flat outputs into the same :class:`SimplicialComplex`
structure the pure-Python oracle in ``lifting.py`` produces — the two paths
are equality-tested in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from math import comb
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "native", "libcsmpn_lift.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("CSMPN_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        # lazy one-shot build; failures just leave the Python path active
        src_dir = os.path.join(_REPO, "native")
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            try:
                subprocess.run(["make", "-C", src_dir], timeout=120,
                               capture_output=True)
            except (OSError, subprocess.TimeoutExpired):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.csmpn_rips_lift.restype = ctypes.c_int
    lib.csmpn_rips_lift.argtypes = [
        f64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
    ]
    lib.csmpn_clique_lift.restype = ctypes.c_int
    lib.csmpn_clique_lift.argtypes = [
        f64p, ctypes.c_int32, ctypes.c_int32,
        i32p, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double,
        i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _buffers(n: int, fully_connect: bool):
    max_e = comb(n, 2)
    max_t = comb(n, 3)
    # 0-0 edge cofaces (2E) + 1-1 triangle cofaces (6T) + boundary 0->1
    # (2E) + boundary 1->2 (3T) + fully-connected fill (< n^2)
    max_adj = 4 * max_e + 9 * max_t + (n * n if fully_connect else 0)
    edges = np.empty((max_e, 2), dtype=np.int32)
    tris = np.empty((max_t, 3), dtype=np.int32)
    adj = np.empty((max_adj, 4), dtype=np.int32)
    return edges, tris, adj, max_e, max_t, max_adj


def _to_complex(n: int, edges: np.ndarray, n_e: int, tris: np.ndarray,
                n_t: int, adj: np.ndarray, n_adj: int, max_dim: int):
    from .lifting import SimplicialComplex

    x = {0: np.arange(n, dtype=np.int64).reshape(n, 1),
         1: edges[:n_e].astype(np.int64),
         2: tris[:n_t].astype(np.int64)}
    for d in range(max_dim + 1, 3):
        x.pop(d, None)
    adj_dict = {}
    quads = adj[:n_adj]
    keys = quads[:, 0] * 4 + quads[:, 1]
    for ds in range(max_dim + 1):
        for dt in range(max_dim + 1):
            sel = keys == ds * 4 + dt
            if sel.any():
                adj_dict[(ds, dt)] = quads[sel, 2:].astype(np.int64).T
    return SimplicialComplex(max_dim, x, adj_dict)


def rips_lift_native(points: np.ndarray, dim: int, dis: float,
                     fully_connect: bool = True):
    lib = _load()
    assert lib is not None, "native lifting library unavailable"
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    edges, tris, adj, max_e, max_t, max_adj = _buffers(n, fully_connect)
    n_e = np.zeros(1, np.int32)
    n_t = np.zeros(1, np.int32)
    n_a = np.zeros(1, np.int32)
    rc = lib.csmpn_rips_lift(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, float(dis), int(dim), int(fully_connect),
        _i32p(edges), _i32p(n_e), max_e,
        _i32p(tris), _i32p(n_t), max_t,
        _i32p(adj), _i32p(n_a), max_adj)
    assert rc == 0, "csmpn_rips_lift: buffer overflow (impossible bounds?)"
    return _to_complex(n, edges, int(n_e[0]), tris, int(n_t[0]),
                       adj, int(n_a[0]), dim)


def clique_lift_native(points: np.ndarray, edge_index: np.ndarray,
                       edge_th: float = 1e4, tri_th: float = 1e4,
                       max_dim: int = 2):
    lib = _load()
    assert lib is not None, "native lifting library unavailable"
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    ei = np.ascontiguousarray(np.asarray(edge_index, dtype=np.int32).T)
    edges, tris, adj, max_e, max_t, max_adj = _buffers(n, False)
    n_e = np.zeros(1, np.int32)
    n_t = np.zeros(1, np.int32)
    n_a = np.zeros(1, np.int32)
    rc = lib.csmpn_clique_lift(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, _i32p(ei), ei.shape[0],
        float(edge_th), float(tri_th),
        _i32p(edges), _i32p(n_e), max_e,
        _i32p(tris), _i32p(n_t), max_t,
        _i32p(adj), _i32p(n_a), max_adj)
    assert rc == 0, "csmpn_clique_lift: buffer overflow"
    return _to_complex(n, edges, int(n_e[0]), tris, int(n_t[0]),
                       adj, int(n_a[0]), max_dim)
