"""TPU-native Clifford algebra runtime.

Functional JAX re-design of the reference algebra runtime
(`csmpn/algebra/cliffordalgebra.py:10-262`).  The algebra object is a plain
host-side Python object (NOT a pytree): all tables are numpy constants built
once per metric signature and closed over by jitted functions, where XLA
constant-folds them.  All tensor methods take/return ``jnp`` arrays and are
shape-polymorphic over leading batch dimensions; the blade axis is always
last.

Conventions (identical to the reference, required for task parity):
  * short-lex blade order (blades.BladeOrder)
  * geometric product contraction ``...i,ijk,...k->...j``
  * smooth-abs-sqrt ``(q^2 + 1e-16)^0.25`` for norms
    (cliffordalgebra.py:148-149)
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .blades import BladeOrder, blade_product, cayley_table


class CliffordAlgebra:
    """Clifford algebra Cl(metric) over R with a euclidean-style diagonal metric.

    Parameters
    ----------
    metric: sequence of diagonal metric entries, e.g. ``(1.0, 1.0, 1.0)`` for
        Cl(3, 0).
    """

    def __init__(self, metric: Sequence[float]):
        self.metric = np.asarray(metric, dtype=np.float64)
        self.dim = len(self.metric)
        self.n_blades = 2**self.dim
        self.bbo = BladeOrder(self.dim)
        self.cayley = cayley_table(self.bbo, self.metric).astype(np.float32)
        self.bbo_grades = self.bbo.grades  # (n_blades,) int64
        self.grades = np.unique(self.bbo_grades)
        self.n_subspaces = len(self.grades)
        # number of blades per grade, short-lex contiguous
        self.subspaces = np.asarray(
            [math.comb(self.dim, int(g)) for g in self.grades], dtype=np.int64
        )
        starts = np.concatenate([[0], np.cumsum(self.subspaces)])
        self.grade_to_slice = [
            slice(int(starts[g]), int(starts[g + 1])) for g in range(self.dim + 1)
        ]
        self.grade_to_index = [
            np.arange(int(starts[g]), int(starts[g + 1])) for g in range(self.dim + 1)
        ]
        g = self.bbo_grades.astype(np.float64)
        self._alpha_signs = np.power(-1.0, g).astype(np.float32)
        self._beta_signs = np.power(-1.0, g * (g - 1) / 2).astype(np.float32)
        self._gamma_signs = np.power(-1.0, g * (g + 1) / 2).astype(np.float32)
        self.even_grades = (self.bbo_grades % 2 == 0)
        self.odd_grades = ~self.even_grades
        # Diagonal of the scalar-output slice of the Cayley tensor:
        # blade_i * blade_k has a grade-0 component only when i == k, so
        # b(x, y)[..., 0] = sum_i beta_signs[i] * q_diag[i] * x_i * y_i.
        self._q_diag = np.einsum("ii->i", self.cayley[:, 0, :]).copy()
        self._b_coeff = (self._beta_signs * self._q_diag).astype(np.float32)
        # expansion map: blade index -> grade index (for repeat_interleave-free
        # gather-based per-grade parameter expansion on TPU)
        self.blade_to_grade = self.bbo_grades.astype(np.int32)

    # ------------------------------------------------------------------ core

    def geometric_product(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full geometric product; a, b: (..., n_blades)."""
        cayley = jnp.asarray(self.cayley, dtype=a.dtype)
        return jnp.einsum("...i,ijk,...k->...j", a, cayley, b)

    # -------------------------------------------------------- grade machinery

    def get_grade(self, mv: jnp.ndarray, grade: int) -> jnp.ndarray:
        return mv[..., self.grade_to_slice[grade]]

    def embed_grade(self, tensor: jnp.ndarray, grade: int) -> jnp.ndarray:
        """Embed coefficients of one grade into a full multivector
        (reference embed_grade, cliffordalgebra.py:105-109)."""
        s = self.grade_to_slice[grade]
        pad = [(0, 0)] * (tensor.ndim - 1) + [(s.start, self.n_blades - s.stop)]
        return jnp.pad(tensor, pad)

    def embed(self, tensor: jnp.ndarray, blade_indices) -> jnp.ndarray:
        blade_indices = np.asarray(blade_indices)
        out = jnp.zeros((*tensor.shape[:-1], self.n_blades), dtype=tensor.dtype)
        return out.at[..., blade_indices].set(tensor)

    # ------------------------------------------------------------ involutions

    def alpha(self, mv: jnp.ndarray) -> jnp.ndarray:
        return mv * jnp.asarray(self._alpha_signs, dtype=mv.dtype)

    def beta(self, mv: jnp.ndarray) -> jnp.ndarray:
        return mv * jnp.asarray(self._beta_signs, dtype=mv.dtype)

    def gamma(self, mv: jnp.ndarray) -> jnp.ndarray:
        return mv * jnp.asarray(self._gamma_signs, dtype=mv.dtype)

    # --------------------------------------------------------- quadratic form

    def b(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Scalar-blade bilinear form b(x, y) = <beta(x) y>_0, shape (..., 1).

        Uses the diagonal structure of the scalar output slice instead of a
        full Cayley contraction (reference b(), cliffordalgebra.py:119-141).
        """
        coeff = jnp.asarray(self._b_coeff, dtype=x.dtype)
        return jnp.sum(coeff * x * y, axis=-1, keepdims=True)

    def q(self, mv: jnp.ndarray) -> jnp.ndarray:
        return self.b(mv, mv)

    def _q_blades(self, mv: jnp.ndarray, blades: np.ndarray) -> jnp.ndarray:
        coeff = jnp.asarray(self._b_coeff[blades], dtype=mv.dtype)
        return jnp.sum(coeff * mv * mv, axis=-1, keepdims=True)

    @staticmethod
    def _smooth_abs_sqrt(x: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
        return (x**2 + eps) ** 0.25

    def norm(self, mv: jnp.ndarray) -> jnp.ndarray:
        return self._smooth_abs_sqrt(self.q(mv))

    def qs(self, mv: jnp.ndarray, grades: Optional[Sequence[int]] = None):
        """Per-grade magnitude-squared values, each (..., 1); operates on a
        full multivector, slicing each grade (reference qs :162-168)."""
        if grades is None:
            grades = range(self.dim + 1)
        return [
            self._q_blades(self.get_grade(mv, g), self.grade_to_index[g])
            for g in grades
        ]

    def norms(self, mv: jnp.ndarray, grades: Optional[Sequence[int]] = None):
        if grades is None:
            grades = range(self.dim + 1)
        return [self._smooth_abs_sqrt(q) for q in self.qs(mv, grades)]

    def norms_cat(self, mv: jnp.ndarray) -> jnp.ndarray:
        """All per-grade norms concatenated: (..., n_subspaces).

        Fused form used by the normalization layers: computes all grades in
        one masked matmul instead of dim+1 slices.
        """
        sq = mv * mv * jnp.asarray(self._b_coeff, dtype=mv.dtype)
        # sum within each grade via a (n_blades, n_subspaces) 0/1 matrix
        seg = jnp.asarray(self._grade_onehot(), dtype=mv.dtype)
        q = sq @ seg
        return self._smooth_abs_sqrt(q)

    def qs_cat(self, mv: jnp.ndarray) -> jnp.ndarray:
        sq = mv * mv * jnp.asarray(self._b_coeff, dtype=mv.dtype)
        seg = jnp.asarray(self._grade_onehot(), dtype=mv.dtype)
        return sq @ seg

    @functools.lru_cache(maxsize=None)
    def _grade_onehot(self) -> np.ndarray:
        m = np.zeros((self.n_blades, self.n_subspaces), dtype=np.float32)
        m[np.arange(self.n_blades), self.bbo_grades] = 1.0
        return m

    def expand_per_grade(self, per_grade: jnp.ndarray) -> jnp.ndarray:
        """Expand a (..., n_subspaces) per-grade array to (..., n_blades).

        TPU-friendly gather replacement for torch repeat_interleave over
        subspaces (reference pattern at cegnn_utils.py:48, :82, :330).
        """
        return per_grade[..., self.blade_to_grade]

    # ----------------------------------------------------------- versor tools

    def parity_is_odd(self, mv: jnp.ndarray) -> bool:
        even_zero = bool(jnp.all(mv[..., self.even_grades] == 0))
        odd_zero = bool(jnp.all(mv[..., self.odd_grades] == 0))
        if even_zero ^ odd_zero:
            return even_zero
        raise ValueError("Not a homogeneous element.")

    def eta(self, w: jnp.ndarray) -> float:
        return -1.0 if self.parity_is_odd(w) else 1.0

    def alpha_w(self, w: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
        even = jnp.asarray(self.even_grades, dtype=mv.dtype)
        odd = jnp.asarray(self.odd_grades, dtype=mv.dtype)
        return even * mv + self.eta(w) * odd * mv

    def inverse(self, mv: jnp.ndarray) -> jnp.ndarray:
        """Versor inverse: beta(mv) / <mv beta(mv)>_0.

        Note: the reference (cliffordalgebra.py:215-217) divides by
        ``b(mv, beta(mv))`` instead, which mis-scales the versor action for
        general versors; that code path is a testing affordance the
        reference never exercises (its repo has no tests).  We use the
        correct quadratic-form denominator so that ``rho`` is an isometry —
        it anchors this framework's equivariance test suite.
        """
        return self.beta(mv) / self.q(mv)

    def sandwich(self, u, v, w):
        return self.geometric_product(self.geometric_product(u, v), w)

    def rho(self, w: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
        """Versor action of w on mv (the twisted conjugation used for
        equivariance checks; reference rho :219-221)."""
        return self.sandwich(w, self.alpha_w(w, mv), self.inverse(w))

    def random_vector(self, key: jax.Array, n: int = 1) -> jnp.ndarray:
        v = jnp.zeros((n, self.n_blades), dtype=jnp.float32)
        vec = jax.random.normal(key, (n, self.dim), dtype=jnp.float32)
        return v.at[:, self.grade_to_slice[1]].set(vec)

    def versor(self, key: jax.Array, order: Optional[int] = None,
               normalized: bool = True) -> jnp.ndarray:
        """Random versor as a product of `order` random grade-1 vectors
        (even order by default => a rotor)."""
        if order is None:
            order = self.dim if self.dim % 2 == 0 else self.dim - 1
        order = max(order, 2)
        vectors = self.random_vector(key, order)
        out = vectors[0]
        for i in range(1, order):
            out = self.geometric_product(out, vectors[i])
        if normalized:
            out = out / self.norm(out)[..., :1]
        return out

    rotor = versor

    # ------------------------------------------------------ structural tables

    @functools.cached_property
    def geometric_product_paths(self) -> np.ndarray:
        """(dim+1)^3 bool table: which (grade_l, grade_out, grade_r) triples
        carry nonzero Cayley entries (reference :238-252)."""
        d = self.dim + 1
        paths = np.zeros((d, d, d), dtype=bool)
        for i in range(d):
            for j in range(d):
                for k in range(d):
                    block = self.cayley[
                        self.grade_to_slice[i], self.grade_to_slice[j],
                        self.grade_to_slice[k],
                    ]
                    paths[i, j, k] = bool((block != 0).any())
        return paths

    @functools.cached_property
    def n_product_paths(self) -> int:
        return int(self.geometric_product_paths.sum())

    @functools.cached_property
    def gp_pair_tables(self):
        """Sparse pair form of the geometric product.

        Blade products are group-like: for every (output j, right k) there
        is exactly ONE left blade i = bitmap(j) ^ bitmap(k) with a nonzero
        Cayley coefficient.  Returns (i_of, coeff):
          i_of[j, k]  — the contributing left blade index, (nb, nb) int32
          coeff[j, k] — cayley[i_of[j,k], j, k], (nb, nb) float32
        so that (a * b)_j = sum_k coeff[j,k] * a[i_of[j,k]] * b[k].
        This does nb^2 work instead of the dense nb^3 contraction (8x fewer
        FLOPs for Cl(3), 32x for Cl(5)).
        """
        nb = self.n_blades
        btm = self.bbo.index_to_bitmap
        i_of = np.zeros((nb, nb), dtype=np.int32)
        coeff = np.zeros((nb, nb), dtype=np.float32)
        for j in range(nb):
            for k in range(nb):
                i = int(self.bbo.bitmap_to_index[btm[j] ^ btm[k]])
                i_of[j, k] = i
                coeff[j, k] = self.cayley[i, j, k]
        return i_of, coeff

    def output_blades(self, blades_left, blades_right) -> np.ndarray:
        out = []
        for bl in blades_left:
            for br in blades_right:
                bm, _ = blade_product(
                    int(self.bbo.index_to_bitmap[bl]),
                    int(self.bbo.index_to_bitmap[br]),
                    self.metric,
                )
                out.append(int(self.bbo.bitmap_to_index[bm]))
        return np.asarray(out)

    # -------------------------------------------------------------- reshaping

    def split(self, mv: jnp.ndarray) -> jnp.ndarray:
        """(B, C*n_blades) -> (B, C, n_blades)."""
        return mv.reshape(*mv.shape[:-1], -1, self.n_blades)

    def flatten(self, mv: jnp.ndarray) -> jnp.ndarray:
        """(B, C, n_blades) -> (B, C*n_blades)."""
        return mv.reshape(*mv.shape[:-2], -1)


@functools.lru_cache(maxsize=None)
def get_algebra(metric: tuple) -> CliffordAlgebra:
    """Cached algebra instances keyed by metric tuple."""
    return CliffordAlgebra(metric)
