"""Algebra-core unit tests: golden Cayley tables, algebraic identities,
versor machinery (SURVEY.md §4 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmpn_tpu.algebra import BladeOrder, CliffordAlgebra, cayley_table


def geometric_product_dense(algebra, a, b):
    """Reference-style dense Cayley contraction, used to validate the
    optimized paths (b/q/norm shortcuts)."""
    cayley = jnp.asarray(algebra.cayley)
    return jnp.einsum("...i,ijk,...k->...j", a, cayley, b)


class TestBladeOrder:
    def test_shortlex_cl3(self):
        bbo = BladeOrder(3)
        # 1, e1, e2, e3, e12, e13, e23, e123
        assert list(bbo.index_to_bitmap) == [0, 1, 2, 4, 3, 5, 6, 7]
        assert list(bbo.grades) == [0, 1, 1, 1, 2, 2, 2, 3]

    def test_shortlex_cl5_grades(self):
        bbo = BladeOrder(5)
        counts = np.bincount(bbo.grades)
        assert list(counts) == [1, 5, 10, 10, 5, 1]
        # bitmap_to_index inverts index_to_bitmap
        assert (bbo.bitmap_to_index[bbo.index_to_bitmap] == np.arange(32)).all()


class TestCayley:
    def test_cl2_golden(self):
        """Cl(2,0) is well known: e1e1=e2e2=1, e12 e12 = -1 (complex-like
        even subalgebra)."""
        alg = CliffordAlgebra((1.0, 1.0))
        C = alg.cayley  # (i, j, k): blade_i * blade_k -> blade_j
        # order: 1, e1, e2, e12
        e1, e2, e12 = 1, 2, 3
        assert C[e1, 0, e1] == 1.0
        assert C[e2, 0, e2] == 1.0
        assert C[e12, 0, e12] == -1.0
        assert C[e1, e12, e2] == 1.0   # e1 e2 = e12
        assert C[e2, e12, e1] == -1.0  # e2 e1 = -e12
        assert C[e1, e2, e12] == 1.0   # e1 e12 = e2
        assert C[e12, e2, e1] == -1.0  # e12 e1 = -e2

    def test_cl3_quaternion_structure(self):
        """The even subalgebra of Cl(3,0) is the quaternions:
        (e12)(e13) ... check bivector products."""
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        # order: 1 e1 e2 e3 e12 e13 e23 e123
        e12, e13, e23 = 4, 5, 6
        C = alg.cayley
        assert C[e12, 0, e12] == -1.0
        assert C[e13, 0, e13] == -1.0
        assert C[e23, 0, e23] == -1.0
        # e12 * e13 = e1 e2 e1 e3 = -e2 e3 = -e23
        assert C[e12, e23, e13] == -1.0
        # e13 * e12 = e23
        assert C[e13, e23, e12] == 1.0

    def test_metric_signs(self):
        """Cl(1,1)-style metric (1, -1): e2 e2 = -1."""
        alg = CliffordAlgebra((1.0, -1.0))
        C = alg.cayley
        assert C[1, 0, 1] == 1.0
        assert C[2, 0, 2] == -1.0

    @pytest.mark.parametrize("metric", [(1.0,) * 2, (1.0,) * 3, (1.0,) * 5])
    def test_associativity(self, metric):
        alg = CliffordAlgebra(metric)
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.randn(4, alg.n_blades), dtype=jnp.float32)
        b = jnp.asarray(rng.randn(4, alg.n_blades), dtype=jnp.float32)
        c = jnp.asarray(rng.randn(4, alg.n_blades), dtype=jnp.float32)
        gp = alg.geometric_product
        left = gp(gp(a, b), c)
        right = gp(a, gp(b, c))
        np.testing.assert_allclose(left, right, rtol=1e-4, atol=1e-4)

    def test_vector_square_is_metric_norm(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        v = alg.embed_grade(jnp.asarray([[1.0, 2.0, 3.0]]), 1)
        sq = alg.geometric_product(v, v)
        np.testing.assert_allclose(sq[0, 0], 14.0, rtol=1e-6)
        np.testing.assert_allclose(sq[0, 1:], 0.0, atol=1e-6)


class TestQuadraticForms:
    @pytest.mark.parametrize("metric", [(1.0, 1.0), (1.0, 1.0, 1.0), (1.0,) * 5])
    def test_b_matches_dense(self, metric):
        alg = CliffordAlgebra(metric)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(8, alg.n_blades), dtype=jnp.float32)
        y = jnp.asarray(rng.randn(8, alg.n_blades), dtype=jnp.float32)
        dense = geometric_product_dense(alg, alg.beta(x), y)[..., :1]
        np.testing.assert_allclose(alg.b(x, y), dense, rtol=1e-5, atol=1e-5)

    def test_qs_cat_matches_list(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        x = jnp.asarray(np.random.RandomState(3).randn(4, 7, alg.n_blades), dtype=jnp.float32)
        cat = alg.qs_cat(x)
        lst = jnp.concatenate(alg.qs(x), axis=-1)
        np.testing.assert_allclose(cat, lst, rtol=1e-5, atol=1e-6)

    def test_norms_euclidean(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        v = alg.embed_grade(jnp.asarray([[3.0, 4.0, 0.0]]), 1)
        n = alg.norms(v, grades=[1])[0]
        np.testing.assert_allclose(n, 5.0, rtol=1e-4)

    def test_expand_per_grade(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        pg = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
        out = alg.expand_per_grade(pg)
        np.testing.assert_allclose(
            out[0], [10, 20, 20, 20, 30, 30, 30, 40])


class TestVersors:
    @pytest.mark.parametrize("metric", [(1.0, 1.0), (1.0, 1.0, 1.0)])
    def test_rotor_preserves_grade_and_norm(self, metric):
        alg = CliffordAlgebra(metric)
        w = alg.versor(jax.random.PRNGKey(7))
        v = alg.embed_grade(
            jnp.asarray(np.random.RandomState(42).randn(5, alg.dim),
                        dtype=jnp.float32), 1)
        rv = alg.rho(w, v)
        # grade-1 stays grade-1
        mask = np.ones(alg.n_blades, bool)
        mask[alg.grade_to_slice[1]] = False
        np.testing.assert_allclose(np.asarray(rv)[:, mask], 0.0, atol=1e-4)
        # norm preserved (orthogonal action)
        np.testing.assert_allclose(
            alg.norm(rv), alg.norm(v), rtol=1e-4, atol=1e-5)

    def test_rho_is_algebra_homomorphism(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        w = alg.versor(jax.random.PRNGKey(11))
        rng = np.random.RandomState(12)
        a = jnp.asarray(rng.randn(3, alg.n_blades), dtype=jnp.float32)
        b = jnp.asarray(rng.randn(3, alg.n_blades), dtype=jnp.float32)
        lhs = alg.rho(w, alg.geometric_product(a, b))
        # twisted conjugation of a full (inhomogeneous) multivector is not
        # rho; use plain sandwich conjugation for the homomorphism property
        conj = lambda x: alg.sandwich(w, x, alg.inverse(w))
        rhs = alg.geometric_product(conj(a), conj(b))
        np.testing.assert_allclose(
            conj(alg.geometric_product(a, b)), rhs, rtol=2e-3, atol=2e-3)

    def test_product_paths_cl3(self):
        alg = CliffordAlgebra((1.0, 1.0, 1.0))
        paths = alg.geometric_product_paths
        assert paths.shape == (4, 4, 4)
        # scalar * scalar -> scalar only
        assert paths[0, 0, 0]
        assert not paths[0, 1, 0]
        # vector * vector -> scalar + bivector
        assert paths[1, 0, 1] and paths[1, 2, 1]
        assert not paths[1, 1, 1]
        # known count for Cl(3,0): 20 nonzero grade triples
        assert paths.sum() == 20

    def test_split_flatten_roundtrip(self):
        alg = CliffordAlgebra((1.0, 1.0))
        x = jnp.asarray(np.random.RandomState(5).randn(6, 3, 4), dtype=jnp.float32)
        np.testing.assert_array_equal(alg.split(alg.flatten(x)), x)
