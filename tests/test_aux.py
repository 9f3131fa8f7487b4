"""k-ops numerics tests, mirroring reference test/test_aux.jl."""

import numpy as np
import jax.numpy as jnp
import pytest

from krylov_tpu import sym_givens, roots_quadratic, to_boundary


class TestSymGivens:
    def test_real_corner_cases(self):
        c, s, rho = sym_givens(0.0, 0.0)
        assert (c, s, rho) == (1.0, 0.0, 0.0)

        a = 3.14
        c, s, rho = sym_givens(a, 0.0)
        assert (c, s, rho) == (1.0, 0.0, a)
        c, s, rho = sym_givens(-a, 0.0)
        assert (c, s, rho) == (-1.0, 0.0, a)

        b = 3.14
        c, s, rho = sym_givens(0.0, b)
        assert (c, s, rho) == (0.0, 1.0, b)
        c, s, rho = sym_givens(0.0, -b)
        assert (c, s, rho) == (0.0, -1.0, b)

    def test_complex_corner_cases(self):
        z = complex(0.0)
        c, s, rho = sym_givens(z, z)
        assert (c, s, rho) == (1.0, 0.0, 0.0)

        a = 1.0 + 1.0j
        c, s, rho = sym_givens(a, z)
        assert (c, s, rho) == (1.0, 0.0, a)
        c, s, rho = sym_givens(-a, z)
        assert (c, s, rho) == (1.0, 0.0, -a)

        b = 1.0 + 1.0j
        c, s, rho = sym_givens(z, b)
        assert (c, s, rho) == (0.0, 1.0, b)
        c, s, rho = sym_givens(z, -b)
        assert (c, s, rho) == (0.0, 1.0, -b)

    @pytest.mark.parametrize("a,b", [(2.0, 3.0), (-5.0, 0.5), (1e-8, 1e8),
                                     (3.0, 3.0), (1e300, 1e300)])
    def test_real_reflection_property(self, a, b):
        c, s, rho = sym_givens(a, b)
        assert np.isclose(c * a + s * b, rho, rtol=1e-12)
        assert abs(s * a - c * b) <= 1e-12 * abs(float(rho))
        assert np.isclose(c * c + s * s, 1.0, rtol=1e-12)

    @pytest.mark.parametrize(
        "a,b", [(2 + 1j, 3 - 2j), (-5j, 0.5), (1e-8 + 1e-8j, 1e8 - 1j)]
    )
    def test_complex_reflection_property(self, a, b):
        c, s, rho = sym_givens(complex(a), complex(b))
        c, s, rho = complex(c), complex(s), complex(rho)
        assert np.isclose(c * a + s * b, rho, rtol=1e-12)
        assert abs(np.conj(s) * a - c * b) <= 1e-10 * abs(rho)


class TestRootsQuadratic:
    def test_zero_quadratic(self):
        r1, r2 = roots_quadratic(0.0, 0.0, 0.0)
        assert r1 == 0.0 and r2 == 0.0

    def test_linear(self):
        r1, r2 = roots_quadratic(0.0, 3.14, -1.0)
        assert np.isclose(float(r1), 1.0 / 3.14)
        assert r1 == r2

    def test_no_real_roots_linear(self):
        with pytest.raises(ValueError):
            roots_quadratic(0.0, 0.0, 1.0)

    def test_simple_quadratic(self):
        r1, r2 = roots_quadratic(1.0, 0.0, -1.0)
        roots = sorted([float(r1), float(r2)])
        assert np.allclose(roots, [-1.0, 1.0])

    def test_no_real_roots(self):
        with pytest.raises(ValueError):
            roots_quadratic(1.0, 0.0, 1.0)

    def test_ill_conditioned(self):
        # reference test_aux.jl: ill-conditioned quadratic, exact results
        r1, r2 = roots_quadratic(-1.0e-8, 1.0e5, 1.0, nitref=0)
        assert float(r1) == 1.0e13 and float(r2) == 0.0
        # iterative refinement is crucial
        r1, r2 = roots_quadratic(-1.0e-8, 1.0e5, 1.0, nitref=1)
        assert float(r1) == 1.0e13 and float(r2) == -1.0e-05

    def test_not_ill_conditioned(self):
        for nitref in (0, 1):
            r1, r2 = roots_quadratic(-1.0e-7, 1.0, 1.0, nitref=nitref)
            assert np.isclose(float(r1), 1.0e7, rtol=1e-6)
            assert np.isclose(float(r2), -1.0, rtol=1e-6)

    def test_two_roots(self):
        r1, r2 = roots_quadratic(1.0, 3.0, 2.0)
        assert np.isclose(float(r1), -2.0) and np.isclose(float(r2), -1.0)

    def test_no_real_roots_large_coeff(self):
        with pytest.raises(ValueError):
            roots_quadratic(1.0e8, 1.0, 1.0)


class TestToBoundary:
    def test_euclidean(self):
        n = 5
        x = jnp.zeros(n, dtype=jnp.float64)
        d = jnp.ones(n, dtype=jnp.float64)
        s1, s2 = to_boundary(x, d, 2.0)
        sigma = max(float(s1), float(s2))
        assert np.isclose(np.linalg.norm(np.asarray(x + sigma * d)), 2.0)

    def test_from_interior(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(8) * 0.1)
        d = jnp.asarray(rng.standard_normal(8))
        s1, s2 = to_boundary(x, d, 3.0)
        for s in (float(s1), float(s2)):
            assert np.isclose(np.linalg.norm(np.asarray(x + s * d)), 3.0, rtol=1e-8)


class TestCompensatedDot:
    """Dot2 kernels: fp64-grade accuracy from fp32 arithmetic."""

    def test_random_accuracy(self):
        import jax.numpy as jnp
        from krylov_tpu.ops.kops import kdotr2
        rng = np.random.default_rng(0)
        n = 50000
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        exact = float(np.dot(np.asarray(x, np.float64),
                             np.asarray(y, np.float64)))
        naive = float(jnp.dot(x, y))
        comp = float(kdotr2(x, y))
        # compensated must sit at the f32 representation floor,
        # at least 10x better than the naive accumulation
        assert abs(comp - exact) <= max(abs(naive - exact) / 10,
                                        2e-7 * abs(exact))

    def test_cancellation(self):
        import jax.numpy as jnp
        from krylov_tpu.ops.kops import kdotr2
        rng = np.random.default_rng(1)
        big = jnp.asarray(np.r_[1e8 * np.ones(512),
                                rng.standard_normal(512)], jnp.float32)
        w = jnp.asarray(np.r_[np.ones(512),
                              rng.standard_normal(512)], jnp.float32)
        x = jnp.concatenate([big, -big])
        y = jnp.concatenate([w, w])
        exact = float(np.dot(np.asarray(x, np.float64),
                             np.asarray(y, np.float64)))
        comp = float(kdotr2(x, y))
        naive = float(jnp.dot(x, y))
        assert abs(comp - exact) < 1.0       # eps^2-grade absolute error
        assert abs(naive - exact) > 100.0    # naive is catastrophically off

    def test_knorm2(self):
        import jax.numpy as jnp
        from krylov_tpu.ops.kops import knorm2
        x = jnp.asarray(np.random.default_rng(2).standard_normal(10000),
                        jnp.float32)
        exact = np.linalg.norm(np.asarray(x, np.float64))
        assert abs(float(knorm2(x)) - exact) <= 2e-7 * exact
