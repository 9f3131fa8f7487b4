"""CR / CAR / CG-LANCZOS / CG-LANCZOS-SHIFT tests (reference test_cr.jl,
test_car.jl, test_cg_lanczos.jl, test_cg_lanczos_shift.jl patterns)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu import cr, car, cg_lanczos, cg_lanczos_shift, DiagonalOperator

TOL = 1.0e-6


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def _dense(A):
    return np.asarray(A.todense() if hasattr(A, "todense") else A)


def check_resid(A, b, x, stats, tol=TOL):
    r = np.asarray(b) - _dense(A) @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) <= tol
    assert stats.solved


class TestCR:
    def test_symmetric_definite(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = cr(A, b)
        check_resid(A, b, x, stats)
        assert stats.status == "solution good enough given atol and rtol"

    def test_sparse_laplacian(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = cr(A, b)
        check_resid(A, b, x, stats)

    def test_preconditioned(self, FC):
        A, b, M_inv = fx.square_preconditioned(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        # rtol slightly above the default: CR's preconditioned residual
        # recurrence plateaus within 0.3% of √eps·‖r₀‖ on this problem.
        x, stats = cr(A, b, M=M, rtol=5e-8)
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        resid = fx.metric(r, M_inv) / fx.metric(b, M_inv)
        assert resid <= TOL
        assert stats.solved

    def test_zero_rhs(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = cr(A, np.zeros(10, dtype=FC))
        assert stats.status == "x is a zero-residual solution"
        assert stats.niter == 0

    def test_trust_region(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        radius = 0.75 * float(np.linalg.norm(np.linalg.solve(_dense(A), b)))
        x, stats = cr(A, b, radius=radius, itmax=10)
        assert stats.solved
        assert np.linalg.norm(np.asarray(x)) <= radius * (1 + 1e-6)

    def test_linesearch_indefinite(self, FC):
        from krylov_tpu.solvers.cr import _cr_solve
        A, b = fx.symmetric_indefinite(FC=FC, shift=10)
        x, stats, state = _cr_solve(A, b, linesearch=True)
        assert stats.status == "nonpositive curvature"
        assert stats.indefinite
        assert stats.niter == 0

    def test_indefinite_error(self):
        A, b = fx.symmetric_indefinite(shift=10)
        with pytest.raises(ValueError, match="Indefinite system"):
            cr(A, b)

    def test_warm_start(self):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = cr(A, b, x0)
        check_resid(A, b, x, stats)

    def test_history(self):
        A, b = fx.symmetric_definite()
        x, stats = cr(A, b, history=True)
        assert len(stats.residuals) == stats.niter + 1
        assert len(stats.Aresiduals) >= stats.niter


class TestCAR:
    def test_symmetric_definite(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = car(A, b)
        check_resid(A, b, x, stats)

    def test_sparse_laplacian(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = car(A, b)
        check_resid(A, b, x, stats)

    def test_preconditioned(self, FC):
        A, b, M_inv = fx.square_preconditioned(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        x, stats = car(A, b, M=M)
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert fx.metric(r, M_inv) / fx.metric(b, M_inv) <= TOL

    def test_zero_rhs(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = car(A, np.zeros(10, dtype=FC))
        assert stats.status == "x is a zero-residual solution"

    def test_warm_start(self):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = car(A, b, x0)
        check_resid(A, b, x, stats)


class TestCgLanczos:
    def test_symmetric_definite(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = cg_lanczos(A, b)
        check_resid(A, b, x, stats)
        assert stats.Anorm > 0

    def test_sparse_laplacian(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = cg_lanczos(A, b)
        check_resid(A, b, x, stats)

    def test_check_curvature(self, FC):
        A, b = fx.symmetric_indefinite(FC=FC)
        x, stats = cg_lanczos(A, b, check_curvature=True)
        assert stats.indefinite
        assert stats.status == "negative curvature"

    def test_zero_rhs(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = cg_lanczos(A, np.zeros(10, dtype=FC))
        assert stats.status == "x is a zero-residual solution"

    def test_preconditioned(self, FC):
        A, b, M_inv = fx.square_preconditioned(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        x, stats = cg_lanczos(A, b, M=M)
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert fx.metric(r, M_inv) / fx.metric(b, M_inv) <= TOL

    def test_matches_cg(self):
        from krylov_tpu import cg
        A, b = fx.sparse_laplacian(8)
        x1, s1 = cg_lanczos(A, b)
        x2, s2 = cg(A, b)
        assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


class TestCgLanczosShift:
    def test_multiple_shifts(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        shifts = [1.0, 2.0, 5.0]
        X, stats = cg_lanczos_shift(A, b, shifts)
        assert stats.solved
        Ad = _dense(A)
        for i, s in enumerate(shifts):
            r = np.asarray(b) - (Ad + s * np.eye(10)) @ np.asarray(X[i])
            assert np.linalg.norm(r) / np.linalg.norm(b) <= TOL

    def test_negative_shifts_curvature(self):
        A, b = fx.symmetric_definite()
        shifts = [-4.0, 1.0]   # -4 makes A+σI indefinite (diag 4, eigs > 0)
        X, stats = cg_lanczos_shift(A, b, shifts, check_curvature=True)
        assert np.asarray(stats.indefinite).shape == (2,)

    def test_history(self):
        A, b = fx.symmetric_definite()
        shifts = [0.0, 3.0]
        X, stats = cg_lanczos_shift(A, b, shifts, history=True)
        assert len(stats.residuals) == 2
        assert all(len(h) > 0 for h in stats.residuals)

    def test_zero_rhs(self):
        A, _ = fx.symmetric_definite()
        X, stats = cg_lanczos_shift(A, np.zeros(10), [1.0, 2.0])
        assert stats.status == "x is a zero-residual solution"
