"""CGS / BiCGSTAB tests (reference test_cgs.jl, test_bicgstab.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu import cgs, bicgstab, DiagonalOperator

TOL = 1.0e-6


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def _dense(A):
    return np.asarray(A.todense() if hasattr(A, "todense") else A)


def check(A, b, x, stats, tol=TOL):
    r = np.asarray(b) - _dense(A) @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) <= tol
    assert stats.solved


@pytest.mark.parametrize("method", [cgs, bicgstab], ids=["cgs", "bicgstab"])
class TestBiortho:
    def test_nonsymmetric_definite(self, method, FC):
        A, b = fx.nonsymmetric_definite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_kron_unsymmetric(self, method):
        A, b = fx.kron_unsymmetric(4)
        x, stats = method(A, b)
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-4
        assert stats.solved

    def test_sparse_laplacian(self, method):
        A, b = fx.sparse_laplacian(8)
        x, stats = method(A, b)
        check(A, b, x, stats, tol=1e-5)

    def test_zero_rhs(self, method, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = method(A, b)
        assert stats.status == "x is a zero-residual solution"

    def test_shadow_breakdown(self, method):
        A, b = fx.nonsymmetric_definite()
        c = np.zeros(10)
        x, stats = method(A, b, c=c)
        assert stats.status == "Breakdown bᴴc = 0"
        assert stats.niter == 0

    def test_preconditioners(self, method, FC):
        A, b, M_inv, N_inv = fx.two_preconditioners(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        N = DiagonalOperator(jnp.asarray(np.diag(N_inv)))
        x, stats = method(A, b, M=M, N=N)
        assert stats.solved
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert np.linalg.norm(M_inv @ r) <= 100 * TOL * np.linalg.norm(b)

    def test_warm_start(self, method):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = method(A, b, x0)
        check(A, b, x, stats, tol=1e-5)

    def test_history_callback(self, method):
        A, b = fx.nonsymmetric_definite(n=30)
        x, stats = method(A, b, history=True)
        assert len(stats.residuals) == stats.niter + 1

        def cb(state):
            return state.iter >= 2

        x, stats = method(A, b, callback=cb, rtol=1e-30, atol=1e-30)
        assert stats.status == "user-requested exit"
        assert stats.niter == 2
