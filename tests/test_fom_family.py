"""FOM / DIOM / DQGMRES tests (reference test_fom.jl, test_diom.jl,
test_dqgmres.jl patterns)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu import fom, diom, dqgmres, DiagonalOperator

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


@pytest.mark.parametrize("method", [fom, diom, dqgmres],
                         ids=["fom", "diom", "dqgmres"])
class TestFomFamily:
    def test_nonsymmetric_definite(self, method, FC):
        A, b = fx.nonsymmetric_definite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_symmetric_indefinite(self, method, FC):
        # (square_consistent has cond ≈ 4e17; the reference only exercises
        # the truncated methods on well-conditioned fixtures.)
        A, b = fx.symmetric_indefinite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_sparse_laplacian(self, method):
        A, b = fx.sparse_laplacian(8)
        x, stats = method(A, b, memory=30)
        check(A, b, x, stats)

    def test_zero_rhs(self, method, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = method(A, b)
        assert stats.status == "x is a zero-residual solution"

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
        x, stats = method(A, b, x0, memory=40)
        check(A, b, x, stats)

    def test_history(self, method):
        A, b = fx.nonsymmetric_definite()
        x, stats = method(A, b, history=True)
        assert len(stats.residuals) == stats.niter + 1


class TestFomSpecifics:
    def test_restart(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = fom(A, b, memory=10, restart=True)
        check(A, b, x, stats)


class TestTruncatedMemory:
    def test_diom_small_memory(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = diom(A, b, memory=6, itmax=2000)
        check(A, b, x, stats, tol=1e-5)

    def test_dqgmres_small_memory(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = dqgmres(A, b, memory=6, itmax=2000)
        # dqgmres residual estimate lags; check the true residual.
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-4
