"""GMRES/FGMRES tests mirroring reference test/test_gmres.jl, test_fgmres.jl."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu.solvers.gmres import gmres, fgmres
from krylov_tpu import DiagonalOperator

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


@pytest.mark.parametrize("method", [gmres, fgmres], ids=["gmres", "fgmres"])
class TestGmres:
    def test_nonsymmetric_definite(self, method, FC):
        A, b = fx.nonsymmetric_definite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_nonsymmetric_indefinite(self, method, FC):
        A, b = fx.nonsymmetric_indefinite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_square_consistent(self, method, FC):
        A, b = fx.square_consistent(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_sparse_laplacian(self, method):
        A, b = fx.sparse_laplacian(8)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_zero_rhs(self, method, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = method(A, b)
        assert stats.status == "x is a zero-residual solution"
        assert stats.niter == 0

    def test_restart(self, method):
        A, b = fx.sparse_laplacian(8)
        x, stats = method(A, b, memory=8, restart=True)
        check(A, b, x, stats)

    def test_preconditioners(self, method, FC):
        A, b, M_inv, N_inv = fx.two_preconditioners(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        N = DiagonalOperator(jnp.asarray(np.diag(N_inv)))
        x, stats = method(A, b, M=M, N=N)
        r = np.asarray(b) - _dense(A) @ np.asarray(x)
        assert np.linalg.norm(M_inv @ r) <= TOL * np.linalg.norm(M_inv @ np.asarray(b))
        assert stats.solved

    def test_warm_start(self, method):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = method(A, b, x0)
        check(A, b, x, stats)

    def test_warm_start_restart(self, method):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = method(A, b, x0, memory=10, restart=True)
        check(A, b, x, stats)

    def test_history(self, method):
        A, b = fx.nonsymmetric_definite()
        x, stats = method(A, b, history=True)
        assert len(stats.residuals) == stats.niter + 1

    def test_reorthogonalization(self, method):
        A, b = fx.kron_unsymmetric(4)
        x, stats = method(A, b, reorthogonalization=True)
        check(A, b, x, stats)

    def test_itmax(self, method):
        A, b = fx.sparse_laplacian(8)
        x, stats = method(A, b, itmax=3, rtol=1e-30, atol=1e-30)
        assert stats.niter == 3
        assert stats.status == "maximum number of iterations exceeded"


class TestGmresSpecifics:
    def test_square_inconsistent(self):
        A, b = fx.square_inconsistent()
        x, stats = gmres(A, b)
        assert stats.inconsistent
        assert stats.status == "found approximate least-squares solution"

    def test_callback(self):
        A, b = fx.sparse_laplacian(8)

        def cb(state):
            return state.iter >= 4

        x, stats = gmres(A, b, callback=cb, rtol=1e-30, atol=1e-30)
        assert stats.status == "user-requested exit"
        assert stats.niter == 4

    def test_callback_sees_pass_boundary_x(self):
        # At a restart boundary the callback must observe the
        # POST-epilogue state (x updated from the finished pass,
        # rNorm = true restarted residual) — the single-loop-formulation
        # order, regression for the two-level-loop restructure.
        A, b = fx.sparse_laplacian(8)
        Ad = np.zeros((0,))
        bn = np.linalg.norm(np.asarray(b))
        tol = 1e-6

        def cb(state):
            # state.x is only nonzero after a pass epilogue has run;
            # exit as soon as the M-residual estimate carried in rNorm
            # (exact at a fresh restart) crosses tol.
            return state.rNorm <= tol * bn

        x, stats = gmres(A, b, memory=5, restart=True, callback=cb,
                         rtol=1e-30, atol=1e-30)
        assert stats.status == "user-requested exit"
        # The exit must happen AT a pass boundary (epilogue state), so
        # the returned x already satisfies the tolerance.
        from krylov_tpu.ops.sparse import spmv
        r = np.asarray(b) - np.asarray(spmv(A, x))
        assert np.linalg.norm(r) <= 5 * tol * bn
        assert stats.niter % 5 == 0  # fired on a boundary iteration

    def test_fgmres_variable_preconditioner(self):
        # FGMRES tolerates a (fixed here) nonlinear right preconditioner.
        from krylov_tpu.operators import FunctionOperator
        A, b = fx.nonsymmetric_definite(n=20)
        Ad = jnp.asarray(np.asarray(A))
        d = jnp.asarray(1.0 / np.diag(np.asarray(A)))
        Nop = FunctionOperator(lambda v: d * v, (20, 20), Ad.dtype)
        x, stats = fgmres(A, b, N=Nop)
        check(A, b, x, stats)
