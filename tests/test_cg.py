"""CG tests mirroring reference test/test_cg.jl."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu import cg, DiagonalOperator
from krylov_tpu.operators import FunctionOperator


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def resid_norm(A, b, x):
    A = np.asarray(A.todense() if hasattr(A, "todense") else A)
    r = np.asarray(b) - A @ np.asarray(x)
    return np.linalg.norm(r) / max(np.linalg.norm(b), 1e-300)


class TestCG:
    def test_symmetric_definite(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = cg(A, b, itmax=10)
        assert resid_norm(A, b, x) <= 1e-6
        assert stats.solved
        assert stats.status == "solution good enough given atol and rtol"

    def test_sparse_laplacian(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = cg(A, b)
        assert resid_norm(A, b, x) <= 1e-6
        assert stats.solved
        assert stats.niter > 0

    def test_history(self):
        A, b = fx.symmetric_definite()
        x, stats = cg(A, b, history=True)
        assert len(stats.residuals) == stats.niter + 1
        assert stats.residuals[-1] <= stats.residuals[0]

    def test_zero_rhs(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        A = A @ A.conj().T + np.eye(10, dtype=FC)  # make it SPD
        x, stats = cg(A, np.zeros(10, dtype=FC))
        assert np.linalg.norm(np.asarray(x)) == 0
        assert stats.status == "x is a zero-residual solution"
        assert stats.niter == 0

    def test_jacobi_preconditioner(self, FC):
        A, b, M_inv = fx.square_preconditioned(FC=FC)
        M = DiagonalOperator(jnp.asarray(np.diag(M_inv)))
        x, stats = cg(A, b, M=M)
        r = np.asarray(b) - A @ np.asarray(x)
        resid = fx.metric(r, M_inv) / fx.metric(b, M_inv)
        assert resid <= 1e-6
        assert stats.solved
        # niter ≤ 1 + count of distinct eigenvalues (here 2)
        assert stats.niter <= 2

    def test_ldiv_mode(self):
        A, b = fx.symmetric_definite(n=50)
        d = jnp.asarray(np.diag(np.asarray(A)))
        M = DiagonalOperator(d)  # solve-mode: applies x/d
        x, stats = cg(A, b, M=M, ldiv=True)
        assert resid_norm(A, b, x) <= 1e-6

    def test_trust_region_boundary(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        radius = 0.75 * float(np.linalg.norm(np.linalg.solve(np.asarray(A), b)))
        x, stats = cg(A, b, radius=radius, itmax=10)
        assert stats.solved
        assert np.isclose(np.linalg.norm(np.asarray(x)), radius, rtol=1e-6)
        assert stats.status == "on trust-region boundary"

    def test_linesearch_npc(self, FC):
        # Indefinite A: CG with linesearch stops at the first iteration
        # (reference test_cg.jl:51-62).
        from krylov_tpu.solvers.cg import _cg_solve
        A, b = fx.symmetric_indefinite(FC=FC, shift=10)
        x, stats, state = _cg_solve(A, b, linesearch=True)
        assert stats.status == "nonpositive curvature"
        assert not stats.inconsistent
        assert stats.niter == 0
        assert stats.indefinite
        assert stats.npc_count == 1
        npc_dir = np.asarray(state.npc_dir)
        assert np.real(np.vdot(npc_dir, np.asarray(A) @ npc_dir)) <= 0
        assert np.allclose(npc_dir, b)
        assert np.allclose(np.asarray(x), b)

    def test_radius_npc(self, FC):
        # radius > 0 and pᵀAp < 0 (reference test_cg.jl:82-96).
        from krylov_tpu.solvers.cg import _cg_solve
        A = np.diag([10.0, 8.0, 5.0, -1.0]).astype(FC)
        b = np.array([1.0, 1.0, 1.0, 0.1], dtype=FC)
        x, stats, state = _cg_solve(A, b, radius=10.0)
        assert stats.npc_count == 1
        assert stats.status == "nonpositive curvature"
        assert stats.indefinite
        npc_dir = np.asarray(state.npc_dir)
        assert np.real(np.vdot(npc_dir, A @ npc_dir)) <= 0.01

    def test_linesearch_conflict(self):
        A, b = fx.symmetric_definite()
        with pytest.raises(ValueError):
            cg(A, b, radius=1.0, linesearch=True)

    def test_singular_consistent(self):
        A, b = fx.singular_consistent()
        x, stats = cg(A, b)
        r = b - A @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6
        assert not stats.inconsistent

    def test_zero_rhs_linesearch(self, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = cg(A, b, linesearch=True)
        assert stats.status == "x is a zero-residual solution"
        assert np.linalg.norm(np.asarray(x)) == 0
        assert stats.niter == 0

    def test_callback_exit(self):
        A, b = fx.symmetric_definite(n=50)

        def cb(state):
            return state.iter >= 3

        x, stats = cg(A, b, callback=cb, rtol=1e-30, atol=1e-30)
        assert stats.status == "user-requested exit"
        assert stats.niter == 3

    def test_itmax(self):
        A, b = fx.sparse_laplacian(8)
        x, stats = cg(A, b, itmax=2, rtol=1e-30, atol=1e-30)
        assert stats.niter == 2
        assert stats.status == "maximum number of iterations exceeded"
        assert not stats.solved

    def test_warm_start(self):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = cg(A, b, x0)
        assert resid_norm(A, b, x) <= 1e-6
        assert stats.solved

    def test_matrix_free(self):
        A, b = fx.symmetric_definite(n=30)
        Aj = jnp.asarray(np.asarray(A))
        op = FunctionOperator(lambda v: Aj @ v, (30, 30), Aj.dtype)
        x, stats = cg(op, b)
        assert resid_norm(A, b, x) <= 1e-6

    def test_reuse_no_recompile(self):
        # The zero-allocation analogue: second solve with the same static
        # config hits the jit cache.
        import jax
        A, b = fx.symmetric_definite(n=40)
        x1, s1 = cg(A, b)
        A2, b2 = fx.symmetric_definite(n=40)
        with jax.log_compiles(False):
            x2, s2 = cg(2.0 * np.asarray(A2), b2)
        assert s2.solved
