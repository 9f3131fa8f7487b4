"""PDE/ODE fixture problems (reference adjoint/poisson test patterns)."""

import numpy as np
import pytest

import fixtures as fx
from krylov_tpu import bilqr, trilqr, diom, dqgmres, minres, gmres, bicgstab
from krylov_tpu.ops.sparse import spmv


class TestAdjointProblems:
    def test_bilqr_ode(self):
        A, b, c = fx.adjoint_ode(50)
        x, y, stats = bilqr(A, b, c)
        assert stats.solved_primal and stats.solved_dual
        assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) <= 1e-8
        assert np.linalg.norm(c - A.T @ np.asarray(y)) / np.linalg.norm(c) <= 1e-8

    def test_trilqr_ode(self):
        A, b, c = fx.adjoint_ode(50)
        x, y, stats = trilqr(A, b, c)
        assert stats.solved_primal and stats.solved_dual
        assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) <= 1e-7

    def test_bilqr_pde(self):
        A, b, c = fx.adjoint_pde(12, 12)
        x, y, stats = bilqr(A, b, c)
        assert stats.solved_primal and stats.solved_dual


class TestPoissonProblems:
    def test_diom_polar(self):
        A, b = fx.polar_poisson(20, 20)
        x, stats = diom(A, b, memory=150)
        r = b - np.asarray(spmv(A, x))
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6

    def test_dqgmres_polar(self):
        A, b = fx.polar_poisson(20, 20)
        x, stats = dqgmres(A, b, memory=150)
        r = b - np.asarray(spmv(A, x))
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6

    def test_minres_cartesian(self):
        A, b = fx.cartesian_poisson(15, 15)
        x, stats = minres(A, b)
        r = b - np.asarray(spmv(A, x))
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-8

    def test_convection_diffusion_gmres_bicgstab(self):
        # BASELINE config #2: nonsymmetric convection-diffusion with
        # Jacobi preconditioner.
        import jax.numpy as jnp
        from krylov_tpu import DiagonalOperator
        A, b, c = fx.adjoint_pde(16, 16)   # convection-dominated PDE
        diag = A.diagonal()
        M = DiagonalOperator(jnp.asarray(1.0 / diag))
        for method in (gmres, bicgstab):
            x, stats = method(A.toarray() if hasattr(A, "toarray") else A,
                              b, M=M)
            r = b - A @ np.asarray(x)
            assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-5
            assert stats.solved
