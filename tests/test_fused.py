"""Whole-solve fused Pallas CG kernel (ops/pallas_fused.py).

Validates interpret-mode semantics against the general while_loop core;
one real-TPU run is part of bench.py (CLAUDE.md: interpret mode does not
validate Mosaic constraints).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from krylov_tpu import cg
from krylov_tpu.operators import DIAOperator
from krylov_tpu.ops.dia import poisson_dia
from krylov_tpu.ops.pallas_dia import dia_align
from krylov_tpu.ops.pallas_fused import cg_dia_fused, cg_dia_fused_supported


def _problem(N=8, dtype=np.float32):
    n = N ** 3
    D = poisson_dia(N, N, N, dtype=dtype)
    pd = dia_align(D.data, D.offsets, n)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    return D, pd, b, n


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_matches_general(dtype):
    D, pd, b, n = _problem(dtype=dtype)
    x, niter, rnorm, status, _ = cg_dia_fused(
        pd, D.offsets, b, 0.0, 1e-6, 2 * n, interpret=True)
    op = DIAOperator(D, use_pallas=False)
    xr, stats = cg(op, b, atol=0.0, rtol=1e-6)
    assert int(niter) == stats.niter
    assert int(status) == 1
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))
    r = b - op.matvec(x)
    assert float(jnp.linalg.norm(r)) <= 1e-6 * float(jnp.linalg.norm(b)) * 1.01


def test_fused_zero_rhs():
    D, pd, b, n = _problem()
    b0 = jnp.zeros(n, np.float32)
    x, niter, rnorm, status, _ = cg_dia_fused(
        pd, D.offsets, b0, 0.0, 1e-6, 2 * n, interpret=True)
    assert int(niter) == 0
    assert int(status) == 2          # ZERO_RESIDUAL
    assert float(jnp.linalg.norm(x)) == 0.0


def test_fused_itmax_cap():
    D, pd, b, n = _problem()
    x, niter, rnorm, status, _ = cg_dia_fused(
        pd, D.offsets, b, 0.0, 1e-12, 3, interpret=True)
    assert int(niter) == 3
    assert int(status) == 0          # RUNNING → host maps to TIRED


def test_cg_routes_to_fused_path():
    """cg() on a pallas DIAOperator (default config) uses the fused kernel."""
    D, pd, b, n = _problem()
    op = DIAOperator(D, use_pallas=True)
    assert cg_dia_fused_supported(D.offsets, n, b.dtype)
    x, stats = cg(op, b, atol=0.0, rtol=1e-6)
    op_ref = DIAOperator(D, use_pallas=False)
    xr, stats_ref = cg(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.solved and stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_cg_fused_warm_start():
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x1, _ = cg(op, b, atol=0.0, rtol=1e-3)
    x2, stats2 = cg(op, b, x1, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.1


def test_cg_history_falls_back_to_general():
    """history=True is general-path only; result still correct."""
    D, pd, b, n = _problem()
    op = DIAOperator(D, use_pallas=True)
    x, stats = cg(op, b, atol=0.0, rtol=1e-6, history=True)
    assert stats.residuals.shape[0] == stats.niter + 1


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_minres_matches_general(dtype):
    from krylov_tpu import minres
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = minres(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = minres(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_minres_lambda_shift():
    from krylov_tpu import minres
    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = minres(op_fast, b, lam=0.5, atol=0.0, rtol=1e-8)
    xr, stats_ref = minres(op_ref, b, lam=0.5, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_fused_minres_zero_rhs():
    from krylov_tpu import minres
    D, pd, b, n = _problem()
    op = DIAOperator(D, use_pallas=True)
    x, stats = minres(op, jnp.zeros(n, np.float32))
    assert stats.niter == 1           # reference parity src/minres.jl:219
    assert stats.status == "x is a zero-residual solution"


def test_fused_minres_warm_start():
    from krylov_tpu import minres
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x1, _ = minres(op, b, atol=0.0, rtol=1e-3)
    x2, stats = minres(op, b, x1, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.1


def test_cg_fused_jacobi_precond():
    """Diagonal M routes through the fused kernel and matches general."""
    from krylov_tpu.operators import DiagonalOperator
    D, pd, b, n = _problem(dtype=np.float64)
    # variable diagonal makes Jacobi non-trivial
    data = np.asarray(D.data).copy()
    zi = list(D.offsets).index(0)
    data[zi] = 6.0 + 0.5 * np.sin(np.arange(n))
    D2 = type(D)(jnp.asarray(data), D.offsets, D.shape)
    M = DiagonalOperator(jnp.asarray(1.0 / data[zi]))
    op_fast = DIAOperator(D2, use_pallas=True)
    op_ref = DIAOperator(D2, use_pallas=False)
    x, stats = cg(op_fast, b, M=M, atol=0.0, rtol=1e-8)
    xr, stats_ref = cg(op_ref, b, M=M, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


@pytest.mark.parametrize("degree", [1, 2, 6])
def test_cg_fused_cheby_precond(degree):
    """ChebyshevPreconditioner in the same DIA operator routes to the
    in-kernel-polynomial fused kernel and matches the general core."""
    from krylov_tpu import ChebyshevPreconditioner

    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    MF = ChebyshevPreconditioner(op_fast, degree=degree, lmin=0.4, lmax=12.2)
    MR = ChebyshevPreconditioner(op_ref, degree=degree, lmin=0.4, lmax=12.2)
    x, stats = cg(op_fast, b, M=MF, atol=0.0, rtol=1e-8)
    xr, stats_ref = cg(op_ref, b, M=MR, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))
    if degree > 1:
        x0, stats0 = cg(op_ref, b, atol=0.0, rtol=1e-8)
        assert stats.niter < stats0.niter


def test_cg_fused_cheby_foreign_operator_falls_back():
    """A Chebyshev preconditioner built on a DIFFERENT operator must not
    route to the fused kernel (its polynomial applies the wrong A)."""
    from krylov_tpu import ChebyshevPreconditioner

    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_other = DIAOperator(D, use_pallas=False)
    M = ChebyshevPreconditioner(op_other, degree=4, lmin=0.4, lmax=12.2)
    x, stats = cg(op_fast, b, M=M, atol=0.0, rtol=1e-8)
    r = b - op_other.matvec(x)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.1


def test_cg_fused_cheby_zero_rhs():
    from krylov_tpu import ChebyshevPreconditioner

    D, pd, b, n = _problem()
    op = DIAOperator(D, use_pallas=True)
    M = ChebyshevPreconditioner(op, degree=4, lmin=0.4, lmax=12.2)
    x, stats = cg(op, jnp.zeros(n, np.float32), M=M, atol=0.0, rtol=1e-6)
    assert stats.niter == 0
    assert float(jnp.linalg.norm(x)) == 0.0


class TestFusedBlockGmres:
    """Whole-solve fused block-GMRES vs the general block core."""

    def _problem(self, N=10, p=3, dtype=np.float64, shift=0.5):
        from krylov_tpu.ops.dia import DIAMatrix
        D = poisson_dia(N, N, N, dtype=dtype)
        D = DIAMatrix(D.data.at[3].add(shift), D.offsets, D.shape)
        n = D.shape[0]
        B = jnp.asarray(
            np.random.default_rng(3).standard_normal((n, p)), dtype)
        return D, B, n

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_matches_general_with_restart(self, dtype):
        from krylov_tpu import block_gmres
        D, B, n = self._problem(dtype=dtype)
        rtol = 1e-6 if dtype == np.float32 else 1e-10
        kw = dict(memory=12, restart=True, atol=0.0, rtol=rtol)
        Xf, stf = block_gmres(DIAOperator(D, use_pallas=True), B, **kw)
        op_ref = DIAOperator(D, use_pallas=False)
        Xr, sr = block_gmres(op_ref, B, **kw)
        assert sr.niter > 12          # restart actually exercised
        assert abs(stf.niter - sr.niter) <= 2
        assert stf.status == sr.status
        R = B - op_ref.matmat(Xf)
        assert float(jnp.linalg.norm(R)) <= rtol * float(
            jnp.linalg.norm(B)) * 1.05

    def test_zero_rhs_and_itmax(self):
        from krylov_tpu import block_gmres
        D, B, n = self._problem()
        op = DIAOperator(D, use_pallas=True)
        X0_, st0 = block_gmres(op, jnp.zeros_like(B), memory=8)
        assert st0.niter == 0 and float(jnp.linalg.norm(X0_)) == 0.0
        _, stc = block_gmres(op, B, memory=8, restart=True, itmax=3,
                             atol=0.0, rtol=1e-14)
        assert stc.niter == 3
        assert stc.status == "maximum number of iterations exceeded"

    def test_warm_start(self):
        from krylov_tpu import block_gmres
        D, B, n = self._problem()
        op = DIAOperator(D, use_pallas=True)
        op_ref = DIAOperator(D, use_pallas=False)
        Xr, _ = block_gmres(op_ref, B, memory=12, restart=True, atol=0.0,
                            rtol=1e-10)
        Xw, stw = block_gmres(op, B, X0=0.5 * Xr, memory=12, restart=True,
                              atol=0.0, rtol=1e-10)
        R = B - op_ref.matmat(Xw)
        assert float(jnp.linalg.norm(R)) <= 1e-9 * float(jnp.linalg.norm(B))

    def test_general_path_when_preconditioned(self):
        from krylov_tpu import block_gmres
        from krylov_tpu.operators import DiagonalOperator
        D, B, n = self._problem()
        op = DIAOperator(D, use_pallas=True)
        M = DiagonalOperator(jnp.full(n, 1.0 / 6.5))
        X, st = block_gmres(op, B, M=M, memory=12, restart=True, atol=0.0,
                            rtol=1e-10)
        R = B - DIAOperator(D, use_pallas=False).matmat(X)
        assert float(jnp.linalg.norm(R)) <= 1e-9 * float(jnp.linalg.norm(B))


class TestCompressedBasisGmres:
    """bf16 Krylov panel, f32 arithmetic (arxiv.org/abs/2009.12101)."""

    def _problem(self, N=14):
        from krylov_tpu.ops.dia import convdiff_dia
        D = convdiff_dia(N, N, N, pe=0.3, dtype=np.float32)
        n = D.shape[0]
        return D, jnp.ones(n, np.float32), n

    def test_converges_with_modest_iteration_inflation(self):
        from krylov_tpu import gmres
        D, b, n = self._problem()
        opF = DIAOperator(D, use_pallas=True)
        op_ref = DIAOperator(D, use_pallas=False)
        x32, st32 = gmres(opF, b, memory=20, restart=True, atol=0.0,
                          rtol=1e-6)
        xbf, stbf = gmres(opF, b, memory=20, restart=True, atol=0.0,
                          rtol=1e-6, basis_dtype=jnp.bfloat16)
        assert stbf.solved
        assert stbf.niter <= int(1.5 * st32.niter) + 5
        rbf = float(jnp.linalg.norm(b - op_ref.matvec(xbf)))
        r32 = float(jnp.linalg.norm(b - op_ref.matvec(x32)))
        assert rbf <= 5 * r32 + 1e-5 * float(jnp.linalg.norm(b))

    def test_gate_admits_larger_problems(self):
        from krylov_tpu.ops.pallas_fused import gmres_dia_fused_supported
        D, b, n = self._problem()
        # a mem too large for the f32 gate at some n fits compressed
        n_big = 96 ** 3
        assert not gmres_dia_fused_supported(
            D.offsets, n_big, jnp.float32, 20)
        assert gmres_dia_fused_supported(
            D.offsets, n_big, jnp.float32, 20, basis_dtype=jnp.bfloat16)

    def test_unroutable_config_raises(self):
        from krylov_tpu import gmres
        with pytest.raises(ValueError, match="fused-path feature"):
            gmres(np.eye(8), np.ones(8), basis_dtype=jnp.bfloat16)

    def test_block_gmres_compressed_basis(self):
        from krylov_tpu import block_gmres
        from krylov_tpu.ops.dia import DIAMatrix
        D = poisson_dia(10, 10, 10, dtype=np.float32)
        D = DIAMatrix(D.data.at[3].add(0.5), D.offsets, D.shape)
        n = D.shape[0]
        B = jnp.asarray(
            np.random.default_rng(3).standard_normal((n, 3)), np.float32)
        opF = DIAOperator(D, use_pallas=True)
        op_ref = DIAOperator(D, use_pallas=False)
        X32, st32 = block_gmres(opF, B, memory=12, restart=True, atol=0.0,
                                rtol=1e-5)
        Xbf, stbf = block_gmres(opF, B, memory=12, restart=True, atol=0.0,
                                rtol=1e-5, basis_dtype=jnp.bfloat16)
        assert stbf.solved
        assert stbf.niter <= int(1.5 * st32.niter) + 5
        Rbf = B - op_ref.matmat(Xbf)
        assert float(jnp.linalg.norm(Rbf)) <= 5e-5 * float(
            jnp.linalg.norm(B))
        with pytest.raises(ValueError, match="fused-path feature"):
            block_gmres(op_ref, B, basis_dtype=jnp.bfloat16)


class TestFusedBlockMinres:
    """Whole-solve fused block-MINRES vs the general O(1) block core."""

    def _problem(self, N=10, p=4, dtype=np.float64, shift=0.0):
        from krylov_tpu.ops.dia import DIAMatrix
        D = poisson_dia(N, N, N, dtype=dtype)
        if shift:
            D = DIAMatrix(D.data.at[3].add(shift), D.offsets, D.shape)
        n = D.shape[0]
        B = jnp.asarray(
            np.random.default_rng(3).standard_normal((n, p)), dtype)
        return D, B, n

    @pytest.mark.parametrize("shift", [0.0, -1.5],
                             ids=["spd", "indefinite"])
    def test_matches_general(self, shift):
        from krylov_tpu import block_minres
        D, B, n = self._problem(shift=shift)
        kw = dict(atol=0.0, rtol=1e-10)
        Xf, stf = block_minres(DIAOperator(D, use_pallas=True), B, **kw)
        op_ref = DIAOperator(D, use_pallas=False)
        Xr, sr = block_minres(op_ref, B, **kw)
        assert abs(stf.niter - sr.niter) <= 2
        assert stf.status == sr.status
        R = B - op_ref.matmat(Xf)
        assert float(jnp.linalg.norm(R)) <= 1e-9 * float(
            jnp.linalg.norm(B))

    def test_zero_rhs_warm_and_rank_deficient(self):
        from krylov_tpu import block_minres
        D, B, n = self._problem()
        op = DIAOperator(D, use_pallas=True)
        op_ref = DIAOperator(D, use_pallas=False)
        X0_, st0 = block_minres(op, jnp.zeros_like(B))
        assert st0.niter == 0 and float(jnp.linalg.norm(X0_)) == 0.0
        Xr, _ = block_minres(op_ref, B, atol=0.0, rtol=1e-10)
        Xw, stw = block_minres(op, B, X0=0.5 * Xr, atol=0.0, rtol=1e-10)
        R = B - op_ref.matmat(Xw)
        assert float(jnp.linalg.norm(R)) <= 1e-9 * float(jnp.linalg.norm(B))
        # rank-1 block routes to the general (Householder) core
        B1 = jnp.tile(B[:, :1], (1, 4))
        X1, st1 = block_minres(op, B1, atol=0.0, rtol=1e-10)
        R1 = B1 - op_ref.matmat(X1)
        assert float(jnp.linalg.norm(R1)) <= 1e-9 * float(
            jnp.linalg.norm(B1))


def test_minres_fused_jacobi_precond():
    """Diagonal M routes through the fused MINRES kernel and matches the
    general core (M-norm residual semantics)."""
    from krylov_tpu import minres
    from krylov_tpu.operators import DiagonalOperator

    D, pd, b, n = _problem(dtype=np.float64)
    data = np.asarray(D.data).copy()
    zi = list(D.offsets).index(0)
    data[zi] = 6.0 + 0.5 * np.sin(np.arange(n))
    D2 = type(D)(jnp.asarray(data), D.offsets, D.shape)
    M = DiagonalOperator(jnp.asarray(1.0 / data[zi]))
    op_fast = DIAOperator(D2, use_pallas=True)
    op_ref = DIAOperator(D2, use_pallas=False)
    x, stats = minres(op_fast, b, M=M, atol=0.0, rtol=1e-8)
    xr, stats_ref = minres(op_ref, b, M=M, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_minres_fused_precond_violation_raises():
    from krylov_tpu import minres
    from krylov_tpu.operators import DiagonalOperator

    D, pd, b, n = _problem(dtype=np.float64)
    M = DiagonalOperator(jnp.full(n, -1.0))
    op = DIAOperator(D, use_pallas=True)
    with pytest.raises(ValueError, match="positive definite"):
        minres(op, b, M=M, atol=0.0, rtol=1e-8)


def test_cg_fused_posdef_violation_raises():
    from krylov_tpu.operators import DiagonalOperator
    D, pd, b, n = _problem(dtype=np.float64)
    M = DiagonalOperator(jnp.full(n, -1.0))
    op = DIAOperator(D, use_pallas=True)
    with pytest.raises(ValueError, match="positive definite"):
        cg(op, b, M=M, atol=0.0, rtol=1e-8)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_cr_matches_general(dtype):
    from krylov_tpu import cr
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = cr(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = cr(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_cr_zero_rhs_and_warm():
    from krylov_tpu import cr
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = cr(op, jnp.zeros(n))
    assert stats.status == "x is a zero-residual solution"
    x1, _ = cr(op, b, atol=0.0, rtol=1e-3)
    x2, stats = cr(op, b, x1, atol=0.0, rtol=1e-9)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.1


@pytest.mark.parametrize("lam", [0.0, 0.1])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_lsqr_matches_general(dtype, lam):
    from krylov_tpu import lsqr
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = lsqr(op_fast, b, lam=lam)
    xr, stats_ref = lsqr(op_ref, b, lam=lam)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-3 * float(jnp.max(jnp.abs(xr)))


def test_fused_lsqr_unsymmetric_stencil():
    # conv-diff is unsymmetric: exercises the adjoint-aligned stencil
    from krylov_tpu import lsqr
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = lsqr(op_fast, b, atol=0.0, rtol=0.0)
    xr, stats_ref = lsqr(op_ref, b, atol=0.0, rtol=0.0)
    assert stats.niter == stats_ref.niter
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_fused_lsqr_zero_rhs():
    from krylov_tpu import lsqr
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = lsqr(op, jnp.zeros(n))
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    assert not stats.inconsistent


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_car_matches_general(dtype):
    from krylov_tpu import car
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = car(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = car(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_car_zero_rhs_and_warm_start():
    from krylov_tpu import car
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = car(op, jnp.zeros(n))
    assert stats.niter == 0 and not stats.solved or stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    x1, _ = car(op, b, atol=0.0, rtol=1e-3)
    x2, stats = car(op, b, x1, atol=0.0, rtol=1e-9)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.1


def test_car_history_falls_back_to_general():
    from krylov_tpu import car
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = car(op, b, history=True)
    assert stats.residuals.size == stats.niter + 1
    assert stats.Aresiduals.size == stats.niter + 1


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_cg_lanczos_matches_general(dtype):
    from krylov_tpu import cg_lanczos
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = cg_lanczos(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = cg_lanczos(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert abs(stats.Anorm - stats_ref.Anorm) < 1e-3 * stats_ref.Anorm
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_cg_lanczos_curvature_exit():
    """check_curvature on an indefinite stencil must exit with the
    negative-curvature status, matching the general core's niter."""
    from krylov_tpu import cg_lanczos
    from krylov_tpu.ops.dia import DIAMatrix
    D, pd, b, n = _problem(dtype=np.float64)
    # flip the sign of the diagonal on part of the domain -> indefinite
    data = np.asarray(D.data).copy()
    data[D.offsets.index(0) if hasattr(D.offsets, "index")
         else list(D.offsets).index(0)][: n // 2] *= -1.0
    Di = DIAMatrix(jnp.asarray(data), D.offsets, D.shape)
    op_fast = DIAOperator(Di, use_pallas=True)
    op_ref = DIAOperator(Di, use_pallas=False)
    x, stats = cg_lanczos(op_fast, b, check_curvature=True)
    xr, stats_ref = cg_lanczos(op_ref, b, check_curvature=True)
    assert stats.status == stats_ref.status
    assert stats.niter == stats_ref.niter
    assert stats.indefinite == stats_ref.indefinite


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_cg_lanczos_shift_matches_general(dtype):
    from krylov_tpu import cg_lanczos_shift
    D, pd, b, n = _problem(dtype=dtype)
    shifts = jnp.asarray([0.0, 0.5, 2.0], dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    X, stats = cg_lanczos_shift(op_fast, b, shifts, atol=0.0, rtol=1e-6)
    Xr, stats_ref = cg_lanczos_shift(op_ref, b, shifts, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert np.array_equal(stats.indefinite, stats_ref.indefinite)
    assert float(jnp.max(jnp.abs(X - Xr))) < 1e-4 * float(jnp.max(jnp.abs(Xr)))
    # each shifted system is actually solved
    for i, sig in enumerate([0.0, 0.5, 2.0]):
        r = b - (op_ref.matvec(X[i]) + sig * X[i])
        assert float(jnp.linalg.norm(r)) <= 2e-6 * float(jnp.linalg.norm(b))


def test_fused_cg_lanczos_shift_curvature_mask():
    """With check_curvature, a shift that makes A+sigma*I indefinite is
    frozen (marked indefinite) while the SPD shifts still converge."""
    from krylov_tpu import cg_lanczos_shift
    D, pd, b, n = _problem(dtype=np.float64)
    shifts = jnp.asarray([-12.5, 0.0, 1.0])   # lambda_min(A) > -12 ⇒ first is indefinite
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    X, stats = cg_lanczos_shift(op_fast, b, shifts, check_curvature=True)
    Xr, stats_ref = cg_lanczos_shift(op_ref, b, shifts, check_curvature=True)
    assert np.array_equal(stats.indefinite, stats_ref.indefinite)
    assert stats.indefinite[0] and not stats.indefinite[2]
    assert stats.niter == stats_ref.niter
    assert float(jnp.max(jnp.abs(X - Xr))) < 1e-8 * float(
        jnp.max(jnp.abs(Xr)) + 1)


def test_cg_lanczos_shift_history_falls_back():
    from krylov_tpu import cg_lanczos_shift
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    X, stats = cg_lanczos_shift(op, b, jnp.asarray([0.0, 1.0]),
                                history=True)
    assert len(stats.residuals) == 2


def test_cg_lanczos_history_falls_back_to_general():
    from krylov_tpu import cg_lanczos
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = cg_lanczos(op, b, history=True)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("lam", [0.0, 0.1])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_lsmr_matches_general(dtype, lam):
    from krylov_tpu import lsmr
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = lsmr(op_fast, b, lam=lam)
    xr, stats_ref = lsmr(op_ref, b, lam=lam)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    # both converge to the default sqrt(eps) tolerances; forward solution
    # difference is bounded by that, not by machine eps
    tol = 5e-3 if dtype == np.float32 else 1e-6
    assert float(jnp.max(jnp.abs(x - xr))) < tol * float(jnp.max(jnp.abs(xr)))
    # LsmrStats estimate recurrences must survive the fused port
    assert abs(stats.Anorm - stats_ref.Anorm) < 1e-2 * stats_ref.Anorm + 1e-6
    assert abs(stats.xNorm - stats_ref.xNorm) < 1e-2 * stats_ref.xNorm + 1e-6


def test_fused_lsmr_unsymmetric_stencil():
    from krylov_tpu import lsmr
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = lsmr(op_fast, b, atol=0.0, rtol=0.0)
    xr, stats_ref = lsmr(op_ref, b, atol=0.0, rtol=0.0)
    assert stats.niter == stats_ref.niter
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_fused_lsmr_zero_rhs():
    from krylov_tpu import lsmr
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = lsmr(op, jnp.zeros(n))
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    assert not stats.inconsistent


def test_lsmr_history_falls_back_to_general():
    from krylov_tpu import lsmr
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = lsmr(op, b, history=True)
    assert stats.residuals.size == stats.niter + 1


def test_lsqr_history_falls_back_to_general():
    from krylov_tpu import lsqr
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = lsqr(op, b, history=True)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("mem", [20, 5])
def test_fused_gmres_matches_general(mem):
    from krylov_tpu import gmres
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n))
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = gmres(op_fast, b, restart=True, memory=mem, rtol=1e-8)
    xr, stats_ref = gmres(op_ref, b, restart=True, memory=mem, rtol=1e-8)
    assert stats.solved
    # kernel MGS vs general-core CGS2: same counts up to roundoff paths
    assert abs(stats.niter - stats_ref.niter) <= max(2, stats_ref.niter // 20)
    r = b - op_ref.matvec(x)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.5


def test_fused_gmres_warm_start():
    from krylov_tpu import gmres
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    op = DIAOperator(D, use_pallas=True)
    b = jnp.asarray(np.random.default_rng(6).standard_normal(n))
    x1, s1 = gmres(op, b, restart=True, memory=20, atol=0.0, rtol=1e-4)
    x2, s2 = gmres(op, b, x1, restart=True, memory=20, atol=0.0, rtol=1e-10)
    assert s2.solved
    r = b - op.matvec(x2)
    # rtol is relative to the warm residual (reference parity)
    assert float(jnp.linalg.norm(r)) <= 1.5e-10 * float(
        jnp.linalg.norm(b - op.matvec(x1)))
    assert s2.niter < s1.niter + 40


def test_fused_gmres_zero_rhs():
    from krylov_tpu import gmres
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = gmres(op, jnp.zeros(n), restart=True, memory=10)
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"


def test_gmres_history_falls_back_to_general():
    from krylov_tpu import gmres
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = gmres(op, b, restart=True, memory=20, rtol=1e-8, history=True)
    assert stats.residuals.size > 0


def test_fused_bicgstab_matches_general():
    from krylov_tpu import bicgstab
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(8).standard_normal(n))
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = bicgstab(op_fast, b, atol=0.0, rtol=1e-8)
    xr, stats_ref = bicgstab(op_ref, b, atol=0.0, rtol=1e-8)
    assert stats.solved
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-10 * float(
        jnp.max(jnp.abs(xr)) + 1)


@pytest.mark.parametrize("method", ["cgls", "crls", "cgne", "crmr"])
@pytest.mark.parametrize("lam", [0.0, 0.1])
def test_fused_normal_equation_family_matches_general(method, lam):
    """CGLS/CRLS (least-squares) and CGNE/CRMR (minimum-norm) fused
    kernels vs their general cores on a square unsymmetric stencil."""
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(11).standard_normal(n))
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    solve = getattr(kt, method)
    x, stats = solve(op_fast, b, lam=lam, atol=0.0, rtol=1e-8)
    xr, stats_ref = solve(op_ref, b, lam=lam, atol=0.0, rtol=1e-8)
    # reductions run in different orders (padded tiles vs flat vector), so
    # the stopping test can flip by one iteration at the threshold
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(
        jnp.max(jnp.abs(xr)) + 1)


@pytest.mark.parametrize("method", ["cgls", "crls", "cgne", "crmr"])
def test_fused_normal_equation_zero_rhs_and_fallback(method):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    solve = getattr(kt, method)
    x, stats = solve(op, jnp.zeros(n))
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    x, stats = solve(op, b, history=True)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_cgs_matches_general(dtype):
    from krylov_tpu import cgs
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=dtype)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = cgs(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = cgs(op_ref, b, atol=0.0, rtol=1e-6)
    # CGS squares the residual polynomial, so f32 rounding can shift the
    # stopping iteration by a couple (observed 2 on the real chip at
    # 32³ conv-diff); f64 must match exactly
    slack = 2 if dtype == np.float32 else 0
    assert abs(stats.niter - stats_ref.niter) <= slack
    assert stats.status == stats_ref.status
    tol = 5e-3 if dtype == np.float32 else 1e-6
    assert float(jnp.max(jnp.abs(x - xr))) < tol * float(jnp.max(jnp.abs(xr)))
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    assert np.linalg.norm(r) <= 1.1e-6 * np.linalg.norm(np.asarray(b))


def test_fused_cgs_zero_rhs_and_fallbacks():
    from krylov_tpu import cgs
    D, pd, b, n = _problem()
    op = DIAOperator(D, use_pallas=True)
    x, stats = cgs(op, jnp.zeros(n, np.float32))
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    x, stats = cgs(op, b, atol=0.0, rtol=1e-8, history=True)
    assert stats.residuals.size == stats.niter + 1


def test_fused_bicgstab_zero_rhs_and_fallbacks():
    from krylov_tpu import bicgstab
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = bicgstab(op, jnp.zeros(n))
    assert stats.niter == 0
    assert stats.status == "x is a zero-residual solution"
    # history forces the general core
    x, stats = bicgstab(op, b, atol=0.0, rtol=1e-8, history=True)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("method", ["cg", "cr", "bicgstab", "gmres",
                                    "lsqr"])
def test_bf16_stencil_matches_f32_all_fused(method):
    """Every fused method must accept bf16-stored diagonals (exact for the
    Poisson stencil: 6 and -1 are representable) and reproduce the f32
    result bit-for-bit, since the kernel upcasts the stencil in-register."""
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import DIAMatrix
    D, pd, b, n = _problem(dtype=np.float32)
    Dbf = DIAMatrix(D.data.astype(jnp.bfloat16), D.offsets, D.shape)
    op32 = DIAOperator(D, use_pallas=True)
    opbf = DIAOperator(Dbf, use_pallas=True)
    assert opbf._pd.dtype == jnp.bfloat16
    solve = getattr(kt, method)
    x32, s32 = solve(op32, b, atol=0.0, rtol=1e-6)
    xbf, sbf = solve(opbf, b, atol=0.0, rtol=1e-6)
    assert s32.niter == sbf.niter and s32.status == sbf.status
    assert float(jnp.max(jnp.abs(x32 - xbf))) < 1e-5 * float(
        jnp.max(jnp.abs(x32)) + 1)


def test_bf16_stencil_minres_matches_f32():
    """bf16-stored diagonals (exact for the Poisson stencil) must give the
    same fused-MINRES result as f32 storage, at half the diagonal bytes."""
    from krylov_tpu import minres
    from krylov_tpu.ops.dia import DIAMatrix
    D, pd, b, n = _problem(dtype=np.float32)
    Dbf = DIAMatrix(D.data.astype(jnp.bfloat16), D.offsets, D.shape)
    op32 = DIAOperator(D, use_pallas=True)
    opbf = DIAOperator(Dbf, use_pallas=True)
    assert opbf._pd.dtype == jnp.bfloat16
    x32, s32 = minres(op32, b, atol=0.0, rtol=1e-6)
    xbf, sbf = minres(opbf, b, atol=0.0, rtol=1e-6)
    assert s32.niter == sbf.niter and s32.status == sbf.status
    assert float(jnp.max(jnp.abs(x32 - xbf))) < 1e-5 * float(
        jnp.max(jnp.abs(x32)) + 1)


def test_bf16_stencil_admits_128cubed():
    """The VMEM gate must admit 2M-unknown MINRES with a bf16 stencil
    (f32 stencil + 7 vectors = 117 MB > gate; bf16 stencil = 87 MB)."""
    from krylov_tpu.ops.pallas_fused import minres_dia_fused_supported
    offsets = (-128 * 128, -128, -1, 0, 1, 128, 128 * 128)
    n = 128 ** 3
    assert not minres_dia_fused_supported(offsets, n, np.float32)
    assert minres_dia_fused_supported(offsets, n, np.float32,
                                      stencil_dtype=jnp.bfloat16)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_symmlq_matches_general(dtype):
    from krylov_tpu import symmlq
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = symmlq(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = symmlq(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))
    assert np.isclose(stats.Anorm, stats_ref.Anorm, rtol=1e-3)


def test_fused_symmlq_lambda_shift_and_no_transfer():
    from krylov_tpu import symmlq
    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = symmlq(op_fast, b, lam=0.7, atol=0.0, rtol=1e-8)
    xr, stats_ref = symmlq(op_ref, b, lam=0.7, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))
    x, stats = symmlq(op_fast, b, transfer_to_cg=False, atol=0.0, rtol=1e-8)
    xr, stats_ref = symmlq(op_ref, b, transfer_to_cg=False, atol=0.0,
                           rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status


def test_fused_symmlq_zero_rhs_warm_and_fallbacks():
    from krylov_tpu import symmlq
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = symmlq(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    # warm start via the residual-system path
    x1, _ = symmlq(op, b, atol=0.0, rtol=1e-3)
    x2, stats = symmlq(op, b, x1, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.2
    # history / λest requests must fall back to the general core
    x, stats = symmlq(op, b, history=True, atol=0.0, rtol=1e-6)
    assert stats.residuals.size == stats.niter + 1
    x, stats = symmlq(op, b, lambda_est=0.1, history=True,
                      atol=0.0, rtol=1e-6)
    assert stats.errors.size > 0


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_minres_qlp_matches_general(dtype):
    from krylov_tpu import minres_qlp
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = minres_qlp(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = minres_qlp(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert stats.inconsistent == stats_ref.inconsistent
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_minres_qlp_indefinite_shift():
    from krylov_tpu import minres_qlp
    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    # λ = -2 makes A + λI indefinite — exercises the QLP registers.
    x, stats = minres_qlp(op_fast, b, lam=-2.0, atol=0.0, rtol=1e-8)
    xr, stats_ref = minres_qlp(op_ref, b, lam=-2.0, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_fused_minres_qlp_zero_rhs_and_fallbacks():
    from krylov_tpu import minres_qlp
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = minres_qlp(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    assert float(jnp.linalg.norm(x)) == 0.0
    # warm start via the residual-system path
    x1, _ = minres_qlp(op, b, atol=0.0, rtol=1e-3)
    x2, stats = minres_qlp(op, b, x1, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.2
    # history / linesearch requests must fall back to the general core
    x, stats = minres_qlp(op, b, history=True, atol=0.0, rtol=1e-6)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_minares_matches_general(dtype):
    from krylov_tpu import minares
    D, pd, b, n = _problem(dtype=dtype)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = minares(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = minares(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4 * float(jnp.max(jnp.abs(xr)))


def test_fused_minares_indefinite_shift():
    from krylov_tpu import minares
    D, pd, b, n = _problem(dtype=np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = minares(op_fast, b, lam=-2.0, atol=0.0, rtol=1e-8)
    xr, stats_ref = minares(op_ref, b, lam=-2.0, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


def test_fused_minares_zero_rhs_warm_and_fallbacks():
    from krylov_tpu import minares
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = minares(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x1, _ = minares(op, b, atol=0.0, rtol=1e-3)
    x2, stats = minares(op, b, x1, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.2
    x, stats = minares(op, b, history=True, atol=0.0, rtol=1e-6)
    assert stats.residuals.size == stats.niter + 1
    assert stats.Aresiduals.size == stats.niter + 1


@pytest.mark.parametrize("method", ["bilq", "qmr"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_bi_lanczos_matches_general(method, dtype):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=dtype)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), dtype)
    solve = getattr(kt, method)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = solve(op_fast, b, atol=0.0, rtol=1e-6)
    xr, stats_ref = solve(op_ref, b, atol=0.0, rtol=1e-6)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    tol = 1e-3 if dtype == np.float32 else 1e-6
    assert float(jnp.max(jnp.abs(x - xr))) < tol * float(jnp.max(jnp.abs(xr)))
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    assert np.linalg.norm(r) <= 2e-6 * np.linalg.norm(np.asarray(b))


def test_fused_bilq_no_transfer():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = kt.bilq(op_fast, b, transfer_to_bicg=False, atol=0.0,
                       rtol=1e-8)
    xr, stats_ref = kt.bilq(op_ref, b, transfer_to_bicg=False, atol=0.0,
                            rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status


@pytest.mark.parametrize("method", ["bilq", "qmr"])
def test_fused_bi_lanczos_zero_rhs_and_fallbacks(method):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(6, 6, 6, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    solve = getattr(kt, method)
    op = DIAOperator(D, use_pallas=True)
    x, stats = solve(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    # history, custom shadow c, and warm starts use the general core
    x, stats = solve(op, b, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    x, stats = solve(op, b, c=c, atol=0.0, rtol=1e-8)
    assert stats.solved
    # warm start from a generic guess (reference test_warm_start.jl:470-489
    # semantics: residual relative to ‖b‖; starting at a near-solution makes
    # the bi-Lanczos shadow vector c = b nearly orthogonal to r₀ and the
    # residual estimate unreliable — a property of the method, not the path)
    x0 = 1.2 * jnp.ones(n, np.float64)
    x2, stats = solve(op, b, x0, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-6 * float(jnp.linalg.norm(b))


@pytest.mark.parametrize("mem", [8, 20])
def test_fused_fom_matches_general(mem):
    from krylov_tpu import fom
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = fom(op_fast, b, memory=mem, restart=True, atol=0.0, rtol=1e-8)
    xr, stats_ref = fom(op_ref, b, memory=mem, restart=True, atol=0.0,
                        rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    assert np.linalg.norm(r) <= 1.1e-8 * np.linalg.norm(np.asarray(b))


def test_fused_fom_warm_zero_and_fallbacks():
    from krylov_tpu import fom
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = fom(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x1, _ = fom(op, b, memory=10, restart=True, atol=0.0, rtol=1e-3)
    x2, stats = fom(op, b, x1, memory=10, restart=True, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 2e-8 * float(jnp.linalg.norm(b))
    x, stats = fom(op, b, history=True, memory=10, restart=True,
                   atol=0.0, rtol=1e-6)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("method", ["diom", "dqgmres"])
@pytest.mark.parametrize("mem", [6, 20])
def test_fused_trunc_matches_general(method, mem):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    solve = getattr(kt, method)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = solve(op_fast, b, memory=mem, atol=0.0, rtol=1e-8)
    xr, stats_ref = solve(op_ref, b, memory=mem, atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * float(jnp.max(jnp.abs(xr)))


@pytest.mark.parametrize("method", ["diom", "dqgmres"])
def test_fused_trunc_zero_warm_and_fallbacks(method):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    solve = getattr(kt, method)
    op = DIAOperator(D, use_pallas=True)
    x, stats = solve(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x1, _ = solve(op, b, memory=10, atol=0.0, rtol=1e-3)
    x2, stats = solve(op, b, x1, memory=10, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 2e-8 * float(jnp.linalg.norm(b))
    x, stats = solve(op, b, history=True, memory=10, atol=0.0, rtol=1e-6)
    assert stats.residuals.size == stats.niter + 1


@pytest.mark.parametrize("method", ["tricg", "trimr"])
@pytest.mark.parametrize("preset", [{}, {"spd": True}, {"flip": True}])
def test_fused_tri_matches_general(method, preset):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(11).standard_normal(n),
                    np.float64)
    solve = getattr(kt, method)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    # Fixed-cap trajectory parity: the saddle recurrences amplify
    # ulp-level summation-order differences over 100+ iterations (the
    # stopping iteration can flip by 1-2 near-singular presets), so the
    # sharp check is elementwise equality at a fixed iteration count.
    x, y, stats = solve(op_fast, b, c, atol=0.0, rtol=1e-30, itmax=40,
                        **preset)
    xr, yr, stats_ref = solve(op_ref, b, c, atol=0.0, rtol=1e-30,
                              itmax=40, **preset)
    assert stats.niter == stats_ref.niter == 40
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-10 * (
        float(jnp.max(jnp.abs(xr))) + 1)
    assert float(jnp.max(jnp.abs(y - yr))) < 1e-10 * (
        float(jnp.max(jnp.abs(yr))) + 1)
    # Converged solve: statuses agree, niter within rounding slack.
    x, y, stats = solve(op_fast, b, c, atol=0.0, rtol=1e-8, **preset)
    xr, yr, stats_ref = solve(op_ref, b, c, atol=0.0, rtol=1e-8, **preset)
    assert abs(stats.niter - stats_ref.niter) <= 3
    assert stats.status == stats_ref.status
    # true block residual: [τI A; Aᴴ νI][x;y] = [b;c]
    tau, nu = (1.0, 1.0) if preset.get("spd") else \
        ((-1.0, 1.0) if preset.get("flip") else (1.0, -1.0))
    r1 = b - (tau * x + op_ref.matvec(y))
    r2 = c - (op_ref.rmatvec(x) + nu * y)
    rn = float(jnp.sqrt(jnp.linalg.norm(r1) ** 2 + jnp.linalg.norm(r2) ** 2))
    b0 = float(jnp.sqrt(jnp.linalg.norm(b) ** 2 + jnp.linalg.norm(c) ** 2))
    assert rn <= 1e-7 * b0


@pytest.mark.parametrize("method", ["tricg", "trimr"])
def test_fused_tri_zero_rhs_and_fallbacks(method):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(11).standard_normal(n),
                    np.float64)
    solve = getattr(kt, method)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = solve(op, jnp.zeros(n, np.float64),
                        jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x, y, stats = solve(op, b, c, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
    # warm start falls back to the general core
    x1, y1, _ = solve(op, b, c, atol=0.0, rtol=1e-3)
    x2, y2, stats = solve(op, b, c, x1, y1, atol=0.0, rtol=1e-8)
    assert stats.solved


@pytest.mark.parametrize("method", ["craig", "craigmr"])
@pytest.mark.parametrize("lam", [0.0, 0.3])
def test_fused_craig_family_matches_general(method, lam):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    solve = getattr(kt, method)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, y, stats = solve(op_fast, b, lam=lam, atol=0.0, rtol=1e-8)
    xr, yr, stats_ref = solve(op_ref, b, lam=lam, atol=0.0, rtol=1e-8)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-7 * (
        float(jnp.max(jnp.abs(xr))) + 1)
    assert float(jnp.max(jnp.abs(y - yr))) < 1e-7 * (
        float(jnp.max(jnp.abs(yr))) + 1)
    if lam == 0.0:
        # CRAIG stops on the backward-error test (bkwerr <= btol = sqrt(eps)),
        # so the true residual lands near sqrt(eps)*||b||, not rtol*||b||
        r = np.asarray(b) - np.asarray(op_ref.matvec(x))
        assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(np.asarray(b))


@pytest.mark.parametrize("method", ["craig", "craigmr"])
def test_fused_craig_family_zero_rhs_and_fallbacks(method):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    solve = getattr(kt, method)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = solve(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x, y, stats = solve(op, b, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
    x, y, stats = solve(op, b, sqd=True, atol=0.0, rtol=1e-8)
    assert stats.solved


@pytest.mark.parametrize("lam", [0.0, 0.3])
def test_fused_lnlq_matches_general(lam):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, y, stats = kt.lnlq(op_fast, b, lam=lam, atol=0.0, rtol=1e-8)
    xr, yr, stats_ref = kt.lnlq(op_ref, b, lam=lam, atol=0.0, rtol=1e-8)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-7 * (
        float(jnp.max(jnp.abs(xr))) + 1)
    assert float(jnp.max(jnp.abs(y - yr))) < 1e-7 * (
        float(jnp.max(jnp.abs(yr))) + 1)


def test_fused_lnlq_zero_rhs_and_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = kt.lnlq(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x, y, stats = kt.lnlq(op, b, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
    x, y, stats = kt.lnlq(op, b, transfer_to_craig=False, atol=0.0,
                          rtol=1e-8)
    assert stats.solved


@pytest.mark.parametrize("method", ["usymlq", "usymqr"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fused_usym_matches_general(method, dtype):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=dtype)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), dtype)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), dtype)
    solve = getattr(kt, method)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = solve(op_fast, b, c, atol=0.0, rtol=1e-6)
    xr, stats_ref = solve(op_ref, b, c, atol=0.0, rtol=1e-6)
    # ±1: 150+ SSY iterations amplify ulp-level summation-order
    # differences at the stopping threshold (same as the saddle family)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    assert np.linalg.norm(r) <= 2e-6 * np.linalg.norm(np.asarray(b))


def test_fused_usymlq_no_transfer():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = kt.usymlq(op_fast, b, c, transfer_to_usymcg=False,
                         atol=0.0, rtol=1e-8)
    xr, stats_ref = kt.usymlq(op_ref, b, c, transfer_to_usymcg=False,
                              atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status


@pytest.mark.parametrize("method", ["usymlq", "usymqr"])
def test_fused_usym_zero_warm_and_fallbacks(method):
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    solve = getattr(kt, method)
    op = DIAOperator(D, use_pallas=True)
    x, stats = solve(op, jnp.zeros(n, np.float64), c)
    assert stats.status == "x is a zero-residual solution"
    x, stats = solve(op, b, c, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
    x0 = 1.2 * jnp.ones(n, np.float64)
    x2, stats = solve(op, b, c, x0, atol=0.0, rtol=1e-8)
    r = b - op.matvec(x2)
    assert float(jnp.linalg.norm(r)) <= 1e-6 * float(jnp.linalg.norm(b))


@pytest.mark.parametrize("kw", [{}, {"lam": 0.2}, {"sigma": 0.05},
                                {"transfer_to_lsqr": True}])
def test_fused_lslq_matches_general(kw):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = kt.lslq(op_fast, b, atol=1e-10, rtol=1e-8, **kw)
    xr, stats_ref = kt.lslq(op_ref, b, atol=1e-10, rtol=1e-8, **kw)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert stats.inconsistent == stats_ref.inconsistent
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-7 * (
        float(jnp.max(jnp.abs(xr))) + 1)


def test_fused_lslq_zero_rhs_and_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, stats = kt.lslq(op, jnp.zeros(n, np.float64))
    assert stats.status == "x is a zero-residual solution"
    x, stats = kt.lslq(op, b, history=True, atol=1e-10, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1


def test_fused_cgls_lanczos_shift_matches_general():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    shifts = jnp.asarray([0.1, 1.0, 4.0], np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    X, stats = kt.cgls_lanczos_shift(op_fast, b, shifts, atol=0.0,
                                     rtol=1e-8)
    Xr, stats_ref = kt.cgls_lanczos_shift(op_ref, b, shifts, atol=0.0,
                                          rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(X - Xr))) < 1e-7 * (
        float(jnp.max(jnp.abs(Xr))) + 1)
    # regularized normal equations hold per shift
    for i, sig in enumerate(np.asarray(shifts)):
        g = op_ref.rmatvec(b - op_ref.matvec(X[i])) - sig * X[i]
        assert float(jnp.linalg.norm(g)) <= 1e-7 * float(jnp.linalg.norm(b))


def test_fused_cgls_lanczos_shift_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    op = DIAOperator(D, use_pallas=True)
    shifts = jnp.asarray([0.5, 2.0], np.float64)
    X, stats = kt.cgls_lanczos_shift(op, b, shifts, history=True,
                                     atol=0.0, rtol=1e-8)
    assert len(stats.residuals) == 2


def test_fused_fgmres_identity_precond_routes():
    """FGMRES with N = I is recurrence-identical to GMRES → fused path."""
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, stats = kt.fgmres(op_fast, b, memory=20, restart=True,
                         atol=0.0, rtol=1e-8)
    xr, stats_ref = kt.fgmres(op_ref, b, memory=20, restart=True,
                              atol=0.0, rtol=1e-8)
    assert stats.niter == stats_ref.niter
    assert stats.status == stats_ref.status
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    assert np.linalg.norm(r) <= 1.1e-8 * np.linalg.norm(np.asarray(b))


def test_fused_bilqr_matches_general():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, y, stats = kt.bilqr(op_fast, b, c, atol=0.0, rtol=1e-8)
    xr, yr, stats_ref = kt.bilqr(op_ref, b, c, atol=0.0, rtol=1e-8)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert stats.solved_primal == stats_ref.solved_primal
    assert stats.solved_dual == stats_ref.solved_dual
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    s = np.asarray(c) - np.asarray(op_ref.rmatvec(y))
    assert np.linalg.norm(r) <= 2e-8 * np.linalg.norm(np.asarray(b))
    assert np.linalg.norm(s) <= 2e-8 * np.linalg.norm(np.asarray(c))


def test_fused_bilqr_zero_and_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = kt.bilqr(op, jnp.zeros(n, np.float64),
                           jnp.zeros(n, np.float64))
    assert "Breakdown" in stats.status or "zero-residual" in stats.status
    x, y, stats = kt.bilqr(op, b, c, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals_primal.size > 0
    x0 = 1.2 * jnp.ones(n, np.float64)
    y0 = 0.8 * jnp.ones(n, np.float64)
    x, y, stats = kt.bilqr(op, b, c, x0, y0, atol=0.0, rtol=1e-8)
    assert stats.solved_primal and stats.solved_dual


def test_fused_trilqr_matches_general():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, y, stats = kt.trilqr(op_fast, b, c, atol=0.0, rtol=1e-8)
    xr, yr, stats_ref = kt.trilqr(op_ref, b, c, atol=0.0, rtol=1e-8)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert stats.solved_primal == stats_ref.solved_primal
    assert stats.solved_dual == stats_ref.solved_dual
    r = np.asarray(b) - np.asarray(op_ref.matvec(x))
    s = np.asarray(c) - np.asarray(op_ref.rmatvec(y))
    assert np.linalg.norm(r) <= 2e-8 * np.linalg.norm(np.asarray(b))
    assert np.linalg.norm(s) <= 2e-8 * np.linalg.norm(np.asarray(c))


def test_fused_trilqr_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = kt.trilqr(op, b, c, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals_primal.size > 0
    x0 = 1.2 * jnp.ones(n, np.float64)
    y0 = 0.8 * jnp.ones(n, np.float64)
    x, y, stats = kt.trilqr(op, b, c, x0, y0, atol=0.0, rtol=1e-8)
    assert stats.solved_primal and stats.solved_dual


@pytest.mark.parametrize("mode", [{}, {"ls": True, "ln": False},
                                  {"ls": False, "ln": True}])
def test_fused_usymlqr_matches_general(mode):
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op_fast = DIAOperator(D, use_pallas=True)
    op_ref = DIAOperator(D, use_pallas=False)
    x, y, stats = kt.usymlqr(op_fast, b, c, atol=0.0, rtol=1e-8, **mode)
    xr, yr, stats_ref = kt.usymlqr(op_ref, b, c, atol=0.0, rtol=1e-8,
                                   **mode)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-6 * (
        float(jnp.max(jnp.abs(xr))) + 1)
    assert float(jnp.max(jnp.abs(y - yr))) < 1e-6 * (
        float(jnp.max(jnp.abs(yr))) + 1)


def test_fused_usymlqr_saddle_residual_and_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op = DIAOperator(D, use_pallas=True)
    x, y, stats = kt.usymlqr(op, b, c, atol=0.0, rtol=1e-10)
    # saddle system [I A; Aᴴ 0][x;y] = [b;c]
    r1 = b - (x + op.matvec(y))
    r2 = c - op.rmatvec(x)
    assert float(jnp.linalg.norm(r1)) <= 1e-8 * float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(r2)) <= 1e-8 * float(jnp.linalg.norm(c))
    x, y, stats = kt.usymlqr(op, b, c, history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size > 0


def test_fused_gpmr_matches_general():
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import convdiff_dia
    D = convdiff_dia(8, 8, 8, dtype=np.float64)
    n = D.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n), np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    opA_f = DIAOperator(D, use_pallas=True)
    opA_r = DIAOperator(D, use_pallas=False)
    from krylov_tpu.ops.dia import DIAMatrix
    pd_adj, offs_adj = opA_f.aligned_adjoint()
    DT = DIAMatrix(pd_adj, offs_adj, D.shape)
    opB_f = DIAOperator(DT, use_pallas=True)
    opB_r = DIAOperator(DT, use_pallas=False)
    # [I A; A^T -I] generalized saddle system, memory 40 (no restart)
    x, y, stats = kt.gpmr(opA_f, opB_f, b, c, lam=1.0, mu=-1.0,
                          memory=40, itmax=40, atol=0.0, rtol=1e-8)
    xr, yr, stats_ref = kt.gpmr(opA_r, opB_r, b, c, lam=1.0, mu=-1.0,
                                memory=40, itmax=40, atol=0.0, rtol=1e-8)
    assert abs(stats.niter - stats_ref.niter) <= 1
    assert stats.status == stats_ref.status
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-7 * (
        float(jnp.max(jnp.abs(xr))) + 1)
    assert float(jnp.max(jnp.abs(y - yr))) < 1e-7 * (
        float(jnp.max(jnp.abs(yr))) + 1)
    # true block residual
    r1 = b - (x + opA_r.matvec(y))
    r2 = c - (opB_r.matvec(x) - y)
    rn = float(jnp.sqrt(jnp.linalg.norm(r1) ** 2 + jnp.linalg.norm(r2) ** 2))
    b0 = float(jnp.sqrt(jnp.linalg.norm(b) ** 2 + jnp.linalg.norm(c) ** 2))
    assert rn <= 1e-7 * b0 or stats.niter == 40


def test_fused_gpmr_fallbacks():
    import krylov_tpu as kt
    D, pd, b, n = _problem(dtype=np.float64)
    c = jnp.asarray(np.random.default_rng(6).standard_normal(n), np.float64)
    op = DIAOperator(D, use_pallas=True)
    from krylov_tpu.ops.dia import DIAMatrix
    pd_adj, offs_adj = op.aligned_adjoint()
    opB = DIAOperator(DIAMatrix(pd_adj, offs_adj, D.shape),
                      use_pallas=True)
    x, y, stats = kt.gpmr(op, opB, b, c, memory=30, itmax=30,
                          history=True, atol=0.0, rtol=1e-8)
    assert stats.residuals.size == stats.niter + 1
