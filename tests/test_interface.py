"""Generic interface + workspace tests (reference test_interface.jl,
test_warm_start.jl patterns) and block solvers."""

import numpy as np
import pytest

import fixtures as fx
import krylov_tpu as kt
from krylov_tpu import (
    krylov_solve, krylov_workspace, krylov_solve_inplace, KRYLOV_METHODS,
    solution, statistics, results, issolved, iteration_count,
    Aprod_count, Atprod_count, warm_start, elapsed_time,
)


SQUARE_ONE_OUT = [
    "cg", "cr", "car", "cg_lanczos", "symmlq", "minres", "minres_qlp",
    "minares", "cgs", "bicgstab", "bilq", "qmr", "diom", "fom",
    "dqgmres", "gmres", "fgmres",
]


class TestGenericInterface:
    def test_method_list_complete(self):
        # the full basket: 35 vector + 2 block methods + shift variants
        assert len(KRYLOV_METHODS) >= 37

    @pytest.mark.parametrize("method", SQUARE_ONE_OUT)
    def test_spd_methods(self, method):
        A, b = fx.symmetric_definite(n=20)
        A = np.asarray(A)
        x, stats = krylov_solve(method, A, b)
        r = b - A @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-5, method
        assert stats.solved

    def test_rectangular_methods(self):
        A, b = fx.over_consistent()
        for method in ("lsqr", "lsmr", "lslq", "cgls", "crls"):
            x, stats = krylov_solve(method, A, b)
            r = b - A @ np.asarray(x)
            assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-4, method

    def test_two_output_methods(self):
        A, b = fx.under_consistent()
        for method in ("craig", "craigmr", "lnlq"):
            x, y, stats = krylov_solve(method, A, b)
            r = b - A @ np.asarray(x)
            assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-5, method

    def test_unknown_method(self):
        with pytest.raises(ValueError, match="unknown Krylov method"):
            krylov_workspace("not_a_method")


class TestWorkspace:
    def test_reuse(self):
        A, b = fx.symmetric_definite(n=30)
        ws = krylov_workspace("cg", np.asarray(A), b)
        krylov_solve_inplace(ws, A, b)
        assert issolved(ws)
        n1 = iteration_count(ws)
        assert Aprod_count(ws) == n1
        assert Atprod_count(ws) == 0
        assert elapsed_time(ws) > 0
        x, stats = results(ws)
        assert stats is statistics(ws)
        assert np.allclose(np.asarray(solution(ws)), np.asarray(x))
        # solve a second system with the same workspace
        A2, b2 = fx.symmetric_definite(n=30)
        krylov_solve_inplace(ws, 2.0 * np.asarray(A2), b2)
        assert issolved(ws)

    def test_warm_start_accessor(self):
        A, b = fx.warm_start_system()
        ws = krylov_workspace("cg")
        warm_start(ws, 0.99 * np.ones(b.shape[0]))
        krylov_solve_inplace(ws, A, b)
        assert issolved(ws)

    def test_warm_start_rejected(self):
        ws = krylov_workspace("lsqr")
        with pytest.raises(ValueError, match="warm start"):
            warm_start(ws, np.ones(3))

    def test_state_field_access(self):
        from krylov_tpu.workspaces import CgWorkspace
        A, b = fx.symmetric_definite(n=20)
        ws = CgWorkspace(np.asarray(A), b)
        ws.solve(A, b)
        # solver-internal fields are reachable like reference ws fields
        assert ws.r.shape == (20,)
        assert float(ws.rNorm) < 1e-4

    def test_generated_classes(self):
        from krylov_tpu import workspaces as w
        for method in KRYLOV_METHODS:
            cname = "".join(s.capitalize() for s in method.split("_")) + "Workspace"
            assert hasattr(w, cname), cname

    def test_block_supertype_and_kstdout(self):
        # Reference exports: BlockKrylovWorkspace abstract supertype and
        # the kstdout default verbose stream (src/Krylov.jl:10).
        import sys
        import krylov_tpu as kt
        assert issubclass(kt.BlockGmresWorkspace, kt.BlockKrylovWorkspace)
        assert issubclass(kt.BlockMinresWorkspace, kt.BlockKrylovWorkspace)
        assert issubclass(kt.BlockKrylovWorkspace, kt.KrylovWorkspace)
        assert not issubclass(kt.CgWorkspace, kt.BlockKrylovWorkspace)
        assert kt.kstdout is sys.stdout


class TestBlockSolvers:
    @pytest.mark.parametrize("FC", [np.float64, np.complex128],
                             ids=["f64", "c128"])
    def test_block_minres(self, FC):
        A, b = fx.symmetric_definite(n=20, FC=FC)
        A = np.asarray(A)
        B = np.stack([b, np.ones(20, dtype=FC)], axis=1)
        X, stats = kt.block_minres(A, B)
        R = B - A @ np.asarray(X)
        assert np.linalg.norm(R) / np.linalg.norm(B) <= 1e-6
        assert stats.solved

    @pytest.mark.parametrize("FC", [np.float64, np.complex128],
                             ids=["f64", "c128"])
    def test_block_gmres(self, FC):
        A, b = fx.nonsymmetric_definite(n=20, FC=FC)
        A = np.asarray(A)
        B = np.stack([b, np.arange(20).astype(FC)], axis=1)
        X, stats = kt.block_gmres(A, B)
        R = B - A @ np.asarray(X)
        assert np.linalg.norm(R) / np.linalg.norm(B) <= 1e-6

    def test_block_gmres_restart(self):
        A, b = fx.sparse_laplacian(6)
        Ad = np.asarray(A.todense())
        B = np.stack([b, np.linspace(0, 1, 216)], axis=1)
        X, stats = kt.block_gmres(Ad, B, memory=10, restart=True)
        R = B - Ad @ np.asarray(X)
        assert np.linalg.norm(R) / np.linalg.norm(B) <= 1e-5

    def test_block_warm_start(self):
        A, b = fx.symmetric_definite(n=20)
        A = np.asarray(A)
        B = np.stack([b, np.ones(20)], axis=1)
        X0 = 0.5 * np.ones((20, 2))
        X, stats = kt.block_minres(A, B, X0)
        R = B - A @ np.asarray(X)
        assert np.linalg.norm(R) / np.linalg.norm(B) <= 1e-6


class TestKrylovConstructor:
    # reference src/krylov_workspaces.jl:36-54 and test usage
    # UsymlqrWorkspace(KrylovConstructor(b, d))
    def test_prototype_allocation(self):
        import jax.numpy as jnp
        b = jnp.ones(7, jnp.float64)
        c = jnp.ones(4, jnp.float64)
        kc = kt.KrylovConstructor(b, c)
        assert (kc.m, kc.n) == (7, 4)
        assert kc.dtype == jnp.float64
        ws = kt.CgWorkspace(kt.KrylovConstructor(b))
        assert (ws.m, ws.n) == (7, 7)
        rng = np.random.default_rng(0)
        Ad = rng.standard_normal((7, 7))
        A = Ad @ Ad.T + 7 * np.eye(7)
        ws.solve(jnp.asarray(A), b)
        assert kt.issolved(ws)

    def test_rectangular_prototypes(self):
        import jax.numpy as jnp
        b = jnp.ones(6, jnp.float64)
        c = jnp.ones(4, jnp.float64)
        ws = kt.UsymlqrWorkspace(kt.KrylovConstructor(b, c))
        assert (ws.m, ws.n) == (6, 4)


class TestNoRetraceOnResolve:
    # Analogue of reference test_allocations.jl: the reference asserts
    # zero allocations on a second in-place solve; the JAX equivalent is
    # that a second solve with identical static config does not retrace
    # (jit cache hit), so the operator's Python matvec runs 0 times.
    def test_second_solve_hits_cache(self):
        import jax.numpy as jnp
        traces = []

        def mv(v):
            traces.append(1)
            return 3.0 * v

        op = kt.FunctionOperator(mv, (32, 32), jnp.float64)
        b = jnp.ones(32)
        ws = kt.krylov_workspace("cg", 32, 32, jnp.float64)
        ws.solve(op, b, rtol=1e-12)
        n_first = len(traces)
        assert n_first >= 1                     # traced at least once
        ws.solve(op, b * 2.0, rtol=1e-12)       # same shapes/statics
        assert len(traces) == n_first           # no retrace
        assert kt.issolved(ws)
