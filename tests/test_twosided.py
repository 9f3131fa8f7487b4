"""Bi-Lanczos / SSY / saddle-point / least-norm family tests."""

import numpy as np
import pytest

import fixtures as fx
from krylov_tpu import (
    bilq, qmr, bilqr, usymlq, usymqr, trilqr, usymlqr,
    tricg, trimr, gpmr, craig, craigmr, lnlq, lslq,
)

TOL = 1.0e-6


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def rel(r, b):
    return np.linalg.norm(r) / np.linalg.norm(b)


@pytest.mark.parametrize("method", [bilq, qmr], ids=["bilq", "qmr"])
class TestBiLanczos:
    def test_nonsymmetric_definite(self, method, FC):
        A, b = fx.nonsymmetric_definite(FC=FC)
        x, stats = method(A, b)
        assert rel(b - A @ np.asarray(x), b) <= TOL
        assert stats.solved

    def test_kron_unsymmetric(self, method):
        A, b = fx.kron_unsymmetric(4)
        Ad = np.asarray(A.todense())
        x, stats = method(Ad, b)
        assert rel(b - Ad @ np.asarray(x), b) <= 1e-4
        assert stats.solved

    def test_zero_rhs(self, method, FC):
        A, b = fx.zero_rhs(FC=FC)
        x, stats = method(A, b)
        assert stats.status == "x is a zero-residual solution"

    def test_breakdown_bc(self, method):
        A, b, c = fx.bc_breakdown()
        x, stats = method(A, b, c=c)
        assert stats.status == "Breakdown bᴴc = 0"

    def test_warm_start(self, method):
        A, b = fx.warm_start_system()
        Ad = np.asarray(A.todense())
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = method(Ad, b, x0)
        assert rel(b - Ad @ np.asarray(x), b) <= TOL


class TestBilqr:
    def test_square_adjoint(self, FC):
        A, b, c = fx.square_adjoint(n=50, FC=FC)
        x, y, stats = bilqr(A, b, c)
        assert rel(b - A @ np.asarray(x), b) <= TOL
        assert rel(c - A.conj().T @ np.asarray(y), c) <= TOL
        assert stats.solved_primal and stats.solved_dual
        assert "Both primal and dual" in stats.status

    def test_adjoint_stats_histories(self):
        A, b, c = fx.square_adjoint(n=30)
        x, y, stats = bilqr(A, b, c, history=True)
        assert len(stats.residuals_primal) > 0
        assert len(stats.residuals_dual) > 0

    def test_status_vocabulary_chain(self):
        """Exact-string parity with the reference precedence chain
        (src/bilqr.jl:452-467), including the four mixed tol/mach
        combinations."""
        import types
        from krylov_tpu.solvers.bilq import _bilqr_status
        from krylov_tpu import _runtime as rt

        def st(**kw):
            flags = dict(solved_lq_tol=False, solved_lq_mach=False,
                         solved_cg_tol=False, solved_cg_mach=False,
                         solved_qr_tol=False, solved_qr_mach=False,
                         solved_primal=False, solved_dual=False,
                         breakdown=False)
            flags.update(kw)
            flags["solved_primal"] = (
                flags["solved_primal"] or flags["solved_lq_tol"]
                or flags["solved_lq_mach"] or flags["solved_cg_tol"]
                or flags["solved_cg_mach"])
            flags["solved_dual"] = (
                flags["solved_dual"] or flags["solved_qr_tol"]
                or flags["solved_qr_mach"])
            return _bilqr_status(types.SimpleNamespace(**flags),
                                 rt.SOLVED_PRIMAL_DUAL)

        assert st(solved_lq_tol=True) == (
            "Only the primal solution xᴸ is good enough given atol and rtol")
        assert st(solved_cg_tol=True) == (
            "Only the primal solution xᶜ is good enough given atol and rtol")
        assert st(solved_qr_tol=True) == (
            "Only the dual solution t is good enough given atol and rtol")
        assert st(solved_lq_tol=True, solved_qr_tol=True) == (
            "Both primal and dual solutions (xᴸ, t) are good enough "
            "given atol and rtol")
        assert st(solved_cg_tol=True, solved_qr_tol=True) == (
            "Both primal and dual solutions (xᶜ, t) are good enough "
            "given atol and rtol")
        assert st(solved_lq_mach=True) == (
            "Only found approximate zero-residual primal solution xᴸ")
        assert st(solved_cg_mach=True) == (
            "Only found approximate zero-residual primal solution xᶜ")
        assert st(solved_qr_mach=True) == (
            "Only found approximate zero-residual dual solution t")
        assert st(solved_lq_mach=True, solved_qr_mach=True) == (
            "Found approximate zero-residual primal and dual solutions "
            "(xᴸ, t)")
        assert st(solved_cg_mach=True, solved_qr_mach=True) == (
            "Found approximate zero-residual primal and dual solutions "
            "(xᶜ, t)")
        assert st(solved_lq_mach=True, solved_qr_tol=True) == (
            "Found approximate zero-residual primal solutions xᴸ and a "
            "dual solution t good enough given atol and rtol")
        assert st(solved_cg_mach=True, solved_qr_tol=True) == (
            "Found approximate zero-residual primal solutions xᶜ and a "
            "dual solution t good enough given atol and rtol")
        assert st(solved_lq_tol=True, solved_qr_mach=True) == (
            "Found a primal solution xᴸ good enough given atol and rtol "
            "and an approximate zero-residual dual solutions t")
        assert st(solved_cg_tol=True, solved_qr_mach=True) == (
            "Found a primal solution xᶜ good enough given atol and rtol "
            "and an approximate zero-residual dual solutions t")
        # dual stopped only by the inconsistency test: the reference
        # chain has no matching line and leaves "unknown".
        assert st(solved_lq_tol=True, solved_dual=True) == "unknown"


@pytest.mark.parametrize("method", [usymlq, usymqr], ids=["usymlq", "usymqr"])
class TestUsym:
    def test_square(self, method, FC):
        A, b, c = fx.square_adjoint(n=40, FC=FC)
        x, stats = method(A, b, c)
        assert rel(b - A @ np.asarray(x), b) <= TOL
        assert stats.solved

    def test_zero_rhs(self, method, FC):
        A, b, c = fx.square_adjoint(n=20, FC=FC)
        x, stats = method(A, np.zeros_like(b), c)
        assert stats.status == "x is a zero-residual solution"


class TestUsymqrRectangular:
    def test_over_consistent(self, FC):
        A, b = fx.over_consistent(FC=FC)
        c = np.ones(10, dtype=FC)
        x, stats = usymqr(A, b, c)
        assert rel(b - A @ np.asarray(x), b) <= TOL

    def test_inconsistent_detection(self):
        # reference test_usymqr.jl:67-71
        A, b = fx.under_inconsistent()
        c = np.array([1.0 if (i + 1) % 2 == 0 else -1.0 for i in range(25)])
        x, stats = usymqr(A, b, c)
        assert stats.inconsistent

    def test_square_inconsistent(self):
        # reference test_usymqr.jl:81-85
        A, b = fx.square_inconsistent()
        c = np.ones(10)
        x, stats = usymqr(A, b, c)
        assert stats.inconsistent


class TestTrilqr:
    def test_square_adjoint(self, FC):
        A, b, c = fx.square_adjoint(n=50, FC=FC)
        x, y, stats = trilqr(A, b, c)
        assert rel(b - A @ np.asarray(x), b) <= TOL
        assert rel(c - A.conj().T @ np.asarray(y), c) <= TOL
        assert stats.solved_primal and stats.solved_dual

    def test_rectangular_adjoint(self):
        A, b, c = fx.underdetermined_adjoint(20, 40)
        x, y, stats = trilqr(A, b, c)
        assert rel(b - A @ np.asarray(x), b) <= 1e-5
        assert stats.solved_primal


class TestSaddlePoint:
    @pytest.mark.parametrize("method", [tricg, trimr], ids=["tricg", "trimr"])
    def test_sqd(self, method, FC):
        A, b, M, N = fx.sqd(FC=FC)
        c = -b.copy()
        x, y, stats = method(A, b, c)
        K = np.block([[np.eye(5), A], [A.conj().T, -np.eye(5)]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-6
        assert stats.solved

    def test_trimr_sp(self, FC):
        A, b, M, N = fx.sqd(FC=FC)
        c = -b.copy()
        x, y, stats = trimr(A, b, c, sp=True)
        K = np.block([[np.eye(5), A], [A.conj().T, np.zeros((5, 5))]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-5

    def test_usymlqr(self):
        A, b, M, N = fx.sqd()
        c = -b.copy()
        x, y, stats = usymlqr(A, b, c)
        K = np.block([[np.eye(5), A], [A.conj().T, np.zeros((5, 5))]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-5
        assert stats.solved

    def test_usymlqr_ls_ln_modes(self, FC):
        # reference test/test_usymlqr.jl "Small complex SP" block
        rng = np.random.default_rng(7)
        m = n = 4
        def rnd(*s):
            a = rng.random(s)
            return a + 1j * rng.random(s) if FC == np.complex128 else a
        A = rnd(m, n).astype(FC)
        b = rnd(m).astype(FC)
        c = rnd(n).astype(FC)
        K = np.block([[np.eye(m), A], [A.conj().T, np.zeros((n, n))]])
        for kw, d in ((dict(), np.concatenate([b, c])),
                      (dict(ln=False), np.concatenate([b, 0 * c])),
                      (dict(ls=False), np.concatenate([0 * b, c]))):
            x, y, stats = usymlqr(A, b, c, **kw)
            r = d - K @ np.concatenate([np.asarray(x), np.asarray(y)])
            assert np.linalg.norm(r) <= 1e-6
            assert stats.solved

    def test_usymlqr_warm_start(self):
        rng = np.random.default_rng(11)
        m = n = 6
        A = rng.random((m, n))
        b = rng.random(m)
        c = rng.random(n)
        K = np.block([[np.eye(m), A], [A.conj().T, np.zeros((n, n))]])
        sol = np.linalg.solve(K, np.concatenate([b, c]))
        x0 = sol[:m] + 1e-3 * rng.random(m)
        y0 = sol[m:] + 1e-3 * rng.random(n)
        x, y, stats = usymlqr(A, b, c, x0, y0)
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-6
        assert stats.solved

    def test_usymlqr_both_false(self):
        A = np.eye(3)
        b = np.ones(3)
        with pytest.raises(ValueError, match="ls.*ln|ln.*ls"):
            usymlqr(A, b, b, ls=False, ln=False)

    def test_tricg_presets(self):
        A, b, M, N = fx.sqd()
        c = -b.copy()
        x, y, stats = tricg(A, b, c, spd=True)
        K = np.block([[np.eye(5), A], [A.conj().T, np.eye(5)]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-6


class TestGpmr:
    def test_gsp_fixture(self, FC):
        A, B, b, c, M, N = fx.gsp(FC=FC)
        x, y, stats = gpmr(A, B, b, c)
        mN, nN = A.shape
        K = np.block([[np.eye(mN), A], [B, np.eye(nN)]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-8
        assert stats.solved

    def test_lambda_mu(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((20, 15))
        B = rng.standard_normal((15, 20))
        b = rng.standard_normal(20)
        c = rng.standard_normal(15)
        x, y, stats = gpmr(A, B, b, c, lam=3.0, mu=2.0)
        K = np.block([[3 * np.eye(20), A], [B, 2 * np.eye(15)]])
        r = np.concatenate([b, c]) - K @ np.concatenate(
            [np.asarray(x), np.asarray(y)])
        assert np.linalg.norm(r) <= 1e-8


@pytest.mark.parametrize("method", [craig, craigmr, lnlq],
                         ids=["craig", "craigmr", "lnlq"])
class TestLeastNormFamily:
    def test_under_consistent(self, method, FC):
        A, b = fx.under_consistent(FC=FC)
        x, y, stats = method(A, b)
        assert rel(b - A @ np.asarray(x), b) <= TOL
        assert fx.check_min_norm(A, b, np.asarray(x), atol=1e-5)
        assert stats.solved

    def test_zero_rhs(self, method, FC):
        A, _ = fx.under_consistent(FC=FC)
        x, y, stats = method(A, np.zeros(10, dtype=FC))
        assert stats.status == "x is a zero-residual solution"

    def test_regularized(self, method):
        A, b = fx.under_consistent()
        lam = 0.5
        x, y, stats = method(A, b, lam=lam)
        yref = np.linalg.solve(A @ A.T + lam ** 2 * np.eye(10), b)
        xref = A.T @ yref
        assert np.allclose(np.asarray(x), xref, atol=1e-5)


class TestLslq:
    def test_over_consistent(self, FC):
        A, b = fx.over_consistent(FC=FC)
        x, stats = lslq(A, b)
        assert rel(b - A @ np.asarray(x), b) <= 1e-5
        assert stats.solved

    def test_over_inconsistent(self):
        A, b = fx.over_inconsistent()
        x, stats = lslq(A, b)
        Ar = A.T @ (b - A @ np.asarray(x))
        assert np.linalg.norm(Ar) <= 1e-8
        assert stats.inconsistent

    def test_transfer_to_lsqr(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        x, stats = lslq(A, b, transfer_to_lsqr=True)
        Ar = A.T @ (b - A @ np.asarray(x))
        assert np.linalg.norm(Ar) <= 1e-6

    def test_sigma_bounds(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        x, stats = lslq(A, b, sigma=0.01, utol=1e-4, history=True)
        assert stats.solved
