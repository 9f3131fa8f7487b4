"""SYMMLQ / MINRES-QLP / MINARES tests (reference test_symmlq.jl,
test_minres_qlp.jl, test_minares.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
from krylov_tpu import symmlq, minres_qlp, minares, DiagonalOperator

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
    assert np.linalg.norm(r) / np.linalg.norm(b) <= tol * max(
        1.0, np.linalg.norm(Ad) * np.linalg.norm(np.asarray(x))
    )
    assert stats.solved


@pytest.mark.parametrize("method", [symmlq, minres_qlp, minares],
                         ids=["symmlq", "minres_qlp", "minares"])
class TestSidFamily:
    def test_symmetric_definite(self, method, FC):
        A, b = fx.symmetric_definite(FC=FC)
        x, stats = method(A, b)
        check(A, b, x, stats)

    def test_symmetric_indefinite(self, method, FC):
        A, b = fx.symmetric_indefinite(FC=FC)
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
        assert np.linalg.norm(np.asarray(x)) == 0

    def test_shifted(self, method, FC):
        A, b = fx.symmetric_indefinite(FC=FC)
        x, stats = method(A, b, lam=2.0)
        check(A, b, x, stats, lam=2.0)

    def test_warm_start(self, method):
        A, b = fx.warm_start_system()
        x0 = 0.99 * np.ones(b.shape[0])
        x, stats = method(A, b, x0)
        Ad = _dense(A)
        r = np.asarray(b) - Ad @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-5

    def test_history(self, method):
        A, b = fx.symmetric_definite()
        x, stats = method(A, b, history=True)
        assert len(stats.residuals) >= stats.niter


class TestSymmlqSpecifics:
    def test_cg_transfer_status(self):
        A, b = fx.symmetric_definite()
        x, stats = symmlq(A, b, transfer_to_cg=True)
        assert stats.status in (
            "solution xᶜ good enough given atol and rtol",
            "solution xᴸ good enough given atol and rtol",
            "found approximate solution",
        )

    def test_lambda_est(self):
        A, b = fx.symmetric_definite()
        x, stats = symmlq(A, b, lambda_est=0.5, history=True)
        assert stats.solved
        assert stats.Anorm > 0

    def test_symmlq_shift_operator_form(self):
        # The documented λ-deviation pin (solvers/symmlq.py docstring):
        # lam=λ must agree exactly with solving the explicitly shifted
        # matrix — the operator-form shift is self-consistent.
        rng = np.random.default_rng(11)
        n = 60
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = Q @ np.diag(np.linspace(-2.0, 3.0, n)) @ Q.T
        A = (A + A.T) / 2
        b = rng.standard_normal(n)
        lam = 0.7
        x1, s1 = symmlq(A, b, lam=lam, atol=0.0, rtol=1e-10)
        x2, s2 = symmlq(A + lam * np.eye(n), b, atol=0.0, rtol=1e-10)
        assert s1.niter == s2.niter
        assert s1.status == s2.status
        assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)
        r = b - (A + lam * np.eye(n)) @ np.asarray(x1)
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b)

    def test_lambda_est_error_bounds(self):
        # errors/errorscg histories with the retrospective window
        # correction (reference src/symmlq.jl:342-374): with
        # 0 < λest < λmin the err sequence upper-bounds the true forward
        # error of the LQ iterates.
        rng = np.random.default_rng(3)
        n = 50
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        evals = np.linspace(1.0, 10.0, n)
        A = Q @ np.diag(evals) @ Q.T
        A = (A + A.T) / 2
        b = rng.standard_normal(n)
        lam_est = 0.9 * evals[0]
        window = 5
        x, stats = symmlq(A, b, lambda_est=lam_est, window=window,
                          atol=0.0, rtol=1e-12, etol=1e-12, history=True)
        assert stats.solved
        assert len(stats.errors) == stats.niter + 1
        assert len(stats.errorscg) == stats.niter + 1
        assert np.all(np.isfinite(stats.errors))
        x_star = np.linalg.solve(A, b)
        # reconstruct LQ iterates at a few k and check the bound
        for k in (3, 6, 10):
            if k >= stats.niter:
                continue
            xk, sk = symmlq(A, b, lambda_est=lam_est, window=window,
                            atol=0.0, rtol=0.0, etol=0.0, itmax=k)
            true_err = np.linalg.norm(x_star - np.asarray(xk))
            assert stats.errors[k] >= 0.5 * true_err
        # the window correction rewrote early errorscg entries: they must
        # remain valid (finite where defined) and tighter or equal
        uncorr = np.asarray(stats.errors[: stats.niter - window])
        corr = np.asarray(stats.errorscg[: stats.niter - window])
        finite = np.isfinite(corr)
        assert np.all(corr[finite] <= uncorr[finite] + 1e-12)

    def test_stats_type(self):
        from krylov_tpu import SymmlqStats
        A, b = fx.symmetric_definite()
        x, stats = symmlq(A, b, history=True)
        assert isinstance(stats, SymmlqStats)
        assert len(stats.residualscg) > 0


class TestMinresQlpSpecifics:
    def test_singular_min_norm(self, FC):
        # MINRES-QLP returns the minimum-norm LS solution (its raison d'être).
        A, b = fx.symmetric_inconsistent()
        x, stats = minres_qlp(A, b)
        xmin, *_ = np.linalg.lstsq(A, b, rcond=None)
        assert np.linalg.norm(np.asarray(x) - xmin) <= 1e-8
        assert stats.inconsistent
        assert stats.status == "found approximate minimum least-squares solution"

    def test_singular_consistent(self):
        A, b = fx.singular_consistent()
        x, stats = minres_qlp(A, b)
        r = b - A @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6

    def test_linesearch_npc(self, FC):
        A, b = fx.symmetric_indefinite(FC=FC, shift=10)
        x, stats = minres_qlp(A, b, linesearch=True)
        assert stats.status == "nonpositive curvature"
        assert stats.indefinite
        assert stats.npc_count == 1


class TestMinaresSpecifics:
    def test_artol_stop(self):
        A, b = fx.symmetric_indefinite(n=50)
        x, stats = minares(A, b, Artol=1e-10)
        Ad = np.asarray(A)
        r = b - Ad @ np.asarray(x)
        assert np.linalg.norm(Ad @ r) <= 1e-5 * np.linalg.norm(b)
