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
