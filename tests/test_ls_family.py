"""Least-squares / least-norm family tests (reference test_lsqr.jl,
test_lsmr.jl, test_cgls.jl, test_crls.jl, test_cgne.jl, test_crmr.jl)."""

import numpy as np
import pytest

import fixtures as fx
from krylov_tpu import lsqr, lsmr, cgls, crls, cgne, crmr, cgls_lanczos_shift

TOL = 1.0e-5


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def ls_check(A, b, x, tol=TOL):
    """‖Aᴴ(b − Ax)‖ relative — the least-squares criterion."""
    A = np.asarray(A)
    r = np.asarray(b) - A @ np.asarray(x)
    Ar = A.conj().T @ r
    return np.linalg.norm(Ar) <= tol * np.linalg.norm(A) * max(np.linalg.norm(r), 1e-30)


@pytest.mark.parametrize("method", [lsqr, lsmr, cgls, crls],
                         ids=["lsqr", "lsmr", "cgls", "crls"])
class TestLeastSquares:
    def test_over_consistent(self, method, FC):
        A, b = fx.over_consistent(FC=FC)
        x, stats = method(A, b)
        r = np.asarray(b) - np.asarray(A) @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= TOL
        assert stats.solved

    def test_over_inconsistent(self, method, FC):
        A, b = fx.over_inconsistent(FC=FC)
        x, stats = method(A, b)
        assert ls_check(A, b, x)
        assert stats.solved

    @pytest.mark.parametrize("npower", [1, 2, 3, 4])
    def test_gen_lsq(self, method, npower):
        # reference test_lsqr.jl:8-14: assert the LS optimality residual.
        b, A, D, HY, HZ, Acond, rnorm = fx.gen_lsq(40, 40, 4, npower, 0.0)
        x, stats = method(A, b)
        r = b - A @ np.asarray(x)
        assert np.linalg.norm(A.T @ r) / np.linalg.norm(b) <= 1e-5
        assert stats.solved

    def test_regularized(self, method):
        # λ-regularized optimality: LSQR/LSMR damp by λ (Aᴴr = λ²x);
        # CGLS/CRLS regularize the normal equations (Aᴴr = λx).
        b, A, D, HY, HZ, Acond, rnorm = fx.gen_lsq(25, 10, 1, 1, 0.0)
        lam = 1.0e-3
        x, stats = method(A, b, lam=lam)
        r = b - A @ np.asarray(x)
        power = 2 if method in (lsqr, lsmr) else 1
        resid = np.linalg.norm(A.T @ r - lam**power * np.asarray(x))
        assert resid / np.linalg.norm(b) <= 1e-5

    def test_zero_rhs(self, method, FC):
        A, _ = fx.over_consistent(FC=FC)
        x, stats = method(A, np.zeros(25, dtype=FC))
        assert stats.status == "x is a zero-residual solution"


class TestLsqrSpecifics:
    def test_sqd(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        x, stats = lsqr(A, b, sqd=True)
        xreg = np.linalg.solve(A.T @ A + np.eye(10), A.T @ b)
        assert np.allclose(np.asarray(x), xreg, atol=1e-6)

    def test_sqd_conflict(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        with pytest.raises(ValueError):
            lsqr(A, b, sqd=True, lam=2.0)

    def test_lsmr_stats(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        x, stats = lsmr(A, b)
        assert stats.Anorm > 0
        assert stats.Acond > 0


@pytest.mark.parametrize("method", [cgne, crmr], ids=["cgne", "crmr"])
class TestLeastNorm:
    def test_under_consistent(self, method, FC):
        A, b = fx.under_consistent(FC=FC)
        x, stats = method(A, b)
        r = np.asarray(b) - np.asarray(A) @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= TOL
        assert stats.solved

    def test_minimum_norm(self, method):
        A, b = fx.under_consistent()
        x, stats = method(A, b)
        assert fx.check_min_norm(A, b, np.asarray(x), atol=1e-4)

    def test_inconsistent_detection(self, method, FC):
        A, b = fx.under_inconsistent(FC=FC)
        x, stats = method(A, b)
        assert stats.inconsistent or not stats.solved

    def test_zero_rhs(self, method, FC):
        A, _ = fx.under_consistent(FC=FC)
        x, stats = method(A, np.zeros(10, dtype=FC))
        assert stats.status == "x is a zero-residual solution"


class TestCglsLanczosShift:
    def test_multiple_lambdas(self):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        shifts = [0.0, 0.5, 2.0]
        X, stats = cgls_lanczos_shift(A, b, shifts)
        assert stats.solved
        for i, lam in enumerate(shifts):
            xreg = np.linalg.solve(A.T @ A + lam * np.eye(10), A.T @ b)
            assert np.allclose(np.asarray(X[i]), xreg, atol=1e-4), f"shift {lam}"
