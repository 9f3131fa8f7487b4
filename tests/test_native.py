"""Native libkrylov tests through the ctypes bridge (reference
interfaces/test pattern: every solver converges through the C ABI)."""

import shutil
import subprocess

import numpy as np
import pytest

from krylov_tpu import native
import fixtures as fx

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()


def spd_system(n=40):
    A = np.diag(4.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1) \
        + np.diag(-np.ones(n - 1), -1)
    return A, np.ones(n)


class TestNativeSolvers:
    @pytest.mark.parametrize("method", ["cg", "cr", "car", "minres", "gmres"])
    def test_spd(self, method):
        A, b = spd_system()
        x, info = native.native_solve(method, A, b)
        r = b - A @ x
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6
        assert info["solved"]
        assert info["niter"] > 0

    @pytest.mark.parametrize("method", ["gmres", "bicgstab", "cgs"])
    def test_nonsymmetric(self, method):
        A, b = fx.nonsymmetric_definite(n=30)
        x, info = native.native_solve(method, np.asarray(A), b)
        r = b - np.asarray(A) @ x
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-5
        assert info["solved"]

    @pytest.mark.parametrize("method", ["lsqr", "lsmr", "cgls"])
    def test_least_squares(self, method):
        b, A, *_ = fx.gen_lsq(25, 10, 1, 1, 0.0)
        x, info = native.native_solve(method, A, b)
        Ar = A.T @ (b - A @ x)
        assert np.linalg.norm(Ar) / np.linalg.norm(b) <= 1e-5

    def test_warm_start(self):
        A, b = spd_system()
        x, info = native.native_solve("cg", A, b)
        x2, info2 = native.native_solve("cg", A, b, x0=np.asarray(x))
        assert info2["niter"] <= info["niter"]
        r = b - A @ x2
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-6

    def test_itmax_status(self):
        A, b = spd_system()
        x, info = native.native_solve("cg", A, b, itmax=2, rtol=1e-30,
                                      atol=1e-30)
        assert info["niter"] == 2
        assert not info["solved"]
        assert "maximum number" in info["status"]

    def test_float32(self):
        A, b = spd_system()
        x, info = native.native_solve("cg", A.astype(np.float32),
                                      b.astype(np.float32))
        r = b - A @ x.astype(np.float64)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 2e-3

    def test_c_test_binary(self):
        # Run the C test program end-to-end (mirrors reference C tests).
        import os
        nat = os.path.join(os.path.dirname(native.__file__), "..", "native")
        subprocess.run(["make", "test"], cwd=nat, check=True,
                       capture_output=True)


class TestNativeTrueSymmlqQmr:
    # SYMMLQ and QMR are now distinct native kernels (not MINRES /
    # BiCGSTAB fallbacks): SYMMLQ reports the LQ status vocabulary and
    # QMR needs (and uses) the adjoint callback.
    def test_symmlq_indefinite(self):
        rng = np.random.default_rng(0)
        n = 50
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = Q @ np.diag(np.linspace(-3, 5, n)) @ Q.T
        b = rng.standard_normal(n)
        x, info = native.native_solve("symmlq", A, b, atol=1e-10, rtol=1e-10)
        assert info["solved"]
        assert info["status"] == "solution good enough given atol and rtol"
        assert np.linalg.norm(A @ x - b) <= 1e-7

    def test_qmr_real_and_complex(self):
        rng = np.random.default_rng(1)
        n = 40
        for dt in (np.float64, np.complex128):
            M = rng.standard_normal((n, n)).astype(dt)
            if dt == np.complex128:
                M = M + 1j * rng.standard_normal((n, n))
            M = M + 3 * n * np.eye(n)
            b = rng.standard_normal(n).astype(dt)
            x, info = native.native_solve("qmr", M, b, atol=1e-10, rtol=1e-10)
            assert info["solved"], info["status"]
            assert np.linalg.norm(M @ x - b) <= 1e-6


class TestNativeDistinctKernels:
    # every former alias now has its own recurrence; solve each through
    # the bridge and check true residual/optimality.
    def _spd(self, n=40, seed=0):
        rng = np.random.default_rng(seed)
        Ad = rng.standard_normal((n, n))
        return Ad @ Ad.T + n * np.eye(n), rng.standard_normal(n)

    def test_fom(self):
        A, b = self._spd()
        x, info = native.native_solve("fom", A, b, atol=1e-9, rtol=1e-9)
        assert info["solved"]
        assert np.linalg.norm(A @ x - b) <= 1e-6

    def test_bilq_usymlq_usymqr(self):
        rng = np.random.default_rng(1)
        n = 40
        M = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        for method in ("bilq", "usymlq", "usymqr"):
            x, info = native.native_solve(method, M, b, atol=1e-9, rtol=1e-9)
            assert info["solved"], (method, info["status"])
            assert np.linalg.norm(M @ x - b) <= 1e-5, method

    def test_crls_optimality(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((50, 30))
        b = rng.standard_normal(50)
        x, info = native.native_solve("crls", A, b, atol=1e-10, rtol=1e-10)
        assert info["solved"]
        assert np.linalg.norm(A.T @ (b - A @ x)) <= 1e-6

    def test_crmr_craigmr_min_norm(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((25, 60))
        b = A @ rng.standard_normal(60)
        xm = A.T @ np.linalg.solve(A @ A.T, b)
        for method in ("crmr", "craigmr"):
            x, info = native.native_solve(method, A, b, atol=1e-11,
                                          rtol=1e-11)
            assert info["solved"], (method, info["status"])
            assert np.linalg.norm(x - xm) <= 1e-6, method
        assert "y" in info  # craigmr returns the dual iterate
        assert np.linalg.norm(x - A.T @ info["y"]) <= 1e-10

    def test_minares(self):
        A, b = self._spd(seed=4)
        x, info = native.native_solve("minares", A, b, atol=1e-9, rtol=1e-9)
        assert info["solved"]
        assert np.linalg.norm(A @ (b - A @ x)) <= 1e-4
