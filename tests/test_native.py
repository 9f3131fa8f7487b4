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


class TestNativeRound2Kernels:
    """The 11 solvers added in round 2, each through the ctypes bridge."""

    def _sid(self, n=50, seed=0):
        # indefinite but safely nonsingular spectrum (no eigenvalue at 0)
        rng = np.random.default_rng(seed)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.concatenate([np.linspace(-3, -1, 20), np.linspace(1, 5, n - 20)])
        return Q @ np.diag(d) @ Q.T, rng.standard_normal(n)

    def test_minres_qlp(self):
        A, b = self._sid()
        x, info = native.native_solve("minres_qlp", A, b, atol=1e-10,
                                      rtol=1e-10)
        assert info["solved"], info["status"]
        assert np.linalg.norm(A @ x - b) <= 1e-6

    def test_minres_qlp_singular_min_norm(self):
        # singular consistent system: minimum-norm solution
        rng = np.random.default_rng(7)
        n, r = 40, 30
        U, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.concatenate([np.linspace(1, 4, r), np.zeros(n - r)])
        A = U @ np.diag(d) @ U.T
        b = A @ rng.standard_normal(n)
        x, info = native.native_solve("minres_qlp", A, b, atol=1e-10,
                                      rtol=1e-10)
        xm = np.linalg.pinv(A) @ b
        assert np.linalg.norm(x - xm) <= 1e-5

    @pytest.mark.parametrize("method", ["diom", "dqgmres"])
    def test_truncated(self, method):
        rng = np.random.default_rng(11)
        n = 50
        A = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        x, info = native.native_solve(method, A, b, atol=1e-9, rtol=1e-9)
        assert info["solved"], (method, info["status"])
        assert np.linalg.norm(A @ x - b) <= 1e-5

    def test_lslq(self):
        rng = np.random.default_rng(13)
        A = rng.standard_normal((60, 35))
        b = rng.standard_normal(60)
        x, info = native.native_solve("lslq", A, b, atol=1e-10, rtol=1e-10)
        assert np.linalg.norm(A.T @ (b - A @ x)) <= 1e-5

    def test_lnlq_min_norm(self):
        rng = np.random.default_rng(17)
        A = rng.standard_normal((25, 60))
        b = A @ rng.standard_normal(60)
        x, info = native.native_solve("lnlq", A, b, atol=1e-11, rtol=1e-11)
        xm = A.T @ np.linalg.solve(A @ A.T, b)
        assert np.linalg.norm(x - xm) <= 1e-6
        assert "y" in info
        assert np.linalg.norm(x - A.T @ info["y"]) <= 1e-8

    def test_bilqr_adjoint_pair(self):
        rng = np.random.default_rng(19)
        n = 40
        A = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        cvec = rng.standard_normal(n)
        x, info = native.native_solve("bilqr", A, b, c=cvec, atol=1e-10,
                                      rtol=1e-10)
        assert np.linalg.norm(A @ x - b) <= 1e-5
        assert np.linalg.norm(A.T @ info["y"] - cvec) <= 1e-5

    def test_trilqr_rectangular(self):
        rng = np.random.default_rng(23)
        m, n = 50, 30
        A = rng.standard_normal((m, n))
        xstar = rng.standard_normal(n)
        b = A @ xstar                      # consistent primal
        cvec = rng.standard_normal(n)      # dual A'y = c (A' wide, consistent)
        x, info = native.native_solve("trilqr", A, b, c=cvec, atol=1e-10,
                                      rtol=1e-10)
        assert np.linalg.norm(A.T @ info["y"] - cvec) <= 1e-5

    def test_usymlqr_saddle(self):
        # well-conditioned structured A: the SSY recurrence loses accuracy
        # quickly on random dense systems (drifts past ~m/2 steps even in
        # the JAX layer), so test on the bidiagonal operator family.
        rng = np.random.default_rng(29)
        m, n = 40, 25
        A = np.zeros((m, n))
        for i in range(m):
            if i < n:
                A[i, i] = 2.0 + 0.02 * i
            if 0 <= i - 1 < n:
                A[i, i - 1] = 0.5
        b = rng.standard_normal(m)
        cvec = rng.standard_normal(n)
        x, info = native.native_solve("usymlqr", A, b, c=cvec, itmax=30)
        y = info["y"]
        top = b - (x + A @ y)
        bot = cvec - A.T @ x
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        assert rr <= 1e-4 * np.sqrt(np.linalg.norm(b) ** 2
                                    + np.linalg.norm(cvec) ** 2)

    @pytest.mark.parametrize("method", ["tricg", "trimr"])
    def test_saddle_point(self, method):
        rng = np.random.default_rng(31)
        m, n = 45, 30
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        cvec = rng.standard_normal(n)
        x, info = native.native_solve(method, A, b, c=cvec, atol=1e-10,
                                      rtol=1e-10)
        y = info["y"]
        top = b - (x + A @ y)              # tau=1
        bot = cvec - (A.T @ x - y)         # nu=-1
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        assert rr <= 1e-6 * np.sqrt(np.linalg.norm(b) ** 2
                                    + np.linalg.norm(cvec) ** 2), method

    def test_gpmr_partitioned(self):
        rng = np.random.default_rng(37)
        m, n = 40, 28
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        cvec = rng.standard_normal(n)
        # B = A' flows through the At slot
        x, info = native.native_solve("gpmr", A, b, c=cvec, atol=1e-10,
                                      rtol=1e-10)
        y = info["y"]
        top = b - (x + A @ y)              # lambda=1
        bot = cvec - (A.T @ x + y)         # mu=1
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        assert rr <= 1e-6 * np.sqrt(np.linalg.norm(b) ** 2
                                    + np.linalg.norm(cvec) ** 2)

    def test_minares_bounded_memory(self):
        # indefinite system: old (basis-hoarding) kernel replaced; the
        # bounded kernel must still minimize ||A r||.
        A, b = self._sid(seed=41)
        x, info = native.native_solve("minares", A, b, atol=1e-9, rtol=1e-9)
        assert info["solved"], info["status"]
        assert np.linalg.norm(A @ (b - A @ x)) <= 1e-5


class TestNativeComplexRound2:
    """complex128 coverage of the round-2 kernels (conj placement)."""

    def _cplx(self, rng, shape):
        return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)

    def test_minres_qlp_hermitian(self):
        rng = np.random.default_rng(0)
        n = 30
        H = self._cplx(rng, (n, n))
        H = H + H.conj().T + 2 * n * np.eye(n)
        b = self._cplx(rng, n)
        x, info = native.native_solve("minres_qlp", H, b, atol=1e-10,
                                      rtol=1e-10)
        assert info["solved"]
        assert np.linalg.norm(H @ x - b) <= 1e-7

    @pytest.mark.parametrize("method", ["diom", "dqgmres"])
    def test_truncated_complex(self, method):
        rng = np.random.default_rng(0)
        n = 30
        M = self._cplx(rng, (n, n)) + 3 * n * np.eye(n)
        b = self._cplx(rng, n)
        x, info = native.native_solve(method, M, b, atol=1e-10, rtol=1e-10)
        assert info["solved"], (method, info["status"])
        assert np.linalg.norm(M @ x - b) <= 1e-7

    def test_lnlq_complex_min_norm(self):
        rng = np.random.default_rng(0)
        A = self._cplx(rng, (20, 45))
        b = A @ self._cplx(rng, 45)
        x, info = native.native_solve("lnlq", A, b, atol=1e-11, rtol=1e-11)
        assert np.linalg.norm(A @ x - b) <= 1e-10
        assert np.linalg.norm(x - A.conj().T @ info["y"]) <= 1e-8

    @pytest.mark.parametrize("method", ["tricg", "trimr"])
    def test_saddle_complex(self, method):
        rng = np.random.default_rng(0)
        A = self._cplx(rng, (25, 18)) * 0.2
        bm = self._cplx(rng, 25)
        cn = self._cplx(rng, 18)
        x, info = native.native_solve(method, A, bm, c=cn, atol=1e-10,
                                      rtol=1e-10)
        y = info["y"]
        top = bm - (x + A @ y)
        bot = cn - (A.conj().T @ x - y)
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        assert rr <= 1e-7, method

    def test_gpmr_complex(self):
        rng = np.random.default_rng(0)
        A = self._cplx(rng, (25, 18)) * 0.2
        bm = self._cplx(rng, 25)
        cn = self._cplx(rng, 18)
        x, info = native.native_solve("gpmr", A, bm, c=cn, atol=1e-10,
                                      rtol=1e-10)
        y = info["y"]
        top = bm - (x + A @ y)
        bot = cn - (A.conj().T @ x + y)   # B = Aᴴ through the At slot
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        assert rr <= 1e-10

    def test_bilqr_complex(self):
        rng = np.random.default_rng(0)
        n = 30
        M = self._cplx(rng, (n, n)) + 3 * n * np.eye(n)
        b = self._cplx(rng, n)
        cvec = self._cplx(rng, n)
        x, info = native.native_solve("bilqr", M, b, c=cvec, atol=1e-10,
                                      rtol=1e-10)
        assert np.linalg.norm(M @ x - b) <= 1e-7
        assert np.linalg.norm(M.conj().T @ info["y"] - cvec) <= 1e-7
