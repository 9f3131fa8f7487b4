"""Process tests mirroring reference test/test_processes.jl:
(a) orthonormality, (b) initial-vector identity, (c) factorization residual."""

import numpy as np
import pytest
import jax.numpy as jnp

import fixtures as fx
from krylov_tpu import processes as pr
from krylov_tpu.processes import block_hermitian_lanczos


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def FC(request):
    return request.param


def ortho(V, tol=1e-4):
    V = np.asarray(V)
    G = V.conj().T @ V
    return np.linalg.norm(G - np.eye(G.shape[0])) <= tol


class TestHermitianLanczos:
    def test_factorization(self, FC):
        A, b = fx.symmetric_definite(FC=FC)
        A = np.asarray(A)
        k = 6
        V, beta1, T = pr.hermitian_lanczos(A, b, k)
        V = np.asarray(V)
        T = np.asarray(T)
        assert ortho(V)
        assert np.allclose(beta1 * V[:, 0], b)
        assert np.linalg.norm(A @ V[:, :k] - V @ T) <= 1e-10

    def test_breakdown(self):
        A, b = fx.symmetric_breakdown()
        with pytest.raises(ValueError, match="breakdown"):
            pr.hermitian_lanczos(A, b, 2)
        V, beta1, T = pr.hermitian_lanczos(A, b, 2, allow_breakdown=True)


class TestNonhermitianLanczos:
    def test_factorization(self, FC):
        rng = np.random.default_rng(7)
        A = (rng.standard_normal((12, 12)) + 6 * np.eye(12)).astype(FC)
        if np.issubdtype(np.dtype(FC), np.complexfloating):
            A = A + 1j * rng.standard_normal((12, 12))
        b = rng.standard_normal(12).astype(FC)
        c = rng.standard_normal(12).astype(FC)
        k = 6
        V, beta1, T, U, gamma1H, Th = pr.nonhermitian_lanczos(A, b, c, k)
        V, U, T, Th = map(np.asarray, (V, U, T, Th))
        assert np.linalg.norm(A @ V[:, :k] - V @ T) <= 1e-8
        assert np.linalg.norm(A.conj().T @ U[:, :k] - U @ Th) <= 1e-8
        # biorthogonality
        G = U.conj().T @ V
        assert np.linalg.norm(G - np.eye(k + 1)) <= 1e-6


class TestArnoldi:
    def test_factorization(self, FC):
        rng = np.random.default_rng(8)
        A = rng.standard_normal((12, 12)).astype(FC)
        if np.issubdtype(np.dtype(FC), np.complexfloating):
            A = A + 1j * rng.standard_normal((12, 12))
        b = rng.standard_normal(12).astype(FC)
        k = 6
        V, beta, H = pr.arnoldi(A, b, k)
        V, H = np.asarray(V), np.asarray(H)
        assert ortho(V)
        assert np.allclose(beta * V[:, 0], b)
        assert np.linalg.norm(A @ V[:, :k] - V @ H) <= 1e-10

    def test_reorthogonalization(self):
        A, b = fx.symmetric_definite(n=30)
        V, beta, H = pr.arnoldi(np.asarray(A), b, 10, reorthogonalization=True)
        assert ortho(V, tol=1e-10)


class TestGolubKahan:
    def test_factorization(self, FC):
        rng = np.random.default_rng(9)
        A = rng.standard_normal((20, 12)).astype(FC)
        if np.issubdtype(np.dtype(FC), np.complexfloating):
            A = A + 1j * rng.standard_normal((20, 12))
        b = rng.standard_normal(20).astype(FC)
        k = 5
        V, U, beta1, L = pr.golub_kahan(A, b, k)
        V, U, L = map(np.asarray, (V, U, L))
        assert ortho(V) and ortho(U)
        assert np.allclose(beta1 * U[:, 0], b)
        # A Vₖ = Uₖ₊₁ Lₖ₊₁ᵀ-ish: check AᴴU = V Lᴴ relation columnwise
        assert np.linalg.norm(A.conj().T @ U - V @ L.conj().T) <= 1e-8


class TestSSY:
    def test_factorization(self, FC):
        A, b, c = fx.square_adjoint(n=20, FC=FC)
        A = np.asarray(A)
        k = 6
        V, beta1, T, U, gamma1, Th = pr.saunders_simon_yip(A, b, c, k)
        V, U, T, Th = map(np.asarray, (V, U, T, Th))
        assert ortho(V) and ortho(U)
        assert np.linalg.norm(A @ U[:, :k] - V @ T) <= 1e-8
        assert np.linalg.norm(A.conj().T @ V[:, :k] - U @ Th) <= 1e-8


class TestMontoisonOrban:
    def test_factorization(self, FC):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((15, 12)).astype(FC)
        B = rng.standard_normal((12, 15)).astype(FC)
        b = rng.standard_normal(15).astype(FC)
        c = rng.standard_normal(12).astype(FC)
        k = 5
        V, beta, H, U, gamma, F = pr.montoison_orban(A, B, b, c, k)
        V, U, H, F = map(np.asarray, (V, U, H, F))
        assert ortho(V) and ortho(U)
        assert np.linalg.norm(A @ U[:, :k] - V @ H) <= 1e-8
        assert np.linalg.norm(B @ V[:, :k] - U @ F) <= 1e-8


class TestBlockProcesses:
    def test_block_hermitian_lanczos(self, FC):
        A, _ = fx.symmetric_definite(n=16, FC=FC)
        A = np.asarray(A)
        rng = np.random.default_rng(0)
        B = rng.standard_normal((16, 2)).astype(FC)
        k = 4
        V, Psi1, T = pr.block_hermitian_lanczos(A, B, k)
        V, T = np.asarray(V), np.asarray(T)
        assert ortho(V, tol=1e-8)
        assert np.linalg.norm(A @ V[:, :k * 2] - V @ T) <= 1e-8

    def test_block_arnoldi(self, FC):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((16, 16)).astype(FC)
        if np.issubdtype(np.dtype(FC), np.complexfloating):
            A = A + 1j * rng.standard_normal((16, 16))
        B = rng.standard_normal((16, 2)).astype(FC)
        k = 4
        V, Gamma, H = pr.block_arnoldi(A, B, k)
        V, H = np.asarray(V), np.asarray(H)
        assert ortho(V, tol=1e-8)
        assert np.linalg.norm(A @ V[:, :k * 2] - V @ H) <= 1e-8

    def test_block_golub_kahan(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((20, 12))
        B = rng.standard_normal((20, 2))
        k = 3
        V, U, Psi1, L = pr.block_golub_kahan(A, B, k)
        V, U, L = map(np.asarray, (V, U, L))
        assert ortho(V, tol=1e-8) and ortho(U, tol=1e-8)
        assert np.linalg.norm(A.conj().T @ U - V @ L.conj().T) <= 1e-8

    def test_block_ssy(self):
        rng = np.random.default_rng(4)
        A = rng.standard_normal((18, 14))
        b = rng.standard_normal((18, 2))
        c = rng.standard_normal((14, 2))
        k = 3
        V, Psi1, T, U, Phi1, Th = pr.block_saunders_simon_yip(A, b, c, k)
        V, U, T, Th = map(np.asarray, (V, U, T, Th))
        assert ortho(V, tol=1e-8) and ortho(U, tol=1e-8)
        assert np.linalg.norm(A @ U[:, :k * 2] - V @ T) <= 1e-8

    def test_block_montoison_orban(self):
        rng = np.random.default_rng(5)
        A = rng.standard_normal((15, 12))
        B = rng.standard_normal((12, 15))
        D = rng.standard_normal((15, 2))
        C = rng.standard_normal((12, 2))
        k = 3
        V, Gamma, H, U, Lambda, F = pr.block_montoison_orban(A, B, D, C, k)
        V, U, H, F = map(np.asarray, (V, U, H, F))
        assert ortho(V, tol=1e-8) and ortho(U, tol=1e-8)
        assert np.linalg.norm(A @ U[:, :k * 2] - V @ H) <= 1e-8
        assert np.linalg.norm(B @ V[:, :k * 2] - U @ F) <= 1e-8

    def test_block_nonhermitian_lanczos(self):
        rng = np.random.default_rng(6)
        A = rng.standard_normal((16, 16)) + 8 * np.eye(16)
        B = rng.standard_normal((16, 2))
        C = rng.standard_normal((16, 2))
        k = 3
        V, Psi1, T, U, G1, Th = pr.block_nonhermitian_lanczos(A, B, C, k)
        V, U, T, Th = map(np.asarray, (V, U, T, Th))
        # biorthogonality UᴴV ≈ I
        G = U.conj().T @ V
        assert np.linalg.norm(G - np.eye(G.shape[0])) <= 1e-6
        assert np.linalg.norm(A @ V[:, :k * 2] - V @ T) <= 1e-6


class TestBlockQrAlgos:
    # reference block_krylov_utils.jl:125-160 algo selector
    def test_gs_mgs_match_householder(self):
        rng = np.random.default_rng(0)
        for FC in (np.float64, np.complex128):
            W = rng.standard_normal((20, 4)).astype(FC)
            if FC == np.complex128:
                W = W + 1j * rng.standard_normal((20, 4))
            from krylov_tpu.processes import _block_qr
            Qh, Rh = _block_qr(jnp.asarray(W), "householder")
            for algo in ("gs", "mgs", "givens"):
                Q, R = _block_qr(jnp.asarray(W), algo)
                assert np.allclose(np.asarray(Q) @ np.asarray(R), W, atol=1e-12)
                assert np.allclose(
                    np.asarray(jnp.conj(Q.T) @ Q), np.eye(4), atol=1e-12)

    def test_block_process_algo_kwarg(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((12, 12))
        B = rng.standard_normal((12, 3))
        for algo in ("gs", "mgs", "householder"):
            V, Psi1, T = block_hermitian_lanczos(
                0.5 * (A + A.T), B, 3, algo=algo)
            assert np.allclose(
                np.asarray(jnp.conj(V.T) @ V), np.eye(V.shape[1]), atol=1e-10)

    def test_bad_algo(self):
        from krylov_tpu.processes import _block_qr
        with pytest.raises(ValueError, match="unknown block QR algo"):
            _block_qr(jnp.ones((4, 2)), "qr_magic")
