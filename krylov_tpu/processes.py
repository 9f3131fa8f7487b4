"""Standalone Krylov processes (SURVEY.md L2).

The six basis-building factorizations of reference
src/krylov_processes.jl, with dense coefficient matrices instead of the
reference's CSC sparse assembly (a (k+1)×k dense array is the natural
jnp container).  Block variants (p-column) mirror
src/block_krylov_processes.jl with QR-based normalization
(jnp.linalg.qr replaces the reference's LAPACK Householder calls).

All run an eager k-step loop (k is small and static); breakdowns raise
unless ``allow_breakdown=True``, matching the reference's error text.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ._dtypes import real_dtype
from .operators import as_operator
from .ops.kops import kdot, kdotr, knorm


def _hi(fn):
    """Run a process builder under true-f32 matmul precision: TPU f32
    matmuls otherwise execute as bf16 passes, destroying the basis
    orthogonality these factorizations exist to provide."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapper


def _chk(val, allow, what):
    if not allow and float(val) == 0:
        raise ValueError(f"Exact breakdown {what} == 0.")


@_hi
def hermitian_lanczos(A, b, k, allow_breakdown=False, reorthogonalization=False):
    """V, β₁, T with A Vₖ = Vₖ₊₁ Tₖ₊₁.ₖ (reference :28-103).

    Returns V (n, k+1), β₁, T (k+1, k) real tridiagonal coefficients.
    """
    A = as_operator(A)
    b = jnp.asarray(b)
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    V = []
    Tm = np.zeros((k + 1, k), dtype=T)

    beta1 = knorm(b)
    _chk(beta1, allow_breakdown, "β₁")
    v = jnp.zeros(n, FC) if float(beta1) == 0 else b / beta1.astype(FC)
    V.append(v)
    beta_prev = None
    for i in range(k):
        q = A.matvec(V[i])
        if i >= 1:
            beta_i = Tm[i, i - 1]
            Tm[i - 1, i] = beta_i
            q = q - beta_i * V[i - 1]
        alpha = kdotr(V[i], q)
        q = q - alpha.astype(FC) * V[i]
        if reorthogonalization:
            if i >= 1:
                btmp = kdotr(V[i - 1], q)
                Tm[i, i - 1] += float(btmp)
                Tm[i - 1, i] += float(btmp)
                q = q - btmp.astype(FC) * V[i - 1]
            atmp = kdotr(V[i], q)
            alpha = alpha + atmp
            q = q - atmp.astype(FC) * V[i]
        Tm[i, i] = float(alpha)
        beta = knorm(q)
        _chk(beta, allow_breakdown, f"β{i + 2}")
        Tm[i + 1, i] = float(beta)
        v = jnp.zeros(n, FC) if float(beta) == 0 else q / beta.astype(FC)
        V.append(v)
    return jnp.stack(V, axis=1), float(beta1), jnp.asarray(Tm)


@_hi
def nonhermitian_lanczos(A, b, c, k, allow_breakdown=False):
    """V, β₁, T, U, γ₁ᴴ, Tᴴ — Lanczos biorthogonalization (reference :133-224)."""
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    n = b.shape[0]
    FC = b.dtype
    Tm = np.zeros((k + 1, k), dtype=np.dtype(FC))
    Th = np.zeros((k + 1, k), dtype=np.dtype(FC))

    cHb = kdot(c, b)
    _chk(jnp.abs(cHb), allow_breakdown, "β₁γ₁")
    beta1 = jnp.sqrt(jnp.abs(cHb))
    gamma1 = jnp.where(beta1 == 0, 0, cHb / jnp.where(beta1 == 0, 1, beta1).astype(FC))
    V = [b / jnp.where(beta1 == 0, 1, beta1).astype(FC)]
    U = [c / jnp.where(gamma1 == 0, 1, jnp.conj(gamma1))]
    beta, gamma = beta1.astype(FC), gamma1
    for i in range(k):
        q = A.matvec(V[i])
        p = A.rmatvec(U[i])
        if i >= 1:
            q = q - gamma * V[i - 1]
            p = p - jnp.conj(beta) * U[i - 1]
        alpha = kdot(U[i], q)
        q = q - alpha * V[i]
        p = p - jnp.conj(alpha) * U[i]
        pHq = kdot(p, q)
        if i < k - 1:
            _chk(jnp.abs(pHq), allow_breakdown, f"β{i + 2}γ{i + 2}")
        beta_n = jnp.sqrt(jnp.abs(pHq))
        gamma_n = jnp.where(beta_n == 0, 0,
                            pHq / jnp.where(beta_n == 0, 1, beta_n).astype(FC))
        Tm[i, i] = complex(alpha) if np.iscomplexobj(Tm) else float(alpha.real)
        Th[i, i] = np.conj(Tm[i, i])
        Tm[i + 1, i] = complex(beta_n) if np.iscomplexobj(Tm) else float(beta_n)
        Th[i + 1, i] = np.conj(complex(gamma_n)) if np.iscomplexobj(Th) else float(gamma_n.real)
        if i + 1 < k:
            Tm[i, i + 1] = complex(gamma_n) if np.iscomplexobj(Tm) else float(gamma_n.real)
            Th[i, i + 1] = np.conj(complex(beta_n)) if np.iscomplexobj(Th) else float(beta_n)
        nz = float(jnp.abs(pHq)) != 0
        V.append(q / beta_n.astype(FC) if nz else jnp.zeros(n, FC))
        U.append(p / jnp.conj(gamma_n) if nz else jnp.zeros(n, FC))
        beta, gamma = beta_n.astype(FC), gamma_n
    return (jnp.stack(V, axis=1), float(beta1), jnp.asarray(Tm),
            jnp.stack(U, axis=1), complex(jnp.conj(gamma1)), jnp.asarray(Th))


@_hi
def arnoldi(A, b, k, allow_breakdown=False, reorthogonalization=False):
    """V, β, H with A Vₖ = Vₖ₊₁ Hₖ₊₁.ₖ (reference :250-296)."""
    A = as_operator(A)
    b = jnp.asarray(b)
    n = b.shape[0]
    FC = b.dtype
    H = np.zeros((k + 1, k), dtype=np.dtype(FC))
    beta = knorm(b)
    _chk(beta, allow_breakdown, "β")
    V = [b / jnp.where(beta == 0, 1, beta).astype(FC)]
    for j in range(k):
        q = A.matvec(V[j])
        for i in range(j + 1):
            hij = kdot(V[i], q)
            H[i, j] = complex(hij) if np.iscomplexobj(H) else float(hij.real)
            q = q - hij * V[i]
        if reorthogonalization:
            for i in range(j + 1):
                htmp = kdot(V[i], q)
                H[i, j] += complex(htmp) if np.iscomplexobj(H) else float(htmp.real)
                q = q - htmp * V[i]
        hj = knorm(q)
        _chk(hj, allow_breakdown, f"h_{j + 2}.{j + 1}")
        H[j + 1, j] = float(hj)
        V.append(q / jnp.where(hj == 0, 1, hj).astype(FC))
    return jnp.stack(V, axis=1), float(beta), jnp.asarray(H)


@_hi
def golub_kahan(A, b, k, allow_breakdown=False):
    """V, U, β₁, L — Golub-Kahan bidiagonalization (reference :323-402).

    A Vₖ = Uₖ₊₁ Lₖ₊₁.ₖ-ish with L the (k+1)×(k+1) lower bidiagonal
    [α₁; β₂ α₂; ...] as in the reference.
    """
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    L = np.zeros((k + 1, k + 1), dtype=T)
    beta1 = knorm(b)
    _chk(beta1, allow_breakdown, "β₁")
    U = [b / jnp.where(beta1 == 0, 1, beta1).astype(FC)]
    V = []
    beta = beta1
    v_prev = None
    for i in range(k + 1):
        p = A.rmatvec(U[i])
        if i >= 1:
            p = p - beta.astype(FC) * V[i - 1]
        alpha = knorm(p)
        if i < k:
            _chk(alpha, allow_breakdown, f"α{i + 1}")
        L[i, i] = float(alpha)
        v = p / jnp.where(alpha == 0, 1, alpha).astype(FC)
        V.append(v)
        if i < k:
            q = A.matvec(v) - alpha.astype(FC) * U[i]
            beta = knorm(q)
            _chk(beta, allow_breakdown, f"β{i + 2}")
            L[i + 1, i] = float(beta)
            U.append(q / jnp.where(beta == 0, 1, beta).astype(FC))
    return (jnp.stack(V, axis=1), jnp.stack(U, axis=1), float(beta1),
            jnp.asarray(L))


@_hi
def saunders_simon_yip(A, b, c, k, allow_breakdown=False):
    """V, β₁, T, U, γ₁ᴴ, Tᴴ — orthogonal tridiagonalization (reference :431-524)."""
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    FC = b.dtype
    Tm = np.zeros((k + 1, k), dtype=np.dtype(FC))
    Th = np.zeros((k + 1, k), dtype=np.dtype(FC))
    beta1 = knorm(b)
    gamma1 = knorm(c)
    _chk(beta1, allow_breakdown, "β₁")
    _chk(gamma1, allow_breakdown, "γ₁")
    V = [b / jnp.where(beta1 == 0, 1, beta1).astype(FC)]
    U = [c / jnp.where(gamma1 == 0, 1, gamma1).astype(FC)]
    beta, gamma = beta1, gamma1
    for i in range(k):
        q = A.matvec(U[i])
        p = A.rmatvec(V[i])
        if i >= 1:
            q = q - gamma.astype(FC) * V[i - 1]
            p = p - beta.astype(FC) * U[i - 1]
        alpha = kdot(V[i], q)
        q = q - alpha * V[i]
        p = p - jnp.conj(alpha) * U[i]
        beta_n = knorm(q)
        gamma_n = knorm(p)
        if i < k - 1:
            _chk(beta_n, allow_breakdown, f"β{i + 2}")
            _chk(gamma_n, allow_breakdown, f"γ{i + 2}")
        Tm[i, i] = complex(alpha) if np.iscomplexobj(Tm) else float(alpha.real)
        Th[i, i] = np.conj(Tm[i, i])
        Tm[i + 1, i] = float(beta_n)
        Th[i + 1, i] = float(gamma_n)
        if i + 1 < k:
            Tm[i, i + 1] = float(gamma_n)
            Th[i, i + 1] = float(beta_n)
        V.append(q / jnp.where(beta_n == 0, 1, beta_n).astype(FC))
        U.append(p / jnp.where(gamma_n == 0, 1, gamma_n).astype(FC))
        beta, gamma = beta_n, gamma_n
    return (jnp.stack(V, axis=1), float(beta1), jnp.asarray(Tm),
            jnp.stack(U, axis=1), float(gamma1), jnp.asarray(Th))


@_hi
def montoison_orban(A, B, b, c, k, allow_breakdown=False,
                    reorthogonalization=False):
    """V, β, H, U, γ, F — orthogonal Hessenberg reduction of [0 A; B 0]
    (reference :555-627)."""
    A = as_operator(A)
    B = as_operator(B)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    FC = b.dtype
    H = np.zeros((k + 1, k), dtype=np.dtype(FC))
    F = np.zeros((k + 1, k), dtype=np.dtype(FC))
    beta = knorm(b)
    gamma = knorm(c)
    _chk(beta, allow_breakdown, "β")
    _chk(gamma, allow_breakdown, "γ")
    V = [b / jnp.where(beta == 0, 1, beta).astype(FC)]
    U = [c / jnp.where(gamma == 0, 1, gamma).astype(FC)]
    for j in range(k):
        q = A.matvec(U[j])
        p = B.matvec(V[j])
        for i in range(j + 1):
            hij = kdot(V[i], q)
            fij = kdot(U[i], p)
            H[i, j] = complex(hij) if np.iscomplexobj(H) else float(hij.real)
            F[i, j] = complex(fij) if np.iscomplexobj(F) else float(fij.real)
            q = q - hij * V[i]
            p = p - fij * U[i]
        if reorthogonalization:
            for i in range(j + 1):
                htmp = kdot(V[i], q)
                ftmp = kdot(U[i], p)
                H[i, j] += complex(htmp) if np.iscomplexobj(H) else float(htmp.real)
                F[i, j] += complex(ftmp) if np.iscomplexobj(F) else float(ftmp.real)
                q = q - htmp * V[i]
                p = p - ftmp * U[i]
        hj = knorm(q)
        fj = knorm(p)
        _chk(hj, allow_breakdown, f"h_{j + 2}.{j + 1}")
        _chk(fj, allow_breakdown, f"f_{j + 2}.{j + 1}")
        H[j + 1, j] = float(hj)
        F[j + 1, j] = float(fj)
        V.append(q / jnp.where(hj == 0, 1, hj).astype(FC))
        U.append(p / jnp.where(fj == 0, 1, fj).astype(FC))
    return (jnp.stack(V, axis=1), float(beta), jnp.asarray(H),
            jnp.stack(U, axis=1), float(gamma), jnp.asarray(F))


# ---------------------------------------------------------------------------
# Block variants (reference src/block_krylov_processes.jl) with
# jnp.linalg.qr normalization in place of LAPACK Householder.
# ---------------------------------------------------------------------------

def _block_qr(W, algo="householder"):
    """Reduced QR of a tall n×p block (reference block_krylov_utils.jl:125-160).

    ``algo``: "householder" (default, XLA's blocked Householder — also
    used for "givens", which is numerically equivalent and has no TPU
    advantage over Householder), "gs" (classical Gram-Schmidt) or
    "mgs" (modified Gram-Schmidt).  The GS variants loop over the p
    columns (p is small); each column update is a fused matvec.
    """
    if algo in ("householder", "givens"):
        Q, R = jnp.linalg.qr(W)
        return Q, R
    if algo not in ("gs", "mgs"):
        raise ValueError(f"unknown block QR algo: {algo!r}")
    n, p = W.shape
    FC = W.dtype
    cols = []
    rows = []
    for j in range(p):
        v = W[:, j]
        rj = jnp.zeros(p, FC)
        if j > 0:
            Qj = jnp.stack(cols, axis=1)          # n×j
            if algo == "gs":
                coef = jnp.conj(Qj.T) @ v
                v = v - Qj @ coef
            else:                                  # mgs: sequential
                coefs = []
                for i in range(j):
                    ci = jnp.vdot(cols[i], v)
                    v = v - ci * cols[i]
                    coefs.append(ci)
                coef = jnp.stack(coefs)
            rj = rj.at[:j].set(coef)
        nrm = jnp.linalg.norm(v)
        rj = rj.at[j].set(nrm.astype(FC))
        cols.append(v / jnp.where(nrm == 0, 1, nrm).astype(FC))
        rows.append(rj)
    return jnp.stack(cols, axis=1), jnp.stack(rows, axis=0).T


@_hi
def block_hermitian_lanczos(A, B, k, algo="householder"):
    """V (n, (k+1)p), Ψ₁ (p,p), T ((k+1)p, kp) — reference :20-117."""
    A = as_operator(A)
    B = jnp.asarray(B)
    n, p = B.shape
    FC = B.dtype
    T = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(FC))
    V1, Psi1 = _block_qr(B, algo)
    Vs = [V1]
    Psi_prev = None
    for i in range(k):
        Q = A.matmat(Vs[i])
        if i >= 1:
            Q = Q - Vs[i - 1] @ jnp.conj(Psi_prev.T)
        Omega = jnp.conj(Vs[i].T) @ Q
        Q = Q - Vs[i] @ Omega
        Vn, Psi = _block_qr(Q, algo)
        T[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(Omega)
        T[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(Psi)
        if i + 1 < k:
            T[i * p:(i + 1) * p, (i + 1) * p:(i + 2) * p] = np.asarray(
                jnp.conj(Psi.T))
        Vs.append(Vn)
        Psi_prev = Psi
    return jnp.concatenate(Vs, axis=1), Psi1, jnp.asarray(T)


@_hi
def block_arnoldi(A, B, k, algo="householder", reorthogonalization=False):
    """V, Γ, H — block Arnoldi (reference :249-325)."""
    A = as_operator(A)
    B = jnp.asarray(B)
    n, p = B.shape
    H = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(B.dtype))
    V1, Gamma = _block_qr(B, algo)
    Vs = [V1]
    for j in range(k):
        Q = A.matmat(Vs[j])
        for i in range(j + 1):
            Hij = jnp.conj(Vs[i].T) @ Q
            H[i * p:(i + 1) * p, j * p:(j + 1) * p] = np.asarray(Hij)
            Q = Q - Vs[i] @ Hij
        if reorthogonalization:
            for i in range(j + 1):
                Htmp = jnp.conj(Vs[i].T) @ Q
                H[i * p:(i + 1) * p, j * p:(j + 1) * p] += np.asarray(Htmp)
                Q = Q - Vs[i] @ Htmp
        Vn, Hj = _block_qr(Q, algo)
        H[(j + 1) * p:(j + 2) * p, j * p:(j + 1) * p] = np.asarray(Hj)
        Vs.append(Vn)
    return jnp.concatenate(Vs, axis=1), Gamma, jnp.asarray(H)


@_hi
def block_golub_kahan(A, B, k, algo="householder"):
    """V, U, Ψ₁, L — block Golub-Kahan (reference :326-441)."""
    A = as_operator(A, need_adjoint=True)
    B = jnp.asarray(B)
    m, p = B.shape
    FC = B.dtype
    L = np.zeros(((k + 1) * p, (k + 1) * p), dtype=np.dtype(FC))
    U1, Psi1 = _block_qr(B, algo)
    Us = [U1]
    Vs = []
    Psi = Psi1
    for i in range(k + 1):
        P = A.rmatmat(Us[i])
        if i >= 1:
            P = P - Vs[i - 1] @ jnp.conj(TT.T)
        Vn, Omega = _block_qr(P, algo)
        L[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(jnp.conj(Omega.T))
        Vs.append(Vn)
        if i < k:
            Q = A.matmat(Vn) - Us[i] @ jnp.conj(Omega.T)
            Un, TT = _block_qr(Q, algo)
            L[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(TT)
            Us.append(Un)
    return (jnp.concatenate(Vs, axis=1), jnp.concatenate(Us, axis=1),
            Psi1, jnp.asarray(L))


@_hi
def block_nonhermitian_lanczos(A, B, C, k, algo="householder"):
    """Block bi-Lanczos (reference :118-248).

    Normalization: V blocks orthonormal (QR), U blocks scaled so
    UᵢᴴVᵢ = I; the off-diagonal coefficients are computed as explicit
    biorthogonal projections (Uⱼᴴ·, Vⱼᴴ·) so A·V = V·T and AᴴU = U·Tᴴ
    hold columnwise by construction.
    """
    A = as_operator(A, need_adjoint=True)
    B = jnp.asarray(B)
    C = jnp.asarray(C, dtype=B.dtype)
    n, p = B.shape
    FC = B.dtype
    T = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(FC))
    Th = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(FC))
    V1, Psi1 = _block_qr(B, algo)
    D1 = jnp.conj(C.T) @ V1          # = Γ₁ᴴΨ... pairing
    U1 = C @ jnp.linalg.inv(jnp.conj(D1.T))
    Vs, Us = [V1], [U1]
    for i in range(k):
        Q = A.matmat(Vs[i])
        P = A.rmatmat(Us[i])
        if i >= 1:
            Gm = jnp.conj(Us[i - 1].T) @ Q
            Bm = jnp.conj(Vs[i - 1].T) @ P
            Q = Q - Vs[i - 1] @ Gm
            P = P - Us[i - 1] @ Bm
            T[(i - 1) * p:i * p, i * p:(i + 1) * p] = np.asarray(Gm)
            Th[(i - 1) * p:i * p, i * p:(i + 1) * p] = np.asarray(Bm)
        Omega = jnp.conj(Us[i].T) @ Q
        OmegaH = jnp.conj(Vs[i].T) @ P
        Q = Q - Vs[i] @ Omega
        P = P - Us[i] @ OmegaH
        T[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(Omega)
        Th[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(OmegaH)
        Vn, beta_n = _block_qr(Q, algo)
        Dn = jnp.conj(P.T) @ Vn
        Un = P @ jnp.linalg.inv(jnp.conj(Dn.T))
        T[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(beta_n)
        Th[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(
            jnp.conj(Dn.T))
        Vs.append(Vn)
        Us.append(Un)
    return (jnp.concatenate(Vs, axis=1), Psi1, jnp.asarray(T),
            jnp.concatenate(Us, axis=1), jnp.conj(D1.T), jnp.asarray(Th))


@_hi
def block_saunders_simon_yip(A, B, C, k, algo="householder"):
    """Block SSY tridiagonalization (reference :442-582)."""
    A = as_operator(A, need_adjoint=True)
    B = jnp.asarray(B)
    C = jnp.asarray(C, dtype=B.dtype)
    m, p = B.shape
    FC = B.dtype
    T = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(FC))
    Th = np.zeros(((k + 1) * p, k * p), dtype=np.dtype(FC))
    V1, Psi1 = _block_qr(B, algo)
    U1, Phi1 = _block_qr(C, algo)
    Vs, Us = [V1], [U1]
    beta_prev = gamma_prev = None
    for i in range(k):
        Q = A.matmat(Us[i])
        P = A.rmatmat(Vs[i])
        if i >= 1:
            Q = Q - Vs[i - 1] @ jnp.conj(gamma_prev.T)
            P = P - Us[i - 1] @ jnp.conj(beta_prev.T)
        Omega = jnp.conj(Vs[i].T) @ Q
        Q = Q - Vs[i] @ Omega
        P = P - Us[i] @ jnp.conj(Omega.T)
        Vn, beta_n = _block_qr(Q, algo)
        Un, gamma_n = _block_qr(P, algo)
        T[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(Omega)
        Th[i * p:(i + 1) * p, i * p:(i + 1) * p] = np.asarray(jnp.conj(Omega.T))
        T[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(beta_n)
        Th[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = np.asarray(gamma_n)
        if i + 1 < k:
            T[i * p:(i + 1) * p, (i + 1) * p:(i + 2) * p] = np.asarray(
                jnp.conj(gamma_n.T))
            Th[i * p:(i + 1) * p, (i + 1) * p:(i + 2) * p] = np.asarray(
                jnp.conj(beta_n.T))
        beta_prev, gamma_prev = beta_n, gamma_n
        Vs.append(Vn)
        Us.append(Un)
    return (jnp.concatenate(Vs, axis=1), Psi1, jnp.asarray(T),
            jnp.concatenate(Us, axis=1), Phi1, jnp.asarray(Th))


@_hi
def block_montoison_orban(A, B, D, C, k, algo="householder",
                          reorthogonalization=False):
    """Block orthogonal Hessenberg reduction (reference :583-666).

    Note the argument order (A, B, D, C): operators A, B and right-hand
    blocks D (for V) and C (for U).
    """
    A = as_operator(A)
    B = as_operator(B)
    D = jnp.asarray(D)
    C = jnp.asarray(C, dtype=D.dtype)
    H = np.zeros(((k + 1) * D.shape[1], k * D.shape[1]), dtype=np.dtype(D.dtype))
    F = np.zeros_like(H)
    p = D.shape[1]
    V1, Gamma = _block_qr(D, algo)
    U1, Lambda = _block_qr(C, algo)
    Vs, Us = [V1], [U1]
    for j in range(k):
        Q = A.matmat(Us[j])
        P = B.matmat(Vs[j])
        for i in range(j + 1):
            Hij = jnp.conj(Vs[i].T) @ Q
            Fij = jnp.conj(Us[i].T) @ P
            H[i * p:(i + 1) * p, j * p:(j + 1) * p] = np.asarray(Hij)
            F[i * p:(i + 1) * p, j * p:(j + 1) * p] = np.asarray(Fij)
            Q = Q - Vs[i] @ Hij
            P = P - Us[i] @ Fij
        Vn, Hj = _block_qr(Q, algo)
        Un, Fj = _block_qr(P, algo)
        H[(j + 1) * p:(j + 2) * p, j * p:(j + 1) * p] = np.asarray(Hj)
        F[(j + 1) * p:(j + 2) * p, j * p:(j + 1) * p] = np.asarray(Fj)
        Vs.append(Vn)
        Us.append(Un)
    return (jnp.concatenate(Vs, axis=1), Gamma, jnp.asarray(H),
            jnp.concatenate(Us, axis=1), Lambda, jnp.asarray(F))
