"""Test problem generators mirroring the reference fixture zoo.

Numpy/scipy ports of /root/reference/test/test_utils.jl:18-429,
test/get_div_grad.jl and test/gen_lsq.jl.  All generators use 1-based
index formulas like the originals so the matrices (and hence iteration
counts) match exactly.  FC is a numpy dtype (np.float64 / np.complex128).
"""

import numpy as np
import scipy.sparse as sp

from krylov_tpu.ops.sparse import csr_from_coo


def _complex(FC):
    return np.issubdtype(np.dtype(FC), np.complexfloating)


def to_csr(A_scipy, dtype=None):
    A = sp.coo_matrix(A_scipy)
    return csr_from_coo(A.row, A.col, A.data, A.shape, dtype=dtype)


# --- div_grad 3-D Poisson (reference test/get_div_grad.jl:8-27) -----------

def ddx(n):
    e = np.ones(n)
    return sp.coo_matrix(
        (np.concatenate([-e, e]),
         (np.concatenate([np.arange(n), np.arange(n)]),
          np.concatenate([np.arange(n), np.arange(1, n + 1)]))),
        shape=(n, n + 1),
    )


def get_div_grad(n1, n2, n3):
    I1, I2, I3 = sp.eye(n1), sp.eye(n2), sp.eye(n3)
    D1 = sp.kron(I3, sp.kron(I2, ddx(n1)))
    D2 = sp.kron(I3, sp.kron(ddx(n2), I1))
    D3 = sp.kron(ddx(n3), sp.kron(I2, I1))
    Div = sp.hstack([D1, D2, D3])
    return (Div @ Div.T).tocsr()


# --- linear system generators (test_utils.jl) ------------------------------

def symmetric_definite(n=10, FC=np.float64):
    alpha = 1j if _complex(FC) else 1.0
    A = sp.diags(
        [alpha * np.ones(n - 1), 4 * np.ones(n), np.conj(alpha) * np.ones(n - 1)],
        [-1, 0, 1],
    ).astype(FC)
    b = A @ np.arange(1, n + 1).astype(FC)
    return A.toarray(), b


def symmetric_indefinite(n=10, FC=np.float64, shift=0):
    alpha = 1j if _complex(FC) else 1.0
    A = sp.diags(
        [alpha * np.ones(n - 1), np.ones(n), np.conj(alpha) * np.ones(n - 1)],
        [-1, 0, 1],
    ).astype(FC) - shift * sp.eye(n).astype(FC)
    b = A @ np.arange(1, n + 1).astype(FC)
    return A.toarray(), b


def system_zero_quad(n=2, FC=np.float64):
    A = np.zeros((n, n), dtype=FC)
    A[0, 0] = 1
    A[1, 1] = -1
    b = np.zeros(n, dtype=FC)
    b[0] = 1
    b[1] = 1
    return A, b


def nonsymmetric_definite(n=10, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    if _complex(FC):
        A = np.where(i == j, n + 0j, 1j).astype(FC)
    else:
        A = np.where(i == j, float(n), np.where(i < j, 1.0, -1.0)).astype(FC)
    b = A @ np.arange(1, n + 1).astype(FC)
    return A, b


def nonsymmetric_indefinite(n=10, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    if _complex(FC):
        A = np.where(i == j, n * (-1.0 + 0j) ** (i * j), 1j).astype(FC)
    else:
        A = np.where(
            i == j, n * (-1.0) ** (i * j), np.where(i < j, 1.0, -1.0)
        ).astype(FC)
    b = A @ np.arange(1, n + 1).astype(FC)
    return A, b


def under_consistent(n=10, m=25, FC=np.float64):
    alpha = 1j if _complex(FC) else 1.0
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, m + 1)[None, :]
    A = (i / j - alpha * j / i).astype(FC)
    b = A @ np.ones(m, dtype=FC)
    return A, b


def under_inconsistent(n=10, m=25, FC=np.float64):
    alpha = (1 + 1j) if _complex(FC) else 1.0
    A = alpha * np.ones((n, m), dtype=FC)
    b = np.arange(1, n + 1).astype(FC)
    b[0] = -1
    return A, b


def square_consistent(n=10, FC=np.float64):
    alpha = 1j if _complex(FC) else 1.0
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = (i / j - alpha * j / i).astype(FC)
    b = A @ np.ones(n, dtype=FC)
    return A, b


def square_inconsistent(n=10, FC=np.float64):
    A = np.eye(n, dtype=FC)
    A[0, 0] = 0
    b = np.ones(n, dtype=FC)
    return A, b


def symmetric_inconsistent():
    A = np.array([
        [3.0, 2.0, -1.0, 5.0],
        [2.0, -2.0, 4.0, 0.0],
        [-1.0, 4.0, 1.0, 3.0],
        [5.0, 0.0, 3.0, 5.0],
    ])
    b = np.array([1.0, -8.0, 5.0, 2.0])
    return A, b


def over_consistent(n=25, m=10, FC=np.float64):
    alpha = 1j if _complex(FC) else 1.0
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, m + 1)[None, :]
    A = (i / j - alpha * j / i).astype(FC)
    b = A @ np.ones(m, dtype=FC)
    return A, b


def over_inconsistent(n=25, m=10, FC=np.float64):
    alpha = (1 + 1j) if _complex(FC) else 1.0
    A = alpha * np.ones((n, m), dtype=FC)
    b = np.arange(1, n + 1).astype(FC)
    b[0] = -1
    return A, b


def sparse_laplacian(n=16, FC=np.float64):
    A = get_div_grad(n, n, n)
    b = np.ones(n ** 3, dtype=FC)
    return to_csr(A, dtype=FC), b


def kron_unsymmetric(n=8, FC=np.float64):
    A = sp.diags(
        [np.full(n - 1, -1.0), np.full(n, 3.0), np.full(n - 1, -2.0)], [-1, 0, 1]
    )
    Id = sp.eye(n)
    A = sp.kron(A, Id) + sp.kron(Id, A)
    A = sp.kron(A, Id) + sp.kron(Id, A)
    N = A.shape[0]
    b = A @ np.ones(N)
    return to_csr(A, dtype=FC), b.astype(FC)


def almost_singular(n=16, FC=np.float64):
    A = get_div_grad(n, n, n).astype(FC) - 5 * sp.eye(n ** 3, dtype=FC)
    b = A @ np.ones(n ** 3, dtype=FC)
    return to_csr(A, dtype=FC), b


def singular_consistent(n=10, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = (i * j).astype(FC) + 5 * np.eye(n, dtype=FC)
    A[:, 0] = A[:, 1] = A[1, :] = A[0, :] = 1
    b = A @ np.ones(n, dtype=FC)
    return A, b


def symmetric_breakdown(FC=np.float64):
    A = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=FC)
    b = np.array([1.0, 0.0], dtype=FC)
    return A, b


def unsymmetric_breakdown(FC=np.float64):
    A = np.array([[0.0, 1.0], [-1.0, 0.0]], dtype=FC)
    b = np.array([1.0, 0.0], dtype=FC)
    c = np.array([-1.0, 0.0], dtype=FC)
    return A, b, c


def bc_breakdown(FC=np.float64):
    A = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=FC)
    b = np.array([0.0, 1.0], dtype=FC)
    c = np.array([1.0, 0.0], dtype=FC)
    return A, b, c


def underdetermined_adjoint(n=100, m=200, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, m + 1)[None, :]
    A = np.where(i == j, 10.0, np.where(i < j, 1.0, -1.0)).astype(FC)
    b = A @ np.arange(1, m + 1).astype(FC)
    c = A.conj().T @ np.arange(-n, 0).astype(FC)
    return A, b, c


def square_adjoint(n=100, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = np.where(i == j, 10.0, np.where(i < j, 1.0, -1.0)).astype(FC)
    b = A @ np.arange(1, n + 1).astype(FC)
    c = A.conj().T @ np.arange(-n, 0).astype(FC)
    return A, b, c


def rectangular_adjoint(n=10, m=25, FC=np.float64):
    AH, c = over_inconsistent(m, n, FC=FC)
    A = AH.conj().T
    b = A @ np.ones(m, dtype=FC)
    return A, b, c


def overdetermined_adjoint(n=200, m=100, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, m + 1)[None, :]
    A = np.where(i == j, 10.0, np.where(i < j, 1.0, -1.0)).astype(FC)
    b = A @ np.arange(1, m + 1).astype(FC)
    c = A.conj().T @ np.arange(-n, 0).astype(FC)
    return A, b, c


def square_preconditioned(n=10, FC=np.float64):
    A = np.ones((n, n), dtype=FC) + (n - 1) * np.eye(n, dtype=FC)
    b = 10 * np.arange(1, n + 1).astype(FC)
    M_inv = (1.0 / n) * np.eye(n, dtype=FC)
    return A, b, M_inv


def two_preconditioners(n=10, m=20, FC=np.float64):
    A = np.ones((n, n), dtype=FC) + (n - 1) * np.eye(n, dtype=FC)
    b = np.ones(n, dtype=FC)
    M_inv = (1.0 / np.sqrt(n)) * np.eye(n, dtype=FC)
    N_inv = (1.0 / np.sqrt(m)) * np.eye(n, dtype=FC)
    return A, b, M_inv, N_inv


def zero_rhs(n=10, FC=np.float64):
    rng = np.random.default_rng(1234)
    A = rng.random((n, n)).astype(FC)
    if _complex(FC):
        A = A + 1j * rng.random((n, n)).astype(FC)
    b = np.zeros(n, dtype=FC)
    return A, b


def regularization(n=5, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = (2.0 ** (i / j) * j + (-1.0) ** (i - j) * n * (i - 1)).astype(FC)
    b = np.ones(n, dtype=FC)
    lam = 4.0
    return A, b, lam


def saddle_point(n=5, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = (2.0 ** (i / j) * j + (-1.0) ** (i - j) * n * (i - 1)).astype(FC)
    b = np.ones(n, dtype=FC)
    D = np.diag(2.0 * np.arange(1, n + 1)).astype(FC)
    return A, b, D


def small_sp(transpose=False, FC=np.float64):
    A = np.array([[1.0, 0.0], [0.0, -1.0], [3.0, 0.0]], dtype=FC)
    if transpose:
        A = A.T.copy()
    n, m = A.shape
    b = np.ones(n, dtype=FC)
    c = -np.ones(m, dtype=FC)
    D = np.diag(2.0 * np.arange(1, n + 1)).astype(FC)
    return A, b, c, D


def gsp(transpose=False, FC=np.float64):
    A = np.array([[1.0, 0.0], [0.0, -1.0], [3.0, 0.0]], dtype=FC)
    B = np.array([[0.0, 2.0, 4.0], [-3.0, 0.0, 0.0]], dtype=FC)
    if transpose:
        A, B = A.T.copy(), B.T.copy()
    n, m = A.shape
    b = np.ones(n, dtype=FC)
    c = -np.ones(m, dtype=FC)
    M = np.diag(2.0 * np.arange(1, n + 1)).astype(FC)
    N = np.diag(16.0 * np.arange(1, m + 1)).astype(FC)
    return A, B, b, c, M, N


def sqd(n=5, FC=np.float64):
    i = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    A = (2.0 ** (i / j) * j + (-1.0) ** (i - j) * n * (i - 1)).astype(FC)
    b = np.ones(n, dtype=FC)
    M = np.diag(3.0 * np.arange(1, n + 1)).astype(FC)
    N = np.diag(5.0 * np.arange(1, n + 1)).astype(FC)
    return A, b, M, N


def small_sqd(transpose=False, FC=np.float64):
    A = np.array([[1.0, 0.0], [0.0, -1.0], [3.0, 0.0]], dtype=FC)
    if transpose:
        A = A.T.copy()
    n, m = A.shape
    b = np.ones(n, dtype=FC)
    c = -np.ones(m, dtype=FC)
    M = np.diag(3.0 * np.arange(1, n + 1)).astype(FC)
    N = np.diag(5.0 * np.arange(1, m + 1)).astype(FC)
    return A, b, c, M, N


def warm_start_system(n=8, FC=np.float64):
    A = get_div_grad(n, n, n).astype(FC)
    b = A @ np.ones(n ** 3, dtype=FC)
    return to_csr(A, dtype=FC), b


def ssy_mo_breakdown(transpose=False, FC=np.float64):
    if transpose:
        A = np.array([[1, -1], [0, 1], [-1, 0]], dtype=FC)
    else:
        A = np.array([[1, 0, -1], [-1, 1, 0]], dtype=FC)
    n, m = A.shape
    b = np.ones(n, dtype=FC)
    c = np.ones(m, dtype=FC)
    return A, b, c


def small_ln(FC=np.float64):
    A = np.array([[0.0, 1.0]], dtype=FC)
    b = np.array([1.0], dtype=FC)
    return A, b


# --- gen_lsq (reference test/gen_lsq.jl:2-54) ------------------------------

def lstp(nrow, ncol, ndupl, npower, lam, x):
    """LSQR-paper least-squares test problem with known solution."""
    assert nrow >= ncol
    fourpi = 4 * 3.141592
    alpha = fourpi / nrow
    beta = fourpi / ncol
    hy = np.sin(np.arange(1, nrow + 1) * alpha)
    hz = np.cos(np.arange(1, ncol + 1) * beta)

    hy /= np.linalg.norm(hy)
    HY = np.eye(nrow) - 2 * np.outer(hy, hy)
    hz /= np.linalg.norm(hz)
    HZ = np.eye(ncol) - 2 * np.outer(hz, hz)

    d = ((np.arange(ncol) + ndupl) // ndupl * ndupl / ncol) ** npower
    D = np.zeros((nrow, ncol))
    np.fill_diagonal(D, d)
    A = HY @ D @ HZ

    Acond = abs(d[ncol - 1] / d[0])

    r = np.zeros(nrow)
    x = np.asarray(x, dtype=np.float64)
    r[:ncol] = (HZ @ x) / d
    t = 1.0
    for i in range(ncol, nrow):
        j = i - ncol + 1
        r[i] = t * j / nrow
        t = -t
    r = HY @ r

    rnorm = np.linalg.norm(r)
    b = r + A @ x
    return b, A, D, HY, HZ, Acond, rnorm


def gen_lsq(nrow=25, ncol=10, ndupl=1, npower=1, damp=0.0):
    x = ncol - np.arange(1, ncol + 1.0)
    return lstp(nrow, ncol, ndupl, npower, damp, x)


# --- helpers ---------------------------------------------------------------

def metric(r, P):
    """Energy norm √(rᴴ P r) (reference test/get_div_grad.jl:5)."""
    return np.sqrt(np.real(np.vdot(r, P @ r)))


def check_min_norm(A, b, x, atol=1e-12):
    """Minimum-norm check via dense least squares oracle."""
    xmin, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    return np.linalg.norm(np.asarray(x) - xmin) <= atol * max(
        1.0, np.linalg.norm(xmin)
    )
