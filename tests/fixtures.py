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


# --- ODE / PDE adjoint generators (reference test/get_div_grad.jl:28-240) --

def ODE(n, f, g, ode_coefs, dim_x=(0.0, 1.0)):
    xl, xr = dim_x
    dx = (xr - xl) / (n + 1)
    grid = np.array([i * dx for i in range(1, n + 1)])
    c1, c2, c3 = ode_coefs
    A = np.zeros((n, n))
    for i in range(n):
        if i != 0:
            A[i, i - 1] = c1 / (dx * dx) - c2 / (2 * dx)
        A[i, i] = -2 * c1 / (dx * dx) + c3
        if i != n - 1:
            A[i, i + 1] = c1 / (dx * dx) + c2 / (2 * dx)
    return A, f(grid), g(grid)


def PDE(n, m, f, g, pde_coefs, dim_x=(0.0, 1.0), dim_y=(0.0, 1.0)):
    xl, xr = dim_x
    yl, yr = dim_y
    dx = (xr - xl) / (n + 1)
    dy = (yr - yl) / (m + 1)
    x = np.array([xl + i * dx for i in range(1, n + 1)])
    y = np.array([yl + j * dy for j in range(1, m + 1)])
    a, bb, c, d, e = pde_coefs
    A = sp.lil_matrix((n * m, n * m))
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            k = (i - 1) + n * (j - 1)
            A[k, k] = -2 * a / dx**2 - 2 * bb / dy**2 + e
            if i >= 2:
                A[k, k - 1] = a / dx**2 - c / (2 * dx)
            if i <= n - 1:
                A[k, k + 1] = a / dx**2 + c / (2 * dx)
            if j >= 2:
                A[k, k - n] = bb / dy**2 - d / (2 * dy)
            if j <= m - 1:
                A[k, k + n] = bb / dy**2 + d / (2 * dy)
    bvec = np.array([f(x[i], y[j]) for j in range(m) for i in range(n)])
    cvec = np.array([g(x[i], y[j]) for j in range(m) for i in range(n)])
    return A.tocsr(), bvec, cvec


def adjoint_ode(n=50, FC=np.float64):
    c1 = c2 = c3 = 1.0
    f = lambda x: (-c1 * np.pi**2 + c3) * np.sin(np.pi * x) \
        + c2 * np.pi * np.cos(np.pi * x)
    g = lambda x: np.exp(x)
    A, b, c = ODE(n, f, g, [c1, c2, c3])
    return A.astype(FC), b.astype(FC), c.astype(FC)


def adjoint_pde(n=50, m=50, FC=np.float64):
    k1, k2, k3 = 5.0, 20.0, 0.0
    f = lambda x, y: ((-2 * k1 * np.pi**2 + k3) * np.sin(np.pi * x)
                      * np.sin(np.pi * y)
                      + k2 * np.pi * np.cos(np.pi * x) * np.sin(np.pi * y)
                      + k2 * np.pi * np.sin(np.pi * x) * np.cos(np.pi * y))
    g = lambda x, y: np.exp(x + y)
    A, b, c = PDE(n, m, f, g, [k1, k1, k2, k2, k3])
    return A.toarray().astype(FC), b.astype(FC), c.astype(FC)


def polar_poisson(n=50, m=50, FC=np.float64, R=1.0):
    fr = lambda r, t: -3.0 * np.cos(t)
    gr = lambda r, t: 0.0
    dr = 2 * R / (2 * n + 1)
    r = np.array([(i - 0.5) * dr for i in range(1, n + 2)])
    dth = 2 * np.pi / m
    th = np.array([(j - 1) * dth for j in range(1, m + 2)])
    lam = np.array([1.0 / (2 * (k - 0.5)) for k in range(1, n + 1)])
    beta = np.array([1.0 / ((k - 0.5) ** 2 * dth**2) for k in range(1, n + 1)])
    D = sp.diags(beta)
    T = sp.diags([1.0 - lam[1:n], -2.0 * np.ones(n), 1.0 + lam[:n - 1]],
                 [-1, 0, 1])
    A = sp.lil_matrix((n * m, n * m))
    for k in range(m):
        A[k * n:(k + 1) * n, k * n:(k + 1) * n] = (T - 2 * D).toarray()
        if k <= m - 2:
            A[(k + 1) * n:(k + 2) * n, k * n:(k + 1) * n] = D.toarray()
            A[k * n:(k + 1) * n, (k + 1) * n:(k + 2) * n] = D.toarray()
    A[(m - 1) * n:m * n, 0:n] = D.toarray()
    A[0:n, (m - 1) * n:m * n] = D.toarray()
    b = np.zeros(n * m)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            b[i - 1 + n * (j - 1)] = dr * dr * fr(r[i - 1], th[j - 1])
            if i == n:
                b[i - 1 + n * (j - 1)] -= (1.0 + lam[n - 1]) * gr(R, th[j - 1])
    return to_csr(A.tocsr(), dtype=FC), b.astype(FC)


def cartesian_poisson(n=50, m=50, FC=np.float64):
    f = lambda x, y: -2.0 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    A, b, c = PDE(n, m, f, lambda x, y: 0.0, [1.0, 1.0, 0.0, 0.0, 0.0])
    return to_csr(A, dtype=FC), b.astype(FC)


# ---------------------------------------------------------------------------
# Universal per-method driver: solve ANY of the 39 METHOD_TABLE entries on
# a small well-conditioned problem in a given dtype.  Shared by the full
# mixed-precision sweep (reference test/test_mp.jl) and the storage /
# no-retrace contract tests.
# ---------------------------------------------------------------------------

SPD_METHODS = ("cg", "cr", "car", "cg_lanczos", "symmlq", "minres",
               "minres_qlp", "minares")
NONSYM_METHODS = ("cgs", "bicgstab", "bilq", "qmr", "fom", "gmres", "fgmres",
                  "diom", "dqgmres")
USYM_METHODS = ("usymlq", "usymqr")
LS_METHODS = ("lsqr", "lsmr", "lslq", "cgls", "crls")
LN_METHODS = ("cgne", "crmr", "lnlq", "craig", "craigmr")
TWO_OUT_SQ = ("bilqr",)
RECT_PAIR = ("trilqr", "usymlqr", "tricg", "trimr")
ALL_METHODS = (SPD_METHODS + ("cg_lanczos_shift",) + NONSYM_METHODS
               + USYM_METHODS + LS_METHODS + ("cgls_lanczos_shift",)
               + LN_METHODS + TWO_OUT_SQ + RECT_PAIR
               + ("gpmr", "block_minres", "block_gmres"))


def _mk(dtype, arr):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(arr), dtype=dtype)


def drive_method(method, dtype, n=10, m=14, **kw):
    """Solve `method` on a small fixture in `dtype`.

    Returns (relative_residual: float, stats, extras: dict) where the
    residual is the natural optimality measure of the family (true
    residual, normal equations, saddle residual, ...), computed in f64.
    """
    import jax.numpy as jnp
    import krylov_tpu as kt

    is_cplx = np.dtype(dtype) in (np.dtype(np.complex64),
                                  np.dtype(np.complex128))
    rng = np.random.default_rng(42)

    def spd(k):
        A = np.diag(4.0 * np.ones(k)) + np.diag(-np.ones(k - 1), 1) \
            + np.diag(-np.ones(k - 1), -1)
        if is_cplx:
            A = A.astype(np.complex128)
            od = (0.5 + 0.25j) * np.ones(k - 1)
            A += np.diag(od, 1) + np.diag(od.conj(), -1)
        return A

    def nonsym(k):
        A = np.diag(4.0 * np.ones(k)) + np.diag(-2.0 * np.ones(k - 1), -1) \
            + np.diag(-np.ones(k - 1), 1)
        if is_cplx:
            A = A.astype(np.complex128) + 0.3j * np.diag(np.ones(k))
        return A

    def tall(mm, nn):
        A = np.zeros((mm, nn))
        for i in range(mm):
            if i < nn:
                A[i, i] = 2.0 + 0.05 * i
            if 0 <= i - 1 < nn:
                A[i, i - 1] = 0.5
        if is_cplx:
            A = A.astype(np.complex128)
            A[0, 0] += 0.25j
        return A

    def f64(v):
        return np.asarray(v, dtype=np.complex128 if is_cplx else np.float64)

    if method in SPD_METHODS:
        A = spd(n)
        b = A @ np.ones(n)
        x, stats = kt.krylov_solve(method, _mk(dtype, A), _mk(dtype, b), **kw)
        r = f64(b) - f64(A) @ f64(x)
        return float(np.linalg.norm(r) / np.linalg.norm(b)), stats, {"x": x}

    if method == "cg_lanczos_shift":
        A = spd(n)
        b = A @ np.ones(n)
        shifts = [0.0, 0.5]
        x, stats = kt.cg_lanczos_shift(_mk(dtype, A), _mk(dtype, b), shifts,
                                       **kw)
        r = f64(b) - (f64(A) + 0.5 * np.eye(n)) @ f64(x[1])
        return float(np.linalg.norm(r) / np.linalg.norm(b)), stats, {"x": x}

    if method in NONSYM_METHODS:
        A = nonsym(n)
        b = A @ np.ones(n)
        x, stats = kt.krylov_solve(method, _mk(dtype, A), _mk(dtype, b), **kw)
        r = f64(b) - f64(A) @ f64(x)
        return float(np.linalg.norm(r) / np.linalg.norm(b)), stats, {"x": x}

    if method in USYM_METHODS:
        A = nonsym(n)
        b = A @ np.ones(n)
        c = b + 0.1 * rng.standard_normal(n)
        x, stats = kt.krylov_solve(method, _mk(dtype, A), _mk(dtype, b),
                                   c=_mk(dtype, c), **kw)
        r = f64(b) - f64(A) @ f64(x)
        return float(np.linalg.norm(r) / np.linalg.norm(b)), stats, {"x": x}

    if method in LS_METHODS or method == "cgls_lanczos_shift":
        A = tall(m, n)
        b = A @ np.ones(n) + 0.01 * np.concatenate(
            [np.zeros(n), np.ones(m - n)])
        if method == "cgls_lanczos_shift":
            x, stats = kt.cgls_lanczos_shift(_mk(dtype, A), _mk(dtype, b),
                                             [0.0, 0.1], **kw)
            xx = f64(x[0])
        else:
            x, stats = kt.krylov_solve(method, _mk(dtype, A), _mk(dtype, b),
                                       **kw)
            xx = f64(x)
        Ar = f64(A).conj().T @ (f64(b) - f64(A) @ xx)
        return float(np.linalg.norm(Ar) / np.linalg.norm(b)), stats, {"x": x}

    if method in LN_METHODS:
        A = tall(m, n).conj().T          # wide n×m
        b = A @ np.ones(m)
        out = kt.krylov_solve(method, _mk(dtype, A), _mk(dtype, b), **kw)
        if len(out) == 3:
            x, y, stats = out
        else:
            x, stats = out
        r = f64(b) - f64(A) @ f64(x)
        return float(np.linalg.norm(r) / np.linalg.norm(b)), stats, {"x": x}

    if method in TWO_OUT_SQ:
        A = nonsym(n)
        b = A @ np.ones(n)
        c = A.conj().T @ np.ones(n)
        x, y, stats = kt.bilqr(_mk(dtype, A), _mk(dtype, b), _mk(dtype, c),
                               **kw)
        r = f64(b) - f64(A) @ f64(x)
        s = f64(c) - f64(A).conj().T @ f64(y)
        rr = np.sqrt(np.linalg.norm(r) ** 2 + np.linalg.norm(s) ** 2)
        return float(rr / np.linalg.norm(b)), stats, {"x": x, "y": y}

    if method in RECT_PAIR:
        A = tall(m, n)
        if method == "trilqr":
            b = A @ np.ones(n)
            c = rng.standard_normal(n)
            x, y, stats = kt.trilqr(_mk(dtype, A), _mk(dtype, b),
                                    _mk(dtype, c), **kw)
            s = f64(c) - f64(A).conj().T @ f64(y)
            return float(np.linalg.norm(s) / np.linalg.norm(c)), stats, \
                {"x": x, "y": y}
        if method == "usymlqr":
            # both subproblems consistent: the LS sweep's residual stop
            # needs b ∈ range(A) and the LN sweep needs c ∈ range(Aᴴ)
            xs = 0.1 * rng.standard_normal(m)
            ys = rng.standard_normal(n)
            b = np.asarray(A @ ys)
            c = np.asarray(A.conj().T @ xs)
            x, y, stats = kt.usymlqr(_mk(dtype, A), _mk(dtype, b),
                                     _mk(dtype, c), **kw)
            top = f64(b) - (f64(x) + f64(A) @ f64(y))
            bot = f64(c) - f64(A).conj().T @ f64(x)
            rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
            return float(rr / np.linalg.norm(b)), stats, {"x": x, "y": y}
        # tricg / trimr on [I A; Aᴴ -I]; ‖A‖ < 1 keeps the orthogonal
        # tridiagonalization well-behaved at every precision (the short
        # recurrence drifts past the breakdown point otherwise — the
        # reference's sqd fixtures are scaled the same way).
        A = 0.3 * A
        b = rng.standard_normal(m)
        c = rng.standard_normal(n)
        fn = kt.tricg if method == "tricg" else kt.trimr
        x, y, stats = fn(_mk(dtype, A), _mk(dtype, b), _mk(dtype, c), **kw)
        top = f64(b) - (f64(x) + f64(A) @ f64(y))
        bot = f64(c) - (f64(A).conj().T @ f64(x) - f64(y))
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        return float(rr / np.linalg.norm(b)), stats, {"x": x, "y": y}

    if method == "gpmr":
        A = tall(m, n)
        B = A.conj().T
        b = rng.standard_normal(m)
        c = rng.standard_normal(n)
        x, y, stats = kt.gpmr(_mk(dtype, A), _mk(dtype, B), _mk(dtype, b),
                              _mk(dtype, c), **kw)
        top = f64(b) - (f64(x) + f64(A) @ f64(y))
        bot = f64(c) - (f64(B) @ f64(x) + f64(y))
        rr = np.sqrt(np.linalg.norm(top) ** 2 + np.linalg.norm(bot) ** 2)
        return float(rr / np.linalg.norm(b)), stats, {"x": x, "y": y}

    if method in ("block_minres", "block_gmres"):
        p = 2
        A = spd(n) if method == "block_minres" else nonsym(n)
        Bm = A @ np.ones((n, p))
        fn = kt.block_minres if method == "block_minres" else kt.block_gmres
        X, stats = fn(_mk(dtype, A), _mk(dtype, Bm), **kw)
        R = f64(Bm) - f64(A) @ f64(X)
        return float(np.linalg.norm(R) / np.linalg.norm(Bm)), stats, {"x": X}

    raise ValueError(f"unknown method {method}")
