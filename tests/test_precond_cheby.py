"""Chebyshev polynomial preconditioner (krylov_tpu/precond.py).

The library-level contract anchored by the reference's ic0-preconditioned
GPU tests (reference test/gpu/nvidia.jl:36-118: an effective M cuts CG
iterations hard) — realized TPU-natively with matvec polynomials instead
of sequential triangular solves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import krylov_tpu as kt
from krylov_tpu import ChebyshevPreconditioner, power_bound
from krylov_tpu.operators import DIAOperator, MatrixOperator
from krylov_tpu.ops.dia import poisson_dia


def _poisson_op(N=12, dtype=np.float64):
    D = poisson_dia(N, N, N, dtype=dtype)
    return DIAOperator(D), D.shape[0]


def test_power_bound_covers_lmax():
    A, n = _poisson_op()
    lmax = power_bound(A)
    # 3-D Poisson 7-point: λmax < 12, and the power estimate must cover it
    dense_lmax = 12.0
    assert lmax <= dense_lmax * 1.1
    v = jnp.ones(n)
    # Rayleigh quotient is a lower bound on λmax
    assert float(v @ A.matvec(v) / (v @ v)) <= lmax


def test_hermitian_and_positive():
    A, n = _poisson_op()
    M = ChebyshevPreconditioner(A, degree=6)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(n))
    b = jnp.asarray(rng.standard_normal(n))
    # symmetry: <Ma, b> == <a, Mb>
    assert abs(float(M.matvec(a) @ b) - float(a @ M.matvec(b))) < 1e-10
    # positivity: <Ma, a> > 0
    assert float(M.matvec(a) @ a) > 0


def test_cg_iteration_drop():
    """Degree-8 Chebyshev must cut CG iterations by well over half on an
    ill-conditioned SPD system (the ic0-anchor contract)."""
    import scipy.sparse as sp
    D = poisson_dia(12, 12, 12, dtype=np.float64)
    n = D.shape[0]
    A = sp.dia_matrix((np.asarray(D.data), np.asarray(D.offsets)),
                      shape=(n, n)).tocsr()
    S = sp.diags(np.sqrt(np.logspace(0, 3, n)))
    As = (S @ A @ S).todia()
    from krylov_tpu.ops.dia import DIAMatrix
    op = DIAOperator(DIAMatrix(jnp.asarray(As.data),
                               tuple(int(o) for o in As.offsets), (n, n)))
    b = jnp.ones(n)
    x1, s1 = kt.cg(op, b, atol=0.0, rtol=1e-8, itmax=20000)
    M = ChebyshevPreconditioner(op, degree=8)
    x2, s2 = kt.cg(op, b, M=M, atol=0.0, rtol=1e-8, itmax=20000)
    assert s2.solved
    assert s2.niter < 0.25 * s1.niter
    r = np.asarray(b - op.matvec(x2))
    assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(np.asarray(b))


def test_minres_accepts_cheby():
    A, n = _poisson_op()
    M = ChebyshevPreconditioner(A, degree=4)
    b = jnp.ones(n)
    x0n, s0 = kt.minres(A, b, atol=0.0, rtol=1e-8)
    x, s = kt.minres(A, b, M=M, atol=0.0, rtol=1e-8)
    assert s.solved and s.niter < s0.niter
    r = np.asarray(b - A.matvec(x))
    assert np.linalg.norm(r) <= 1e-6 * np.sqrt(n)


def test_jits_through_core_without_retrace():
    """The preconditioner is a pytree: two different stencils reuse one
    compiled core."""
    A1, n = _poisson_op(10)
    D2 = poisson_dia(10, 10, 10, dtype=np.float64)
    D2 = type(D2)(D2.data * 2.0, D2.offsets, D2.shape)
    A2 = DIAOperator(D2)
    b = jnp.ones(n)
    M1 = ChebyshevPreconditioner(A1, degree=4)
    M2 = ChebyshevPreconditioner(A2, degree=4, lmax=24.0)
    x1, s1 = kt.cg(A1, b, M=M1, atol=0.0, rtol=1e-8)
    x2, s2 = kt.cg(A2, b, M=M2, atol=0.0, rtol=1e-8)
    assert s1.solved and s2.solved
    # scaled system: x2 = x1 / 2
    assert float(jnp.max(jnp.abs(x1 - 2 * x2))) < 1e-6


def test_complex_hpd():
    rng = np.random.default_rng(1)
    n = 64
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A_ = B @ B.conj().T / n + 2 * np.eye(n)
    op = MatrixOperator(jnp.asarray(A_))
    M = ChebyshevPreconditioner(op, degree=5)
    b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x, s = kt.cg(op, b, M=M, atol=0.0, rtol=1e-10)
    assert s.solved
    assert np.linalg.norm(A_ @ np.asarray(x) - np.asarray(b)) < 1e-7


def test_degree_one_is_scaled_identity():
    A, n = _poisson_op()
    M = ChebyshevPreconditioner(A, degree=1, lmin=1.0, lmax=3.0)
    r = jnp.ones(n)
    assert np.allclose(np.asarray(M.matvec(r)), 0.5)   # r / theta, theta=2
