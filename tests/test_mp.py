"""Mixed-precision sweep (reference test/test_mp.jl): every method solved
in bfloat16/float32/float64 (+complex), tolerance √eps(T) scaled for the
low-precision types, with dtype propagation checks."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures as fx
import krylov_tpu as kt


SQUARE = ["cg", "cr", "car", "cg_lanczos", "symmlq", "minres", "minres_qlp",
          "minares", "cgs", "bicgstab", "bilq", "qmr", "fom", "gmres",
          "fgmres", "diom", "dqgmres"]
RECT = ["lsqr", "lsmr", "lslq", "cgls", "crls"]


def tol_for(dtype):
    eps = float(jnp.finfo(jnp.dtype(dtype)).eps)
    t = np.sqrt(eps)
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        t *= 10
    return t


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32, jnp.float64],
                         ids=["bf16", "f32", "f64"])
class TestMixedPrecision:
    @pytest.mark.parametrize("method", SQUARE)
    def test_square(self, method, dtype):
        if method == "minres_qlp" and dtype == jnp.bfloat16:
            pytest.xfail("QLP double factorization needs > 8 mantissa bits")
        n = 10
        A = np.diag(4.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1) \
            + np.diag(-np.ones(n - 1), -1)
        b = A @ np.ones(n)
        Aj = jnp.asarray(A, dtype=dtype)
        bj = jnp.asarray(b, dtype=dtype)
        x, stats = kt.krylov_solve(method, Aj, bj)
        assert x.dtype == jnp.dtype(dtype)
        r = np.asarray(b, dtype=np.float64) - A @ np.asarray(
            x, dtype=np.float64)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 20 * tol_for(dtype), \
            (method, stats.status)

    @pytest.mark.parametrize("method", RECT)
    def test_rectangular(self, method, dtype):
        b0, A0, *_ = fx.gen_lsq(15, 8, 1, 1, 0.0)
        Aj = jnp.asarray(A0, dtype=dtype)
        bj = jnp.asarray(b0, dtype=dtype)
        x, stats = kt.krylov_solve(method, Aj, bj)
        assert x.dtype == jnp.dtype(dtype)
        Ar = A0.T @ (b0 - A0 @ np.asarray(x, dtype=np.float64))
        assert np.linalg.norm(Ar) / np.linalg.norm(b0) <= 100 * tol_for(dtype), \
            (method, stats.status)


@pytest.mark.parametrize("dtype", [jnp.complex64, jnp.complex128],
                         ids=["c64", "c128"])
def test_complex_propagation(dtype):
    n = 10
    A, b = fx.symmetric_definite(n=n, FC=np.complex128)
    Aj = jnp.asarray(np.asarray(A), dtype=dtype)
    bj = jnp.asarray(b, dtype=dtype)
    for method in ("cg", "minres", "gmres", "bicgstab"):
        x, stats = kt.krylov_solve(method, Aj, bj)
        assert x.dtype == jnp.dtype(dtype), method
