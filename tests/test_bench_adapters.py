"""Pin the benchmark device-solve adapters (benchmarks/adapters.py) to the
public solver API: same iteration counts on shared fixtures, callable under
an enclosing jit (the S-solves-in-one-computation harness in bench.py).
Signature drift in any solver core breaks this test, not the benchmark
artifact."""

import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import krylov_tpu as kt
from krylov_tpu.ops.dia import poisson_dia, convdiff_dia
from krylov_tpu.operators import DIAOperator, DiagonalOperator, MatrixOperator
from benchmarks import adapters

RTOL = 1e-6


def run_adapter(made):
    solve, ops, rhs = made

    @jax.jit
    def once(ops, rhs):
        return solve(ops, rhs)

    it, chk = once(ops, rhs)
    assert np.isfinite(float(chk))
    return int(it)


@pytest.fixture(scope="module")
def convdiff():
    D = convdiff_dia(12, 12, 12, dtype=np.float64)
    A = DIAOperator(D)
    M = DiagonalOperator(jnp.full(D.shape[0], 1.0 / 6.0, jnp.float64))
    b = jnp.ones(D.shape[0], jnp.float64)
    return A, M, b


def test_gmres_adapter(convdiff):
    A, M, b = convdiff
    _, stats = kt.gmres(A, b, M=M, memory=20, restart=True,
                        atol=0.0, rtol=RTOL)
    it = run_adapter(adapters.make_gmres(A, M, b, RTOL, 4000, mem=20))
    assert stats.solved and it == stats.niter


def test_bicgstab_adapter(convdiff):
    A, M, b = convdiff
    _, stats = kt.bicgstab(A, b, M=M, atol=0.0, rtol=RTOL)
    it = run_adapter(adapters.make_bicgstab(A, M, b, RTOL, 4000))
    assert stats.solved and it == stats.niter


@pytest.mark.parametrize("name", ["lsqr", "lsmr"])
def test_gk_adapters(name):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((60, 30)))
    b = jnp.asarray(rng.standard_normal(60))
    op = MatrixOperator(A)
    method = getattr(kt, name)
    _, stats = method(op, b, lam=0.5, atol=0.0, rtol=RTOL)
    make = getattr(adapters, f"make_{name}")
    it = run_adapter(make(op, b, RTOL, 200, lam=0.5))
    assert stats.solved and it == stats.niter


@pytest.mark.parametrize("name", ["tricg", "trimr"])
def test_sp_adapters(name):
    rng = np.random.default_rng(1)
    n = 24
    A = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n))
    op = MatrixOperator(A)
    b = jnp.ones(n)
    c = -jnp.ones(n)
    method = getattr(kt, name)
    out = method(op, b, c, atol=0.0, rtol=RTOL)
    stats = out[2]
    make = getattr(adapters, f"make_{name}")
    it = run_adapter(make(op, b, c, RTOL, 400))
    assert stats.solved and it == stats.niter


def test_gpmr_adapter():
    rng = np.random.default_rng(2)
    n = 24
    A = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n))
    op = MatrixOperator(A)
    opT = MatrixOperator(A.T)
    b = jnp.ones(n)
    c = -jnp.ones(n)
    x, y, stats = kt.gpmr(op, opT, b, c, lam=1.0, mu=-1.0, memory=20,
                          atol=0.0, rtol=RTOL)
    it = run_adapter(adapters.make_gpmr(op, opT, b, c, RTOL, 400, mem=20))
    assert stats.solved and it == stats.niter


def test_block_gmres_adapter():
    D = poisson_dia(8, 8, 8, dtype=np.float64)
    A = DIAOperator(D)
    n = D.shape[0]
    B = jnp.stack([jnp.ones(n), jnp.linspace(0.5, 1.5, n)], axis=1)
    _, stats = kt.block_gmres(A, B, memory=16, restart=True,
                              atol=0.0, rtol=RTOL)
    it = run_adapter(adapters.make_block_gmres(A, B, RTOL, 2000, mem=16))
    assert stats.solved and it == stats.niter


def test_cg_lanczos_shift_adapter():
    D = poisson_dia(8, 8, 8, dtype=np.float64)
    A = DIAOperator(D)
    b = jnp.ones(D.shape[0], jnp.float64)
    shifts = jnp.asarray([0.5, 1.0, 2.0])
    _, stats = kt.cg_lanczos_shift(A, b, shifts, atol=0.0, rtol=RTOL)
    it = run_adapter(adapters.make_cg_lanczos_shift(A, b, shifts, RTOL, 2000))
    assert it == stats.niter


def test_fused_adapters_interpret():
    """Fused-kernel adapters validate on CPU via interpret mode only when
    supported; on CPU the Pallas TPU kernels are exercised by
    tests/test_fused.py — here just check the adapter plumbing imports."""
    assert callable(adapters.make_cg_fused)
    assert callable(adapters.make_minres_fused)
    assert callable(adapters.make_gmres_fused)
    assert callable(adapters.make_lsqr_fused)
    assert callable(adapters.make_lsmr_fused)
    assert callable(adapters.make_bicgstab_fused)
    assert callable(adapters.make_cg_lanczos_shift_fused)


def test_cg_lanczos_shift_fused_adapter_counts():
    from krylov_tpu.ops.dia import poisson_dia
    D = poisson_dia(10, 10, 10, dtype=np.float64)
    n = D.shape[0]
    b = jnp.ones(n)
    shifts = jnp.asarray([0.5, 1.0, 2.0])
    A = DIAOperator(D, use_pallas=False)
    _, stats = kt.cg_lanczos_shift(A, b, shifts, atol=0.0, rtol=RTOL)
    pd = DIAOperator(D, use_pallas=True)._pd
    it = run_adapter(adapters.make_cg_lanczos_shift_fused(
        pd, D.offsets, b, shifts, RTOL, 2000))
    assert it == stats.niter


def test_gmres_fused_adapter_counts(convdiff):
    A, M, b = convdiff
    _, stats = kt.gmres(A, b, memory=20, restart=True, atol=0.0, rtol=RTOL)
    pd = DIAOperator(A.dia, use_pallas=True)._pd
    it = run_adapter(adapters.make_gmres_fused(pd, A.dia.offsets, b,
                                               RTOL, 4000, mem=20))
    assert stats.solved and abs(it - stats.niter) <= 2


def test_bicgstab_fused_adapter_counts(convdiff):
    A, M, b = convdiff
    op = DIAOperator(A.dia, use_pallas=False)
    _, stats = kt.bicgstab(op, b, atol=0.0, rtol=RTOL)
    pd = DIAOperator(A.dia, use_pallas=True)._pd
    it = run_adapter(adapters.make_bicgstab_fused(pd, A.dia.offsets, b,
                                                  RTOL, 4000))
    assert stats.solved and abs(it - stats.niter) <= 2


def test_lsqr_fused_adapter_counts(convdiff):
    A, M, b = convdiff
    _, stats = kt.lsqr(A, b, atol=0.0, rtol=RTOL, axtol=1e-8, etol=1e-8)
    op = DIAOperator(A.dia, use_pallas=True)
    pd_adj, offs_adj = op.aligned_adjoint()
    it = run_adapter(adapters.make_lsqr_fused(
        op._pd, pd_adj, A.dia.offsets, offs_adj, b, RTOL, 4000))
    assert stats.solved and abs(it - stats.niter) <= 2


def test_batched_cg_adapter_counts():
    rng = np.random.default_rng(0)
    nb, n = 4, 20
    Q = rng.standard_normal((nb, n, n))
    As = jnp.asarray(Q @ np.transpose(Q, (0, 2, 1)) / n + 2 * np.eye(n))
    Bs = jnp.asarray(rng.standard_normal((nb, n)))
    it_sum = run_adapter(adapters.make_batched_cg(As, Bs, RTOL, 3 * n))
    ref = 0
    for i in range(nb):
        _, st = kt.cg(As[i], Bs[i], atol=0.0, rtol=RTOL)
        ref += st.niter
    assert it_sum == ref
