"""Traceable device-solve adapters for the benchmark harness.

Each ``make_*`` returns ``(solve, ops, rhs)`` where

* ``solve(ops, rhs) -> (niter:int32, checksum:float32)`` is pure and safe
  to call inside an enclosing ``jit`` — the harness runs S back-to-back
  solves inside ONE compiled computation so the ~28 ms host↔device round
  trip of the remote-TPU tunnel amortizes (CLAUDE.md measurement gotcha),
* ``ops`` is the operator pytree (operators are pytree-registered),
* ``rhs`` is the right-hand-side pytree the harness rescales per solve.

The adapters mirror the solver wrappers' core invocations exactly
(e.g. krylov_tpu/solvers/gmres.py ``run``); tests/test_bench_adapters.py
pins every adapter's iteration count to the public API so signature
drift cannot silently corrupt the benchmark.
"""

import jax
import jax.numpy as jnp

from krylov_tpu.solvers.gmres import _gmres_core
from krylov_tpu.solvers.bicgstab import _bicgstab_core
from krylov_tpu.solvers.lsqr import _lsqr_core
from krylov_tpu.solvers.lsmr import _lsmr_core
from krylov_tpu.solvers.tricg import _tricg_core, _trimr_core
from krylov_tpu.solvers.gpmr import _gpmr_core
from krylov_tpu.solvers.block import _block_core
from krylov_tpu.solvers.cg_lanczos import _cg_lanczos_shift_core
from krylov_tpu._dtypes import sqrt_eps


def _chk(*xs):
    out = jnp.float32(0)
    for x in xs:
        out = out + jnp.real(jnp.sum(x)).astype(jnp.float32)
    return out


def _hi():
    return jax.default_matmul_precision("highest")


def make_gmres(A, M, b, rtol, itmax, mem=20):
    """GMRES(mem) with restart, left preconditioner M."""
    def solve(ops, rhs):
        A_, M_ = ops
        with _hi():
            st = _gmres_core(
                A_, M_, None, rhs, None, None, jnp.int32(itmax),
                jnp.int32(itmax), 0.0, float(rtol),
                mem=int(mem), ldiv=False, restart=True, flexible=False,
                reorthogonalization=False, history=False, hist_len=0,
                callback=None, verbose=0, MisI=M is None, NisI=True)
        return st.iter, _chk(st.x)
    return solve, (A, M), b


def make_bicgstab(A, M, b, rtol, itmax):
    def solve(ops, rhs):
        A_, M_ = ops
        with _hi():
            st = _bicgstab_core(
                A_, M_, None, rhs, rhs, None, None, jnp.int32(itmax),
                0.0, float(rtol),
                ldiv=False, history=False, hist_len=0, callback=None,
                verbose=0)
        return st.iter, _chk(st.x)
    return solve, (A, M), b


def _make_gk(core, A, b, rtol, itmax, lam):
    T = jnp.real(jnp.zeros((), b.dtype)).dtype
    tol = float(sqrt_eps(T))
    def solve(ops, rhs):
        (A_,) = ops
        with _hi():
            st = core(
                A_, None, None, rhs, None, jnp.int32(itmax),
                jnp.int32(itmax), float(lam), tol, tol, 0.0, float(rtol),
                tol, 1.0e8, 0.0,
                ldiv=False, history=False, hist_len=0, callback=None,
                verbose=0, window=5, use_radius=False, MisI=True, NisI=True)
        return st.iter, _chk(st.x)
    return solve, (A,), b


def make_lsqr(A, b, rtol, itmax, lam=0.0):
    return _make_gk(_lsqr_core, A, b, rtol, itmax, lam)


def make_lsmr(A, b, rtol, itmax, lam=0.0):
    return _make_gk(_lsmr_core, A, b, rtol, itmax, lam)


def _make_sp(core, A, b, c, rtol, itmax, tau, nu):
    def solve(ops, rhs):
        (A_,) = ops
        b_, c_ = rhs
        with _hi():
            st = core(
                A_, None, None, b_, c_, None, None, None, jnp.int32(itmax),
                0.0, float(rtol), float(tau), float(nu),
                ldiv=False, history=False, hist_len=0, callback=None,
                verbose=0, MisI=True, NisI=True)
        return st.iter, _chk(st.x, st.y)
    return solve, (A,), (b, c)


def make_tricg(A, b, c, rtol, itmax, tau=1.0, nu=-1.0):
    return _make_sp(_tricg_core, A, b, c, rtol, itmax, tau, nu)


def make_trimr(A, b, c, rtol, itmax, tau=1.0, nu=-1.0):
    return _make_sp(_trimr_core, A, b, c, rtol, itmax, tau, nu)


def make_gpmr(A, B, b, c, rtol, itmax, mem=20, lam=1.0, mu=-1.0):
    def solve(ops, rhs):
        A_, B_ = ops
        b_, c_ = rhs
        with _hi():
            st = _gpmr_core(
                A_, B_, None, None, None, None, b_, c_, None, None, None,
                jnp.int32(itmax), 0.0, float(rtol), float(lam), float(mu),
                mem=int(mem), ldiv=False, reorthogonalization=False,
                history=False, hist_len=0, callback=None, verbose=0,
                CisI=True, DisI=True, EisI=True, FisI=True)
        # x/y are assembled host-side from (V, U, R, zt); the device loop is
        # fully forced by the transformed rhs + residual norm.
        return st.iter, _chk(st.zt, st.rNorm)
    return solve, (A, B), (b, c)


def make_block_gmres(A, B, rtol, itmax, mem=16):
    def solve(ops, rhs):
        (A_,) = ops
        with _hi():
            st = _block_core(
                A_, None, None, rhs, None, None, jnp.int32(itmax),
                jnp.int32(itmax), 0.0, float(rtol),
                mem=int(mem), ldiv=False, restart=True,
                reorthogonalization=False, history=False, hist_len=0,
                callback=None, verbose=0, MisI=True, NisI=True)
        return st.iter, _chk(st.X)
    return solve, (A,), B


def make_cg_lanczos_shift_fused(pd, offsets, b, shifts, rtol, itmax):
    from krylov_tpu.ops.pallas_fused import cg_lanczos_shift_dia_fused
    shifts = jnp.asarray(shifts)
    ns = int(shifts.shape[0])
    def solve(ops, rhs):
        pd_, sh = ops
        X, it, rn, stt, idf = cg_lanczos_shift_dia_fused(
            pd_, offsets, rhs, sh, ns, 0.0, float(rtol), int(itmax))
        return it, _chk(X[0])
    return solve, (pd, shifts), b


def make_cg_lanczos_shift(A, b, shifts, rtol, itmax):
    shifts = jnp.asarray(shifts)
    def solve(ops, rhs):
        A_, sh = ops
        with _hi():
            st = _cg_lanczos_shift_core(
                A_, None, rhs, sh, None, jnp.int32(itmax), 0.0, float(rtol),
                ldiv=False, check_curvature=False, history=False,
                hist_len=0, callback=None, verbose=0, MisI=True)
        return st.iter, _chk(st.x)
    return solve, (A, shifts), b


def make_cg_fused(pd, offsets, b, rtol, itmax, dinv=None):
    from krylov_tpu.ops.pallas_fused import cg_dia_fused
    def solve(ops, rhs):
        pd_, dinv_ = ops
        x, it, rn, stt, vi = cg_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax), dinv=dinv_)
        return it, _chk(x)
    return solve, (pd, dinv), b


def make_minres_fused(pd, offsets, b, rtol, itmax, eps):
    from krylov_tpu.ops.pallas_fused import minres_dia_fused
    def solve(ops, rhs):
        (pd_,) = ops
        x, it, rn, stt, inc, viol = minres_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), float(eps), 1e-8, 0.0,
            int(itmax))
        return it, _chk(x)
    return solve, (pd,), b


def make_gmres_fused(pd, offsets, b, rtol, itmax, mem=20):
    from krylov_tpu.ops.pallas_fused import gmres_dia_fused
    def solve(ops, rhs):
        (pd_,) = ops
        x, it, rn, stt, inc, npp = gmres_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax), mem=int(mem))
        return it, _chk(x)
    return solve, (pd,), b


def make_bicgstab_fused(pd, offsets, b, rtol, itmax):
    from krylov_tpu.ops.pallas_fused import bicgstab_dia_fused
    def solve(ops, rhs):
        (pd_,) = ops
        x, it, rn, stt = bicgstab_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax))
        return it, _chk(x)
    return solve, (pd,), b


def make_lsqr_fused(pd, pd_adj, offsets, offsets_adj, b, rtol, itmax,
                    lam=0.0, axtol=1e-8):
    from krylov_tpu.ops.pallas_fused import lsqr_dia_fused
    def solve(ops, rhs):
        pd_, pda_ = ops
        x, it, rn, arn, stt, zr = lsqr_dia_fused(
            pd_, pda_, offsets, offsets_adj, rhs, float(lam), float(axtol),
            float(axtol), 0.0, float(rtol), float(axtol), 1e8, int(itmax))
        return it, _chk(x)
    return solve, (pd, pd_adj), b


def make_lsmr_fused(pd, pd_adj, offsets, offsets_adj, b, rtol, itmax,
                    lam=0.0, axtol=1e-8):
    from krylov_tpu.ops.pallas_fused import lsmr_dia_fused
    def solve(ops, rhs):
        pd_, pda_ = ops
        (x, it, rn, arn, acond, anorm, xnorm, stt, zr) = lsmr_dia_fused(
            pd_, pda_, offsets, offsets_adj, rhs, float(lam), float(axtol),
            float(axtol), 0.0, float(rtol), float(axtol), 1e8, int(itmax))
        return it, _chk(x)
    return solve, (pd, pd_adj), b


def make_tri_fused(variant, pd, pd_adj, offsets, offsets_adj, b, c, rtol,
                   itmax, tau=1.0, nu=-1.0):
    from krylov_tpu.ops.pallas_fused import (tricg_dia_fused,
                                             trimr_dia_fused)
    fn = tricg_dia_fused if variant == "tricg" else trimr_dia_fused
    def solve(ops, rhs):
        pd_, pda_, c_ = ops
        x, y, it, rn, stt = fn(
            pd_, pda_, offsets, offsets_adj, rhs, c_, float(tau),
            float(nu), 0.0, float(rtol), int(itmax))
        return it, _chk(x, y)
    return solve, (pd, pd_adj, c), b


def make_cg_cheby_fused(pd, offsets, b, rtol, itmax, lmin, lmax, degree):
    from krylov_tpu.ops.pallas_fused import cg_cheby_dia_fused
    def solve(ops, rhs):
        pd_, lmin_, lmax_ = ops
        x, it, rn, stt, vi = cg_cheby_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax), lmin_, lmax_,
            int(degree))
        return it, _chk(x)
    return solve, (pd, jnp.asarray(lmin, b.dtype),
                   jnp.asarray(lmax, b.dtype)), b


def make_block_gmres_fused(pd, offsets, B, rtol, itmax, mem=16, p=4):
    from krylov_tpu.ops.pallas_fused import block_gmres_dia_fused
    def solve(ops, rhs):
        (pd_,) = ops
        X, it, rn, stt, inc, npp = block_gmres_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax), mem=int(mem),
            p=int(p))
        return it, _chk(X)
    return solve, (pd,), B


def make_block_minres_fused(pd, offsets, B, rtol, itmax, p=4):
    from krylov_tpu.ops.pallas_fused import block_minres_dia_fused
    def solve(ops, rhs):
        (pd_,) = ops
        X, it, rn, stt = block_minres_dia_fused(
            pd_, offsets, rhs, 0.0, float(rtol), int(itmax), p=int(p))
        return it, _chk(X)
    return solve, (pd,), B


def make_gpmr_fused(pd_a, pd_b, offs_a, offs_b, b, c, rtol, itmax,
                    mem=20, lam=1.0, mu=-1.0):
    from krylov_tpu.ops.pallas_fused import gpmr_dia_fused
    def solve(ops, rhs):
        pda_, pdb_, c_ = ops
        x, y, it, rn, stt, inc = gpmr_dia_fused(
            pda_, pdb_, offs_a, offs_b, rhs, c_, float(lam), float(mu),
            0.0, float(rtol), int(itmax), mem=int(mem))
        return it, _chk(x, y)
    return solve, (pd_a, pd_b, c), b


def make_batched_cg(As, Bs, rtol, itmax):
    """Batch of dense SPD systems through the vmapped CG core."""
    from krylov_tpu.diff import _traced_state
    from krylov_tpu.operators import MatrixOperator

    def solve(ops, rhs):
        (As_,) = ops
        with _hi():
            def one(A_i, b_i):
                st = _traced_state("cg", MatrixOperator(A_i), None, None,
                                   b_i, 0.0, float(rtol), int(itmax), 0)
                return st.x, st.iter
            X, iters = jax.vmap(one)(As_, rhs)
        return jnp.sum(iters), _chk(X)
    return solve, (As,), Bs
