"""BiCGSTAB and CGS for square non-Hermitian Ax = b.

Parity with reference src/bicgstab.jl and src/cgs.jl: shadow vector ``c``
(defaults to b), left/right preconditioning M/N, breakdown statuses
("Breakdown bᴴc = 0", "breakdown αₖ == 0"), warm start, history, callback.
Two operator applications per iteration each.
"""

import functools
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import _runtime as rt
from .._dtypes import real_dtype
from ..operators import as_operator, precond_apply
from ..ops.kops import kdot, knorm
from ..stats import SimpleStats

BC_BREAKDOWN = 29   # "Breakdown bᴴc = 0"
ALPHA_BREAKDOWN = 30  # "breakdown αₖ == 0"
_STATUS = {
    BC_BREAKDOWN: "Breakdown bᴴc = 0",
    ALPHA_BREAKDOWN: "breakdown αₖ == 0",
}


class BicgstabState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    v: jax.Array
    next_rho: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose"),
)
def _bicgstab_core(
    A, M, N, b, c, x0, state_in, iter_cap, atol, rtol,
    *, ldiv, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def N_apply(u):
        return precond_apply(N, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        r = M_apply(r0)
        p = r
        rNorm = knorm(r)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        next_rho = kdot(c, r)
        status = jnp.where(
            rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(next_rho == 0, jnp.int32(BC_BREAKDOWN),
                      jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                jnp.int32(rt.RUNNING))),
        )
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, rNorm, history)
        state = BicgstabState(
            x=x, r=r, p=p, v=jnp.zeros(n, FC),
            next_rho=next_rho, rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        rho = s.next_rho
        y = N_apply(s.p)
        q = A.matvec(y)
        v = M_apply(q)
        alpha = rho / _safe(kdot(c, v))
        sv = s.r - alpha * v
        x_aux = s.x + alpha * y
        z = N_apply(sv)
        d = A.matvec(z)
        t = M_apply(d)
        omega = kdot(t, sv) / _safe(kdot(t, t))
        x_new = x_aux + omega * z
        r_new = sv - omega * t
        next_rho = kdot(c, r_new)
        beta = (next_rho / _safe(rho)) * (alpha / _safe(omega))
        p_new = r_new + beta * (s.p - omega * v)
        rNorm = knorm(r_new)
        it = s.iter + 1

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (alpha == 0) | jnp.isnan(jnp.abs(alpha))
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(ALPHA_BREAKDOWN), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        hist = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, r=r_new, p=p_new, v=v, next_rho=next_rho,
            rNorm=rNorm, iter=it, status=code, hist_r=hist,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING)
                                 | user_exit & (s_new.status == rt.SOLVED),
                                 jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it, "{:5d}  {:7.1e}  {:8.1e}  {:8.1e}",
                         rNorm, jnp.abs(alpha), jnp.abs(omega))
        return s_new

    return jax.lax.while_loop(cond, body, state)


class CgsState(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array
    p: jax.Array
    q: jax.Array
    rho: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose"),
)
def _cgs_core(
    A, M, N, b, c, x0, state_in, iter_cap, atol, rtol,
    *, ldiv, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def N_apply(u):
        return precond_apply(N, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        r = M_apply(r0)
        rNorm = knorm(r)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        rho = kdot(c, r)
        status = jnp.where(
            rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rho == 0, jnp.int32(BC_BREAKDOWN),
                      jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                jnp.int32(rt.RUNNING))),
        )
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, rNorm, history)
        state = CgsState(
            x=x, r=r, u=r, p=r, q=jnp.zeros(n, FC),
            rho=rho, rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        y = N_apply(s.p)
        t = A.matvec(y)
        v = M_apply(t)
        sigma = kdot(c, v)
        alpha = s.rho / _safe(sigma)
        q = s.u - alpha * v
        u_half = s.u + q
        z = N_apply(u_half)
        x_new = s.x + alpha * z
        sv = A.matvec(z)
        w = M_apply(sv)
        r_new = s.r - alpha * w
        rho_next = kdot(c, r_new)
        beta = rho_next / _safe(s.rho)
        u_new = r_new + beta * q
        p_aux = q + beta * s.p
        p_new = u_new + beta * p_aux
        rNorm = knorm(r_new)
        it = s.iter + 1

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (alpha == 0) | jnp.isnan(jnp.abs(alpha))
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(ALPHA_BREAKDOWN), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        hist = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, r=r_new, u=u_new, p=p_new, q=q, rho=rho_next,
            rNorm=rNorm, iter=it, status=code, hist_r=hist,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING)
                                 | user_exit & (s_new.status == rt.SOLVED),
                                 jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it, "{:5d}  {:7.1e}", rNorm)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _biortho_solve(
    core, A, b, x0=None, *, c=None, M=None, N=None, ldiv=False,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None,
):
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    N = as_operator(N)
    b = jnp.asarray(b)
    n = b.shape[0]
    if A.shape is not None:
        if A.shape[0] != A.shape[1]:
            raise ValueError("System must be square")
        if A.shape[1] != n:
            raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    c = b if c is None else jnp.asarray(c, dtype=b.dtype)
    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (core in (_bicgstab_core, _cgs_core) and M is None and N is None
            and c is b and x0 is None and not history
            and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (bicgstab_dia_fused,
                                        bicgstab_dia_fused_supported,
                                        cgs_dia_fused,
                                        cgs_dia_fused_supported)
        fused, gate = ((bicgstab_dia_fused, bicgstab_dia_fused_supported)
                       if core is _bicgstab_core
                       else (cgs_dia_fused, cgs_dia_fused_supported))
        if gate(A.dia.offsets, n, b.dtype, stencil_dtype=A._pd.dtype):
            x, niter, rnorm, status = fused(
                A._pd, A.dia.offsets, b, float(atol), float(rtol), itmax)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    name = "BICGSTAB" if core is _bicgstab_core else "CGS"
    rt.debug_header(verbose, f"{name}: system of size {n}")
    if core is _bicgstab_core:
        rt.debug_header(verbose, f"{'k':>5s}  {'‖rₖ‖':>7s}  {'|αₖ|':>8s}  "
                                 f"{'|ωₖ|':>8s}")
    else:
        rt.debug_header(verbose, f"{'k':>5s}  {'‖rₖ‖':>7s}")

    def run(state, cap):
        return core(
            A, M, N, b, c, x0, state, jnp.int32(cap), atol, rtol,
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None:
        x = x + x0
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, stats, state


def bicgstab(A, b, x0=None, **kwargs):
    """x, stats = bicgstab(A, b; c=b, M=None, N=None, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/N/ldiv allowed; no
    custom shadow vector c — the inner corrections re-seed it per rhs)."""
    import functools as _ft
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("BICGSTAB", _ft.partial(_biortho_solve,
                                                 _bicgstab_core),
                         A, b, x0, kwargs,
                         forward=("M", "N", "ldiv"),
                         reject={"c": None})
    if hit is not None:
        return hit
    x, stats, _ = _biortho_solve(_bicgstab_core, A, b, x0, **kwargs)
    return x, stats


def cgs(A, b, x0=None, **kwargs):
    """x, stats = cgs(A, b; c=b, M=None, N=None, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/N/ldiv allowed; no
    custom shadow vector c — the inner corrections re-seed it per rhs)."""
    import functools as _ft
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("CGS", _ft.partial(_biortho_solve, _cgs_core),
                         A, b, x0, kwargs,
                         forward=("M", "N", "ldiv"),
                         reject={"c": None})
    if hit is not None:
        return hit
    x, stats, _ = _biortho_solve(_cgs_core, A, b, x0, **kwargs)
    return x, stats
