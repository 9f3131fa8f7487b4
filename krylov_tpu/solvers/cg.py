"""Conjugate Gradient for Hermitian positive-definite Ax = b.

Capability parity with reference src/cg.jl (M-preconditioning, ldiv,
trust-region ``radius`` via to_boundary, ``linesearch`` nonpositive-
curvature exit with npc_dir capture, warm start, history, callback,
verbose, the status vocabulary of src/cg.jl:272-278) — reimplemented as a
single lax.while_loop over a NamedTuple state, traced once per static
configuration.
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
from ..ops.kops import kdotr, kdotr2, to_boundary
from ..stats import SimpleStats


class CgState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    npc_dir: jax.Array        # shape (n,) when linesearch/radius, else (0,)
    gamma: jax.Array
    pNorm2: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array        # ε = atol + rtol·‖r₀‖
    iter: jax.Array
    status: jax.Array
    indefinite: jax.Array
    inconsistent: jax.Array
    npc_count: jax.Array
    posdef_violation: jax.Array
    hist: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "ldiv", "linesearch", "history", "hist_len", "callback", "verbose",
        "use_radius", "dot2",
    ),
)
def _cg_core(
    A, M, b, x0, state_in, iter_cap, atol, rtol, radius,
    *, ldiv, linesearch, history, hist_len, callback, verbose, use_radius,
    dot2=False,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps
    radius = jnp.asarray(radius, dtype=T)
    npc_shape = (n,) if (linesearch or use_radius) else (0,)
    # precision="compensated": Ogita-Rump-Oishi Dot2 reductions recover
    # fp64-grade dot accuracy from f32 arithmetic (ops/kops.py:94-112).
    kdotr_ = kdotr2 if dot2 else kdotr

    def M_apply(v):
        return precond_apply(M, v, ldiv)

    if state_in is None:
        x = jnp.zeros(n, dtype=FC)
        if x0 is None:
            r = b
        else:
            r = b - A.matvec(x0)
        z = M_apply(r)
        p = z
        gamma = kdotr_(r, z)
        posdef_violation = gamma < 0
        rNorm = jnp.sqrt(jnp.maximum(gamma, 0))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        status = jnp.where(
            gamma == 0,
            jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING)),
        )
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, rNorm, history)
        state = CgState(
            x=x, r=r, p=p,
            npc_dir=jnp.zeros(npc_shape, dtype=FC),
            gamma=gamma, pNorm2=gamma, rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            indefinite=jnp.zeros((), jnp.bool_),
            inconsistent=jnp.zeros((), jnp.bool_),
            npc_count=jnp.int32(0),
            posdef_violation=posdef_violation,
            hist=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        Ap = A.matvec(s.p)
        pAp = kdotr_(s.p, Ap)

        # Curvature exits (reference src/cg.jl:198-211); only when radius == 0.
        if use_radius:
            curv_small = jnp.zeros((), jnp.bool_)
        else:
            curv_small = pAp <= eps_T * s.pNorm2
        zero_curv = curv_small & (jnp.abs(pAp) <= eps_T * s.pNorm2)
        npc_exit = curv_small & linesearch

        safe_pAp = jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
        alpha = s.gamma / safe_pAp

        on_boundary = jnp.zeros((), jnp.bool_)
        neg_curv_tr = jnp.zeros((), jnp.bool_)
        if use_radius:
            # Step to the trust-region boundary (reference src/cg.jl:216-237).
            if M is None:
                s1, s2 = to_boundary(s.x, s.p, radius, dNorm2=s.pNorm2)
            else:
                s1, s2 = to_boundary(s.x, s.p, radius, M_apply=M_apply)
            sigma = jnp.maximum(s1, s2)
            neg_curv_tr = pAp <= 0
            hit = neg_curv_tr | (alpha > sigma)
            alpha = jnp.where(hit, sigma, alpha)
            on_boundary = hit

        x_new = s.x + alpha.astype(FC) * s.p
        r_new = s.r - alpha.astype(FC) * Ap
        z_new = M_apply(r_new)
        gamma_next = kdotr_(r_new, z_new)
        posdef_violation = s.posdef_violation | (gamma_next < 0)
        rNorm_new = jnp.sqrt(jnp.maximum(gamma_next, 0))

        resid_decrease_mach = (rNorm_new + 1) <= 1
        solved = (rNorm_new <= s.eps_lim) | resid_decrease_mach | on_boundary

        beta = gamma_next / jnp.where(s.gamma == 0, jnp.ones_like(s.gamma), s.gamma)
        p_new = jnp.where(solved, s.p, z_new + beta.astype(FC) * s.p)
        pNorm2_new = jnp.where(solved, s.pNorm2, gamma_next + beta * beta * s.pNorm2)
        gamma_new = jnp.where(solved, s.gamma, gamma_next)

        # The curvature-exit iteration skips the x/r update entirely
        # (reference `continue` at src/cg.jl:211).
        skip = zero_curv | npc_exit
        # linesearch at iter 0: x ← p (= M b) before exiting (src/cg.jl:204).
        x_ls0 = jnp.where(npc_exit & (s.iter == 0), s.p, s.x)
        x_new = jnp.where(skip, x_ls0, x_new)
        r_new = jnp.where(skip, s.r, r_new)
        p_new = jnp.where(skip, s.p, p_new)
        rNorm_new = jnp.where(skip, s.rNorm, rNorm_new)
        gamma_new = jnp.where(skip, s.gamma, gamma_new)
        pNorm2_new = jnp.where(skip, s.pNorm2, pNorm2_new)
        posdef_violation = jnp.where(skip, s.posdef_violation, posdef_violation)

        npc_dir = s.npc_dir
        npc_hit = npc_exit | neg_curv_tr
        if linesearch or use_radius:
            npc_dir = jnp.where(npc_hit, s.p, s.npc_dir)
        indefinite = s.indefinite | npc_hit
        npc_count = jnp.where(npc_hit, s.npc_count + 1, s.npc_count)
        inconsistent = s.inconsistent | (zero_curv & (not linesearch))

        iter_new = jnp.where(skip, s.iter, s.iter + 1)
        hist = rt.hist_write(s.hist, iter_new, rNorm_new, history)

        # Status precedence mirrors src/cg.jl:272-278 (later assignment wins):
        # boundary < indefinite(npc) < solved < zero_curvature.
        solved_any = (solved & ~skip) | npc_exit
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(solved_any & on_boundary, jnp.int32(rt.ON_BOUNDARY), code)
        code = jnp.where(solved_any & indefinite, jnp.int32(rt.NPC), code)
        code = jnp.where(
            solved_any & (code == rt.RUNNING), jnp.int32(rt.SOLVED), code
        )
        code = jnp.where(zero_curv, jnp.int32(rt.ZERO_CURVATURE), code)

        s_new = s._replace(
            x=x_new, r=r_new, p=p_new, npc_dir=npc_dir,
            gamma=gamma_new, pNorm2=pNorm2_new, rNorm=rNorm_new,
            iter=iter_new, status=code,
            indefinite=indefinite, inconsistent=inconsistent,
            npc_count=npc_count, posdef_violation=posdef_violation,
            hist=hist,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(
                    user_exit, jnp.int32(rt.USER_EXIT), s_new.status
                )
            )
        if verbose > 0:
            sigma_v = sigma if use_radius else alpha
            rt.debug_row(
                verbose, s.iter,
                "{:5d}  {:7.1e}  {:8.1e}  {:8.1e}  {:8.1e}",
                s.rNorm, pAp, alpha, sigma_v,
            )
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cg_fused_path(A, b, x0, atol, rtol, itmax, start, dinv=None,
                   cheby=None):
    """Whole-solve-in-VMEM fused kernel (ops/pallas_fused.py).

    One kernel launch per solve, every vector VMEM-resident (~0.9 µs/iter
    measured on a v5e at 64³ vs ~20 µs/iter for the general while_loop).
    ``dinv`` carries a diagonal (Jacobi) preconditioner as z = dinv·r;
    ``cheby`` a ChebyshevPreconditioner applied in-kernel.
    """
    from ..ops.pallas_fused import cg_cheby_dia_fused, cg_dia_fused

    b_eff = b if x0 is None else b - A.matvec(x0)
    if cheby is not None:
        x, niter, rnorm, status, viol = cg_cheby_dia_fused(
            A._pd, A.dia.offsets, b_eff, atol, rtol, itmax,
            cheby._lmin, cheby._lmax, cheby.degree)
    else:
        x, niter, rnorm, status, viol = cg_dia_fused(
            A._pd, A.dia.offsets, b_eff, atol, rtol, itmax, dinv=dinv)
    niter, rnorm, code, viol = jax.device_get([niter, rnorm, status, viol])
    if int(viol):
        raise ValueError(
            "The linear operator `A` or the preconditioner `M` is not "
            "symmetric positive definite.")
    niter = int(niter)
    code = rt.final_status_code(int(code), niter, itmax, False)
    if x0 is not None:
        x = x + x0
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=code == rt.ZERO_CURVATURE,
        indefinite=False,
        npc_count=0,
        residuals=np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, None


def _cg_ir(A, b, x0, M, ldiv, atol, rtol, itmax, timemax, start):
    """precision="double_word": iterative refinement to fp64-grade TRUE
    residuals from f32 storage (SURVEY.md §7.2 "fp64 on TPU"; shared
    driver in solvers/_refine.py).  Inner solves are plain f32 CG (the
    fused whole-solve-in-VMEM kernel when eligible)."""
    from ._refine import ir_solve

    def inner(rhs, rtol_i, it_left, time_left):
        # a finite outer timemax is threaded through so one long inner
        # solve cannot overrun the user's deadline; the default (inf)
        # stays inf to keep inner solves on the fused fast path
        d, st, _ = _cg_solve(A, rhs, M=M, ldiv=ldiv, atol=0.0,
                             rtol=rtol_i, itmax=it_left,
                             timemax=time_left if np.isfinite(time_left)
                             else float("inf"))
        return d, st.niter

    return ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start)


def _cg_solve(
    A, b, x0=None, *, M=None, ldiv=False, radius=0.0, linesearch=False,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None, precision=None,
):
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    b = jnp.asarray(b)
    n = b.shape[0]
    if A.shape is not None:
        if A.shape[0] != A.shape[1]:
            raise ValueError("System must be square")
        if A.shape[1] != n:
            raise ValueError("Inconsistent problem size")
    if linesearch and radius > 0:
        raise ValueError("`linesearch` set to `true` but trust-region radius > 0")
    if x0 is not None and linesearch:
        raise ValueError("warm_start and linesearch cannot be used together")
    if precision not in (None, "working", "compensated", "double_word"):
        raise ValueError(
            "precision must be None, 'working', 'compensated' or "
            "'double_word'")

    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    if precision == "double_word":
        if linesearch or radius > 0 or callback is not None or history:
            raise ValueError(
                "precision='double_word' supports the plain CG "
                "configuration only (no radius/linesearch/history/callback)")
        return _cg_ir(A, b, x0, M, ldiv, atol, rtol, itmax, timemax, start)
    dot2 = precision == "compensated"

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (M = I, a diagonal/Jacobi preconditioner, or a Chebyshev polynomial
    # preconditioner in the same DIA operator).
    from ..operators import DiagonalOperator
    from ..precond import ChebyshevPreconditioner
    diag_M = isinstance(M, DiagonalOperator)
    cheb_M = isinstance(M, ChebyshevPreconditioner) and M.A is A
    if ((M is None or diag_M or cheb_M) and not linesearch and radius == 0
            and callback is None and verbose == 0 and not history
            and not dot2
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (cg_cheby_dia_fused_supported,
                                        cg_dia_fused_supported)
        if cheb_M:
            if cg_cheby_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                            stencil_dtype=A._pd.dtype):
                return _cg_fused_path(A, b, x0, atol, rtol, itmax, start,
                                      cheby=M)
        elif cg_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            dinv = None
            if diag_M:
                dinv = (1.0 / M.d if ldiv else M.d).astype(b.dtype)
            return _cg_fused_path(A, b, x0, atol, rtol, itmax, start,
                                  dinv=dinv)

    if verbose > 0:
        rt.debug_header(verbose, f"CG: system of {n} equations in {n} variables")
        rt.debug_header(verbose, f"{'k':>5s}  {'‖r‖':>7s}  {'pAp':>8s}  "
                                 f"{'α':>8s}  {'σ':>8s}")

    def run(state, cap):
        return _cg_core(
            A, M, b, x0, state, jnp.int32(cap), atol, rtol, float(radius),
            ldiv=bool(ldiv), linesearch=bool(linesearch), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
            use_radius=bool(radius > 0), dot2=dot2,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    if bool(state.posdef_violation):
        raise ValueError(
            "The linear operator `A` or the preconditioner `M` is not "
            "symmetric positive definite."
        )

    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None:
        x = x + x0

    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=bool(state.inconsistent),
        indefinite=bool(state.indefinite),
        npc_count=int(state.npc_count),
        residuals=rt.hist_trim(state.hist, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def cg(A, b, x0=None, **kwargs):
    """x, stats = cg(A, b; ...) — see module docstring for options."""
    x, stats, _ = _cg_solve(A, b, x0, **kwargs)
    return x, stats
