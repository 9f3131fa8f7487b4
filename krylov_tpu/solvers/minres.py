"""MINRES for Hermitian (possibly indefinite/singular) Ax = b.

Capability parity with reference src/minres.jl: λ-shift (solves A+λI),
M-preconditioning (ldiv), linesearch nonpositive-curvature exit with
npc_dir capture, etol forward-error window stop, conlim ill-conditioning
stop, Anorm/Acond estimates, warm start, history, callback, and the
status vocabulary of src/minres.jl:469-478.
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
from ..ops.kops import kdotr, knorm
from ..stats import SimpleStats


class MinresState(NamedTuple):
    x: jax.Array
    r1: jax.Array          # Lanczos vectors (unnormalized): r1 = M⁻¹-image k-1
    r2: jax.Array
    v: jax.Array           # v = M r2 (aliases r2 when M is None)
    w1: jax.Array          # wₖ₋₂ direction
    w2: jax.Array          # wₖ₋₁ direction
    npc_dir: jax.Array
    oldbeta: jax.Array
    beta: jax.Array
    beta1: jax.Array
    dbar: jax.Array
    eps_prev: jax.Array    # ϵ from the previous iteration (for w recurrence)
    phibar: jax.Array
    gmax: jax.Array
    gmin: jax.Array
    cs: jax.Array
    sn: jax.Array
    anorm2: jax.Array
    xenorm2: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    err_vec: jax.Array
    zeta_k: jax.Array
    delta_w: jax.Array
    iter: jax.Array
    status: jax.Array
    indefinite: jax.Array
    inconsistent: jax.Array
    npc_count: jax.Array
    precond_violation: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array
    hist_acond: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "ldiv", "linesearch", "history", "hist_len", "callback", "verbose",
        "window", "MisI",
    ),
)
def _minres_core(
    A, M, b, x0, state_in, iter_cap, atol, rtol, etol, conlim, lam,
    *, ldiv, linesearch, history, hist_len, callback, verbose, window, MisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps
    lam = jnp.asarray(lam, dtype=T)
    ctol = jnp.where(jnp.asarray(conlim, T) > 0, 1.0 / jnp.asarray(conlim, T),
                     jnp.zeros((), T))
    npc_shape = (n,) if linesearch else (0,)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, dtype=FC)
        if x0 is None:
            r1 = b
        else:
            r1 = b - (A.matvec(x0) + lam.astype(FC) * x0)
        r2 = r1
        v = M_apply(r1)
        beta1_sq = kdotr(r1, v)
        precond_violation = beta1_sq < 0
        beta1 = jnp.sqrt(jnp.maximum(beta1_sq, 0))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta1
        # β₁ = 0 → zero-residual exit (reference sets niter = 1 here).
        status = jnp.where(
            beta1_sq == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(beta1 <= eps_lim, jnp.int32(rt.SOLVED_ZERO),
                      jnp.int32(rt.RUNNING)),
        )
        zeros_T = jnp.zeros((), T)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, zeros_T, history)
        hac = rt.hist_init(hist_len, T)
        hac = rt.hist_write(hac, 0, zeros_T, history)
        state = MinresState(
            x=x, r1=r1, r2=r2, v=v,
            w1=jnp.zeros(n, FC), w2=jnp.zeros(n, FC),
            npc_dir=v[:0] if not linesearch else v,
            oldbeta=zeros_T, beta=beta1, beta1=beta1,
            dbar=zeros_T, eps_prev=zeros_T, phibar=beta1,
            gmax=zeros_T, gmin=jnp.asarray(jnp.inf, T),
            cs=-jnp.ones((), T), sn=zeros_T,
            anorm2=zeros_T, xenorm2=zeros_T,
            rNorm=beta1, eps_lim=eps_lim,
            err_vec=jnp.zeros((window,), T),
            zeta_k=zeros_T, delta_w=zeros_T,
            iter=jnp.int32(0), status=status,
            indefinite=jnp.zeros((), jnp.bool_),
            inconsistent=jnp.zeros((), jnp.bool_),
            npc_count=jnp.int32(0),
            precond_violation=precond_violation,
            hist_r=hr, hist_ar=har, hist_acond=hac,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        beta_c = s.beta.astype(FC)

        # Lanczos step on unnormalized vectors (reference :295-316).
        y = A.matvec(s.v) + lam.astype(FC) * s.v
        y = y / beta_c
        y = jnp.where(it >= 2, y - (s.beta / jnp.where(s.oldbeta == 0, 1.0, s.oldbeta)).astype(FC) * s.r1, y)
        alpha = kdotr(s.v, y) / s.beta
        y = y - (alpha / s.beta).astype(FC) * s.r2

        # Direction w before the final 1/γ scaling.
        delta = s.cs * s.dbar + s.sn * alpha
        w_unscaled = (
            s.v / beta_c
            - delta.astype(FC) * s.w2
            - s.eps_prev.astype(FC) * s.w1
        )

        r1_new = s.r2
        r2_new = y
        v_new = M_apply(r2_new)
        oldbeta = s.beta
        beta_sq = kdotr(r2_new, v_new)
        precond_violation = s.precond_violation | (beta_sq < 0)
        beta = jnp.sqrt(jnp.maximum(beta_sq, 0))
        anorm2 = s.anorm2 + alpha * alpha + oldbeta * oldbeta + beta * beta

        # Rotation part 1 (old cs/sn).
        gbar = s.sn * s.dbar - s.cs * alpha
        eps_new = s.sn * beta
        dbar_new = -s.cs * beta
        root = jnp.sqrt(gbar * gbar + dbar_new * dbar_new)
        ArNorm = s.phibar * root

        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), eps_T)
        w = w_unscaled / gamma.astype(FC)

        # Nonpositive-curvature check (reference :336-373).
        cgamma = s.cs * gbar
        if linesearch:
            zeta_km1 = s.zeta_k
            zeta_k = jnp.where(it > 1, -cgamma * s.rNorm * s.rNorm, s.zeta_k)
            beta_w = jnp.where(zeta_km1 != 0, zeta_k / jnp.where(zeta_km1 == 0, 1.0, zeta_km1), zeta_k)
            delta_w = jnp.where(it > 1, zeta_k + beta_w * beta_w * s.delta_w, s.delta_w)
            npc_exit = cgamma >= 0
            npc_count = jnp.where(
                npc_exit,
                jnp.where((it > 1) & (delta_w < 0), jnp.int32(2), jnp.int32(1)),
                s.npc_count,
            )
        else:
            zeta_k, delta_w = s.zeta_k, s.delta_w
            npc_exit = jnp.zeros((), jnp.bool_)
            npc_count = s.npc_count

        # Rotation part 2.
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s.phibar
        phibar = sn * s.phibar

        if linesearch:
            npc_dir = (sn * sn).astype(FC) * s.npc_dir \
                - (phibar * cs / beta).astype(FC) * v_new
            # On npc exit keep the previous direction buffer.
            npc_dir = jnp.where(npc_exit, s.npc_dir, npc_dir)
        else:
            npc_dir = s.npc_dir

        x_new = s.x + phi.astype(FC) * w
        xenorm2 = s.xenorm2 + phi * phi

        err_vec = s.err_vec.at[jnp.mod(it, window)].set(phi)
        err_lbnd = jnp.linalg.norm(err_vec)

        gmax = jnp.maximum(s.gmax, gamma)
        gmin = jnp.minimum(s.gmin, gamma)

        anorm = jnp.sqrt(anorm2)
        xnorm = knorm(x_new)
        rNorm = phibar
        test1 = rNorm / jnp.maximum(anorm * xnorm, jnp.finfo(T).tiny)
        test2 = root / jnp.maximum(anorm, jnp.finfo(T).tiny)
        acond = gmax / jnp.where(gmin == 0, jnp.finfo(T).tiny, gmin)

        # iter 1 early exit: Aᴴb ≈ 0 → x = 0 is a min least-squares solution.
        min_lsq_early = (it == 1) & (beta / s.beta1 <= 10 * eps_T)

        ill_cond_mach = (1.0 + 1.0 / acond) <= 1.0
        solved_mach = (1.0 + test2) <= 1.0
        zero_resid_mach = (1.0 + test1) <= 1.0
        resid_decrease_mach = (rNorm + 1.0) <= 1.0

        ill_cond_lim = (1.0 / acond) <= ctol
        solved_lim = test2 <= s.eps_lim
        zero_resid_lim = (test1 <= eps_T) if MisI else jnp.zeros((), jnp.bool_)
        resid_decrease_lim = rNorm <= s.eps_lim
        fwd_err = (it >= window) & (
            err_lbnd <= jnp.asarray(etol, T) * jnp.sqrt(xenorm2)
        )

        zero_resid = zero_resid_mach | zero_resid_lim
        resid_decrease = resid_decrease_mach | resid_decrease_lim
        ill_cond = ill_cond_mach | ill_cond_lim
        solved = solved_mach | solved_lim | zero_resid | fwd_err | resid_decrease

        # Status chain (reference :469-478, later assignment wins).
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(zero_resid, jnp.int32(rt.SOLVED_ZERO), code)
        code = jnp.where(fwd_err, jnp.int32(rt.FWD_ERR), code)
        code = jnp.where(min_lsq_early, jnp.int32(rt.MIN_LSQ_X), code)
        code = jnp.where(npc_exit, jnp.int32(rt.NPC), code)

        # npc exit: x ← b when iter == 1, else keep x (reference :356-361).
        if linesearch:
            x_new = jnp.where(npc_exit, jnp.where(it == 1, b, s.x), x_new)

        inconsistent = jnp.where(
            min_lsq_early, jnp.ones((), jnp.bool_), ~zero_resid
        )
        indefinite = s.indefinite | npc_exit

        hist_r = rt.hist_write(s.hist_r, it, rNorm, history)
        hist_ar = rt.hist_write(s.hist_ar, it, ArNorm, history)
        hist_ac = rt.hist_write(s.hist_acond, it, acond, history)

        s_new = s._replace(
            x=x_new, r1=r1_new, r2=r2_new, v=v_new,
            w1=s.w2, w2=w, npc_dir=npc_dir,
            oldbeta=oldbeta, beta=beta, dbar=dbar_new, eps_prev=eps_new,
            phibar=phibar, gmax=gmax, gmin=gmin, cs=cs, sn=sn,
            anorm2=anorm2, xenorm2=xenorm2, rNorm=rNorm,
            err_vec=err_vec, zeta_k=zeta_k, delta_w=delta_w,
            iter=it, status=code,
            indefinite=indefinite, inconsistent=inconsistent,
            npc_count=npc_count, precond_violation=precond_violation,
            hist_r=hist_r, hist_ar=hist_ar, hist_acond=hist_ac,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(
                verbose, it,
                "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:8.1e}  {:8.1e}  "
                "{:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}",
                rNorm, ArNorm, beta, cs, sn, anorm, acond, test1, test2)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _minres_solve(
    A, b, x0=None, *, M=None, ldiv=False, linesearch=False, lam=0.0,
    atol=None, rtol=None, etol=None, conlim=1.0e8, window=5,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
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
    if x0 is not None and linesearch:
        raise ValueError("warm_start and linesearch cannot be used together")

    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    etol = rt.default_tol(etol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    if verbose > 0:
        rt.debug_header(verbose, f"MINRES: system of size {n}")
        rt.debug_header(
            verbose,
            f"{'k':>5s}  {'‖r‖':>7s}  {'‖Aᴴr‖':>7s}  {'β':>7s}  {'cos':>8s}"
            f"  {'sin':>8s}  {'‖A‖':>7s}  {'κ(A)':>7s}  {'test1':>7s}"
            f"  {'test2':>7s}")

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (M = I or a diagonal/Jacobi centered preconditioner).
    from ..operators import DiagonalOperator
    diag_M = isinstance(M, DiagonalOperator)
    if ((M is None or diag_M) and not linesearch and callback is None
            and verbose == 0
            and not history and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (minres_dia_fused,
                                        minres_dia_fused_supported)
        if minres_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                      stencil_dtype=A._pd.dtype,
                                      precond=diag_M):
            ctol = 1.0 / conlim if conlim > 0 else 0.0
            b_eff = b if x0 is None else \
                b - (A.matvec(x0) + jnp.asarray(lam, b.dtype) * x0)
            dinv = None
            if diag_M:
                dinv = (1.0 / M.d if ldiv else M.d).astype(b.dtype)
            x, niter, rnorm, code_d, incon, viol = minres_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, etol, ctol,
                float(lam), itmax, window=int(window), dinv=dinv)
            niter, code, incon, viol = jax.device_get(
                [niter, code_d, incon, viol])
            if int(viol):
                raise ValueError(
                    "The linear operator `A` or the preconditioner `M` is "
                    "not symmetric positive definite.")
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if code == rt.ZERO_RESIDUAL:
                niter = 1          # reference parity: src/minres.jl:219
            if x0 is not None:
                x = x + x0
            inconsistent = bool(incon)
            if code == rt.ZERO_RESIDUAL:
                inconsistent = False
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=inconsistent,
                indefinite=False,
                npc_count=0,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return x, stats, None

    def run(state, cap):
        return _minres_core(
            A, M, b, x0, state, jnp.int32(cap), atol, rtol, etol,
            float(conlim), float(lam),
            ldiv=bool(ldiv), linesearch=bool(linesearch),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), window=int(window), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    if bool(state.precond_violation):
        raise ValueError("Preconditioner is not positive definite")

    code = rt.final_status_code(state.status, int(state.iter), itmax, overtimed)
    niter = int(state.iter)
    if code == rt.ZERO_RESIDUAL:
        niter = 1  # reference parity: src/minres.jl:219

    x = jnp.asarray(state.x)
    if x0 is not None and code != rt.NPC:
        x = x + x0

    inconsistent = bool(state.inconsistent)
    if code in (rt.ZERO_RESIDUAL, rt.NPC):
        inconsistent = False

    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        indefinite=bool(state.indefinite),
        npc_count=int(state.npc_count),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        Acond=rt.hist_trim(state.hist_acond, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def _minres_ir(A, b, x0, *, M=None, ldiv=False, atol=None, rtol=None,
               itmax=0, timemax=float("inf"), **_defaults):
    """precision="double_word": iterative refinement to fp64-grade TRUE
    residuals from f32 storage for Hermitian (indefinite) systems —
    inner correction solves are plain working-precision MINRES (the
    fused whole-solve-in-VMEM kernel when eligible); shared dw driver
    in solvers/_refine.py."""
    from ._refine import ir_solve

    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    b = jnp.asarray(b)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * b.shape[0])

    def inner(rhs, rtol_i, it_left, time_left):
        d, st, _ = _minres_solve(A, rhs, M=M, ldiv=ldiv, atol=0.0,
                                 rtol=rtol_i, itmax=it_left,
                                 timemax=time_left if np.isfinite(time_left)
                                 else float("inf"))
        return d, st.niter

    return ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start)


def minres(A, b, x0=None, *, precision=None, **kwargs):
    """x, stats = minres(A, b; ...) — Hermitian (indefinite) systems.

    TPU extension: ``precision="double_word"`` runs double-word iterative
    refinement around working-precision MINRES solves — fp64-grade TRUE
    residuals (rtol down to ~√eps(Float64)) from f32 device storage.
    Plain configuration only (M/ldiv allowed; no λ-shift, linesearch,
    etol window, history, or callback).
    """
    from ._refine import check_ir_config

    if check_ir_config("MINRES", precision,
                       history=kwargs.get("history", False),
                       callback=kwargs.get("callback"),
                       linesearch=kwargs.get("linesearch", False),
                       lam=kwargs.get("lam", 0.0),
                       etol=kwargs.get("etol") or 0.0,
                       # truthy-by-default options compared against their
                       # defaults (can't silently swallow conlim=1e2 etc.)
                       conlim=kwargs.get("conlim", 1.0e8) != 1.0e8,
                       window=kwargs.get("window", 5) != 5,
                       verbose=kwargs.get("verbose", 0)):
        x, stats, _ = _minres_ir(A, b, x0, **kwargs)
        return x, stats
    x, stats, _ = _minres_solve(A, b, x0, **kwargs)
    return x, stats
