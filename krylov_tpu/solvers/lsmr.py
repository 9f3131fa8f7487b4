"""LSMR: min ‖b − Ax‖ (+ λ) minimizing ‖Aᴴrₖ‖ at each step.

Parity with reference src/lsmr.jl: λ/sqd regularization, M/N elliptic
norms, radius, Paige-Saunders stopping rules, the ‖r‖/‖A‖/cond(A)/‖x‖
estimate recurrences, LsmrStats.
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
from ..ops.kops import kdotr, knorm, sym_givens, to_boundary
from ..stats import LsmrStats


class LsmrState(NamedTuple):
    x: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    h: jax.Array
    hbar: jax.Array
    alpha: jax.Array
    beta: jax.Array
    zetabar: jax.Array
    alphabar: jax.Array
    rho: jax.Array
    rhobar: jax.Array
    cbar: jax.Array
    sbar: jax.Array
    betadd: jax.Array
    betad: jax.Array
    rhodold: jax.Array
    tautildeold: jax.Array
    thetatilde: jax.Array
    zeta: jax.Array
    dd: jax.Array
    anorm2: jax.Array
    maxrbar: jax.Array
    minrbar: jax.Array
    xenorm2: jax.Array
    err_vec: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    ArNorm0: jax.Array
    beta1: jax.Array
    acond: jax.Array
    anorm: jax.Array
    xnorm: jax.Array
    iter: jax.Array
    status: jax.Array
    zero_resid: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "window", "use_radius", "MisI", "NisI"),
)
def _lsmr_core(
    A, M, N, b, state_in, iter_cap, itmax, lam, axtol, btol, atol, rtol,
    etol, conlim, radius,
    *, ldiv, history, hist_len, callback, verbose, window, use_radius,
    MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    radius = jnp.asarray(radius, T)
    ctol = jnp.where(jnp.asarray(conlim, T) > 0,
                     1.0 / jnp.asarray(conlim, T), jnp.zeros((), T))
    tiny = jnp.finfo(T).tiny

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        Mu = b
        u = M_apply(Mu)
        beta1 = jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))
        safe_b1 = jnp.where(beta1 == 0, jnp.ones_like(beta1), beta1)
        u = u / safe_b1.astype(FC)
        Mu = u if MisI else Mu / safe_b1.astype(FC)
        Ahu = A.rmatvec(u)
        Nv = Ahu
        v = N_apply(Nv)
        alpha = jnp.sqrt(jnp.maximum(kdotr(v, Nv), 0))
        safe_a = jnp.where(alpha == 0, jnp.ones_like(alpha), alpha)
        v = v / safe_a.astype(FC)
        Nv = v if NisI else Nv / safe_a.astype(FC)
        ArNorm0 = alpha * beta1
        status = jnp.where(
            beta1 == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(alpha == 0, jnp.int32(rt.MIN_LSQ_X),
                      jnp.where(beta1 <= axtol, jnp.int32(rt.SOLVED_LSQ),
                                jnp.int32(rt.RUNNING))),
        )
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm0, history)
        state = LsmrState(
            x=x, u=u, Mu=Mu, v=v, Nv=Nv, h=v, hbar=jnp.zeros(n, FC),
            alpha=alpha, beta=beta1,
            zetabar=alpha * beta1, alphabar=alpha,
            rho=jnp.ones((), T), rhobar=jnp.ones((), T),
            cbar=jnp.ones((), T), sbar=jnp.zeros((), T),
            betadd=beta1, betad=jnp.zeros((), T),
            rhodold=jnp.ones((), T), tautildeold=jnp.zeros((), T),
            thetatilde=jnp.zeros((), T), zeta=jnp.zeros((), T),
            dd=jnp.zeros((), T),
            anorm2=alpha * alpha, maxrbar=jnp.zeros((), T),
            # reference lsmr.jl's 1e100 sentinel overflows narrow dtypes;
            # finfo.max is the same "larger than any real rbar" bound.
            minrbar=jnp.asarray(min(1.0e100, float(jnp.finfo(T).max)), T),
            xenorm2=jnp.zeros((), T), err_vec=jnp.zeros((window,), T),
            rNorm=beta1, ArNorm=ArNorm0, ArNorm0=ArNorm0, beta1=beta1,
            acond=jnp.zeros((), T), anorm=alpha, xnorm=jnp.zeros((), T),
            iter=jnp.int32(0), status=status,
            zero_resid=jnp.zeros((), jnp.bool_),
            hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        Av = A.matvec(s.v)
        Mu = Av - s.alpha.astype(FC) * s.Mu
        u = M_apply(Mu)
        beta = jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))
        bnz = beta != 0
        safe_b = jnp.where(bnz, beta, jnp.ones_like(beta))
        u = jnp.where(bnz, u / safe_b.astype(FC), u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b.astype(FC), Mu)
        Ahu = A.rmatvec(u)
        Nv = jnp.where(bnz, Ahu - beta.astype(FC) * s.Nv, s.Nv)
        v = jnp.where(bnz, N_apply(Nv), s.v)
        alpha = jnp.where(bnz, jnp.sqrt(jnp.maximum(kdotr(v, Nv), 0)), s.alpha)
        anz = bnz & (alpha != 0)
        safe_a = jnp.where(anz, alpha, jnp.ones_like(alpha))
        v = jnp.where(anz, v / safe_a.astype(FC), v)
        Nv = v if NisI else jnp.where(anz, Nv / safe_a.astype(FC), Nv)

        chat, shat, alphahat = sym_givens(s.alphabar, lam)
        rhoold = s.rho
        c, sg, rho = sym_givens(alphahat, beta)
        thetanew = sg * alpha
        alphabar = c * alpha

        rhobarold = s.rhobar
        zetaold = s.zeta
        thetabar = s.sbar * rho
        rhotemp = s.cbar * rho
        cbar, sbar, rhobar = sym_givens(rhotemp, thetanew)
        zeta = cbar * s.zetabar
        zetabar = -sbar * s.zetabar

        xenorm2 = s.xenorm2 + zeta * zeta
        err_vec = s.err_vec.at[jnp.mod(it, window)].set(zeta)
        err_lbnd = jnp.linalg.norm(err_vec)

        delta = thetabar * rho / jnp.maximum(rhoold * rhobarold, tiny)
        hbar = s.h - delta.astype(FC) * s.hbar

        safe_rr = jnp.maximum(rho * rhobar, tiny)
        sigma = zeta / safe_rr
        on_boundary = jnp.zeros((), jnp.bool_)
        if use_radius:
            t1b, t2b = to_boundary(s.x, hbar, radius)
            tmax = jnp.maximum(t1b, t2b)
            tmin = jnp.minimum(t1b, t2b)
            on_boundary = (sigma > tmax) | (sigma < tmin)
            sigma = jnp.where(sigma > 0, jnp.minimum(sigma, tmax),
                              jnp.maximum(sigma, tmin))

        x = s.x + sigma.astype(FC) * hbar
        h = v - (thetanew / jnp.maximum(rho, tiny)).astype(FC) * s.h

        # ‖r‖ estimate recurrences.
        betaacute = chat * s.betadd
        betacheck = -shat * s.betadd
        betahat = c * betaacute
        betadd = -sg * betaacute

        thetatildeold = s.thetatilde
        ctildeold, stildeold, rhotildeold = sym_givens(s.rhodold, thetabar)
        thetatilde = stildeold * rhobar
        rhodold = ctildeold * rhobar
        betad = -stildeold * s.betad + ctildeold * betahat

        tautildeold = (zetaold - thetatildeold * s.tautildeold) / jnp.maximum(
            rhotildeold, tiny)
        taud = (zeta - thetatilde * tautildeold) / jnp.maximum(rhodold, tiny)
        dd = s.dd + betacheck * betacheck
        rNorm = jnp.sqrt(dd + (betad - taud) ** 2 + betadd * betadd)

        anorm2 = s.anorm2 + beta * beta
        anorm = jnp.sqrt(anorm2)
        anorm2 = anorm2 + alpha * alpha

        maxrbar = jnp.maximum(s.maxrbar, rhobarold)
        minrbar = jnp.where(it > 1, jnp.minimum(s.minrbar, rhobarold), s.minrbar)
        acond = jnp.maximum(maxrbar, rhotemp) / jnp.maximum(
            jnp.minimum(minrbar, rhotemp), tiny)

        ArNorm = jnp.abs(zetabar)
        xnorm = knorm(x)

        test1 = rNorm / s.beta1
        test2 = ArNorm / jnp.maximum(anorm * rNorm, tiny)
        test3 = 1.0 / jnp.maximum(acond, tiny)
        t1 = test1 / (1.0 + anorm * xnorm / s.beta1)
        rNormtol = jnp.asarray(btol, T) + jnp.asarray(axtol, T) * anorm * xnorm / s.beta1

        ill_cond_mach = (1.0 + test3) <= 1.0
        solved_mach = (1.0 + test2) <= 1.0
        zero_resid_mach = (1.0 + t1) <= 1.0
        tired = it >= itmax
        ill_cond_lim = test3 <= ctol
        solved_lim = test2 <= axtol
        solved_opt = ArNorm <= jnp.asarray(atol, T) + jnp.asarray(rtol, T) * s.ArNorm0
        zero_resid_lim = test1 <= rNormtol
        fwd_err = (it >= window) & (err_lbnd <= jnp.asarray(etol, T)
                                    * jnp.sqrt(xenorm2))

        ill_cond = ill_cond_mach | ill_cond_lim
        zero_resid = zero_resid_mach | zero_resid_lim
        solved = (solved_mach | solved_lim | solved_opt | zero_resid
                  | fwd_err | on_boundary)

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(solved & zero_resid, jnp.int32(rt.SOLVED_ZERO), code)
        code = jnp.where(solved & fwd_err, jnp.int32(rt.FWD_ERR), code)
        code = jnp.where(solved & on_boundary, jnp.int32(rt.ON_BOUNDARY), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(
            x=x, u=u, Mu=Mu, v=v, Nv=Nv, h=h, hbar=hbar,
            alpha=alpha, beta=beta, zetabar=zetabar, alphabar=alphabar,
            rho=rho, rhobar=rhobar, cbar=cbar, sbar=sbar,
            betadd=betadd, betad=betad, rhodold=rhodold,
            tautildeold=tautildeold, thetatilde=thetatilde, zeta=zeta,
            dd=dd, anorm2=anorm2, maxrbar=maxrbar, minrbar=minrbar,
            xenorm2=xenorm2, err_vec=err_vec,
            rNorm=rNorm, ArNorm=ArNorm, acond=acond, anorm=anorm,
            xnorm=xnorm, iter=it, status=code, zero_resid=zero_resid,
            hist_r=hr, hist_ar=har,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT), s_new.status))
        if verbose > 0:
            rt.debug_row(
                verbose, it,
                "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  {:8.1e}  "
                "{:8.1e}  {:7.1e}",
                rNorm, ArNorm, beta, alpha, c, sg, anorm2)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _lsmr_fused_path(A, b, lam, axtol, btol, atol, rtol, etol, conlim,
                     itmax, window, start):
    """Whole-solve-in-VMEM fused LSMR (ops/pallas_fused.lsmr_dia_fused)."""
    from ..ops.pallas_fused import lsmr_dia_fused

    pd_adj, offs_adj = A.aligned_adjoint()
    (x, niter, rnorm, arnorm, acond, anorm, xnorm, status,
     zr) = lsmr_dia_fused(
        A._pd, pd_adj, A.dia.offsets, offs_adj, b, lam, axtol, btol,
        atol, rtol, etol, conlim, itmax, window=window)
    niter, code, zr = jax.device_get([niter, status, zr])
    niter = int(niter)
    code = rt.final_status_code(int(code), niter, itmax, False)
    inconsistent = not bool(zr)
    if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        inconsistent = False
    stats = LsmrStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        residuals=np.zeros(0), Aresiduals=np.zeros(0),
        residual=float(rnorm), Aresidual=float(arnorm),
        Acond=float(acond), Anorm=float(anorm), xNorm=float(xnorm),
        timer=time.perf_counter() - start, status=rt.decode_status(code),
    )
    return jnp.asarray(x), stats, None


def _lsmr_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0, radius=0.0,
    axtol=None, btol=None, atol=0.0, rtol=0.0, etol=None, conlim=1.0e8,
    window=5, itmax=0, timemax=float("inf"), verbose=0, history=False,
    callback=None,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    M = as_operator(M)
    N = as_operator(N)
    b = jnp.asarray(b)
    m, n = A.shape
    if b.shape[0] != m:
        raise ValueError("Inconsistent problem size")
    if sqd and lam != 0:
        raise ValueError("sqd cannot be set to true if λ ≠ 0 !")
    if sqd:
        lam = 1.0
    T = real_dtype(b.dtype)
    axtol = rt.default_tol(axtol, T)
    btol = rt.default_tol(btol, T)
    etol = rt.default_tol(etol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    hist_len = itmax + 1 if history else 0
    rt.debug_header(verbose, f"LSMR: system of {m} equations in {n} variables")
    rt.debug_header(
        verbose,
        f"{'k':>5s}  {'‖r‖':>7s}  {'‖Aᴴr‖':>7s}  {'β':>7s}  {'α':>7s}  "
        f"{'cos':>8s}  {'sin':>8s}  {'‖A‖²':>7s}")

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (Golub-Kahan over the stencil and its adjoint, all vectors in VMEM).
    if (M is None and N is None and radius == 0 and not history
            and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import lsmr_dia_fused_supported
        if lsmr_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            return _lsmr_fused_path(
                A, b, float(lam), axtol, btol, float(atol), float(rtol),
                etol, float(conlim), itmax, int(window), start)

    def run(state, cap):
        return _lsmr_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            float(lam), axtol, btol, float(atol), float(rtol), etol,
            float(conlim), float(radius),
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), window=int(window),
            use_radius=bool(radius > 0), MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    inconsistent = not bool(state.zero_resid)
    if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        inconsistent = False
    stats = LsmrStats(
        niter=niter, solved=rt.is_solved_code(code), inconsistent=inconsistent,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        residual=float(state.rNorm), Aresidual=float(state.ArNorm),
        Acond=float(state.acond), Anorm=float(state.anorm),
        xNorm=float(state.xnorm),
        timer=time.perf_counter() - start, status=rt.decode_status(code),
    )
    return jnp.asarray(state.x), stats, state


def lsmr(A, b, **kwargs):
    """x, stats = lsmr(A, b; λ, sqd, M, N, radius, ...).

    TPU extension: ``precision="double_word"`` — least-squares iterative
    refinement to fp64-grade LS optimality from f32 storage (see lsqr;
    shared driver in solvers/_refine.ir_solve_ls).  Plain configuration
    only (λ allowed).
    """
    from ._refine import check_ir_config
    from .lsqr import _ls_ir, _ls_ir_guard

    precision = kwargs.pop("precision", None)
    if check_ir_config("LSMR", precision,
                       **_ls_ir_guard("LSMR", kwargs)):
        fwd = {k: kwargs[k] for k in ("lam", "atol", "rtol", "itmax",
                                      "timemax") if k in kwargs}
        x, stats, _ = _ls_ir("LSMR", _lsmr_solve, A, b,
                             stats_cls=LsmrStats, **fwd)
        return x, stats
    x, stats, _ = _lsmr_solve(A, b, **kwargs)
    return x, stats
