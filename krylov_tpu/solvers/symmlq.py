"""SYMMLQ for Hermitian (indefinite) Ax = b.

Parity with reference src/symmlq.jl: λ shift, λest-based forward-error
bounds (err/errcg) including the retrospective window correction of the
recorded errorscg history (src/symmlq.jl:342-374), transfer_to_cg,
conlim, etol, Anorm/Acond estimates, SymmlqStats with LQ and CG-point
residual and error histories.

One documented deviation: the reference applies the λ shift to the
Lanczos scalar only (α = ⟨v, Av⟩ + λ, src/symmlq.jl:300) while leaving
the three-term vector recurrence unshifted — inconsistent for λ ≠ 0 and
untested there.  Here the shift is applied in operator form
((A+λI)v, as reference src/minres.jl:296 does), which makes
``symmlq(A, b, lam=λ)`` agree exactly with ``symmlq(A+λI, b)``
(pinned by tests/test_sid_family.py::test_symmlq_shift_operator_form).
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
from ..ops.kops import kdotr, sym_givens
from ..stats import SymmlqStats

SOLVED_GEN = 34   # "found approximate solution"
SOLVED_LQ = 35    # "solution xᴸ good enough given atol and rtol"
SOLVED_CG_PT = 36  # "solution xᶜ good enough given atol and rtol"
_STATUS = {
    SOLVED_GEN: "found approximate solution",
    SOLVED_LQ: "solution xᴸ good enough given atol and rtol",
    SOLVED_CG_PT: "solution xᶜ good enough given atol and rtol",
}


class SymmlqState(NamedTuple):
    x: jax.Array
    wbar: jax.Array
    Mvold: jax.Array
    Mv: jax.Array
    vold: jax.Array
    v: jax.Array
    beta: jax.Array
    gbar: jax.Array
    dbar: jax.Array
    eps_old: jax.Array
    cold: jax.Array
    eta: jax.Array
    zold: jax.Array
    zetabar: jax.Array
    anorm2: jax.Array
    gmax: jax.Array
    gmin: jax.Array
    xnorm2: jax.Array
    rNorm: jax.Array
    rcgNorm: jax.Array
    # λest machinery
    rhobar: jax.Array
    sigbar: jax.Array
    cw: jax.Array
    sw: jax.Array
    cwold: jax.Array
    err: jax.Array
    errcg: jax.Array
    clist: jax.Array      # (window,) ring of Givens cosines (λest window)
    zlist: jax.Array      # (window,) ring of ζ values
    sprod: jax.Array      # (window,) running sine products
    tol: jax.Array
    iter: jax.Array
    status: jax.Array
    solved_cg_flag: jax.Array
    precond_violation: jax.Array
    hist_r: jax.Array
    hist_rcg: jax.Array
    hist_err: jax.Array
    hist_errcg: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "transfer_to_cg", "use_lambda_est", "history",
                     "hist_len", "callback", "verbose", "MisI", "window"),
)
def _symmlq_core(
    A, M, b, x0, state_in, iter_cap, itmax, atol, rtol, etol, conlim,
    lam, lambda_est,
    *, ldiv, transfer_to_cg, use_lambda_est, history, hist_len, callback,
    verbose, MisI, window=5,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    lest = jnp.asarray(lambda_est, T)
    ctol = jnp.where(jnp.asarray(conlim, T) > 0,
                     1.0 / jnp.asarray(conlim, T), jnp.zeros((), T))
    tiny = jnp.finfo(T).tiny

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def _safe(d):
        return jnp.where(d == 0, jnp.ones_like(d), d)

    if state_in is None:
        x = jnp.zeros(n, FC)
        if x0 is None:
            Mvold = b
        else:
            Mvold = b - (A.matvec(x0) + lam.astype(FC) * x0)
        vold = M_apply(Mvold)
        beta1_sq = kdotr(vold, Mvold)
        precond_violation = beta1_sq < 0
        beta1 = jnp.sqrt(jnp.maximum(beta1_sq, 0))
        safe_b1 = _safe(beta1).astype(FC)
        vold = vold / safe_b1
        Mvold = vold if MisI else Mvold / safe_b1

        wbar = vold
        # Shifted operator (A+λI)v, applied like reference src/minres.jl:296
        # (the reference symmlq adds λ to α only, which is inconsistent for
        # λ ≠ 0 and untested there — we use the correct form).
        Mv = A.matvec(vold) + lam.astype(FC) * vold
        alpha = kdotr(vold, Mv)
        Mv = Mv - alpha.astype(FC) * Mvold
        v = M_apply(Mv)
        beta_sq = kdotr(v, Mv)
        precond_violation = precond_violation | (beta_sq < 0)
        beta = jnp.sqrt(jnp.maximum(beta_sq, 0))
        safe_b = _safe(beta).astype(FC)
        v = v / safe_b
        Mv = v if MisI else Mv / safe_b

        gbar = alpha
        dbar = beta
        eta = beta1
        zetabar = eta / _safe(gbar)
        rcgNorm = beta1 * jnp.abs(zetabar)
        tol = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta1

        solved_lq0 = beta1 <= tol
        solved_cg0 = (gbar != 0) & transfer_to_cg & (rcgNorm <= tol)
        status = jnp.where(
            beta1_sq == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(solved_lq0, jnp.int32(SOLVED_LQ),
                      jnp.where(solved_cg0, jnp.int32(SOLVED_CG_PT),
                                jnp.int32(rt.RUNNING))),
        )

        # λest init
        rhobar = alpha - lest
        rho = jnp.sqrt(rhobar * rhobar + beta * beta)
        cw = rhobar / _safe(rho)
        sw = beta / _safe(rho)

        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        hrcg = rt.hist_init(hist_len, T)
        hrcg = rt.hist_write(
            hrcg, 0, jnp.where(gbar != 0, rcgNorm, jnp.nan), history
        )
        herr = rt.hist_init(hist_len, T)
        herrcg = rt.hist_init(hist_len, T)
        if use_lambda_est:
            # reference src/symmlq.jl:257-259 pre-loop error bounds
            e0 = jnp.abs(beta1 / _safe(lest))
            herr = rt.hist_write(herr, 0, e0, history)
            herrcg = rt.hist_write(
                herrcg, 0,
                jnp.where(gbar != 0,
                          jnp.sqrt(jnp.maximum(e0 * e0
                                               - zetabar * zetabar, 0)),
                          jnp.nan),
                history)
        state = SymmlqState(
            x=x, wbar=wbar, Mvold=Mvold, Mv=Mv, vold=vold, v=v,
            beta=beta, gbar=gbar, dbar=dbar,
            eps_old=jnp.zeros((), T), cold=jnp.ones((), T),
            eta=eta, zold=jnp.zeros((), T), zetabar=zetabar,
            anorm2=alpha * alpha + beta * beta,
            gmax=jnp.asarray(-jnp.inf, T), gmin=jnp.asarray(jnp.inf, T),
            xnorm2=jnp.zeros((), T), rNorm=beta1, rcgNorm=rcgNorm,
            rhobar=rhobar, sigbar=beta, cw=cw, sw=sw,
            cwold=-jnp.ones((), T),
            err=jnp.asarray(jnp.inf, T), errcg=jnp.asarray(jnp.inf, T),
            clist=jnp.zeros((window,), T), zlist=jnp.zeros((window,), T),
            sprod=jnp.ones((window,), T),
            tol=tol, iter=jnp.int32(0), status=status,
            solved_cg_flag=solved_cg0,
            precond_violation=precond_violation,
            hist_r=hr, hist_rcg=hrcg, hist_err=herr, hist_errcg=herrcg,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        c, sn, gamma = sym_givens(s.gbar, s.beta)

        etaold = s.eta
        zeta = etaold / _safe(gamma)
        x = s.x + (c * zeta).astype(FC) * s.wbar + (sn * zeta).astype(FC) * s.v
        wbar = sn.astype(FC) * s.wbar - c.astype(FC) * s.v

        # Next Lanczos vector.
        oldbeta = s.beta
        Mv_next = A.matvec(s.v) + lam.astype(FC) * s.v
        alpha = kdotr(s.v, Mv_next)
        Mv_next = Mv_next - oldbeta.astype(FC) * s.Mvold
        Mvold = s.Mv
        Mv_next = Mv_next - alpha.astype(FC) * s.Mv
        Mv = Mv_next
        v = M_apply(Mv)
        beta_sq = kdotr(v, Mv)
        precond_violation = s.precond_violation | (beta_sq < 0)
        beta = jnp.sqrt(jnp.maximum(beta_sq, 0))
        safe_b = _safe(beta).astype(FC)
        v = v / safe_b
        Mv = v if MisI else Mv / safe_b

        anorm2 = s.anorm2 + alpha * alpha + oldbeta * oldbeta + beta * beta

        if use_lambda_est:
            eta_w = -oldbeta * oldbeta * s.cwold / _safe(s.rhobar)
            omega = lest + eta_w
            psi = c * s.dbar + sn * omega
            omegabar = sn * s.dbar - c * omega

        delta = s.dbar * c + alpha * sn
        gbar = s.dbar * sn - alpha * c
        eps_new = beta * sn
        dbar = -beta * c
        eta = -s.eps_old * s.zold - delta * zeta

        rNorm = jnp.sqrt(gamma * gamma * zeta * zeta
                         + s.eps_old * s.eps_old * s.zold * s.zold)
        xnorm2 = s.xnorm2 + zeta * zeta

        gbar_nz = gbar != 0
        zetabar = jnp.where(gbar_nz, eta / _safe(gbar), s.zetabar)
        rcgNorm = jnp.where(gbar_nz, beta * jnp.abs(sn * zeta - c * zetabar),
                            s.rcgNorm)

        if use_lambda_est:
            # Retrospective window correction of the recorded errorscg
            # history (reference src/symmlq.jl:342-374): the ζ/c/s rings
            # refine the entry written `window` iterations ago.
            idxs = jnp.arange(window)
            sprod = jnp.where((it < window) & (idxs >= it),
                              s.sprod * sn, s.sprod) if window > 1 \
                else s.sprod
            ix = (it - 1) % window
            clist = s.clist.at[ix].set(c)
            zlist = s.zlist.at[ix].set(zeta)
            herrcg = s.hist_errcg
            if history and window > 0:
                jx = it % window
                zetabark = zlist[jx] / _safe(clist[jx])
                theta0 = jnp.sum(clist * sprod * zlist)
                theta = (zetabark * jnp.abs(theta0)
                         + jnp.abs(zetabark * zetabar * sprod[ix] * sn)
                         - zetabark * zetabark)
                back = jnp.maximum(it - window, 0)
                old = herrcg[back]
                corr = jnp.where(
                    gbar_nz, jnp.sqrt(jnp.abs(old * old - 2 * theta)),
                    jnp.nan)
                herrcg = herrcg.at[back].set(
                    jnp.where(it >= window, corr, old))
            if window > 1:
                ixp = it % window
                q = (ixp + 1) % window
                sprod_n = sprod / _safe(sprod[q])
                sprod_n = sprod_n.at[ixp].set(
                    sprod_n[(ixp - 1) % window] * sn)
                sprod = jnp.where(it >= window, sprod_n, sprod)

            err = jnp.abs((s.eps_old * s.zold + psi * zeta) / _safe(omegabar))
            errcg = jnp.where(
                gbar_nz, jnp.sqrt(jnp.abs(err * err - zetabar * zetabar)),
                s.errcg)
            herr = rt.hist_write(s.hist_err, it, err, history)
            herrcg = rt.hist_write(
                herrcg, it, jnp.where(gbar_nz, errcg, jnp.nan), history)
            rhobar = s.sw * s.sigbar - s.cw * (alpha - lest)
            sigbar = -s.cw * beta
            rho = jnp.sqrt(rhobar * rhobar + beta * beta)
            cwold = s.cw
            cw = rhobar / _safe(rho)
            sw = beta / _safe(rho)
        else:
            err, errcg = s.err, s.errcg
            clist, zlist, sprod = s.clist, s.zlist, s.sprod
            herr, herrcg = s.hist_err, s.hist_errcg
            rhobar, sigbar = s.rhobar, s.sigbar
            cw, sw, cwold = s.cw, s.sw, s.cwold

        gmax = jnp.maximum(s.gmax, gamma)
        gmin = jnp.minimum(s.gmin, gamma)
        acond = gmax / jnp.maximum(gmin, tiny)
        anorm = jnp.sqrt(anorm2)
        test1 = rNorm / jnp.maximum(anorm * jnp.sqrt(xnorm2), tiny)

        resid_decrease_mach = (1.0 + rNorm) <= 1.0
        ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
        zero_resid_mach = (1.0 + test1) <= 1.0
        tired = it >= itmax
        ill_cond_lim = (1.0 / jnp.maximum(acond, tiny)) <= ctol
        zero_resid_lim = test1 <= s.tol
        fwd_err = (err <= etol) | (gbar_nz & (errcg <= etol))
        solved_lq = rNorm <= s.tol
        solved_cg = transfer_to_cg & gbar_nz & (rcgNorm <= s.tol)
        zero_resid = solved_lq | solved_cg
        ill_cond = ill_cond_mach | ill_cond_lim
        solved = (resid_decrease_mach | zero_resid | zero_resid_mach
                  | zero_resid_lim | fwd_err)

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(solved, jnp.int32(SOLVED_GEN), code)
        code = jnp.where(solved & solved_lq, jnp.int32(SOLVED_LQ), code)
        code = jnp.where(solved & solved_cg, jnp.int32(SOLVED_CG_PT), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        hrcg = rt.hist_write(s.hist_rcg, it,
                             jnp.where(gbar_nz, rcgNorm, jnp.nan), history)
        s_new = s._replace(
            x=x, wbar=wbar, Mvold=Mvold, Mv=Mv, vold=s.v, v=v,
            beta=beta, gbar=gbar, dbar=dbar, eps_old=eps_new,
            cold=c, eta=eta, zold=zeta, zetabar=zetabar,
            anorm2=anorm2, gmax=gmax, gmin=gmin, xnorm2=xnorm2,
            rNorm=rNorm, rcgNorm=rcgNorm,
            rhobar=rhobar, sigbar=sigbar, cw=cw, sw=sw, cwold=cwold,
            err=err, errcg=errcg,
            clist=clist, zlist=zlist, sprod=sprod,
            iter=it, status=code,
            solved_cg_flag=solved_cg,
            precond_violation=precond_violation,
            hist_r=hr, hist_rcg=hrcg, hist_err=herr, hist_errcg=herrcg,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT), s_new.status))
        if verbose > 0:
            rt.debug_row(
                verbose, it,
                "{:5d}  {:7.1e}  {:7.1e}  {:8.1e}  {:8.1e}  {:7.1e}  "
                "{:7.1e}  {:7.1e}",
                rNorm, beta, c, sn, anorm, acond, test1)
        return s_new

    state = jax.lax.while_loop(cond, body, state)
    # Transfer to the CG point when it triggered the stop
    # (reference src/symmlq.jl:437-440).
    x_final = jnp.where(
        state.solved_cg_flag,
        state.x + state.zetabar.astype(FC) * state.wbar,
        state.x,
    )
    return state._replace(x=x_final)


def _symmlq_solve(
    A, b, x0=None, *, M=None, ldiv=False, lam=0.0, lambda_est=0.0,
    transfer_to_cg=True, atol=None, rtol=None, etol=None, conlim=1.0e8,
    window=5, itmax=0, timemax=float("inf"), verbose=0, history=False,
    callback=None,
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
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    etol = rt.default_tol(etol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    rt.debug_header(verbose, f"SYMMLQ: system of size {n}")
    rt.debug_header(
        verbose,
        f"{'k':>5s}  {'‖r‖':>7s}  {'β':>7s}  {'cos':>8s}  {'sin':>8s}  "
        f"{'‖A‖':>7s}  {'κ(A)':>7s}  {'test1':>7s}")

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and lambda_est == 0 and callback is None and verbose == 0
            and not history and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (symmlq_dia_fused,
                                        symmlq_dia_fused_supported)
        if symmlq_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                      stencil_dtype=A._pd.dtype):
            ctol = 1.0 / conlim if conlim > 0 else 0.0
            b_eff = b if x0 is None else \
                b - (A.matvec(x0) + jnp.asarray(lam, b.dtype) * x0)
            x, niter, rnorm, code_d, anorm2, gmax, gmin = symmlq_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, ctol, float(lam),
                itmax, transfer_to_cg=bool(transfer_to_cg))
            niter, code, anorm2, gmax, gmin = jax.device_get(
                [niter, code_d, anorm2, gmax, gmin])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            gmax, gmin = float(gmax), float(gmin)
            stats = SymmlqStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code in (
                    SOLVED_GEN, SOLVED_LQ, SOLVED_CG_PT),
                residuals=np.zeros(0), residualscg=np.zeros(0),
                errors=np.zeros(0), errorscg=np.zeros(0),
                Anorm=float(np.sqrt(anorm2)),
                Acond=(gmax / max(gmin, 1e-300)
                       if np.isfinite(gmax) and gmax >= 0
                       else float("nan")),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _symmlq_core(
            A, M, b, x0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, etol, float(conlim), float(lam), float(lambda_est),
            ldiv=bool(ldiv), transfer_to_cg=bool(transfer_to_cg),
            use_lambda_est=bool(lambda_est != 0),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None, window=int(window),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    if bool(state.precond_violation):
        raise ValueError("Preconditioner is not positive definite")
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None:
        x = x + x0
    stats = SymmlqStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code in (SOLVED_GEN, SOLVED_LQ,
                                                   SOLVED_CG_PT),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        residualscg=rt.hist_trim(state.hist_rcg, niter) if history else np.zeros(0),
        errors=(rt.hist_trim(state.hist_err, niter)
                if history and lambda_est != 0 else np.zeros(0)),
        errorscg=(rt.hist_trim(state.hist_errcg, niter)
                  if history and lambda_est != 0 else np.zeros(0)),
        Anorm=float(np.sqrt(state.anorm2)),
        Acond=(float(state.gmax) / max(float(state.gmin), 1e-300)
               if np.isfinite(state.gmax) and float(state.gmax) >= 0
               else float("nan")),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, stats, state


def symmlq(A, b, x0=None, **kwargs):
    """x, stats = symmlq(A, b; λ, λest, transfer_to_cg, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/ldiv allowed; no
    λ/λest/etol/window/conlim)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("SYMMLQ", _symmlq_solve, A, b, x0, kwargs,
                         forward=("M", "ldiv"),
                         reject={"lam": 0.0, "lambda_est": 0.0,
                                 "etol": None, "window": 5,
                                 "conlim": 1.0e8})
    if hit is not None:
        return hit
    x, stats, _ = _symmlq_solve(A, b, x0, **kwargs)
    return x, stats
