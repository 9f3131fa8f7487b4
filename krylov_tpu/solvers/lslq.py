"""LSLQ: min ‖b − Ax‖ via the LQ form of Golub-Kahan bidiagonalization.

Parity with reference src/lslq.jl: λ/sqd regularization, σ (underestimate
of σmin) → forward-error upper bounds err_ubnds_lq/cg with utol stop,
etol window lower bound, btol/conlim, transfer_to_lsqr, LSLQStats.
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
from ..stats import LSLQStats

FWD_LBND = 44  # "forward error lower bound small enough"
FWD_UBND = 45  # "forward error upper bound small enough"
_STATUS = {
    FWD_LBND: "forward error lower bound small enough",
    FWD_UBND: "forward error upper bound small enough",
}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


class LslqState(NamedTuple):
    x: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    wbar: jax.Array
    alpha: jax.Array
    beta: jax.Array
    lam_k: jax.Array
    anorm2: jax.Array
    smax: jax.Array
    smin: jax.Array
    gbar: jax.Array
    psi: jax.Array
    c: jax.Array
    s: jax.Array
    delta: jax.Array
    tau: jax.Array
    zeta: jax.Array
    zetabar: jax.Array
    zetatilde: jax.Array
    rhobar_sig: jax.Array
    csig: jax.Array
    omega: jax.Array
    complex_bnd: jax.Array
    xlqnorm2: jax.Array
    err_vec: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    beta1: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    zero_resid: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "use_sigma", "history", "hist_len", "callback",
                     "verbose", "window", "MisI", "NisI"),
)
def _lslq_core(
    A, M, N, b, state_in, iter_cap, itmax, atol, rtol, btol, etol, utol,
    conlim, lam, sigma,
    *, ldiv, use_sigma, history, hist_len, callback, verbose, window,
    MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    sigma_v = jnp.asarray(sigma, T)
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
        safe_b = _safe(beta1).astype(FC)
        u = u / safe_b
        Mu = u if MisI else Mu / safe_b
        Ahu = A.rmatvec(u)
        Nv = Ahu
        v = N_apply(Nv)
        alpha = jnp.sqrt(jnp.maximum(kdotr(v, Nv), 0))
        safe_a = _safe(alpha).astype(FC)
        v = v / safe_a
        Nv = v if NisI else Nv / safe_a
        status = jnp.where(beta1 == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(alpha == 0, jnp.int32(rt.MIN_LSQ_X),
                                     jnp.int32(rt.RUNNING)))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta1
        status = jnp.where((status == rt.RUNNING) & (beta1 <= eps_lim),
                           jnp.int32(rt.SOLVED_ZERO), status)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, alpha * beta1, history)
        state = LslqState(
            x=x, u=u, Mu=Mu, v=v, Nv=Nv, wbar=v,
            alpha=alpha, beta=beta1, lam_k=jnp.asarray(lam, T),
            anorm2=alpha * alpha,
            smax=jnp.zeros((), T), smin=jnp.asarray(jnp.inf, T),
            gbar=alpha, psi=beta1, c=-jnp.ones((), T), s=jnp.zeros((), T),
            delta=-jnp.ones((), T), tau=alpha * beta1,
            zeta=jnp.zeros((), T), zetabar=jnp.zeros((), T),
            zetatilde=jnp.zeros((), T),
            rhobar_sig=-sigma_v, csig=-jnp.ones((), T),
            omega=jnp.zeros((), T),
            complex_bnd=jnp.zeros((), jnp.bool_),
            xlqnorm2=jnp.zeros((), T), err_vec=jnp.zeros((window,), T),
            rNorm=beta1, ArNorm=alpha * beta1, beta1=beta1, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            zero_resid=jnp.zeros((), jnp.bool_),
            hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s_):
        return (s_.status == rt.RUNNING) & (s_.iter < iter_cap)

    def body(s_):
        # Golub-Kahan step.
        Av = A.matvec(s_.v)
        Mu = Av - s_.alpha.astype(FC) * s_.Mu
        u = M_apply(Mu)
        beta = jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))
        bnz = beta != 0
        safe_b = _safe(beta).astype(FC)
        u = jnp.where(bnz, u / safe_b, u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b, Mu)
        Ahu = A.rmatvec(u)
        Nv = jnp.where(bnz, Ahu - beta.astype(FC) * s_.Nv, s_.Nv)
        v = jnp.where(bnz, N_apply(Nv), s_.v)
        alpha = jnp.where(bnz, jnp.sqrt(jnp.maximum(kdotr(v, Nv), 0)), s_.alpha)
        anz = bnz & (alpha != 0)
        safe_a = _safe(alpha).astype(FC)
        v = jnp.where(anz, v / safe_a, v)
        Nv = v if NisI else jnp.where(anz, Nv / safe_a, Nv)

        aL = alpha
        bL = beta
        lam_k = s_.lam_k
        lam_nz = lam_k != 0
        cL, sL, bLr = sym_givens(beta, lam_k)
        aL = jnp.where(lam_nz & bnz, cL * alpha, aL)
        bL = jnp.where(lam_nz & bnz, bLr, bL)
        lam_k = jnp.where(lam_nz & bnz,
                          jnp.sqrt(lam_k * lam_k + (sL * alpha) ** 2), lam_k)
        anorm2 = jnp.where(bnz, s_.anorm2 + aL * aL + bL * bL, s_.anorm2)
        anorm = jnp.sqrt(anorm2)

        cp, sp, gamma = sym_givens(s_.gbar, bL)
        tau = -s_.tau * s_.delta / _safe(gamma)
        delta = sp * aL
        gbar = -cp * aL

        # σ error-bound machinery (reference :363-376).
        if use_sigma:
            mubar = -s_.csig * gamma
            csig1, ssig1, rho1 = sym_givens(s_.rhobar_sig, gamma)
            rhobar_sig = ssig1 * mubar + csig1 * sigma_v
            mubar = -csig1 * delta
            h = delta * csig1 / _safe(rhobar_sig)
            disc = sigma_v * (sigma_v - delta * h)
            complex_bnd = s_.complex_bnd | (disc < 0)
            omega = jnp.where(disc >= 0, jnp.sqrt(jnp.maximum(disc, 0)),
                              s_.omega)
            csig2, ssig2, rho2 = sym_givens(rhobar_sig, delta)
            rhobar_sig = ssig2 * mubar + csig2 * sigma_v
            csig = csig2
        else:
            rhobar_sig, csig, omega = s_.rhobar_sig, s_.csig, s_.omega
            complex_bnd = s_.complex_bnd

        ebar = -gamma * s_.c
        eta = gamma * s_.s
        c, s, eps_ = sym_givens(ebar, delta)
        smax = jnp.maximum(s_.smax, jnp.maximum(eps_, jnp.abs(ebar)))
        smin = jnp.minimum(s_.smin, jnp.minimum(eps_, jnp.abs(ebar)))
        acond = smax / jnp.maximum(smin, tiny)

        zold = s_.zeta
        zeta = (tau - s_.zeta * eta) / _safe(eps_)
        zetabar = zeta / _safe(c)
        rNorm = jnp.sqrt((s_.psi * cp - zold * eta) ** 2 + (s_.psi * sp) ** 2)
        ArNorm = jnp.sqrt((gamma * eps_ * zeta) ** 2
                          + (delta * eta * zold) ** 2)
        psi = s_.psi * sp

        x_new = s_.x + (c * zeta).astype(FC) * s_.wbar \
            + (s * zeta).astype(FC) * v
        wbar = s.astype(FC) * s_.wbar - c.astype(FC) * v
        xlqnorm2 = s_.xlqnorm2 + zeta * zeta
        xlqnorm = jnp.sqrt(xlqnorm2)
        xcgnorm2 = xlqnorm2 + zetabar * zetabar

        it = s_.iter + 1
        err_vec = s_.err_vec.at[jnp.mod(s_.iter, window)].set(zeta)
        err_lbnd = jnp.linalg.norm(err_vec)
        fwd_err_lbnd = (s_.iter >= window) & (
            err_lbnd <= jnp.asarray(etol, T) * xlqnorm)

        if use_sigma:
            etat = omega * s
            epst = -omega * c
            taut = -tau * delta / _safe(omega)
            zetatilde = (taut - zeta * etat) / _safe(epst)
            disc_cg = s_.zetatilde ** 2 - zetabar ** 2
            complex_bnd = complex_bnd | ((s_.iter > 0) & (disc_cg < 0))
            err_ubnd_cg = jnp.sqrt(jnp.maximum(disc_cg, 0))
            fwd_err_ubnd = (s_.iter > 0) & (disc_cg >= 0) & (
                err_ubnd_cg <= jnp.asarray(utol, T) * jnp.sqrt(xcgnorm2))
        else:
            zetatilde = s_.zetatilde
            fwd_err_ubnd = jnp.zeros((), jnp.bool_)

        test1 = rNorm
        test2 = ArNorm / jnp.maximum(anorm * rNorm, tiny)
        test3 = 1.0 / jnp.maximum(acond, tiny)
        t1 = test1 / (1.0 + anorm * xlqnorm)
        tol_z = jnp.asarray(btol, T) + jnp.asarray(atol, T) * anorm * xlqnorm / s_.beta1

        solved_mach = (1.0 + test2) <= 1.0
        zero_resid_mach = (1.0 + t1) <= 1.0
        ill_cond_mach = (1.0 + test3) <= 1.0
        tired = it >= itmax
        ill_cond_lim = test3 <= ctol
        solved_lim = test2 <= jnp.asarray(atol, T)
        zero_resid_lim = test1 <= s_.eps_lim
        zero_resid = zero_resid_mach | zero_resid_lim
        solved = solved_mach | solved_lim | zero_resid | fwd_err_lbnd \
            | fwd_err_ubnd

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(zero_resid, jnp.int32(rt.SOLVED_ZERO), code)
        code = jnp.where(fwd_err_lbnd, jnp.int32(FWD_LBND), code)
        code = jnp.where(fwd_err_ubnd, jnp.int32(FWD_UBND), code)

        hr = rt.hist_write(s_.hist_r, it, rNorm, history)
        har = rt.hist_write(s_.hist_ar, it, ArNorm, history)
        s_new = s_._replace(
            x=x_new, u=u, Mu=Mu, v=v, Nv=Nv, wbar=wbar,
            alpha=alpha, beta=beta, lam_k=lam_k, anorm2=anorm2,
            smax=smax, smin=smin, gbar=gbar, psi=psi, c=c, s=s,
            delta=delta, tau=tau, zeta=zeta, zetabar=zetabar,
            zetatilde=zetatilde, rhobar_sig=rhobar_sig, csig=csig,
            omega=omega, complex_bnd=complex_bnd,
            xlqnorm2=xlqnorm2, err_vec=err_vec,
            rNorm=rNorm, ArNorm=ArNorm, iter=it, status=code,
            zero_resid=zero_resid, hist_r=hr, hist_ar=har,
        )
        if verbose > 0:
            # reference column set src/lslq.jl:324 (k, ‖r‖, ‖Aᴴr‖, β, α,
            # cos, sin, ‖A‖², κ(A), ‖xL‖; trailing timer omitted)
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  "
                         "{:8.1e}  {:8.1e}  {:7.1e}  {:7.1e}  {:7.1e}",
                         s_new.rNorm, s_new.ArNorm, s_new.beta,
                         s_new.alpha, s_new.c, s_new.s, s_new.anorm2,
                         s_new.smax / s_new.smin,
                         jnp.sqrt(s_new.xlqnorm2))
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT),
                                 s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _lslq_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0, sigma=0.0,
    transfer_to_lsqr=False, atol=None, rtol=None, btol=None, etol=None,
    utol=None, conlim=1.0e8, window=5, itmax=0, timemax=float("inf"),
    verbose=0, history=False, callback=None, **_ig,
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
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    btol = rt.default_tol(btol, T)
    etol = rt.default_tol(etol, T)
    utol = rt.default_tol(utol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "LSLQ",
                   ("k", "‖r‖", "‖Aᴴr‖", "β", "α", "cos", "sin", "‖A‖²",
                    "κ(A)", "‖xL‖"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (lslq_dia_fused,
                                        lslq_dia_fused_supported)
        if lslq_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            (x, niter, rnorm, arnorm, code_d, zr,
             cbnd) = lslq_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                float(sigma), atol, rtol, btol, etol, utol, float(conlim),
                itmax, use_sigma=bool(sigma > 0),
                transfer_to_lsqr=bool(transfer_to_lsqr),
                window=int(window))
            niter, code, zr, cbnd = jax.device_get([niter, code_d, zr,
                                                    cbnd])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            inconsistent = not bool(zr)
            if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
                inconsistent = False
            stats = LSLQStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code in (FWD_LBND,
                                                           FWD_UBND),
                inconsistent=inconsistent,
                residuals=np.zeros(0), Aresiduals=np.zeros(0),
                error_with_bnd=bool(cbnd),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _lslq_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, btol, etol, utol, float(conlim), float(lam),
            float(sigma),
            ldiv=bool(ldiv), use_sigma=bool(sigma > 0),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), window=int(window),
            MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)

    x = np.asarray(state.x)
    if transfer_to_lsqr and code not in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        x = x + float(state.zetabar) * np.asarray(state.wbar)
    inconsistent = not bool(state.zero_resid)
    if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        inconsistent = False
    stats = LSLQStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code in (FWD_LBND, FWD_UBND),
        inconsistent=inconsistent,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        error_with_bnd=bool(state.complex_bnd),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return jnp.asarray(x), stats, state


def lslq(A, b, **kwargs):
    """x, stats = lslq(A, b; λ, σ, sqd, transfer_to_lsqr, etol, utol, ...).

    TPU extension: ``precision="double_word"`` runs least-squares
    iterative refinement (Carson & Higham 2018) — the dw
    normal-equations residual Aᴴ(b−Ax) − λ²x certifies fp64-grade LS
    optimality from f32 device storage.  Plain configuration only
    (λ allowed; no M/N/σ/transfer_to_lsqr/etol/utol/history/callback).
    """
    from ._refine import check_ir_config
    from .lsqr import _ls_ir, _ls_ir_guard

    precision = kwargs.get("precision")
    guard = _ls_ir_guard("LSLQ", kwargs)
    guard.update(
        sigma=kwargs.get("sigma", 0.0),
        transfer_to_lsqr=kwargs.get("transfer_to_lsqr", False),
        utol=kwargs.get("utol") is not None,
    )
    if check_ir_config("LSLQ", precision, **guard):
        fwd = {k: kwargs[k] for k in ("lam", "atol", "rtol", "itmax",
                                      "timemax") if k in kwargs}
        x, stats, _ = _ls_ir("LSLQ", _lslq_solve, A, b,
                             stats_cls=LSLQStats, **fwd)
        return x, stats
    kwargs.pop("precision", None)
    x, stats, _ = _lslq_solve(A, b, **kwargs)
    return x, stats
