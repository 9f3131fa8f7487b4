"""CRAIG, CRAIGMR and LNLQ — minimum-norm solutions of consistent Ax = b.

All three ride the Golub-Kahan bidiagonalization and return (x, y) with
x = Aᴴy.  Parity with reference src/craig.jl (λ regularization via the
two-rotation scheme, backward-error stopping, conlim), src/craigmr.jl
(QR of the lower bidiagonal, minimizes ‖y‖ residual-wise; "found
approximate minimum-norm solution") and src/lnlq.jl (LQ factorization,
transfer_to_craig, σ-estimate forward-error bounds with utolx/utoly,
LNLQStats).
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
from ..ops.kops import kdotr, knorm, sym_givens
from ..stats import SimpleStats, LNLQStats

SOLVED_CRAIG = 39   # "solution good enough for the tolerances given"
SOLVED_MN = 40      # "found approximate minimum-norm solution"
INCONS_CRAIG = 41   # "system may be inconsistent"
SOLVED_LNLQ_LQ = 42
SOLVED_LNLQ_CG = 43
_STATUS = {
    SOLVED_CRAIG: "solution good enough for the tolerances given",
    SOLVED_MN: "found approximate minimum-norm solution",
    INCONS_CRAIG: "system may be inconsistent",
    SOLVED_LNLQ_LQ: "solutions (xᴸ, yᴸ) good enough for the tolerances given",
    SOLVED_LNLQ_CG: "solutions (xᶜ, yᶜ) good enough for the tolerances given",
}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


def _gk_norm(u, Mu):
    return jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))


# ---------------------------------------------------------------------------
# CRAIG
# ---------------------------------------------------------------------------

class CraigState(NamedTuple):
    x: jax.Array
    y: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    w: jax.Array
    w2: jax.Array
    beta: jax.Array
    theta: jax.Array
    xi: jax.Array
    delta: jax.Array
    rho_prev: jax.Array
    anorm2: jax.Array
    dnorm2: jax.Array
    xnorm2: jax.Array
    rNorm: jax.Array
    beta1: jax.Array
    eps_c: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "use_lam", "history", "hist_len", "callback",
                     "verbose", "MisI", "NisI"),
)
def _craig_core(
    A, M, N, b, state_in, iter_cap, itmax, atol, rtol, btol_in, conlim, lam,
    *, ldiv, use_lam, history, hist_len, callback, verbose, MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    ctol = jnp.where(jnp.asarray(conlim, T) > 0,
                     1.0 / jnp.asarray(conlim, T), jnp.zeros((), T))
    tiny = jnp.finfo(T).tiny

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        y = jnp.zeros(m, FC)
        Mu = b
        u = M_apply(Mu)
        beta1 = _gk_norm(u, Mu)
        status = jnp.where(beta1 == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.int32(rt.RUNNING))
        safe_b = _safe(beta1).astype(FC)
        u = u / safe_b
        Mu = u if MisI else Mu / safe_b
        eps_c = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta1
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        state = CraigState(
            x=x, y=y, u=u, Mu=Mu, v=jnp.zeros(n, FC), Nv=jnp.zeros(n, FC),
            w=jnp.zeros(m, FC), w2=jnp.zeros(n, FC),
            beta=beta1, theta=beta1, xi=-jnp.ones((), T),
            delta=lam, rho_prev=jnp.ones((), T),
            anorm2=jnp.zeros((), T), dnorm2=jnp.zeros((), T),
            xnorm2=jnp.zeros((), T), rNorm=beta1, beta1=beta1, eps_c=eps_c,
            iter=jnp.int32(0), status=status, hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        Ahu = A.rmatvec(s.u)
        Nv = Ahu - s.beta.astype(FC) * s.Nv
        v = N_apply(Nv)
        alpha = _gk_norm(v, Nv)
        incons = alpha == 0
        safe_a = _safe(alpha).astype(FC)
        v = jnp.where(~incons, v / safe_a, v)
        Nv = v if NisI else jnp.where(~incons, Nv / safe_a, Nv)

        anorm2 = s.anorm2 + alpha * alpha + lam * lam
        if use_lam:
            c1, s1, rho = sym_givens(alpha, s.delta)
        else:
            c1 = jnp.ones((), T)
            s1 = jnp.zeros((), T)
            rho = alpha
        xi = -s.theta / _safe(rho) * s.xi

        if use_lam:
            x_new = s.x + (xi * c1).astype(FC) * v + (xi * s1).astype(FC) * s.w2
            w2_new = s1.astype(FC) * v - c1.astype(FC) * s.w2
        else:
            x_new = s.x + xi.astype(FC) * v
            w2_new = s.w2
        w_new = s.u - (s.theta / s.rho_prev).astype(FC) * s.w
        y_new = s.y + (xi / rho).astype(FC) * w_new
        dnorm2 = s.dnorm2 + knorm(w_new)

        Av = A.matvec(v)
        Mu = Av - alpha.astype(FC) * s.Mu
        u = M_apply(Mu)
        beta = _gk_norm(u, Mu)
        bnz = beta != 0
        safe_b = _safe(beta).astype(FC)
        u = jnp.where(bnz, u / safe_b, u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b, Mu)

        if use_lam:
            theta = beta * c1
            gamma = beta * s1
            c2, s2, delta = sym_givens(lam, gamma)
            w2_new = s2.astype(FC) * w2_new
        else:
            theta = beta
            delta = s.delta

        anorm2 = anorm2 + beta * beta
        anorm = jnp.sqrt(anorm2)
        acond = anorm * jnp.sqrt(dnorm2)
        xnorm2 = s.xnorm2 + xi * xi
        xnorm = jnp.sqrt(xnorm2)
        rNorm = beta * jnp.abs(xi)
        if use_lam:
            rNorm = rNorm * jnp.abs(c1)

        bkwerr = rNorm / jnp.sqrt(s.beta1 ** 2 + anorm2 * xnorm2 + tiny)
        bt = jnp.asarray(btol_in, T)
        solved_lim = bkwerr <= bt
        solved_mach = (1.0 + bkwerr) <= 1.0
        solved_resid_tol = rNorm <= s.eps_c
        solved_resid_lim = rNorm <= bt + jnp.asarray(atol, T) * anorm * xnorm / s.beta1
        solved = solved_mach | solved_lim | solved_resid_tol | solved_resid_lim
        ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
        ill_cond_lim = (1.0 / jnp.maximum(acond, tiny)) <= ctol
        tired = it >= itmax

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(solved, jnp.int32(SOLVED_CRAIG), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(incons, jnp.int32(INCONS_CRAIG), code)

        # On the inconsistency exit the iteration's updates never happened.
        x_new = jnp.where(incons, s.x, x_new)
        y_new = jnp.where(incons, s.y, y_new)
        w_new = jnp.where(incons, s.w, w_new)
        w2_new = jnp.where(incons, s.w2, w2_new)
        it_out = jnp.where(incons, s.iter, it)
        rNorm = jnp.where(incons, s.rNorm, rNorm)

        hr = rt.hist_write(s.hist_r, it_out, rNorm, history)
        s_new = s._replace(
            x=x_new, y=y_new, u=u, Mu=Mu, v=v, Nv=Nv, w=w_new, w2=w2_new,
            beta=jnp.where(incons, s.beta, beta),
            theta=jnp.where(incons, s.theta, theta),
            xi=jnp.where(incons, s.xi, xi),
            delta=jnp.where(incons, s.delta, delta),
            rho_prev=jnp.where(incons, s.rho_prev, rho),
            anorm2=jnp.where(incons, s.anorm2, anorm2),
            dnorm2=jnp.where(incons, s.dnorm2, dnorm2),
            xnorm2=jnp.where(incons, s.xnorm2, xnorm2),
            rNorm=rNorm, iter=it_out, status=code, hist_r=hr,
        )
        if verbose > 0:
            # reference column set src/craig.jl:256-257 (k, ‖r‖, ‖x‖,
            # ‖A‖, κ(A), α, β; trailing timer omitted per debug_table)
            Anorm_d = jnp.sqrt(s_new.anorm2)
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:8.1e}  {:8.1e}  {:8.1e}  {:8.1e}  "
                         "{:8.1e}  {:7.1e}",
                         s_new.rNorm, jnp.sqrt(s_new.xnorm2), Anorm_d,
                         Anorm_d * jnp.sqrt(s_new.dnorm2), alpha, beta)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _craig_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0,
    atol=None, rtol=None, btol=None, conlim=1.0e8, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
    transfer_to_lsqr=False, **_ig,
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
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "CRAIG",
                   ("k", "‖r‖", "‖x‖", "‖A‖", "κ(A)", "α", "β"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (craig_dia_fused,
                                        craig_dia_fused_supported)
        if craig_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                     stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, code_d = craig_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, btol, float(conlim), itmax,
                use_lam=bool(lam > 0))
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code == SOLVED_CRAIG,
                inconsistent=code == INCONS_CRAIG,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _craig_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, btol, float(conlim), float(lam),
            ldiv=bool(ldiv), use_lam=bool(lam > 0), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
            MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code == SOLVED_CRAIG,
        inconsistent=code == INCONS_CRAIG,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return jnp.asarray(state.x), jnp.asarray(state.y), stats, state


def _ln_dw(method, solve_fn, A, b, kwargs, stats_cls=None):
    """Shared ``precision="double_word"`` wiring for the least-norm
    (x, y) family: joint dw refinement of the primal x and the dual y
    against the TRUE residual b − Ax (solvers/_refine.pair_ir_wrap,
    kind="ln").  Each inner correction is the method itself at working
    precision, so dx = Aᴴ·dy holds per pass and x stays in range(Aᴴ) —
    the min-norm property survives refinement.  Plain configuration only
    (λ/sqd change the fixed point to the regularized problem, whose
    residual the dw certificate does not measure)."""
    from ._refine import pair_ir_wrap

    def inner(Aop, f1, f2, rtol_i, it_left, time_left):
        fwd = {k: kwargs[k] for k in ("M", "N", "ldiv") if k in kwargs}
        dx, dy, st, _ = solve_fn(Aop, f1, atol=0.0, rtol=rtol_i,
                                 itmax=it_left, timemax=time_left, **fwd)
        return dx, dy, st.niter

    def make_stats(niter, code, s1, s2, timer):
        cls = stats_cls or SimpleStats
        return cls(niter=niter, solved=rt.is_solved_code(code),
                   residuals=np.zeros(0), timer=timer,
                   status=rt.decode_status(code))

    return pair_ir_wrap(method, inner, A, b, b, kwargs, kind="ln",
                        reject={"sqd": False, "lam": 0.0},
                        make_stats=make_stats)


def craig(A, b, **kwargs):
    """x, y, stats = craig(A, b; λ, sqd, M, N, ...) — min ‖x‖ s.t. Ax = b.

    TPU extension: ``precision="double_word"`` — joint (x, y) iterative
    refinement to fp64-grade TRUE residuals b − Ax from f32 storage
    (plain configuration; inner corrections ride CRAIG's own fast path).
    """
    hit = _ln_dw("CRAIG", _craig_solve, A, b, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _craig_solve(A, b, **kwargs)
    return x, y, stats


# ---------------------------------------------------------------------------
# CRAIGMR
# ---------------------------------------------------------------------------

class CraigmrState(NamedTuple):
    x: jax.Array
    y: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    w: jax.Array
    wbar: jax.Array
    d: jax.Array
    q: jax.Array
    alpha: jax.Array
    beta: jax.Array
    zetabar: jax.Array
    rhobar: jax.Array
    theta: jax.Array
    cp: jax.Array
    sp: jax.Array
    lam_k: jax.Array
    anorm2: jax.Array        # Frobenius-estimate accumulator (verbose col)
    rNorm: jax.Array
    ArNorm: jax.Array
    eps_c: jax.Array
    eps_i: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "use_lam", "history", "hist_len", "callback",
                     "verbose", "MisI", "NisI"),
)
def _craigmr_core(
    A, M, N, b, state_in, iter_cap, itmax, atol, rtol, lam,
    *, ldiv, use_lam, history, hist_len, callback, verbose, MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        y = jnp.zeros(m, FC)
        Mu = b
        u = M_apply(Mu)
        beta = _gk_norm(u, Mu)
        safe_b = _safe(beta).astype(FC)
        u = u / safe_b
        Mu = u if MisI else Mu / safe_b
        Ahu = A.rmatvec(u)
        Nv = Ahu
        v = N_apply(Nv)
        alpha = _gk_norm(v, Nv)
        safe_a = _safe(alpha).astype(FC)
        v = v / safe_a
        Nv = v if NisI else Nv / safe_a
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(alpha == 0, jnp.int32(rt.MIN_LSQ_X),
                                     jnp.int32(rt.RUNNING)))
        if use_lam:
            cp, sp, alphahat = sym_givens(alpha, lam)
            q = sp.astype(FC) * v
        else:
            cp = jnp.ones((), T)
            sp = jnp.ones((), T)
            alphahat = alpha
            q = jnp.zeros(n, FC)
        zetabar = beta
        rhobar = alphahat
        rNorm = zetabar
        ArNorm = alpha
        eps_c = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        eps_i = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * ArNorm
        wbar = u / _safe(alphahat).astype(FC)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm, history)
        state = CraigmrState(
            x=x, y=y, u=u, Mu=Mu, v=v, Nv=Nv,
            w=jnp.zeros(m, FC), wbar=wbar, d=jnp.zeros(n, FC), q=q,
            alpha=alpha, beta=beta, zetabar=zetabar, rhobar=rhobar,
            theta=jnp.zeros((), T), cp=cp, sp=sp, lam_k=lam,
            anorm2=alpha * alpha + lam * lam,
            rNorm=rNorm, ArNorm=ArNorm, eps_c=eps_c, eps_i=eps_i,
            iter=jnp.int32(0), status=status, hist_r=hr, hist_ar=har,
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
        beta = _gk_norm(u, Mu)
        bnz = beta != 0
        safe_b = _safe(beta).astype(FC)
        u = jnp.where(bnz, u / safe_b, u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b, Mu)

        if use_lam:
            betahat = s.cp * beta
            lam_aux = s.sp * beta
        else:
            betahat = beta
            lam_aux = jnp.zeros((), T)

        c, sg, rho = sym_givens(s.rhobar, betahat)
        zeta = c * s.zetabar
        zetabar = sg * s.zetabar
        rNorm = jnp.abs(zetabar)

        w = s.wbar / _safe(rho).astype(FC) - (s.theta / _safe(rho)).astype(FC) * s.w
        y_new = s.y + zeta.astype(FC) * w

        if use_lam:
            d1 = (s.cp / rho).astype(FC) * s.v
            dk = (s.cp / rho).astype(FC) * s.v - (s.theta / rho).astype(FC) * s.d \
                + (s.sp / rho).astype(FC) * s.q
            d_new = jnp.where(it == 1, d1, dk)
            q_new = jnp.where(it == 1, s.q,
                              s.sp.astype(FC) * s.v - s.cp.astype(FC) * s.q)
        else:
            d1 = s.v / _safe(rho).astype(FC)
            dk = s.v / _safe(rho).astype(FC) - (s.theta / _safe(rho)).astype(FC) * s.d
            d_new = jnp.where(it == 1, d1, dk)
            q_new = s.q
        x_new = s.x + zeta.astype(FC) * d_new

        Ahu = A.rmatvec(u)
        Nv = Ahu - beta.astype(FC) * s.Nv
        v = N_apply(Nv)
        alpha = _gk_norm(v, Nv)
        ArNorm = alpha * beta * jnp.abs(zeta / _safe(rho))

        if use_lam:
            cd, sd, lam_next = sym_givens(s.lam_k, lam_aux)
            q_new = sd.astype(FC) * q_new
            cp, sp, alphahat = sym_givens(alpha, lam_next)
        else:
            cp, sp = s.cp, s.sp
            lam_next = s.lam_k
            alphahat = alpha

        anz = alpha != 0
        safe_a = _safe(alpha).astype(FC)
        v = jnp.where(anz, v / safe_a, v)
        Nv = v if NisI else jnp.where(anz, Nv / safe_a, Nv)
        wbar = jnp.where(
            anz,
            (u - betahat.astype(FC) * s.wbar) / _safe(alphahat).astype(FC),
            s.wbar)
        theta = sg * alphahat
        rhobar = -c * alphahat

        solved = rNorm <= s.eps_c
        inconsistent = (rNorm > 100 * s.eps_c) & (ArNorm <= s.eps_i)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(inconsistent, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(solved, jnp.int32(SOLVED_MN), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(
            x=x_new, y=y_new, u=u, Mu=Mu, v=v, Nv=Nv,
            w=w, wbar=wbar, d=d_new, q=q_new,
            alpha=alpha, beta=beta, zetabar=zetabar, rhobar=rhobar,
            theta=theta, cp=cp, sp=sp, lam_k=lam_next,
            anorm2=s.anorm2 + alpha * alpha + beta * beta,
            rNorm=rNorm, ArNorm=ArNorm,
            iter=it, status=code, hist_r=hr, hist_ar=har,
        )
        if verbose > 0:
            # reference column set src/craigmr.jl:228 (k, ‖r‖, ‖Aᴴr‖, β,
            # α, cos, sin, ‖A‖²; trailing timer omitted per debug_table)
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  "
                         "{:8.1e}  {:8.1e}  {:7.1e}",
                         s_new.rNorm, s_new.ArNorm, beta, alpha, c, sg,
                         s_new.anorm2)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _craigmr_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None, **_ig,
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
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "CRAIGMR",
                   ("k", "‖r‖", "‖Aᴴr‖", "β", "α", "cos", "sin", "‖A‖²"),
                   m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (craigmr_dia_fused,
                                        craigmr_dia_fused_supported)
        if craigmr_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                       stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, arnorm, code_d = craigmr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, itmax, use_lam=bool(lam > 0))
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code == SOLVED_MN,
                inconsistent=code == rt.SOLVED_LSQ,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _craigmr_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, float(lam),
            ldiv=bool(ldiv), use_lam=bool(lam > 0), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
            MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code == SOLVED_MN,
        inconsistent=code == rt.SOLVED_LSQ,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return jnp.asarray(state.x), jnp.asarray(state.y), stats, state


def craigmr(A, b, **kwargs):
    """x, y, stats = craigmr(A, b; λ, sqd, M, N, ...).

    TPU extension: ``precision="double_word"`` — joint (x, y) refinement
    to fp64-grade TRUE residuals from f32 storage (see ``craig``)."""
    hit = _ln_dw("CRAIGMR", _craigmr_solve, A, b, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _craigmr_solve(A, b, **kwargs)
    return x, y, stats


# ---------------------------------------------------------------------------
# LNLQ
# ---------------------------------------------------------------------------

class LnlqState(NamedTuple):
    x: jax.Array
    y: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    wbar: jax.Array
    q: jax.Array
    alpha: jax.Array
    alphahat: jax.Array
    beta: jax.Array
    c_k: jax.Array
    s_k: jax.Array
    zeta_km1: jax.Array
    zetabar: jax.Array
    eta: jax.Array
    theta: jax.Array
    epsbar: jax.Array
    tau: jax.Array
    cp: jax.Array
    sp: jax.Array
    lam_k: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    solved_cg_flag: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "use_lam", "transfer_to_craig", "history",
                     "hist_len", "callback", "verbose", "MisI", "NisI"),
)
def _lnlq_core(
    A, M, N, b, state_in, iter_cap, itmax, atol, rtol, lam,
    *, ldiv, use_lam, transfer_to_craig, history, hist_len, callback,
    verbose, MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    eps_T = jnp.finfo(T).eps

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        y = jnp.zeros(m, FC)
        Mu = b
        u = M_apply(Mu)
        beta = _gk_norm(u, Mu)
        bNorm = beta
        safe_b = _safe(beta).astype(FC)
        u = u / safe_b
        Mu = u if MisI else Mu / safe_b
        Ahu = A.rmatvec(u)
        Nv = Ahu
        v = N_apply(Nv)
        alpha = _gk_norm(v, Nv)
        safe_a = _safe(alpha).astype(FC)
        v = jnp.where(alpha != 0, v / safe_a, v)
        Nv = v if NisI else jnp.where(alpha != 0, Nv / safe_a, Nv)
        wbar = u
        if use_lam:
            cp, sp, alphahat = sym_givens(alpha, lam)
            q = sp.astype(FC) * v
        else:
            cp = jnp.ones((), T)
            sp = jnp.ones((), T)
            alphahat = alpha
            q = jnp.zeros(n, FC)
        epsbar = alphahat
        tau = beta / _safe(alphahat)
        zetabar = tau / _safe(epsbar)
        theta = tau
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.int32(rt.RUNNING))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, bNorm, history)
        state = LnlqState(
            x=x, y=y, u=u, Mu=Mu, v=v, Nv=Nv, wbar=wbar, q=q,
            alpha=alpha, alphahat=alphahat, beta=beta,
            c_k=jnp.zeros((), T), s_k=jnp.zeros((), T),
            zeta_km1=jnp.zeros((), T), zetabar=zetabar,
            eta=jnp.zeros((), T), theta=theta, epsbar=epsbar, tau=tau,
            cp=cp, sp=sp, lam_k=lam, rNorm=bNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            solved_cg_flag=jnp.zeros((), jnp.bool_), hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        # x update (reference :293-303).
        if use_lam:
            x_new = s.x + (s.tau * s.cp).astype(FC) * s.v
            x_new = jnp.where(it >= 2, x_new + (s.tau * s.sp).astype(FC) * s.q,
                              x_new)
            q_new = jnp.where(it >= 2,
                              s.sp.astype(FC) * s.v - s.cp.astype(FC) * s.q,
                              s.q)
        else:
            x_new = s.x + s.tau.astype(FC) * s.v
            q_new = s.q

        Av = A.matvec(s.v)
        Mu = Av - s.alpha.astype(FC) * s.Mu
        u = M_apply(Mu)
        beta_kp1 = _gk_norm(u, Mu)
        bnz = beta_kp1 != 0
        safe_b = _safe(beta_kp1).astype(FC)
        u = jnp.where(bnz, u / safe_b, u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b, Mu)

        Ahu = A.rmatvec(u)
        Nv = Ahu - beta_kp1.astype(FC) * s.Nv
        v = N_apply(Nv)
        alpha_kp1 = _gk_norm(v, Nv)
        anz = alpha_kp1 != 0
        safe_a = _safe(alpha_kp1).astype(FC)
        v = jnp.where(anz, v / safe_a, v)
        Nv = v if NisI else jnp.where(anz, Nv / safe_a, Nv)

        if use_lam:
            betahat = s.cp * beta_kp1
            theta_kp1l = s.sp * beta_kp1
            cd, sd, lam_next = sym_givens(lam, theta_kp1l)
            q_new = sd.astype(FC) * q_new
            cp1, sp1, alphahat_kp1 = sym_givens(alpha_kp1, lam_next)
        else:
            betahat = beta_kp1
            alphahat_kp1 = alpha_kp1
            cp1, sp1 = s.cp, s.sp
            lam_next = s.lam_k

        tau_kp1 = -betahat * s.tau / _safe(alphahat_kp1)
        c_kp1, s_kp1, eps_k = sym_givens(s.epsbar, betahat)
        eta_kp1 = alphahat_kp1 * s_kp1
        epsbar_kp1 = -alphahat_kp1 * c_kp1
        zeta_k = s.theta / _safe(eps_k)
        theta_kp1 = tau_kp1 - eta_kp1 * zeta_k
        zetabar_kp1 = theta_kp1 / _safe(epsbar_kp1)

        y_new = s.y + (zeta_k * c_kp1).astype(FC) * s.wbar \
            + (zeta_k * s_kp1).astype(FC) * u
        wbar_new = s_kp1.astype(FC) * s.wbar - c_kp1.astype(FC) * u

        rNorm_lq = jnp.where(
            it == 1, s.rNorm,
            jnp.abs(s.alphahat) * jnp.sqrt(
                (s.epsbar * s.zetabar) ** 2
                + (betahat * s.s_k * s.zeta_km1) ** 2))
        rNorm_cg = jnp.abs(betahat * s.tau)

        solved_lq = rNorm_lq <= s.eps_lim
        solved_cg = transfer_to_craig & (jnp.abs(s.zetabar) > eps_T) \
            & (rNorm_cg <= s.eps_lim)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(solved_lq, jnp.int32(SOLVED_LNLQ_LQ), code)
        code = jnp.where(solved_cg & ~solved_lq, jnp.int32(SOLVED_LNLQ_CG),
                         code)

        hr = rt.hist_write(s.hist_r, it, rNorm_lq, history)
        s_new = s._replace(
            x=x_new, y=y_new, u=u, Mu=Mu, v=v, Nv=Nv, wbar=wbar_new,
            q=q_new,
            alpha=alpha_kp1, alphahat=alphahat_kp1, beta=beta_kp1,
            c_k=c_kp1, s_k=s_kp1,
            zeta_km1=zeta_k, zetabar=zetabar_kp1,
            eta=eta_kp1, theta=theta_kp1, epsbar=epsbar_kp1, tau=tau_kp1,
            cp=cp1 if use_lam else s.cp, sp=sp1 if use_lam else s.sp,
            lam_k=lam_next, rNorm=rNorm_lq,
            iter=it, status=code,
            solved_cg_flag=solved_cg & ~solved_lq, hist_r=hr,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:7.1e}",
                         s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    state = jax.lax.while_loop(cond, body, state)
    # CRAIG-point transfer (reference :569-585).
    eps_T2 = jnp.finfo(T).eps

    def transfer(st):
        if use_lam:
            x_f = st.x + (st.tau * st.cp).astype(FC) * st.v \
                + (st.tau * st.sp).astype(FC) * st.q
        else:
            x_f = st.x + st.tau.astype(FC) * st.v
        y_f = st.y + st.zetabar.astype(FC) * st.wbar
        return st._replace(x=x_f, y=y_f)

    state = jax.lax.cond(
        state.solved_cg_flag & (state.zetabar > eps_T2),
        transfer, lambda st: st, state)
    return state


def _lnlq_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0,
    transfer_to_craig=True, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None, **_ig,
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
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "LNLQ", ("k", "‖rₖ‖"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (lnlq_dia_fused,
                                        lnlq_dia_fused_supported)
        if lnlq_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, code_d = lnlq_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, itmax, use_lam=bool(lam > 0),
                transfer_to_craig=bool(transfer_to_craig))
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code in (
                    SOLVED_LNLQ_LQ, SOLVED_LNLQ_CG),
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _lnlq_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, float(lam),
            ldiv=bool(ldiv), use_lam=bool(lam > 0),
            transfer_to_craig=bool(transfer_to_craig),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = LNLQStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code in (SOLVED_LNLQ_LQ,
                                                   SOLVED_LNLQ_CG),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return jnp.asarray(state.x), jnp.asarray(state.y), stats, state


def lnlq(A, b, **kwargs):
    """x, y, stats = lnlq(A, b; λ, sqd, transfer_to_craig, ...).

    TPU extension: ``precision="double_word"`` — joint (x, y) refinement
    to fp64-grade TRUE residuals from f32 storage (see ``craig``)."""
    from ..stats import LNLQStats
    hit = _ln_dw("LNLQ", _lnlq_solve, A, b, kwargs, stats_cls=LNLQStats)
    if hit is not None:
        return hit
    x, y, stats, _ = _lnlq_solve(A, b, **kwargs)
    return x, y, stats
