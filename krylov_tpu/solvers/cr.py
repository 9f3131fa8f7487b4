"""CR and CAR for Hermitian positive-definite Ax = b.

CR (conjugate residuals) with capability parity to reference src/cr.jl:
trust-region ``radius`` with the full nonpositive-curvature case analysis
(src/cr.jl:272-390), ``linesearch`` exits, γ curvature tolerance, M
preconditioning, warm start.  CAR (conjugate A-residuals, minimizes ‖Arₖ‖)
mirrors reference src/car.jl.
"""

import functools
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import _runtime as rt
from .._dtypes import real_dtype, sqrt_eps
from ..operators import as_operator, precond_apply
from ..ops.kops import kdotr, knorm, roots_quadratic
from ..stats import SimpleStats

# CR-specific status codes decoded in _runtime.BASE_STATUS overrides.
ZERO_CURV_B = 26
NUMERICAL = 25
_CR_STATUS = {
    ZERO_CURV_B: "b is a zero-curvature direction",
    NUMERICAL: "solver encountered numerical issues",
}


class CrState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    q: jax.Array
    Ar: jax.Array
    npc_dir: jax.Array
    rho: jax.Array
    quad: jax.Array       # quadratic model value m (verbose col, src/cr.jl:411)
    rNorm: jax.Array
    rNorm2: jax.Array
    pNorm: jax.Array
    pNorm2: jax.Array
    pr: jax.Array
    pAp: jax.Array
    xNorm: jax.Array
    ArNorm: jax.Array
    eps_lim: jax.Array
    descent: jax.Array
    iter: jax.Array
    status: jax.Array
    indefinite: jax.Array
    npc_count: jax.Array
    indef_error: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


def _safe(x, pred):
    return jnp.where(pred, jnp.ones_like(x), x)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ldiv", "linesearch", "history", "hist_len", "callback", "verbose",
        "use_radius", "MisI",
    ),
)
def _cr_core(
    A, M, b, x0, state_in, iter_cap, atol, rtol, radius, gamma_tol,
    *, ldiv, linesearch, history, hist_len, callback, verbose,
    use_radius, MisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    radius = jnp.asarray(radius, T)
    gamma_tol = jnp.asarray(gamma_tol, T)
    npc_shape = (n,) if (linesearch or use_radius) else (0,)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        if x0 is None:
            p0 = b
        else:
            p0 = b - A.matvec(x0)
        r = M_apply(p0)
        rNorm = jnp.sqrt(jnp.maximum(kdotr(r, p0), 0))
        Ar = A.matvec(r)
        rho = kdotr(r, Ar)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm

        zero_resid = rNorm == 0
        zero_curv = (~zero_resid) & (rho == 0)
        status = jnp.where(
            zero_resid, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(zero_curv, jnp.int32(ZERO_CURV_B),
                      jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                jnp.int32(rt.RUNNING))),
        )
        npc_dir = jnp.zeros(npc_shape, FC)
        indefinite = jnp.zeros((), jnp.bool_)
        npc_count = jnp.int32(0)
        if linesearch or use_radius:
            # On the zero-curvature init exit: x ← M⁻¹b, npc_dir ← M⁻¹b.
            x = jnp.where(zero_curv, r, x)
            npc_dir = jnp.where(zero_curv, r, npc_dir)
            indefinite = indefinite | zero_curv
            npc_count = jnp.where(zero_curv, jnp.int32(1), npc_count)

        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, jnp.where(zero_resid | zero_curv,
                                              jnp.zeros((), T), knorm(Ar)),
                            history)
        state = CrState(
            x=x, r=r, p=r, q=Ar, Ar=Ar, npc_dir=npc_dir,
            rho=rho, rNorm=rNorm, rNorm2=rNorm * rNorm,
            pNorm=rNorm, pNorm2=rNorm * rNorm,
            pr=rNorm * rNorm, pAp=rho, quad=jnp.zeros((), T),
            xNorm=jnp.zeros((), T), ArNorm=knorm(Ar), eps_lim=eps_lim,
            descent=rNorm * rNorm > 0,
            iter=jnp.int32(0), status=status,
            indefinite=indefinite, npc_count=npc_count,
            indef_error=jnp.zeros((), jnp.bool_),
            hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        eps_T = jnp.finfo(T).eps
        sqeps = jnp.sqrt(eps_T)
        code = jnp.int32(rt.RUNNING)
        x, p, q, npc_dir = s.x, s.p, s.q, s.npc_dir
        npc_count, indefinite = s.npc_count, s.indefinite
        on_boundary = jnp.zeros((), jnp.bool_)
        npcurv = jnp.zeros((), jnp.bool_)
        indef_error = s.indef_error

        # --- linesearch nonpositive-curvature exit (src/cr.jl:237-267) ---
        if linesearch:
            p_curv = s.pAp <= gamma_tol * s.pNorm * s.pNorm
            r_curv = s.rho <= gamma_tol * s.rNorm * s.rNorm
            ls_exit = p_curv | r_curv
            first = s.iter == 0
            npc_dir = jnp.where(
                ls_exit,
                jnp.where(first, p,
                          jnp.where(r_curv, s.r, p)),
                npc_dir,
            )
            x = jnp.where(ls_exit & first, p, x)
            add = jnp.where(first, jnp.int32(1),
                            r_curv.astype(jnp.int32) + p_curv.astype(jnp.int32))
            npc_count = jnp.where(ls_exit, npc_count + add, npc_count)
            indefinite = indefinite | ls_exit
            code = jnp.where(ls_exit, jnp.int32(rt.NPC), code)
        else:
            ls_exit = jnp.zeros((), jnp.bool_)
            if not use_radius:
                indef_error = indef_error | (s.pAp <= 0)

        # --- step selection ---
        if use_radius:
            xNorm2 = s.xNorm * s.xNorm
            t1_, t2_ = roots_quadratic(
                s.pNorm2, 2 * kdotr(x, p), xNorm2 - radius * radius
            )
            t1 = jnp.maximum(t1_, t2_)
            t2 = jnp.minimum(t1_, t2_)
            tr1, tr2 = roots_quadratic(
                s.rNorm2, 2 * kdotr(x, s.r), xNorm2 - radius * radius
            )
            tr = jnp.maximum(tr1, tr2)

            qn = knorm(q)
            abspAp = jnp.abs(s.pAp)
            abspr = jnp.abs(s.pr)
            zero_pAp = abspAp <= gamma_tol * s.pNorm * qn
            zero_pr = abspr <= gamma_tol * s.pNorm * s.rNorm
            safe_rho = _safe(s.rho, s.rho == 0)

            # Candidate steps per case (src/cr.jl:272-390).
            alpha_desc = jnp.where(s.descent, t1, t2)
            tr_cvx = jnp.where(s.rho > 0, jnp.minimum(tr, s.rNorm2 / safe_rho), tr)

            # case A: pᴴAp ≈ 0, pᴴr ≈ 0 → p := r
            aA = jnp.where(s.rho > 0, jnp.minimum(tr, s.rNorm2 / safe_rho), tr)
            # case B: pᴴAp ≈ 0, pᴴr ≠ 0
            dB = -alpha_desc * s.pr + tr_cvx * s.rNorm2 - tr_cvx * tr_cvx * s.rho / 2
            # case PN: pAp>0, ρ<0
            safe_pAp = _safe(s.pAp, s.pAp == 0)
            aPN = jnp.where(s.descent, jnp.minimum(t1, s.pr / safe_pAp),
                            jnp.maximum(t2, s.pr / safe_pAp))
            # shared Δ formula for PN/NP/NN with their tr variant
            def delta(al, trv):
                return (-al * s.pr + trv * s.rNorm2
                        + (al * al * s.pAp - trv * trv * s.rho) / 2)

            Mq = M_apply(q)
            qMq = kdotr(q, Mq)
            aPP = s.rho / _safe(qMq, qMq == 0)
            pp_boundary = aPP >= t1

            casePP = (~zero_pAp) & (s.pAp > 0) & (s.rho > 0)
            casePN = (~zero_pAp) & (s.pAp > 0) & (s.rho < 0)
            caseNP = (~zero_pAp) & (s.pAp < 0) & (s.rho > 0)
            caseNN = (~zero_pAp) & (s.pAp < 0) & (s.rho < 0)

            # Redefinition decisions (Δ > 0 → follow r instead of p).
            redefA = zero_pAp & zero_pr
            redefB = zero_pAp & (~zero_pr) & (dB > 0)
            redefPN = casePN & (delta(aPN, tr) > 0)
            trNP = jnp.minimum(tr, s.rNorm2 / safe_rho)
            redefNP = caseNP & (delta(alpha_desc, trNP) > 0)
            redefNN = caseNN & (delta(alpha_desc, tr) > 0)
            redef = redefA | redefB | redefPN | redefNP | redefNN

            alpha = jnp.where(
                zero_pAp,
                jnp.where(zero_pr, aA, jnp.where(dB > 0, tr_cvx, alpha_desc)),
                jnp.where(
                    casePP,
                    jnp.where(pp_boundary, t1, aPP),
                    jnp.where(
                        casePN, jnp.where(redefPN, tr, aPN),
                        jnp.where(caseNP, jnp.where(redefNP, trNP, alpha_desc),
                                  jnp.where(redefNN, tr, alpha_desc)),
                    ),
                ),
            )
            on_boundary = casePP & pp_boundary
            npcurv = zero_pAp | casePN | caseNP | caseNN
            indefinite = indefinite | npcurv

            # npc_dir and count bookkeeping per case.
            npcA_two = redefA & (s.rho <= 0) & (s.iter > 0)
            new_npc_dir = jnp.where(
                zero_pAp,
                jnp.where(npcA_two, s.r, p),
                jnp.where(casePN | caseNN, s.r, p),
            )
            npc_dir = jnp.where(npcurv, new_npc_dir, npc_dir)
            npc_count = jnp.where(
                npcurv,
                jnp.where(caseNN | npcA_two, jnp.int32(2), jnp.int32(1)),
                npc_count,
            )

            p_sel = jnp.where(redef, s.r, p)
            q_sel = jnp.where(redef, s.Ar, q)
        else:
            Mq0 = M_apply(q)
            qMq = kdotr(q, Mq0)
            alpha = s.rho / _safe(qMq, qMq == 0)
            p_sel, q_sel = p, q
            redef = jnp.zeros((), jnp.bool_)

        Mq_sel = M_apply(q_sel)
        alpha_c = alpha.astype(FC)
        x_new = x + alpha_c * p_sel
        xNorm = knorm(x_new)
        if use_radius:
            on_boundary = on_boundary | (
                jnp.abs(xNorm - radius) <= jnp.sqrt(eps_T) * radius
            )
        r_new = s.r - alpha_c * Mq_sel
        if MisI:
            rNorm2 = kdotr(r_new, r_new)
            rNorm = jnp.sqrt(rNorm2)
        else:
            omega = jnp.sqrt(jnp.abs(alpha)) * jnp.sqrt(jnp.abs(s.rho))
            rNorm = jnp.sqrt(jnp.abs(s.rNorm + omega)) * jnp.sqrt(
                jnp.abs(s.rNorm - omega)
            )
            rNorm2 = rNorm * rNorm
        Ar_new = A.matvec(r_new)
        ArNorm = knorm(Ar_new)

        it = s.iter + 1
        resid_decrease = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        solved = resid_decrease | npcurv | on_boundary

        # Continuation updates (skipped when exiting).
        rho_next = kdotr(r_new, Ar_new)
        beta = rho_next / _safe(s.rho, s.rho == 0)
        p_next = r_new + beta.astype(FC) * p_sel
        q_next = Ar_new + beta.astype(FC) * q_sel
        pNorm2_next = (rNorm2 + 2 * beta * s.pr - 2 * beta * alpha * s.pAp
                       + beta * beta * s.pNorm2)
        pnorm_bad = (pNorm2_next <= -sqeps)
        pNorm_next = jnp.where(pNorm2_next > sqeps, jnp.sqrt(jnp.abs(pNorm2_next)),
                               jnp.zeros((), T))
        pr_next = rNorm2 + beta * s.pr - beta * alpha * s.pAp
        pAp_next = rho_next + beta * beta * s.pAp

        exiting = solved | ls_exit
        p_out = jnp.where(exiting, p_sel, p_next)
        q_out = jnp.where(exiting, q_sel, q_next)

        # Status chain (src/cr.jl:460-466, later wins; boundary > npc).
        code = jnp.where(resid_decrease | npcurv | on_boundary,
                         jnp.int32(rt.SOLVED), code)
        code = jnp.where(npcurv, jnp.int32(rt.NPC), code)
        code = jnp.where(on_boundary, jnp.int32(rt.ON_BOUNDARY), code)
        code = jnp.where(ls_exit, jnp.int32(rt.NPC), code)
        code = jnp.where((~exiting) & pnorm_bad, jnp.int32(NUMERICAL), code)

        # On ls_exit the x/r updates never happened (reference returns early).
        x_out = jnp.where(ls_exit, x, x_new)
        r_out = jnp.where(ls_exit, s.r, r_new)
        it_out = jnp.where(ls_exit, s.iter, it)
        rNorm_out = jnp.where(ls_exit, s.rNorm, rNorm)

        hist_r = rt.hist_write(s.hist_r, it_out, rNorm_out, history)
        hist_ar = rt.hist_write(s.hist_ar, it_out, ArNorm, history)

        s_new = s._replace(
            x=x_out, r=r_out, p=p_out, q=q_out,
            Ar=jnp.where(ls_exit, s.Ar, Ar_new), npc_dir=npc_dir,
            rho=jnp.where(exiting, s.rho, rho_next),
            rNorm=rNorm_out, rNorm2=jnp.where(ls_exit, s.rNorm2, rNorm2),
            pNorm=jnp.where(exiting, s.pNorm, pNorm_next),
            pNorm2=jnp.where(exiting, s.pNorm2, pNorm2_next),
            pr=jnp.where(exiting, s.pr, pr_next),
            pAp=jnp.where(exiting, s.pAp, pAp_next),
            quad=jnp.where(ls_exit, s.quad,
                           s.quad - alpha * s.pr + alpha * alpha * s.pAp / 2),
            xNorm=jnp.where(ls_exit, s.xNorm, xNorm),
            ArNorm=ArNorm,
            descent=jnp.where(exiting, s.descent, pr_next > 0),
            iter=it_out, status=code,
            indefinite=indefinite, npc_count=npc_count,
            indef_error=indef_error,
            hist_r=hist_r, hist_ar=hist_ar,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(
                    user_exit & (s_new.status == rt.RUNNING) | user_exit
                    & (s_new.status == rt.SOLVED),
                    jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it_out,
                         "{:5d}  {:8.1e}  {:8.1e}  {:8.1e}",
                         xNorm, rNorm_out, s_new.quad)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cr_solve(
    A, b, x0=None, *, M=None, ldiv=False, radius=0.0, linesearch=False,
    gamma_tol=None, atol=None, rtol=None, itmax=0, timemax=float("inf"),
    verbose=0, history=False, callback=None,
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

    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    gamma_tol = sqrt_eps(T) if gamma_tol is None else float(gamma_tol)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "CR", ("k", "‖x‖", "‖r‖", "quad"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and not linesearch and radius == 0 and callback is None
            and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import cr_dia_fused, cr_dia_fused_supported
        if cr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                  stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, status, indef = cr_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, itmax)
            niter, code, indef = jax.device_get([niter, status, indef])
            if int(indef):
                raise ValueError("Indefinite system and no trust region")
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None and code not in (rt.NPC, ZERO_CURV_B):
                x = x + x0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code == ZERO_CURV_B,
                inconsistent=False,
                indefinite=False,
                npc_count=0,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _CR_STATUS),
            )
            return x, stats, None

    def run(state, cap):
        return _cr_core(
            A, M, b, x0, state, jnp.int32(cap), atol, rtol, float(radius),
            gamma_tol,
            ldiv=bool(ldiv), linesearch=bool(linesearch),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), use_radius=bool(radius > 0), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    if bool(state.indef_error):
        raise ValueError("Indefinite system and no trust region")

    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None and code not in (rt.NPC, ZERO_CURV_B):
        x = x + x0

    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code) or code == ZERO_CURV_B,
        inconsistent=False,
        indefinite=bool(state.indefinite),
        npc_count=int(state.npc_count),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _CR_STATUS),
    )
    return x, stats, state


def cr(A, b, x0=None, **kwargs):
    """x, stats = cr(A, b; ...) — conjugate residuals (Hermitian definite).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/ldiv allowed)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("CR", _cr_solve, A, b, x0, kwargs,
                         forward=("M", "ldiv"),
                         reject={"radius": 0.0, "linesearch": False,
                                 "gamma_tol": None})
    if hit is not None:
        return hit
    x, stats, _ = _cr_solve(A, b, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# CAR (reference src/car.jl) — minimizes ‖Arₖ‖ over the Krylov subspace.
# ---------------------------------------------------------------------------

class CarState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    s: jax.Array
    q: jax.Array
    t: jax.Array
    u: jax.Array
    rho: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose", "MisI"),
)
def _car_core(
    A, M, b, x0, state_in, iter_cap, atol, rtol,
    *, ldiv, history, hist_len, callback, verbose, MisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        r = M_apply(r0)
        p = r
        s = M_apply(A.matvec(r))
        q = s
        t = A.matvec(s)
        u = t
        rho = kdotr(t, s)
        rNorm = knorm(r)
        ArNorm = knorm(s) if MisI else jnp.sqrt(jnp.maximum(kdotr(r, u), 0))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        status = jnp.where(
            rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING)),
        )
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm, history)
        state = CarState(x, r, p, s, q, t, u, rho, rNorm, ArNorm, eps_lim,
                         jnp.int32(0), status, hr, har)
    else:
        state = state_in

    def cond(st):
        return (st.status == rt.RUNNING) & (st.iter < iter_cap)

    def body(st):
        Mu = M_apply(st.u)
        uMu = kdotr(st.u, Mu)
        alpha = st.rho / jnp.where(uMu == 0, jnp.ones_like(uMu), uMu)
        ac = alpha.astype(FC)
        x = st.x + ac * st.p
        r = st.r - ac * st.q
        s_v = st.s - ac * Mu
        rNorm = knorm(r)
        it = st.iter + 1
        solved = (rNorm <= st.eps_lim) | ((rNorm + 1.0) <= 1.0)

        t_v = A.matvec(s_v)
        rho_next = kdotr(t_v, s_v)
        beta = rho_next / jnp.where(st.rho == 0, jnp.ones_like(st.rho), st.rho)
        bc = beta.astype(FC)
        p = jnp.where(solved, st.p, r + bc * st.p)
        q = jnp.where(solved, st.q, s_v + bc * st.q)
        u = jnp.where(solved, st.u, t_v + bc * st.u)
        ArNorm = jnp.where(
            solved, st.ArNorm,
            knorm(s_v) if MisI else jnp.sqrt(jnp.maximum(kdotr(r, u), 0)),
        )
        code = jnp.where(solved, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING))
        hr = rt.hist_write(st.hist_r, it, rNorm, history)
        har = rt.hist_write(st.hist_ar, it, ArNorm, history)
        s_new = st._replace(
            x=x, r=r, p=p, s=s_v, q=q, t=t_v, u=u,
            rho=jnp.where(solved, st.rho, rho_next),
            rNorm=rNorm, ArNorm=ArNorm, iter=it, status=code,
            hist_r=hr, hist_ar=har,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}",
                         rNorm, ArNorm, alpha, beta)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _car_solve(
    A, b, x0=None, *, M=None, ldiv=False, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
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
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "CAR", ("k", "‖rₖ‖", "‖Arₖ‖", "α", "β"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (car_dia_fused,
                                        car_dia_fused_supported)
        if car_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                   stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, arnorm, status = car_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, itmax)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0),
                Aresiduals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _car_core(
            A, M, b, x0, state, jnp.int32(cap), atol, rtol,
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), MisI=M is None,
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
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def car(A, b, x0=None, **kwargs):
    """x, stats = car(A, b; ...) — minimizes ‖Ar‖ (Hermitian definite).

    TPU extension: ``precision="double_word"`` — see cr."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("CAR", _car_solve, A, b, x0, kwargs,
                         forward=("M", "ldiv"))
    if hit is not None:
        return hit
    x, stats, _ = _car_solve(A, b, x0, **kwargs)
    return x, stats
