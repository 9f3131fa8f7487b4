"""CGLS and CRLS: min ‖b − Ax‖² + λ‖x‖² via normal-equation recurrences.

Parity with reference src/cgls.jl (λ Tikhonov, radius trust region, M
preconditioner; stops on ‖Aᴴr‖ ≤ atol + rtol·‖Aᴴr₀‖) and src/crls.jl
(adds the zero-curvature "psd" trust-region analysis).
cgls_lanczos_shift (reference src/cgls_lanczos_shift.jl) solves the
regularized family min ‖b − Ax‖² + λᵢ‖x‖² for all shifts from one
Golub-Kahan/Lanczos stream, vectorized over the shift axis.
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
from ..ops.kops import kdotr, knorm, to_boundary
from ..stats import SimpleStats, LanczosShiftStats

PSD = 31  # "zero-curvature encountered"
_CRLS_STATUS = {PSD: "zero-curvature encountered"}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


class CglsState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    s: jax.Array
    gamma: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "use_radius", "MisI"),
)
def _cgls_core(
    A, M, b, state_in, iter_cap, atol, rtol, lam, radius,
    *, ldiv, history, hist_len, callback, verbose, use_radius, MisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    radius = jnp.asarray(radius, T)

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r = b
        bNorm = knorm(r)
        Mr = M_apply(r)
        sv = A.rmatvec(Mr)
        gamma = kdotr(sv, sv)
        ArNorm = jnp.sqrt(gamma)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * ArNorm
        status = jnp.where(bNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(ArNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, bNorm, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm, history)
        state = CglsState(x=x, r=r, p=sv, s=sv, gamma=gamma, rNorm=bNorm,
                          ArNorm=ArNorm, eps_lim=eps_lim,
                          iter=jnp.int32(0), status=status,
                          hist_r=hr, hist_ar=har)
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        q = A.matvec(s.p)
        Mq = M_apply(q)
        delta = kdotr(q, Mq)
        if True:
            delta = delta + jnp.where(lam > 0, lam * kdotr(s.p, s.p), 0)
        alpha = s.gamma / _safe(delta)

        on_boundary = jnp.zeros((), jnp.bool_)
        if use_radius:
            t1, t2 = to_boundary(s.x, s.p, radius)
            sigma = jnp.maximum(t1, t2)
            hit = alpha > sigma
            alpha = jnp.where(hit, sigma, alpha)
            on_boundary = hit

        x = s.x + alpha.astype(FC) * s.p
        r = s.r - alpha.astype(FC) * q
        Mr = M_apply(r)
        sv = A.rmatvec(Mr)
        sv = sv - jnp.where(lam > 0, lam, 0).astype(FC) * x
        gamma_next = kdotr(sv, sv)
        beta = gamma_next / _safe(s.gamma)
        p = sv + beta.astype(FC) * s.p
        rNorm = knorm(r)
        ArNorm = jnp.sqrt(gamma_next)
        it = s.iter + 1
        solved = (ArNorm <= s.eps_lim) | on_boundary
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)
        code = jnp.where(on_boundary, jnp.int32(rt.ON_BOUNDARY), code)
        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(x=x, r=r, p=p, s=sv, gamma=gamma_next,
                           rNorm=rNorm, ArNorm=ArNorm, iter=it, status=code,
                           hist_r=hr, hist_ar=har)
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:8.1e}  {:8.1e}",
                         s_new.ArNorm, s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cgls_solve(
    A, b, *, M=None, ldiv=False, lam=0.0, radius=0.0, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    M = as_operator(M)
    b = jnp.asarray(b)
    m, n = A.shape
    if b.shape[0] != m:
        raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "CGLS", ("k", "‖Aᴴr‖", "‖r‖"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and radius == 0 and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (cgls_dia_fused,
                                        cgls_dia_fused_supported)
        if cgls_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, arnorm, status = cgls_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, itmax)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0), Aresiduals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _cgls_core(
            A, M, b, state, jnp.int32(cap), atol, rtol, float(lam),
            float(radius), ldiv=bool(ldiv), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
            use_radius=bool(radius > 0), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code), inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start, status=rt.decode_status(code),
    )
    return jnp.asarray(state.x), stats, state


def cgls(A, b, **kwargs):
    """x, stats = cgls(A, b; λ, radius, M, ...).

    TPU extension: ``precision="double_word"`` — least-squares iterative
    refinement to fp64-grade LS optimality from f32 storage.  CGLS's λ
    enters the optimality system linearly (min ‖b−Ax‖² + λ‖x‖² ⇒
    Aᴴ(b−Ax) = λx), so reg = λ (vs λ² for LSQR/LSMR).  Plain
    configuration only (λ allowed).
    """
    from ._refine import check_ir_config
    from .lsqr import _ls_ir, _ls_ir_guard

    precision = kwargs.pop("precision", None)
    if check_ir_config("CGLS", precision,
                       **_ls_ir_guard("CGLS", kwargs)):
        fwd = {k: kwargs[k] for k in ("lam", "atol", "rtol", "itmax",
                                      "timemax") if k in kwargs}
        x, stats, _ = _ls_ir("CGLS", _cgls_solve, A, b,
                             reg_of_lam=lambda l: l, **fwd)
        return x, stats
    x, stats, _ = _cgls_solve(A, b, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# CRLS (reference src/crls.jl)
# ---------------------------------------------------------------------------

class CrlsState(NamedTuple):
    x: jax.Array
    r: jax.Array
    Ar: jax.Array
    p: jax.Array
    Ap: jax.Array
    q: jax.Array
    s: jax.Array
    gamma: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "use_radius", "MisI"),
)
def _crls_core(
    A, M, b, state_in, iter_cap, atol, rtol, lam, radius,
    *, ldiv, history, hist_len, callback, verbose, use_radius, MisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    radius = jnp.asarray(radius, T)

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r = b
        rNorm = knorm(r)
        Mr = M_apply(r)
        Ar = A.rmatvec(Mr)
        sv = A.matvec(Ar)
        Ms = M_apply(sv)
        p = Ar
        Ap = sv
        q = A.rmatvec(Ms)
        q = q + jnp.where(lam > 0, lam, 0).astype(FC) * p
        gamma = kdotr(sv, Ms)
        ArNorm = knorm(Ar)
        gamma = gamma + jnp.where(lam > 0, lam * ArNorm * ArNorm, 0)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * ArNorm
        status = jnp.where(rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(ArNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm, history)
        state = CrlsState(x=x, r=r, Ar=Ar, p=p, Ap=Ap, q=q, s=sv,
                          gamma=gamma, rNorm=rNorm, ArNorm=ArNorm,
                          eps_lim=eps_lim, iter=jnp.int32(0), status=status,
                          hist_r=hr, hist_ar=har)
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        qNorm2 = kdotr(s.q, s.q)
        alpha = s.gamma / _safe(qNorm2)
        p_sel, q_sel = s.p, s.q
        psd = jnp.zeros((), jnp.bool_)
        on_boundary = jnp.zeros((), jnp.bool_)
        if use_radius:
            pNorm = knorm(s.p)
            flat = kdotr(s.Ap, s.Ap) <= s.eps_lim * jnp.sqrt(qNorm2) * pNorm
            psd = flat
            # flat branch: follow Aᴴr to the boundary
            pn2_flat = s.ArNorm * s.ArNorm
            t1f, t2f = to_boundary(s.x, s.Ar, radius, dNorm2=pn2_flat)
            alpha_flat = jnp.minimum(
                s.ArNorm**2 / _safe(s.gamma), jnp.maximum(t1f, t2f)
            )
            # regular branch
            t1r, t2r = to_boundary(s.x, s.p, radius, dNorm2=pNorm * pNorm)
            sigma = jnp.maximum(t1r, t2r)
            hit = alpha >= sigma
            alpha_reg = jnp.where(hit, sigma, alpha)
            on_boundary = (~flat) & hit
            alpha = jnp.where(flat, alpha_flat, alpha_reg)
            p_sel = jnp.where(flat, s.Ar, s.p)
            q_sel = jnp.where(flat, A.rmatvec(s.s), s.q)

        x = s.x + alpha.astype(FC) * p_sel
        Ar_mid = s.Ar - alpha.astype(FC) * q_sel
        ArNorm = knorm(Ar_mid)
        early = psd | on_boundary

        r = s.r - alpha.astype(FC) * s.Ap
        sv = A.matvec(Ar_mid)
        Ms = M_apply(sv)
        gamma_next = kdotr(sv, Ms) + jnp.where(lam > 0, lam * ArNorm * ArNorm, 0)
        beta = gamma_next / _safe(s.gamma)
        p = Ar_mid + beta.astype(FC) * s.p
        Ap = sv + beta.astype(FC) * s.Ap
        MAp = M_apply(Ap)
        q = A.rmatvec(MAp) + jnp.where(lam > 0, lam, 0).astype(FC) * p
        rNorm = jnp.where(
            lam > 0, jnp.sqrt(kdotr(r, r) + lam * kdotr(x, x)), knorm(r)
        )
        it = s.iter + 1
        solved = (ArNorm <= s.eps_lim) | early
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)
        code = jnp.where(psd, jnp.int32(PSD), code)
        code = jnp.where(on_boundary, jnp.int32(rt.ON_BOUNDARY), code)

        # early exit skips the continuation updates (reference `continue`).
        r = jnp.where(early, s.r, r)
        p = jnp.where(early, p_sel, p)
        Ap = jnp.where(early, s.Ap, Ap)
        q = jnp.where(early, q_sel, q)
        sv = jnp.where(early, s.s, sv)
        gamma_out = jnp.where(early, s.gamma, gamma_next)
        rNorm = jnp.where(early, s.rNorm, rNorm)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(x=x, r=r, Ar=Ar_mid, p=p, Ap=Ap, q=q, s=sv,
                           gamma=gamma_out, rNorm=rNorm, ArNorm=ArNorm,
                           iter=it, status=code, hist_r=hr, hist_ar=har)
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:8.1e}  {:8.1e}",
                         s_new.ArNorm, s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _crls_solve(
    A, b, *, M=None, ldiv=False, lam=0.0, radius=0.0, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    M = as_operator(M)
    b = jnp.asarray(b)
    m, n = A.shape
    if b.shape[0] != m:
        raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "CRLS", ("k", "‖Aᴴr‖", "‖r‖"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and radius == 0 and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (crls_dia_fused,
                                        crls_dia_fused_supported)
        if crls_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, arnorm, status = crls_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, itmax)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0), Aresiduals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _CRLS_STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _crls_core(
            A, M, b, state, jnp.int32(cap), atol, rtol, float(lam),
            float(radius), ldiv=bool(ldiv), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
            use_radius=bool(radius > 0), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code) or code == PSD,
        inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _CRLS_STATUS),
    )
    return jnp.asarray(state.x), stats, state


def crls(A, b, **kwargs):
    """x, stats = crls(A, b; λ, radius, M, ...)."""
    x, stats, _ = _crls_solve(A, b, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# CGLS-LANCZOS-SHIFT (reference src/cgls_lanczos_shift.jl): solve
# min ‖b − Ax‖² + λᵢ‖x‖² for all shifts from one Lanczos stream on AᴴA.
# ---------------------------------------------------------------------------

class CglsShiftState(NamedTuple):
    x: jax.Array          # (nshifts, n)
    Mv: jax.Array
    Mv_prev: jax.Array
    v: jax.Array
    u: jax.Array          # (m,) Golub-Kahan residual carrier
    p: jax.Array          # (nshifts, n)
    beta: jax.Array
    sigma: jax.Array
    omega: jax.Array
    gamma: jax.Array
    rNorms: jax.Array
    converged: jax.Array
    indefinite: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("history", "hist_len", "callback", "verbose"),
)
def _cgls_shift_core(
    A, b, shifts, state_in, iter_cap, atol, rtol,
    *, history, hist_len, callback, verbose,
):
    """Lanczos on AᴴA (normal equations), shifted by λᵢ."""
    m, n = A.shape
    nshifts = shifts.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def AhA(u):
        return A.rmatvec(A.matvec(u))

    if state_in is None:
        x = jnp.zeros((nshifts, n), FC)
        Mv = A.rmatvec(b)
        beta = knorm(Mv)
        rNorms = jnp.full((nshifts,), beta, T)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        converged = rNorms <= eps_lim
        status = jnp.where(
            beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(jnp.all(converged), jnp.int32(rt.SOLVED),
                      jnp.int32(rt.RUNNING)),
        )
        safe_b = _safe(beta).astype(FC)
        p = jnp.broadcast_to(Mv, (nshifts, n)).astype(FC)
        v = Mv / safe_b
        hr = jnp.full((max(hist_len, 1), nshifts), jnp.nan, T)
        if history:
            hr = hr.at[0].set(rNorms)
        state = CglsShiftState(
            x=x, Mv=v, Mv_prev=v, v=v, u=b, p=p, beta=beta,
            sigma=jnp.full((nshifts,), beta, T),
            omega=jnp.zeros((nshifts,), T),
            gamma=jnp.ones((nshifts,), T),
            rNorms=rNorms, converged=converged,
            indefinite=jnp.zeros((nshifts,), jnp.bool_),
            eps_lim=eps_lim, iter=jnp.int32(0), status=status, hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        Mv_next = AhA(s.v)
        delta = kdotr(s.v, Mv_next)
        Mv_next = Mv_next - delta.astype(FC) * s.Mv
        Mv_next = jnp.where(s.iter > 0, Mv_next - s.beta.astype(FC) * s.Mv_prev,
                            Mv_next)
        Mv_prev = s.Mv
        Mv = Mv_next
        beta = knorm(Mv)
        safe_b = _safe(beta).astype(FC)
        v = Mv / safe_b
        Mv = v

        delta_hat = delta + shifts
        gamma = 1.0 / (delta_hat - s.omega / s.gamma)
        indefinite = s.indefinite | (gamma <= 0)
        mask = ~s.converged

        x_new = jnp.where(mask[:, None], s.x + gamma[:, None].astype(FC) * s.p,
                          s.x)
        om = beta * gamma
        sigma_new = jnp.where(mask, -om * s.sigma, s.sigma)
        om2 = jnp.where(mask, om * om, s.omega)
        p_new = jnp.where(
            mask[:, None],
            sigma_new[:, None].astype(FC) * v[None, :]
            + om2[:, None].astype(FC) * s.p,
            s.p,
        )
        rNorms = jnp.where(mask, jnp.abs(sigma_new), s.rNorms)
        converged = jnp.where(mask, rNorms <= s.eps_lim, s.converged)
        solved = jnp.all(converged)
        it = s.iter + 1
        code = jnp.where(solved, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING))
        hr = s.hist_r
        if history:
            hr = hr.at[it].set(jnp.where(mask, rNorms, jnp.nan))
        s_new = s._replace(
            x=x_new, Mv=Mv, Mv_prev=Mv_prev, v=v, p=p_new, beta=beta,
            sigma=sigma_new, omega=om2,
            gamma=jnp.where(mask, gamma, s.gamma),
            rNorms=rNorms, converged=converged, indefinite=indefinite,
            iter=it, status=code, hist_r=hr,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cgls_lanczos_shift_solve(
    A, b, shifts, *, atol=None, rtol=None, itmax=0, timemax=float("inf"),
    verbose=0, history=False, callback=None, **_ignored,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    m, n = A.shape
    T = real_dtype(b.dtype)
    shifts = jnp.asarray(shifts, dtype=T)
    nshifts = shifts.shape[0]
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (one AᴴA Lanczos stream, all shifts' x/p panels VMEM-resident).
    if (callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (
            cgls_lanczos_shift_dia_fused,
            cgls_lanczos_shift_dia_fused_supported)
        if cgls_lanczos_shift_dia_fused_supported(
                A.dia.offsets, m, b.dtype, nshifts,
                stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorms, status, indef = cgls_lanczos_shift_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, shifts,
                nshifts, atol, rtol, itmax)
            niter, code, indef = jax.device_get([niter, status, indef])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = LanczosShiftStats(
                niter=niter, solved=rt.is_solved_code(code), residuals=[],
                indefinite=np.asarray(indef, bool),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _cgls_shift_core(
            A, b, shifts, state, jnp.int32(cap), atol, rtol,
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    residuals = []
    if history:
        h = np.asarray(state.hist_r)[: niter + 1]
        for i in range(nshifts):
            col = h[:, i]
            residuals.append(col[~np.isnan(col)])
    stats = LanczosShiftStats(
        niter=niter, solved=rt.is_solved_code(code), residuals=residuals,
        indefinite=np.asarray(state.indefinite),
        timer=time.perf_counter() - start, status=rt.decode_status(code),
    )
    return jnp.asarray(state.x), stats, state


def cgls_lanczos_shift(A, b, shifts, **kwargs):
    """x, stats = cgls_lanczos_shift(A, b, shifts) — x shape (nshifts, n)."""
    x, stats, _ = _cgls_lanczos_shift_solve(A, b, shifts, **kwargs)
    return x, stats
