"""CG-LANCZOS and CG-LANCZOS-SHIFT (Hermitian systems).

Parity with reference src/cg_lanczos.jl (check_curvature exit, Anorm
estimate via ‖Tₖ‖, LanczosStats) and src/cg_lanczos_shift.jl (all shifted
systems (A+σᵢI)xᵢ = b driven from ONE Lanczos stream; per-shift γ/σ/ω
recurrences and convergence masks, LanczosShiftStats).  The shift
recurrences are vectorized over the shift axis — the TPU-native analogue
of the reference's per-shift loops (SURVEY.md §2.5 "multi-shift").
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
from ..ops.kops import kdotr
from ..stats import LanczosStats, LanczosShiftStats

NEG_CURV = 27  # "negative curvature"
_CGL_STATUS = {NEG_CURV: "negative curvature"}


class CgLanczosState(NamedTuple):
    x: jax.Array
    Mv: jax.Array
    Mv_prev: jax.Array
    v: jax.Array
    p: jax.Array
    beta: jax.Array
    sigma: jax.Array
    omega: jax.Array
    gamma: jax.Array
    anorm2: jax.Array
    beta_prev: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    indefinite: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "ldiv", "check_curvature", "history", "hist_len", "callback",
        "verbose", "MisI",
    ),
)
def _cg_lanczos_core(
    A, M, b, x0, state_in, iter_cap, atol, rtol,
    *, ldiv, check_curvature, history, hist_len, callback, verbose, MisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        Mv = b if x0 is None else b - A.matvec(x0)
        v = M_apply(Mv)
        beta = jnp.sqrt(jnp.maximum(kdotr(v, Mv), 0))
        rNorm = beta
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        status = jnp.where(
            beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING)),
        )
        safe_b = jnp.where(beta == 0, jnp.ones_like(beta), beta).astype(FC)
        p = v
        v = v / safe_b
        Mv = Mv / safe_b if not MisI else v
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        state = CgLanczosState(
            x=x, Mv=Mv, Mv_prev=Mv, v=v, p=p,
            beta=beta, sigma=beta, omega=jnp.zeros((), T),
            gamma=jnp.ones((), T), anorm2=jnp.zeros((), T),
            beta_prev=jnp.zeros((), T), rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            indefinite=jnp.zeros((), jnp.bool_), hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        Mv_next = A.matvec(s.v)
        delta = kdotr(s.v, Mv_next)

        gamma = 1.0 / (delta - s.omega / s.gamma)
        indefinite = s.indefinite | (gamma <= 0)
        exit_curv = indefinite if check_curvature else jnp.zeros((), jnp.bool_)

        Mv_next = Mv_next - delta.astype(FC) * s.Mv
        Mv_next = jnp.where(s.iter > 0, Mv_next - s.beta.astype(FC) * s.Mv_prev,
                            Mv_next)
        Mv_prev = s.Mv
        Mv = Mv_next
        v = M_apply(Mv)
        beta = jnp.sqrt(jnp.maximum(kdotr(v, Mv), 0))
        safe_b = jnp.where(beta == 0, jnp.ones_like(beta), beta).astype(FC)
        v = v / safe_b
        if not MisI:
            Mv = Mv / safe_b
        else:
            Mv = v
        anorm2 = s.anorm2 + s.beta_prev**2 + beta**2 + delta**2

        x_new = s.x + gamma.astype(FC) * s.p
        om = beta * gamma
        sigma = -om * s.sigma
        om2 = om * om
        p_new = sigma.astype(FC) * v + om2.astype(FC) * s.p
        rNorm = jnp.abs(sigma)

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)

        # check_curvature exit skips the whole update (reference `continue`).
        skip = exit_curv
        x_new = jnp.where(skip, s.x, x_new)
        p_new = jnp.where(skip, s.p, p_new)
        v = jnp.where(skip, s.v, v)
        Mv = jnp.where(skip, s.Mv, Mv)
        Mv_prev = jnp.where(skip, s.Mv_prev, Mv_prev)
        it = jnp.where(skip, s.iter, s.iter + 1)
        rNorm_out = jnp.where(skip, s.rNorm, rNorm)

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(skip, jnp.int32(NEG_CURV), code)
        code = jnp.where((~skip) & solved, jnp.int32(rt.SOLVED), code)

        hr = rt.hist_write(s.hist_r, it, rNorm_out, history)
        s_new = s._replace(
            x=x_new, Mv=Mv, Mv_prev=Mv_prev, v=v, p=p_new,
            beta=jnp.where(skip, s.beta, beta),
            sigma=jnp.where(skip, s.sigma, sigma),
            omega=jnp.where(skip, s.omega, om2),
            gamma=jnp.where(skip, s.gamma, gamma),
            anorm2=jnp.where(skip, s.anorm2, anorm2),
            beta_prev=jnp.where(skip, s.beta_prev, beta),
            rNorm=rNorm_out, iter=it, status=code,
            indefinite=indefinite, hist_r=hr,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING)
                                 | user_exit & (s_new.status == rt.SOLVED),
                                 jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it, "{:5d}  {:7.1e}", rNorm_out)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cg_lanczos_solve(
    A, b, x0=None, *, M=None, ldiv=False, check_curvature=False,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None,
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
    rt.debug_table(verbose, "CG-LANCZOS", ("k", "‖rₖ‖"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (cg_lanczos_dia_fused,
                                        cg_lanczos_dia_fused_supported)
        if cg_lanczos_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                          stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, anorm, status, indef = cg_lanczos_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, itmax,
                check_curvature=bool(check_curvature))
            niter, code, indef, anorm = jax.device_get(
                [niter, status, indef, anorm])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            stats = LanczosStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                residuals=np.zeros(0),
                indefinite=bool(indef),
                Anorm=float(anorm),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _CGL_STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _cg_lanczos_core(
            A, M, b, x0, state, jnp.int32(cap), atol, rtol,
            ldiv=bool(ldiv), check_curvature=bool(check_curvature),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None:
        x = x + x0
    stats = LanczosStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        indefinite=bool(state.indefinite),
        Anorm=float(np.sqrt(state.anorm2)),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _CGL_STATUS),
    )
    return x, stats, state


def cg_lanczos(A, b, x0=None, **kwargs):
    """x, stats = cg_lanczos(A, b; ...) — CG via the Lanczos process.

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/ldiv allowed)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("CG-LANCZOS", _cg_lanczos_solve, A, b, x0, kwargs,
                         forward=("M", "ldiv"),
                         reject={"check_curvature": False})
    if hit is not None:
        return hit
    x, stats, _ = _cg_lanczos_solve(A, b, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# CG-LANCZOS-SHIFT: (A + σᵢ I) xᵢ = b for all shifts from one Lanczos stream.
# ---------------------------------------------------------------------------

class CgLanczosShiftState(NamedTuple):
    x: jax.Array          # (nshifts, n)
    Mv: jax.Array
    Mv_prev: jax.Array
    v: jax.Array
    p: jax.Array          # (nshifts, n)
    beta: jax.Array
    sigma: jax.Array      # (nshifts,)
    omega: jax.Array
    gamma: jax.Array
    rNorms: jax.Array
    converged: jax.Array
    indefinite: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array     # (hist_len, nshifts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ldiv", "check_curvature", "history", "hist_len", "callback",
        "verbose", "MisI",
    ),
)
def _cg_lanczos_shift_core(
    A, M, b, shifts, state_in, iter_cap, atol, rtol,
    *, ldiv, check_curvature, history, hist_len, callback, verbose, MisI,
):
    n = b.shape[0]
    nshifts = shifts.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros((nshifts, n), FC)
        Mv = b
        v = M_apply(Mv)
        beta = jnp.sqrt(jnp.maximum(kdotr(v, Mv), 0))
        rNorms = jnp.full((nshifts,), beta, T)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        converged = rNorms <= eps_lim
        all_cv = jnp.all(converged)
        status = jnp.where(
            beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(all_cv, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING)),
        )
        safe_b = jnp.where(beta == 0, jnp.ones_like(beta), beta).astype(FC)
        p = jnp.broadcast_to(v, (nshifts, n)).astype(FC)
        v = v / safe_b
        Mv = v if MisI else Mv / safe_b
        hr = jnp.full((max(hist_len, 1), nshifts), jnp.nan, T)
        if history:
            hr = hr.at[0].set(rNorms)
        state = CgLanczosShiftState(
            x=x, Mv=Mv, Mv_prev=Mv, v=v, p=p, beta=beta,
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
        Mv_next = A.matvec(s.v)
        delta = kdotr(s.v, Mv_next)
        Mv_next = Mv_next - delta.astype(FC) * s.Mv
        Mv_next = jnp.where(s.iter > 0, Mv_next - s.beta.astype(FC) * s.Mv_prev,
                            Mv_next)
        Mv_prev = s.Mv
        Mv = Mv_next
        v = M_apply(Mv)
        beta = jnp.sqrt(jnp.maximum(kdotr(v, Mv), 0))
        safe_b = jnp.where(beta == 0, jnp.ones_like(beta), beta).astype(FC)
        v = v / safe_b
        Mv = v if MisI else Mv / safe_b

        rho = jnp.ones((), T) if MisI else kdotr(v, v)
        delta_hat = delta + rho * shifts
        gamma = 1.0 / (delta_hat - s.omega / s.gamma)
        indefinite = s.indefinite | (gamma <= 0)

        if check_curvature:
            not_cv = ~(s.converged | indefinite)
        else:
            not_cv = ~s.converged

        mask = not_cv
        x_new = jnp.where(mask[:, None],
                          s.x + gamma[:, None].astype(FC) * s.p, s.x)
        om = beta * gamma
        sigma_new = jnp.where(mask, -om * s.sigma, s.sigma)
        om2 = jnp.where(mask, om * om, s.omega)
        p_new = jnp.where(
            mask[:, None],
            sigma_new[:, None].astype(FC) * v[None, :] + om2[:, None].astype(FC) * s.p,
            s.p,
        )
        rNorms = jnp.where(mask, jnp.abs(sigma_new), s.rNorms)
        converged = jnp.where(mask, rNorms <= s.eps_lim, s.converged)

        if check_curvature:
            not_cv2 = ~(converged | indefinite)
        else:
            not_cv2 = ~converged
        solved = ~jnp.any(not_cv2)

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
                                 jnp.int32(rt.USER_EXIT), s_new.status)
            )
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cg_lanczos_shift_solve(
    A, b, shifts, *, M=None, ldiv=False, check_curvature=False,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None,
):
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    b = jnp.asarray(b)
    n = b.shape[0]
    T = real_dtype(b.dtype)
    shifts = jnp.asarray(shifts, dtype=T)
    nshifts = shifts.shape[0]
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (one Lanczos stream, all shifts' x/p panels VMEM-resident).
    if (M is None and callback is None and verbose == 0 and not history
            and timemax == float("inf") and b.dtype == T
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (cg_lanczos_shift_dia_fused,
                                        cg_lanczos_shift_dia_fused_supported)
        if cg_lanczos_shift_dia_fused_supported(
                A.dia.offsets, n, b.dtype, nshifts,
                stencil_dtype=A._pd.dtype):
            x, niter, rnorms, status, indef = cg_lanczos_shift_dia_fused(
                A._pd, A.dia.offsets, b, shifts, nshifts, atol, rtol,
                itmax, check_curvature=bool(check_curvature))
            niter, code, indef = jax.device_get([niter, status, indef])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = LanczosShiftStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                residuals=[],
                indefinite=np.asarray(indef, bool),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _cg_lanczos_shift_core(
            A, M, b, shifts, state, jnp.int32(cap), atol, rtol,
            ldiv=bool(ldiv), check_curvature=bool(check_curvature),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    residuals = []
    if history:
        h = np.asarray(state.hist_r)[: niter + 1]
        for i in range(nshifts):
            col = h[:, i]
            residuals.append(col[~np.isnan(col)])
    stats = LanczosShiftStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        residuals=residuals,
        indefinite=np.asarray(state.indefinite),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def cg_lanczos_shift(A, b, shifts, **kwargs):
    """x, stats = cg_lanczos_shift(A, b, shifts) — x has shape (nshifts, n)."""
    x, stats, _ = _cg_lanczos_shift_solve(A, b, shifts, **kwargs)
    return x, stats
