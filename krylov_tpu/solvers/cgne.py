"""CGNE and CRMR: minimum-norm solutions of consistent Ax = b.

Parity with reference src/cgne.jl (CG on AAᴴy = b; λ regularization, N
preconditioner, "system probably inconsistent" detection via ‖p‖) and
src/crmr.jl (CR on AAᴴ; detection via ‖Aᴴr‖).
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

INCONS_CGNE = 32  # "system probably inconsistent"
INCONS_CRMR = 33  # "system probably inconsistent but least squares/norm solution found"
_STATUS = {
    INCONS_CGNE: "system probably inconsistent",
    INCONS_CRMR: "system probably inconsistent but least squares/norm solution found",
}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


class CgneState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    s: jax.Array
    gamma: jax.Array
    rNorm: jax.Array
    pNorm: jax.Array
    eps_c: jax.Array
    eps_i: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "variant", "NisI"),
)
def _cgne_like_core(
    A, N, b, state_in, iter_cap, atol, rtol, lam,
    *, ldiv, history, hist_len, callback, verbose, variant, NisI,
):
    """variant: 'cgne' or 'crmr'."""
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    cgne = variant == "cgne"

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r = b
        z = N_apply(r)
        rNorm = knorm(r)
        p = A.rmatvec(z) if cgne else A.rmatvec(r)
        if cgne:
            gamma = kdotr(r, z)
            indNorm = knorm(p)     # detect inconsistency via ‖p‖
        else:
            gamma = kdotr(p, p) + jnp.where(lam > 0, lam * rNorm * rNorm, 0)
            indNorm = jnp.sqrt(gamma)   # = ‖Aᴴr‖
        eps_c = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        eps_i = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * indNorm
        inconsistent0 = (rNorm > 100 * eps_c) & (indNorm <= eps_i)
        status = jnp.where(
            rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rNorm <= eps_c, jnp.int32(rt.SOLVED),
                      jnp.where(inconsistent0,
                                jnp.int32(INCONS_CGNE if cgne else INCONS_CRMR),
                                jnp.int32(rt.RUNNING))),
        )
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        state = CgneState(x=x, r=r, p=p, s=r, gamma=gamma, rNorm=rNorm,
                          pNorm=indNorm, eps_c=eps_c, eps_i=eps_i,
                          iter=jnp.int32(0), status=status, hist_r=hr)
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        q = A.matvec(s.p)
        q = q + jnp.where(lam > 0, lam, 0).astype(FC) * s.s
        if cgne:
            delta = kdotr(s.p, s.p) + jnp.where(lam > 0, lam * kdotr(s.s, s.s), 0)
            alpha = s.gamma / _safe(delta)
            x = s.x + alpha.astype(FC) * s.p
            r = s.r - alpha.astype(FC) * q
            z = N_apply(r)
            gamma_next = kdotr(r, z)
            beta = gamma_next / _safe(s.gamma)
            Ahz = A.rmatvec(z)
            p = Ahz + beta.astype(FC) * s.p
            indNorm = knorm(p)
            rNorm = jnp.sqrt(jnp.maximum(gamma_next, 0))
        else:
            Nq = N_apply(q)
            alpha = s.gamma / _safe(kdotr(q, Nq))
            x = s.x + alpha.astype(FC) * s.p
            r = s.r - alpha.astype(FC) * Nq
            rNorm = knorm(r)
            Ahr = A.rmatvec(r)
            gamma_next = kdotr(Ahr, Ahr) + jnp.where(lam > 0, lam * rNorm * rNorm, 0)
            beta = gamma_next / _safe(s.gamma)
            p = Ahr + beta.astype(FC) * s.p
            indNorm = jnp.sqrt(jnp.maximum(gamma_next, 0))
        # s ring only participates when λ > 0 (harmless otherwise).
        sv = r + beta.astype(FC) * s.s
        it = s.iter + 1
        solved = (rNorm <= s.eps_c) | ((rNorm + 1.0) <= 1.0)
        inconsistent = (rNorm > 100 * s.eps_c) & (indNorm <= s.eps_i)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(inconsistent,
                         jnp.int32(INCONS_CGNE if cgne else INCONS_CRMR), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)
        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(x=x, r=r, p=p, s=sv, gamma=gamma_next,
                           rNorm=rNorm, pNorm=indNorm, iter=it, status=code,
                           hist_r=hr)
        if verbose > 0:
            if variant == "crmr":
                rt.debug_row(verbose, s_new.iter,
                             "{:5d}  {:8.1e}  {:8.1e}",
                             s_new.pNorm, s_new.rNorm)
            else:
                rt.debug_row(verbose, s_new.iter, "{:5d}  {:8.1e}",
                             s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _cgne_like_solve(
    variant, A, b, *, N=None, ldiv=False, lam=0.0, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    N = as_operator(N)
    b = jnp.asarray(b)
    m, n = A.shape
    if b.shape[0] != m:
        raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, variant.upper(),
                   ("k", "‖Aᴴr‖", "‖r‖") if variant == "crmr"
                   else ("k", "‖r‖"), m, n)
    hist_len = itmax + 1 if history else 0

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (N is None and not history and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (cgne_crmr_dia_fused,
                                        cgne_crmr_dia_fused_supported)
        if cgne_crmr_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                         stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, status = cgne_crmr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, float(lam),
                atol, rtol, itmax, variant=variant)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=code in (INCONS_CGNE, INCONS_CRMR),
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _cgne_like_core(
            A, N, b, state, jnp.int32(cap), atol, rtol, float(lam),
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), variant=variant,
            NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=code in (INCONS_CGNE, INCONS_CRMR),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return jnp.asarray(state.x), stats, state


def _cgne_dw(variant, A, b, kwargs):
    """``precision="double_word"`` for the x-only LN methods (cgne/crmr):
    dw refinement of the TRUE residual b − Ax with the method's own
    min-norm inner corrections (each dx ∈ range(Aᴴ), so the min-norm
    property survives — solvers/_refine.square_ir_wrap is shape-agnostic
    over rectangular A)."""
    import functools as _ft
    from ._refine import square_ir_wrap
    return square_ir_wrap(variant.upper(),
                          _ft.partial(_cgne_like_solve, variant),
                          A, b, None, kwargs, forward=("N", "ldiv"),
                          reject={"lam": 0.0})


def cgne(A, b, **kwargs):
    """x, stats = cgne(A, b; λ, N, ...) — minimum-norm solution.

    TPU extension: ``precision="double_word"`` — fp64-grade TRUE
    residuals from f32 storage (λ=0 configuration)."""
    hit = _cgne_dw("cgne", A, b, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _cgne_like_solve("cgne", A, b, **kwargs)
    return x, stats


def crmr(A, b, **kwargs):
    """x, stats = crmr(A, b; λ, N, ...) — minimum-norm solution.

    TPU extension: ``precision="double_word"`` — fp64-grade TRUE
    residuals from f32 storage (λ=0 configuration)."""
    hit = _cgne_dw("crmr", A, b, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _cgne_like_solve("crmr", A, b, **kwargs)
    return x, stats
