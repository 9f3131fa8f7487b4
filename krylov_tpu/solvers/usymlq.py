"""USYMLQ, USYMQR, TriLQR, USYMLQR — Saunders-Simon-Yip tridiagonalization.

Parity with reference src/usymlq.jl (LQ, transfer_to_usymcg),
src/usymqr.jl (QR, ‖Aᴴr‖ inconsistency test), src/trilqr.jl (adjoint
systems Ax = b / Aᴴy = c with AdjointStats) and src/usymlqr.jl
(least-squares/least-norm saddle-point systems).  The SSY process builds
two orthonormal bases: AUₖ = Vₖ₊₁Tₖ₊₁.ₖ and AᴴVₖ = Uₖ₊₁(Tₖ.ₖ₊₁)ᴴ
with v ∈ ℂᵐ driven by b and u ∈ ℂⁿ driven by c.
"""

import functools
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import _runtime as rt
from .._dtypes import real_dtype
from ..operators import as_operator
from ..ops.kops import kdot, knorm, sym_givens
from ..stats import SimpleStats, AdjointStats

SOLVED_LQ_PT = 35
SOLVED_CG_PT2 = 36
_STATUS = {
    SOLVED_LQ_PT: "solution xᴸ good enough given atol and rtol",
    SOLVED_CG_PT2: "solution xᶜ good enough given atol and rtol",
}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


def _ssy_step(A, vk, uk, vkm1, ukm1, beta_k, gamma_k, it, FC):
    """One SSY tridiagonalization step (reference usymlq :204-224)."""
    q = A.matvec(uk)
    p = A.rmatvec(vk)
    q = jnp.where(it >= 2, q - gamma_k.astype(FC) * vkm1, q)
    p = jnp.where(it >= 2, p - beta_k.astype(FC) * ukm1, p)
    alpha = kdot(vk, q)
    q = q - alpha * vk
    p = p - jnp.conj(alpha) * uk
    beta_kp1 = knorm(q)
    gamma_kp1 = knorm(p)
    return q, p, alpha, beta_kp1, gamma_kp1


# ---------------------------------------------------------------------------
# USYMLQ
# ---------------------------------------------------------------------------

class UsymlqState(NamedTuple):
    x: jax.Array
    vk: jax.Array
    vkm1: jax.Array
    uk: jax.Array
    ukm1: jax.Array
    dbar_vec: jax.Array
    beta: jax.Array
    gamma: jax.Array
    c_km1: jax.Array
    s_km1: jax.Array
    dbar_km1: jax.Array
    zeta_km1: jax.Array
    zeta_km2: jax.Array
    eta_km1: jax.Array
    zetabar: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    solved_cg_flag: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("transfer_to_usymcg", "history", "hist_len", "callback",
                     "verbose"),
)
def _usymlq_core(
    A, b, c, x0, state_in, iter_cap, atol, rtol,
    *, transfer_to_usymcg, history, hist_len, callback, verbose,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        bNorm = knorm(r0)
        beta = knorm(r0)
        gamma = knorm(c)
        vk = r0 / _safe(beta).astype(FC)
        uk = c / _safe(gamma).astype(FC)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        status = jnp.where(bNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(bNorm <= eps_lim, jnp.int32(SOLVED_LQ_PT),
                                     jnp.int32(rt.RUNNING)))
        zc = jnp.zeros((), FC)
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, bNorm, history)
        state = UsymlqState(
            x=x, vk=vk, vkm1=jnp.zeros(m, FC), uk=uk, ukm1=jnp.zeros(n, FC),
            dbar_vec=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            c_km1=-jnp.ones((), T), s_km1=zc,
            dbar_km1=zc, zeta_km1=zc, zeta_km2=zc, eta_km1=zc, zetabar=zc,
            rNorm=bNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            solved_cg_flag=jnp.zeros((), jnp.bool_), hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, beta_kp1, gamma_kp1 = _ssy_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, it, FC)

        ck_g, sk_g, d_km1 = sym_givens(s.dbar_km1, s.gamma.astype(FC))
        ck = jnp.where(it == 1, -jnp.ones((), T), ck_g)
        sk = jnp.where(it == 1, jnp.zeros((), FC), jnp.asarray(sk_g, FC))
        eps_km2 = s.s_km1 * s.beta.astype(FC)
        lam2 = ck * s.beta.astype(FC) + sk * alpha
        dbar2 = jnp.conj(sk) * s.beta.astype(FC) - ck * alpha
        lam3 = -s.c_km1 * ck * s.beta.astype(FC) + sk * alpha
        dbar3 = -s.c_km1 * jnp.conj(sk) * s.beta.astype(FC) - ck * alpha
        lam_km1 = jnp.where(it == 2, lam2, lam3)
        dbar_k = jnp.where(it == 1, alpha, jnp.where(it == 2, dbar2, dbar3))

        zeta_km1_new = jnp.where(it >= 2, s.eta_km1 / _safe(d_km1), s.zeta_km1)
        zeta_km2_new = jnp.where(it >= 3, s.zeta_km1, s.zeta_km2)
        eta_k = jnp.where(
            it == 1, s.beta.astype(FC),
            jnp.where(it == 2, -lam_km1 * zeta_km1_new,
                      -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new))

        x_new = jnp.where(
            it >= 2,
            s.x + (zeta_km1_new * ck).astype(FC) * s.dbar_vec
            + (zeta_km1_new * sk) * s.uk,
            s.x)
        dbar_vec_new = jnp.where(
            it == 1, s.uk,
            jnp.conj(sk) * s.dbar_vec - ck.astype(FC) * s.uk)

        vk_new = jnp.where(beta_kp1 != 0, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(gamma_kp1 != 0, p / _safe(gamma_kp1).astype(FC), s.uk)

        mu = s.beta.astype(FC) * (s.s_km1 * zeta_km2_new
                                  - s.c_km1 * ck * zeta_km1_new) \
            + alpha * sk * zeta_km1_new
        om = beta_kp1.astype(FC) * sk * zeta_km1_new
        rNorm_lq = jnp.where(
            it == 1, s.rNorm,
            jnp.sqrt(jnp.abs(mu) ** 2 + jnp.abs(om) ** 2))

        dbar_ok = jnp.abs(dbar_k) > eps_T
        zetabar = jnp.where(dbar_ok, eta_k / _safe(dbar_k), s.zetabar)
        rho = beta_kp1.astype(FC) * (sk * zeta_km1_new - ck * zetabar)
        rNorm_cg = jnp.abs(rho)

        solved_lq = rNorm_lq <= s.eps_lim
        solved_cg = transfer_to_usymcg & dbar_ok & (rNorm_cg <= s.eps_lim)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(solved_lq, jnp.int32(SOLVED_LQ_PT), code)
        code = jnp.where(solved_cg & ~solved_lq, jnp.int32(SOLVED_CG_PT2), code)

        hist = rt.hist_write(s.hist_r, it, rNorm_lq, history)
        s_new = s._replace(
            x=x_new, vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            dbar_vec=dbar_vec_new,
            beta=beta_kp1, gamma=gamma_kp1,
            c_km1=ck, s_km1=sk, dbar_km1=dbar_k,
            zeta_km1=zeta_km1_new, zeta_km2=zeta_km2_new, eta_km1=eta_k,
            zetabar=zetabar, rNorm=rNorm_lq, iter=it, status=code,
            solved_cg_flag=solved_cg & ~solved_lq, hist_r=hist,
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
    x_final = jnp.where(state.solved_cg_flag,
                        state.x + state.zetabar * state.dbar_vec, state.x)
    return state._replace(x=x_final)


def _usymlq_solve(
    A, b, c, x0=None, *, transfer_to_usymcg=True, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
    **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "USYMLQ", ("k", "‖rₖ‖"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config (no warm start:
    # the kernel seeds v₁ from b directly) → fused whole-solve kernel.
    if (x0 is None and not history and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (usymlq_dia_fused,
                                        usymlq_dia_fused_supported)
        if usymlq_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                      stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, code_d = usymlq_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c, atol, rtol,
                itmax, transfer_to_usymcg=bool(transfer_to_usymcg))
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code in (SOLVED_LQ_PT,
                                                           SOLVED_CG_PT2),
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _usymlq_core(
            A, b, c, x0, state, jnp.int32(cap), atol, rtol,
            transfer_to_usymcg=bool(transfer_to_usymcg),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
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
        solved=rt.is_solved_code(code) or code in (SOLVED_LQ_PT, SOLVED_CG_PT2),
        inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, stats, state


def usymlq(A, b, c, x0=None, **kwargs):
    """x, stats = usymlq(A, b, c; transfer_to_usymcg=True, ...).

    TPU extension: ``precision="double_word"`` — dw refinement of the
    TRUE residual b − Ax from f32 storage; inner corrections re-seed the
    second SSY vector with the caller's ``c``."""
    from ._refine import square_ir_wrap

    def solve_fn(A_, rhs, **kw):
        return _usymlq_solve(A_, rhs, c, None, **kw)

    hit = square_ir_wrap("USYMLQ", solve_fn, A, b, x0, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _usymlq_solve(A, b, c, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# USYMQR
# ---------------------------------------------------------------------------

class UsymqrState(NamedTuple):
    x: jax.Array
    vk: jax.Array
    vkm1: jax.Array
    uk: jax.Array
    ukm1: jax.Array
    w_km2: jax.Array
    w_km1: jax.Array
    beta: jax.Array
    gamma: jax.Array
    c_km2: jax.Array
    s_km2: jax.Array
    c_km1: jax.Array
    s_km1: jax.Array
    zetabar: jax.Array
    kappa: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    inconsistent: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("history", "hist_len", "callback", "verbose"),
)
def _usymqr_core(
    A, b, c, x0, state_in, iter_cap, atol, rtol,
    *, history, hist_len, callback, verbose,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        bNorm = knorm(r0)
        beta = knorm(r0)
        gamma = knorm(c)
        vk = r0 / _safe(beta).astype(FC)
        uk = c / _safe(gamma).astype(FC)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        status = jnp.where(bNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(bNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        zc = jnp.zeros((), FC)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, bNorm, history)
        har = rt.hist_init(hist_len, T)
        state = UsymqrState(
            x=x, vk=vk, vkm1=jnp.zeros(m, FC), uk=uk, ukm1=jnp.zeros(n, FC),
            w_km2=jnp.zeros(n, FC), w_km1=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            c_km2=jnp.zeros((), T), s_km2=zc,
            c_km1=jnp.zeros((), T), s_km1=zc,
            zetabar=bNorm.astype(FC), kappa=jnp.zeros((), T),
            rNorm=bNorm, ArNorm=jnp.zeros((), T), eps_lim=eps_lim,
            iter=jnp.int32(0), status=status,
            inconsistent=jnp.zeros((), jnp.bool_), hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, beta_kp1, gamma_kp1 = _ssy_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, it, FC)

        eps_km2 = jnp.where(it >= 3, s.s_km2 * s.gamma.astype(FC),
                            jnp.zeros((), FC))
        lbar_km1 = jnp.where(it >= 3, -s.c_km2.astype(FC) * s.gamma.astype(FC),
                             jnp.where(it == 2, s.gamma.astype(FC),
                                       jnp.zeros((), FC)))
        lam_km1 = jnp.where(it >= 2,
                            s.c_km1.astype(FC) * lbar_km1 + s.s_km1 * alpha,
                            jnp.zeros((), FC))
        dbar_k = jnp.where(it >= 2,
                           jnp.conj(s.s_km1) * lbar_km1
                           - s.c_km1.astype(FC) * alpha, alpha)
        ck, sk, d_k = sym_givens(dbar_k, beta_kp1.astype(FC))
        zeta_k = ck.astype(FC) * s.zetabar
        zetabar_next = jnp.conj(jnp.asarray(sk, FC)) * s.zetabar

        w1 = s.uk / _safe(d_k)
        w2 = (s.uk - lam_km1 * s.w_km1) / _safe(d_k)
        w3 = (s.uk - lam_km1 * s.w_km1 - eps_km2 * s.w_km2) / _safe(d_k)
        w_k = jnp.where(it == 1, w1, jnp.where(it == 2, w2, w3))

        x_new = s.x + zeta_k * w_k
        rNorm = jnp.abs(zetabar_next)
        ArNorm = jnp.abs(s.zetabar) * jnp.sqrt(
            jnp.abs(dbar_k) ** 2 + jnp.abs(s.c_km1 * gamma_kp1) ** 2)
        kappa = jnp.where(it == 1,
                          jnp.asarray(atol, T) + jnp.asarray(rtol, T) * ArNorm,
                          s.kappa)

        vk_new = jnp.where(beta_kp1 != 0, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(gamma_kp1 != 0, p / _safe(gamma_kp1).astype(FC), s.uk)

        solved = rNorm <= s.eps_lim
        inconsistent = (~solved) & (ArNorm <= kappa)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(inconsistent, jnp.int32(rt.INCONSISTENT), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(
            x=x_new, vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            w_km2=jnp.where(it >= 2, s.w_km1, s.w_km2), w_km1=w_k,
            beta=beta_kp1, gamma=gamma_kp1,
            c_km2=jnp.where(it >= 2, s.c_km1, s.c_km2),
            s_km2=jnp.where(it >= 2, s.s_km1, s.s_km2),
            c_km1=jnp.real(ck), s_km1=jnp.asarray(sk, FC),
            zetabar=zetabar_next, kappa=kappa,
            rNorm=rNorm, ArNorm=ArNorm,
            iter=it, status=code, inconsistent=inconsistent,
            hist_r=hr, hist_ar=har,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:7.1e}  {:8.1e}",
                         s_new.rNorm, s_new.ArNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _usymqr_solve(
    A, b, c, x0=None, *, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "USYMQR", ("k", "‖rₖ‖", "‖Aᴴrₖ₋₁‖"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (x0 is None and not history and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (usymqr_dia_fused,
                                        usymqr_dia_fused_supported)
        if usymqr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                      stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, arnorm, code_d, incon = usymqr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c, atol, rtol,
                itmax)
            niter, code, incon = jax.device_get([niter, code_d, incon])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=bool(incon),
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _usymqr_core(
            A, b, c, x0, state, jnp.int32(cap), atol, rtol,
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
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
        inconsistent=bool(state.inconsistent),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def _usymqr_dw(A, b, c, x0, kwargs):
    from ._refine import square_ir_wrap

    def solve_fn(A_, rhs, **kw):
        return _usymqr_solve(A_, rhs, c, None, **kw)

    return square_ir_wrap("USYMQR", solve_fn, A, b, x0, kwargs)


def usymqr(A, b, c, x0=None, **kwargs):
    """x, stats = usymqr(A, b, c; ...) — rectangular systems supported.

    TPU extension: ``precision="double_word"`` — dw refinement of the
    TRUE residual b − Ax from f32 storage (consistent systems; an
    inconsistent system stalls the refinement and reports the
    machine-precision status)."""
    hit = _usymqr_dw(A, b, c, x0, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _usymqr_solve(A, b, c, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# TriLQR — Ax = b (USYMLQ) and Aᴴy = c (QR dual) simultaneously.
# ---------------------------------------------------------------------------

class TrilqrState(NamedTuple):
    x: jax.Array
    y: jax.Array
    vk: jax.Array
    vkm1: jax.Array
    uk: jax.Array
    ukm1: jax.Array
    dbar_vec: jax.Array
    w_km3: jax.Array
    w_km2: jax.Array
    beta: jax.Array
    gamma: jax.Array
    c_km1: jax.Array
    s_km1: jax.Array
    dbar_km1: jax.Array
    zeta_km1: jax.Array
    zeta_km2: jax.Array
    eta_km1: jax.Array
    zetabar: jax.Array
    psibar_km1: jax.Array
    eps_km3: jax.Array
    lam_km2: jax.Array
    kappa: jax.Array
    rNorm: jax.Array
    sNorm: jax.Array
    epsL: jax.Array
    epsQ: jax.Array
    solved_primal: jax.Array
    solved_dual: jax.Array
    solved_lq_tol: jax.Array
    solved_lq_mach: jax.Array
    solved_cg_tol: jax.Array
    solved_cg_mach: jax.Array
    solved_qr_tol: jax.Array
    solved_qr_mach: jax.Array
    solved_cg_flag: jax.Array
    inconsistent_dual: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_s: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("transfer_to_usymcg", "history", "hist_len", "callback",
                     "verbose"),
)
def _trilqr_core(
    A, b, c, x0, y0, state_in, iter_cap, atol, rtol,
    *, transfer_to_usymcg, history, hist_len, callback, verbose,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps

    if state_in is None:
        x = jnp.zeros(n, FC)
        y = jnp.zeros(m, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        s0 = c if y0 is None else c - A.rmatvec(y0)
        bNorm = knorm(r0)
        cNorm = knorm(s0)
        beta = knorm(r0)
        gamma = knorm(s0)
        vk = r0 / _safe(beta).astype(FC)
        uk = s0 / _safe(gamma).astype(FC)
        epsL = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        epsQ = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * cNorm
        zc = jnp.zeros((), FC)
        status = jnp.where((bNorm == 0) & (cNorm == 0),
                           jnp.int32(rt.ZERO_RESIDUAL), jnp.int32(rt.RUNNING))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, bNorm, history)
        hs = rt.hist_init(hist_len, T)
        hs = rt.hist_write(hs, 0, cNorm, history)
        state = TrilqrState(
            x=x, y=y, vk=vk, vkm1=jnp.zeros(m, FC), uk=uk,
            ukm1=jnp.zeros(n, FC), dbar_vec=jnp.zeros(n, FC),
            w_km3=jnp.zeros(m, FC), w_km2=jnp.zeros(m, FC),
            beta=beta, gamma=gamma,
            c_km1=-jnp.ones((), T), s_km1=zc,
            dbar_km1=zc, zeta_km1=zc, zeta_km2=zc, eta_km1=zc, zetabar=zc,
            psibar_km1=zc, eps_km3=zc, lam_km2=zc, kappa=jnp.zeros((), T),
            rNorm=bNorm, sNorm=cNorm, epsL=epsL, epsQ=epsQ,
            solved_primal=bNorm == 0, solved_dual=cNorm == 0,
            solved_lq_tol=jnp.zeros((), jnp.bool_),
            solved_lq_mach=jnp.zeros((), jnp.bool_),
            solved_cg_tol=jnp.zeros((), jnp.bool_),
            solved_cg_mach=jnp.zeros((), jnp.bool_),
            solved_qr_tol=jnp.zeros((), jnp.bool_),
            solved_qr_mach=jnp.zeros((), jnp.bool_),
            solved_cg_flag=jnp.zeros((), jnp.bool_),
            inconsistent_dual=jnp.zeros((), jnp.bool_),
            iter=jnp.int32(0), status=status, hist_r=hr, hist_s=hs,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, beta_kp1, gamma_kp1 = _ssy_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, it, FC)

        ck_g, sk_g, d_km1 = sym_givens(s.dbar_km1, s.gamma.astype(FC))
        ck = jnp.where(it == 1, -jnp.ones((), T), ck_g)
        sk = jnp.where(it == 1, jnp.zeros((), FC), jnp.asarray(sk_g, FC))
        eps_km2 = s.s_km1 * s.beta.astype(FC)
        lam2 = ck * s.beta.astype(FC) + sk * alpha
        dbar2 = jnp.conj(sk) * s.beta.astype(FC) - ck * alpha
        lam3 = -s.c_km1 * ck * s.beta.astype(FC) + sk * alpha
        dbar3 = -s.c_km1 * jnp.conj(sk) * s.beta.astype(FC) - ck * alpha
        lam_km1 = jnp.where(it == 2, lam2, lam3)
        dbar_k = jnp.where(it == 1, alpha, jnp.where(it == 2, dbar2, dbar3))

        # --- primal (USYMLQ) ---
        pm = ~s.solved_primal
        zeta_km1_new = jnp.where(pm & (it >= 2), s.eta_km1 / _safe(d_km1),
                                 s.zeta_km1)
        zeta_km2_new = jnp.where(pm & (it >= 3), s.zeta_km1, s.zeta_km2)
        eta_k = jnp.where(
            pm,
            jnp.where(it == 1, s.beta.astype(FC),
                      jnp.where(it == 2, -lam_km1 * zeta_km1_new,
                                -eps_km2 * zeta_km2_new
                                - lam_km1 * zeta_km1_new)),
            s.eta_km1)
        x_new = jnp.where(
            pm & (it >= 2),
            s.x + (zeta_km1_new * ck).astype(FC) * s.dbar_vec
            + (zeta_km1_new * sk) * s.uk,
            s.x)
        dbar_vec_new = jnp.where(
            pm,
            jnp.where(it == 1, s.uk,
                      jnp.conj(sk) * s.dbar_vec - ck.astype(FC) * s.uk),
            s.dbar_vec)

        mu = s.beta.astype(FC) * (s.s_km1 * zeta_km2_new
                                  - s.c_km1 * ck * zeta_km1_new) \
            + alpha * sk * zeta_km1_new
        om = beta_kp1.astype(FC) * sk * zeta_km1_new
        rNorm_lq = jnp.where(it == 1, s.rNorm,
                             jnp.sqrt(jnp.abs(mu) ** 2 + jnp.abs(om) ** 2))
        rNorm_lq = jnp.where(pm, rNorm_lq, s.rNorm)

        dbar_ok = jnp.abs(dbar_k) > eps_T
        zetabar = jnp.where(pm & dbar_ok, eta_k / _safe(dbar_k), s.zetabar)
        rho = beta_kp1.astype(FC) * (sk * zeta_km1_new - ck * zetabar)
        rNorm_cg = jnp.abs(rho)

        solved_lq_tol = jnp.where(pm, rNorm_lq <= s.epsL, s.solved_lq_tol)
        solved_lq_mach = jnp.where(pm, (rNorm_lq + 1.0) <= 1.0, s.solved_lq_mach)
        solved_cg_tol = jnp.where(
            pm, transfer_to_usymcg & dbar_ok & (rNorm_cg <= s.epsL),
            s.solved_cg_tol)
        solved_cg_mach = jnp.where(
            pm, transfer_to_usymcg & dbar_ok & ((rNorm_cg + 1.0) <= 1.0),
            s.solved_cg_mach)
        solved_lq = solved_lq_tol | solved_lq_mach
        solved_cg = solved_cg_tol | solved_cg_mach
        solved_primal = s.solved_primal | solved_lq | solved_cg

        # --- dual (QR on Aᴴy = c; reference trilqr :325-385) ---
        dm = ~s.solved_dual
        psi_km1 = jnp.where(it == 1, jnp.zeros((), FC),
                            ck.astype(FC) * s.psibar_km1)
        psibar_k = jnp.where(it == 1, s.gamma.astype(FC), sk * s.psibar_km1)
        w2d = s.vkm1 / _safe(jnp.conj(d_km1))
        w3d = (s.vkm1 - jnp.conj(s.lam_km2) * s.w_km2) / _safe(jnp.conj(d_km1))
        w4d = (s.vkm1 - jnp.conj(s.lam_km2) * s.w_km2
               - jnp.conj(s.eps_km3) * s.w_km3) / _safe(jnp.conj(d_km1))
        w_km1d = jnp.where(it == 2, w2d, jnp.where(it == 3, w3d, w4d))
        y_new = jnp.where(dm & (it >= 2), s.y + psi_km1 * w_km1d, s.y)
        sNorm = jnp.where(dm, jnp.abs(psibar_k), s.sNorm)
        AsNorm = jnp.abs(psibar_k) * jnp.sqrt(
            jnp.abs(dbar_k) ** 2 + jnp.abs(ck * beta_kp1) ** 2)
        kappa = jnp.where(it == 1,
                          jnp.asarray(atol, T) + jnp.asarray(rtol, T) * AsNorm,
                          s.kappa)
        solved_qr_tol = jnp.where(dm, sNorm <= s.epsQ, s.solved_qr_tol)
        solved_qr_mach = jnp.where(dm, (sNorm + 1.0) <= 1.0, s.solved_qr_mach)
        inconsistent_dual = jnp.where(dm, AsNorm <= kappa, s.inconsistent_dual)
        solved_dual = s.solved_dual | solved_qr_tol | solved_qr_mach \
            | inconsistent_dual

        # Advance vectors.
        vk_new = jnp.where(beta_kp1 != 0, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(gamma_kp1 != 0, p / _safe(gamma_kp1).astype(FC),
                           s.uk)

        code = jnp.where(solved_primal & solved_dual,
                         jnp.int32(rt.SOLVED_PRIMAL_DUAL),
                         jnp.int32(rt.RUNNING))
        hr = rt.hist_write(s.hist_r, it, jnp.where(pm, rNorm_lq, jnp.nan),
                           history)
        hs = rt.hist_write(s.hist_s, it, jnp.where(dm, sNorm, jnp.nan),
                           history)
        s_new = s._replace(
            x=x_new, y=y_new, vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            dbar_vec=dbar_vec_new,
            w_km3=jnp.where(it >= 2, s.w_km2, s.w_km3),
            w_km2=jnp.where(it >= 2, w_km1d, s.w_km2),
            beta=beta_kp1, gamma=gamma_kp1,
            c_km1=ck, s_km1=sk, dbar_km1=dbar_k,
            zeta_km1=zeta_km1_new, zeta_km2=zeta_km2_new, eta_km1=eta_k,
            zetabar=zetabar, psibar_km1=psibar_k,
            eps_km3=jnp.where(it >= 3, eps_km2, s.eps_km3),
            lam_km2=jnp.where(it >= 2, lam_km1, s.lam_km2),
            kappa=kappa, rNorm=rNorm_lq, sNorm=sNorm,
            solved_primal=solved_primal, solved_dual=solved_dual,
            solved_lq_tol=solved_lq_tol, solved_lq_mach=solved_lq_mach,
            solved_cg_tol=solved_cg_tol, solved_cg_mach=solved_cg_mach,
            solved_qr_tol=solved_qr_tol, solved_qr_mach=solved_qr_mach,
            solved_cg_flag=s.solved_cg_flag
            | (solved_cg & ~s.solved_primal & ~solved_lq),
            inconsistent_dual=inconsistent_dual,
            iter=it, status=code, hist_r=hr, hist_s=hs,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:7.1e}  {:7.1e}",
                         s_new.rNorm, s_new.sNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    state = jax.lax.while_loop(cond, body, state)
    x_final = jnp.where(state.solved_cg_flag,
                        state.x + state.zetabar * state.dbar_vec, state.x)
    return state._replace(x=x_final)


def _trilqr_status(state, code):
    from .bilq import _bilqr_status
    status = _bilqr_status(state, code)
    if status != "unknown":
        return status
    # Documented deviation (reference src/trilqr.jl:429-444): when the dual
    # system Aᴴy = c is detected INCONSISTENT (AsNorm ≤ ξ) without the
    # qr_tol/qr_mach tests firing, the reference's status chain has a hole
    # and leaves the pre-loop initializer "unknown".  We emit an explicit
    # status instead, phrased with the reference's least-squares vocabulary
    # (src/usymqr.jl "found approximate least-squares solution").
    if bool(getattr(state, "inconsistent_dual", False)):
        lq = bool(state.solved_lq_tol) or bool(state.solved_lq_mach)
        cg = bool(state.solved_cg_tol) or bool(state.solved_cg_mach)
        if lq or cg:
            pt = "xᶜ" if cg and not lq else "xᴸ"
            return (f"Found a primal solution {pt} and an approximate "
                    "least-squares dual solution t (dual system inconsistent)")
        return ("Only found an approximate least-squares dual solution t "
                "(dual system inconsistent)")
    return status


def _trilqr_solve(
    A, b, c, x0=None, y0=None, *, transfer_to_usymcg=True, atol=None,
    rtol=None, itmax=0, timemax=float("inf"), verbose=0, history=False,
    callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "TRILQR", ("k", "‖rₖ‖", "‖sₖ‖"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (x0 is None and y0 is None and not history and callback is None
            and verbose == 0 and timemax == float("inf") and m == n
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (trilqr_dia_fused,
                                        trilqr_dia_fused_supported)
        if trilqr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                      stencil_dtype=A._pd.dtype):
            import types
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, snorm, code_d, flags = trilqr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c, atol, rtol,
                itmax, transfer_to_usymcg=bool(transfer_to_usymcg))
            niter, code, flags = jax.device_get([niter, code_d, flags])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            fl = [bool(v) for v in flags]
            shim = types.SimpleNamespace(
                solved_lq_tol=fl[0], solved_lq_mach=fl[1],
                solved_cg_tol=fl[2], solved_cg_mach=fl[3],
                solved_qr_tol=fl[4], solved_qr_mach=fl[5],
                solved_primal=fl[6], solved_dual=fl[7],
                inconsistent_dual=fl[8] if len(fl) > 8 else False,
                breakdown=False)
            stats = AdjointStats(
                niter=niter,
                solved_primal=fl[6], solved_dual=fl[7],
                residuals_primal=np.zeros(0),
                residuals_dual=np.zeros(0),
                timer=time.perf_counter() - start,
                status=_trilqr_status(shim, code),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _trilqr_core(
            A, b, c, x0, y0, state, jnp.int32(cap), atol, rtol,
            transfer_to_usymcg=bool(transfer_to_usymcg),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    y = jnp.asarray(state.y)
    if x0 is not None:
        x = x + x0
    if y0 is not None:
        y = y + y0

    def _trim(h):
        h = np.asarray(h)[: niter + 1]
        return h[~np.isnan(h)]

    class _StView:
        # adapter so _bilqr_status can read the flags
        breakdown = False
    sv = _StView()
    for f in ("solved_lq_tol", "solved_lq_mach", "solved_cg_tol",
              "solved_cg_mach", "solved_qr_tol", "solved_qr_mach",
              "solved_primal", "solved_dual", "inconsistent_dual"):
        setattr(sv, f, getattr(state, f))
    status = _trilqr_status(sv, code)

    stats = AdjointStats(
        niter=niter,
        solved_primal=bool(state.solved_primal),
        solved_dual=bool(state.solved_dual),
        residuals_primal=_trim(state.hist_r) if history else np.zeros(0),
        residuals_dual=_trim(state.hist_s) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=status,
    )
    return x, y, stats, state


def trilqr(A, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = trilqr(A, b, c) — Ax = b and Aᴴy = c, A rectangular.

    TPU extension: ``precision="double_word"`` — dw refinement of both
    TRUE residuals (b − Ax, c − Aᴴy) from f32 storage; returns
    AdjointStats with per-system certificates."""
    from ._refine import adjoint_dw
    hit = adjoint_dw("TRILQR", _trilqr_solve, A, b, c, x0, y0, kwargs,
                     primal_pt="xᴸ")
    if hit is not None:
        return hit
    x, y, stats, _ = _trilqr_solve(A, b, c, x0, y0, **kwargs)
    return x, y, stats


# ---------------------------------------------------------------------------
# USYMLQR — symmetric saddle-point [I A; Aᴴ 0][x; y] = [b; c].
# Reference src/usymlqr.jl (Buttari, Orban, Ruiz, Titley-Peloquin 2019):
# one Saunders-Simon-Yip tridiagonalization drives a USYMQR-style
# least-squares solve of [I A; Aᴴ 0][r; s] = [b; 0] (when ls=true) and a
# USYMLQ-style least-norm solve of [I A; Aᴴ 0][w; z] = [0; c] (when
# ln=true); the saddle-point solution is the sum of the two parts.
# ---------------------------------------------------------------------------

class UsymlqrState(NamedTuple):
    x: jax.Array          # LN primal accumulator xᴸ (length m)
    r: jax.Array          # LS residual vector rₖ (length m)
    y: jax.Array          # LS solution accumulator yₖ = Wₖfₖ (length n)
    z: jax.Array          # LN accumulator zᴸ (length n)
    vk: jax.Array
    vkm1: jax.Array
    uk: jax.Array
    ukm1: jax.Array
    w_km1: jax.Array      # column k-1 of Wₖ = Uₖ Rₖ⁻¹ (length n)
    w_km2: jax.Array
    dbar_vec: jax.Array   # last column of D̄ₖ = Vₖ Qₖ₋₁ᴴ (length m)
    beta: jax.Array
    gamma: jax.Array
    c_km2: jax.Array
    s_km2: jax.Array
    c_km1: jax.Array
    s_km1: jax.Array
    phibar: jax.Array     # last component of f̄ₖ = Qₖᴴ β₁e₁
    zeta_km1: jax.Array   # trailing components of h̄ₖ = R̄ₖ⁻ᴴ γ₁e₁
    zeta_km2: jax.Array
    eta_km1: jax.Array
    delta_km1: jax.Array
    kappa: jax.Array
    rNorm_ls: jax.Array
    rNorm_ln: jax.Array
    AHrNorm: jax.Array
    eps_ls: jax.Array
    eps_ln: jax.Array
    solved_ls: jax.Array
    solved_ln: jax.Array
    inconsistent: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ls", "ln", "history", "hist_len", "callback",
                     "verbose"),
)
def _usymlqr_core(
    A, b, c, x0, y0, state_in, iter_cap, atol, rtol,
    *, ls, ln, history, hist_len, callback, verbose,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)

    if state_in is None:
        # Warm start folds the guess into the right-hand sides:
        # b₀ = b - Δx - AΔy, c₀ = c - AᴴΔx (reference usymlqr.jl:178-185).
        b0 = b
        c0 = c
        if y0 is not None:
            b0 = b0 - A.matvec(y0)
        if x0 is not None:
            b0 = b0 - x0
            c0 = c0 - A.rmatvec(x0)
        beta = knorm(b0)
        gamma = knorm(c0)
        vk = jnp.where(beta != 0, b0 / _safe(beta).astype(FC),
                       jnp.zeros(m, FC))
        uk = jnp.where(gamma != 0, c0 / _safe(gamma).astype(FC),
                       jnp.zeros(n, FC))
        eps_ls = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        eps_ln = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * gamma
        solved_ls = (not ls) | (beta <= eps_ls)
        solved_ln = (not ln) | (gamma <= eps_ln)
        zc = jnp.zeros((), FC)
        status = jnp.where(solved_ls & solved_ln, jnp.int32(rt.SOLVED),
                           jnp.int32(rt.RUNNING))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta if ls else gamma, history)
        har = rt.hist_init(hist_len, T)
        state = UsymlqrState(
            x=jnp.zeros(m, FC),
            r=b0 if ls else jnp.zeros(m, FC),
            y=jnp.zeros(n, FC), z=jnp.zeros(n, FC),
            vk=vk, vkm1=jnp.zeros(m, FC), uk=uk, ukm1=jnp.zeros(n, FC),
            w_km1=jnp.zeros(n, FC), w_km2=jnp.zeros(n, FC),
            dbar_vec=jnp.zeros(m, FC),
            beta=beta, gamma=gamma,
            c_km2=-jnp.ones((), T), s_km2=zc,
            c_km1=-jnp.ones((), T), s_km1=zc,
            phibar=beta.astype(FC), zeta_km1=zc, zeta_km2=zc,
            eta_km1=zc, delta_km1=zc,
            kappa=jnp.zeros((), T), rNorm_ls=beta, rNorm_ln=gamma,
            AHrNorm=jnp.asarray(jnp.inf, T),
            eps_ls=eps_ls, eps_ln=eps_ln,
            solved_ls=solved_ls, solved_ln=solved_ln,
            inconsistent=jnp.zeros((), jnp.bool_),
            iter=jnp.int32(0), status=status, hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, beta_kp1, gamma_kp1 = _ssy_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, it, FC)

        # QR of the SSY tridiagonal Tₖ₊₁.ₖ, two previous reflections then
        # a new one (reference usymlqr.jl:286-313).  With the (-1, 0)
        # initial cosines/sines the k=1,2 special cases are branchless:
        # ϵₖ₋₂ = 0 and λ̄ₖ₋₁ = γₖ fall out of the same formulas.
        gam = s.gamma.astype(FC)
        eps_km2 = s.s_km2 * gam
        lambdabar = -s.c_km2.astype(FC) * gam
        lam_km1 = s.c_km1.astype(FC) * lambdabar + s.s_km1 * alpha
        deltabar = jnp.conj(s.s_km1) * lambdabar - s.c_km1.astype(FC) * alpha
        ck, sk, delta = sym_givens(deltabar, beta_kp1.astype(FC))

        # wₖ = (uₖ - λₖ₋₁wₖ₋₁ - ϵₖ₋₂wₖ₋₂) / δₖ; the k<3 terms vanish
        # because w₋₁ = w₀ = 0 and ϵ₋₁ = 0.
        w_new = (s.uk - lam_km1 * s.w_km1 - eps_km2 * s.w_km2) \
            / _safe(delta).astype(FC)

        # --- least-squares part (reference usymlqr.jl:334-367) ---
        als = ls & ~s.solved_ls
        phi = ck.astype(FC) * s.phibar
        phibar_next = jnp.conj(sk) * s.phibar
        y_new = jnp.where(als, s.y + phi * w_new, s.y)
        rfac = jnp.where(beta_kp1 != 0,
                         -ck.astype(FC) * phibar_next
                         / _safe(beta_kp1).astype(FC),
                         jnp.zeros((), FC))
        r_new = jnp.where(als, jnp.abs(sk) ** 2 * s.r + rfac * q, s.r)
        rNorm_ls = jnp.where(als, jnp.abs(phibar_next), s.rNorm_ls)
        AHrNorm = jnp.where(
            als,
            jnp.abs(s.phibar) * jnp.sqrt(
                jnp.abs(deltabar) ** 2
                + jnp.abs(s.c_km1 * gamma_kp1) ** 2),
            s.AHrNorm)
        kappa = jnp.where(
            ls & (it == 1),
            jnp.asarray(atol, T) + jnp.asarray(rtol, T) * AHrNorm, s.kappa)
        solved_ls_new = s.solved_ls | (als & (rNorm_ls <= s.eps_ls))
        inconsistent = jnp.where(
            als, ~(rNorm_ls <= s.eps_ls) & (AHrNorm <= kappa),
            s.inconsistent)
        phibar_new = jnp.where(als, phibar_next, s.phibar)

        # --- least-norm part (reference usymlqr.jl:370-436) ---
        aln = ln & ~s.solved_ln
        zeta_km1_new = jnp.where(aln & (it >= 2),
                                 s.eta_km1 / jnp.conj(_safe(s.delta_km1)),
                                 s.zeta_km1)
        zeta_km2_new = jnp.where(aln & (it >= 3), s.zeta_km1, s.zeta_km2)
        eta = jnp.where(
            aln,
            jnp.where(it == 1, gam,
                      -jnp.conj(eps_km2) * zeta_km2_new
                      - jnp.conj(lam_km1) * zeta_km1_new),
            s.eta_km1)
        x_new = jnp.where(
            aln & (it >= 2),
            s.x + zeta_km1_new * s.c_km1.astype(FC) * s.dbar_vec
            + zeta_km1_new * jnp.conj(s.s_km1) * s.vk,
            s.x)
        z_new = jnp.where(aln & (it >= 2), s.z - zeta_km1_new * s.w_km1,
                          s.z)
        dbar_vec_new = jnp.where(
            aln,
            jnp.where(it == 1, s.vk,
                      s.s_km1 * s.dbar_vec - s.c_km1.astype(FC) * s.vk),
            s.dbar_vec)
        mu = gam * (jnp.conj(s.s_km2) * zeta_km2_new
                    - s.c_km2.astype(FC) * s.c_km1.astype(FC) * zeta_km1_new) \
            + jnp.conj(alpha * s.s_km1) * zeta_km1_new
        om = gamma_kp1.astype(FC) * jnp.conj(s.s_km1) * zeta_km1_new
        rNorm_ln = jnp.where(
            aln & (it >= 2),
            jnp.sqrt(jnp.abs(mu) ** 2 + jnp.abs(om) ** 2), s.rNorm_ln)
        solved_ln_new = s.solved_ln | (aln & (rNorm_ln <= s.eps_ln))
        eta_km1_new = jnp.where(aln, eta, s.eta_km1)

        # Advance the SSY basis; zero on breakdown keeps orthogonality
        # (reference usymlqr.jl:440-455).
        vk_new = jnp.where(beta_kp1 != 0, q / _safe(beta_kp1).astype(FC),
                           jnp.zeros(m, FC))
        uk_new = jnp.where(gamma_kp1 != 0, p / _safe(gamma_kp1).astype(FC),
                           jnp.zeros(n, FC))

        solved = solved_ls_new & solved_ln_new
        code = jnp.where(
            solved, jnp.int32(rt.SOLVED),
            jnp.where(inconsistent, jnp.int32(rt.INCONSISTENT),
                      jnp.int32(rt.RUNNING)))
        hr = rt.hist_write(
            s.hist_r, it, rNorm_ls if ls else rNorm_ln, history)
        har = rt.hist_write(s.hist_ar, it,
                            jnp.where(ls, AHrNorm, jnp.nan), history)
        s_new = s._replace(
            x=x_new, r=r_new, y=y_new, z=z_new,
            vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            w_km1=w_new, w_km2=s.w_km1, dbar_vec=dbar_vec_new,
            beta=beta_kp1, gamma=gamma_kp1,
            c_km2=s.c_km1, s_km2=s.s_km1, c_km1=ck,
            s_km1=jnp.asarray(sk, FC),
            phibar=phibar_new, zeta_km1=zeta_km1_new,
            zeta_km2=zeta_km2_new, eta_km1=eta_km1_new, delta_km1=delta,
            kappa=kappa, rNorm_ls=rNorm_ls, rNorm_ln=rNorm_ln,
            AHrNorm=AHrNorm,
            solved_ls=solved_ls_new, solved_ln=solved_ln_new,
            inconsistent=inconsistent,
            iter=it, status=code, hist_r=hr, hist_ar=har,
        )
        if verbose > 0:
            # reference column set src/usymlqr.jl:239 (timer omitted)
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}",
                         beta_kp1, gamma_kp1, s_new.rNorm_ls,
                         s_new.rNorm_ln)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    state = jax.lax.while_loop(cond, body, state)
    # Saddle-point composition x ← xᴸ + r, y ← yₖ + zᴸ
    # (reference usymlqr.jl:494-497).
    return state._replace(x=state.x + state.r, y=state.y + state.z)


def _usymlqr_solve(
    A, b, c, x0=None, y0=None, *, ls=True, ln=True, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
    **_ig,
):
    """Core USYMLQR driver (reference src/usymlqr.jl:136-510).

    Solves [I A; Aᴴ 0][x; y] = [b; c] with x ∈ ℂᵐ, y ∈ ℂⁿ.  `ls`/`ln`
    select the least-squares and least-norm subproblems; the returned
    pair is the sum of the selected parts.  Deviations from the
    reference: on an inconsistent least-squares exit we report
    "system probably inconsistent" and set stats.inconsistent (the
    reference leaves status "unknown" there); history interleaving is
    replaced by residuals ← LS norms (LN norms when ls=false) and
    Aresiduals ← ‖Aᴴr‖ estimates.
    """
    start = time.perf_counter()
    if not (ls or ln):
        raise ValueError(
            "The keyword arguments `ls` and `ln` can't be both `false`.")
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    if b.shape[0] != m or c.shape[0] != n:
        raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "USYMLQR",
                   ("k", "βₖ₊₁", "γₖ₊₁", "‖rₖ‖_LS", "‖rₖ‖_LN"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (x0 is None and y0 is None and not history and callback is None
            and verbose == 0 and timemax == float("inf") and m == n
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (usymlqr_dia_fused,
                                        usymlqr_dia_fused_supported)
        if usymlqr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                       stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            (x, y, niter, rls, rln, code_d,
             incon) = usymlqr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c, atol, rtol,
                itmax, ls=bool(ls), ln=bool(ln))
            niter, code, incon = jax.device_get([niter, code_d, incon])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=code == rt.INCONSISTENT,
                residuals=np.zeros(0), Aresiduals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, {}),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _usymlqr_core(
            A, b, c, x0, y0, state, jnp.int32(cap), atol, rtol,
            ls=bool(ls), ln=bool(ln), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    y = jnp.asarray(state.y)
    if x0 is not None:
        x = x + x0
    if y0 is not None:
        y = y + y0

    def _trim(h):
        h = np.asarray(h)[: niter + 1]
        return h[~np.isnan(h)]

    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=code == rt.INCONSISTENT,
        residuals=_trim(state.hist_r) if history else np.zeros(0),
        Aresiduals=_trim(state.hist_ar) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, {}),
    )
    return x, y, stats, state


def _usymlqr_dw(A, b, c, x0, y0, kwargs):
    """``precision="double_word"`` for USYMLQR's saddle-point system
    [I A; Aᴴ 0][x; y] = [b; c]: kind="sqd" with τ=1, ν=0.

    Inner corrections use TriMR's ``sp`` preset — the identical system —
    rather than USYMLQR itself: USYMLQR's split LS/LN sweeps stop on
    per-sweep criteria whose f32 floors sit above the correction
    tolerance (measured: stalls at ~5e-6 true residual), while the
    monolithic TriMR residual drives the same system to the inner
    tolerance (cf. _ls_ir, which uses TriMR inners for the same reason).
    """
    from ._refine import pair_ir_wrap
    from .tricg import _trimr_solve

    def inner(Aop, f1, f2, rtol_i, it_left, time_left):
        dx, dy, st, _ = _trimr_solve(Aop, f1, f2, atol=0.0, rtol=rtol_i,
                                     itmax=it_left, timemax=time_left,
                                     sp=True)
        return dx, dy, st.niter

    return pair_ir_wrap("USYMLQR", inner, A, b, c, kwargs, kind="sqd",
                        tau=1.0, nu=0.0, x0=x0, y0=y0,
                        reject={"ls": True, "ln": True},
                        # ν=0 saddle corrections converge at the
                        # κ(A)²-grade rate (cf. _ls_ir) — budget wider
                        itmax_scale=16)


def usymlqr(A, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = usymlqr(A, b, c; ls, ln) — saddle-point pair.

    Solves the symmetric saddle-point system [I A; Aᴴ 0][x; y] = [b; c]
    via the Saunders-Simon-Yip tridiagonalization: a USYMQR-style
    least-squares sweep and a USYMLQ-style least-norm sweep share one
    SSY process (reference src/usymlqr.jl).  Warm starts accept
    (x0, y0); returns SimpleStats.

    TPU extension: ``precision="double_word"`` — dw refinement of the
    saddle block residuals (b − x − Ay, c − Aᴴx) to fp64-grade accuracy
    from f32 storage.
    """
    hit = _usymlqr_dw(A, b, c, x0, y0, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _usymlqr_solve(A, b, c, x0, y0, **kwargs)
    return x, y, stats
