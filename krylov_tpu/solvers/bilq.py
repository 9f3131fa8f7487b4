"""BiLQ, QMR and BiLQR — Lanczos biorthogonalization methods.

Parity with reference src/bilq.jl (LQ of Tₖ, transfer_to_bicg),
src/qmr.jl (QR of Tₖ₊₁.ₖ) and src/bilqr.jl (adjoint systems Ax = b and
Aᴴy = c from one process; AdjointStats with the full combined status
vocabulary).  All three share the two-sided Lanczos step (1 A-product
and 1 Aᴴ-product per iteration).
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
from ..ops.kops import kdot, kdotr, knorm, sym_givens
from ..stats import SimpleStats, AdjointStats

BC_BREAKDOWN = 29          # shared with bicgstab: "Breakdown bᴴc = 0"
UV_BREAKDOWN = 38          # "Breakdown ⟨uₖ₊₁,vₖ₊₁⟩ = 0"
SOLVED_LQ_PT = 35          # shared with symmlq codes
SOLVED_CG_PT2 = 36
_STATUS = {
    BC_BREAKDOWN: "Breakdown bᴴc = 0",
    UV_BREAKDOWN: "Breakdown ⟨uₖ₊₁,vₖ₊₁⟩ = 0",
    SOLVED_LQ_PT: "solution xᴸ good enough given atol and rtol",
    SOLVED_CG_PT2: "solution xᶜ good enough given atol and rtol",
}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


def _bi_lanczos_step(A, vk, uk, vkm1, ukm1, beta_k, gamma_k, FC):
    """One step of the two-sided Lanczos process (reference bilq :230-260).
    Returns (q, p, alpha, pHq, beta_kp1, gamma_kp1)."""
    q = A.matvec(vk)
    p = A.rmatvec(uk)
    q = q - gamma_k * vkm1
    p = p - jnp.conj(beta_k) * ukm1
    alpha = kdot(uk, q)
    q = q - alpha * vk
    p = p - jnp.conj(alpha) * uk
    pHq = kdot(p, q)
    beta_kp1 = jnp.sqrt(jnp.abs(pHq))
    gamma_kp1 = pHq / _safe(beta_kp1).astype(FC)
    return q, p, alpha, pHq, beta_kp1, gamma_kp1


# ---------------------------------------------------------------------------
# BiLQ
# ---------------------------------------------------------------------------

class BilqState(NamedTuple):
    x: jax.Array
    vk: jax.Array
    vkm1: jax.Array
    uk: jax.Array
    ukm1: jax.Array
    dbar_vec: jax.Array
    beta: jax.Array          # βₖ (FC: carries the complex phase convention)
    gamma: jax.Array
    c_km1: jax.Array
    s_km1: jax.Array
    dbar_km1: jax.Array
    zeta_km1: jax.Array
    zeta_km2: jax.Array
    eta_km1: jax.Array
    zetabar: jax.Array
    norm_vk: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    solved_cg_flag: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("transfer_to_bicg", "history", "hist_len", "callback",
                     "verbose"),
)
def _bilq_core(
    A, b, c, x0, state_in, iter_cap, atol, rtol,
    *, transfer_to_bicg, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        bNorm = knorm(r0)
        cHb = kdot(c, r0)
        beta = jnp.sqrt(jnp.abs(cHb)).astype(FC)
        gamma = cHb / _safe(beta)
        vk = r0 / _safe(beta)
        uk = c / _safe(jnp.conj(gamma))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        status = jnp.where(
            bNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(cHb == 0, jnp.int32(BC_BREAKDOWN),
                      jnp.where(bNorm <= eps_lim, jnp.int32(SOLVED_LQ_PT),
                                jnp.int32(rt.RUNNING))))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, bNorm, history)
        zc = jnp.zeros((), FC)
        state = BilqState(
            x=x, vk=vk, vkm1=jnp.zeros(n, FC), uk=uk, ukm1=jnp.zeros(n, FC),
            dbar_vec=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            c_km1=-jnp.ones((), T), s_km1=zc,
            dbar_km1=zc, zeta_km1=zc, zeta_km2=zc, eta_km1=zc, zetabar=zc,
            norm_vk=bNorm / _safe(jnp.abs(beta)),
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
        q, p, alpha, pHq, beta_kp1, gamma_kp1 = _bi_lanczos_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, FC)

        # LQ factorization of Tₖ (reference :262-288).  At iter 1 no
        # rotation is computed: c, s keep their init values (-1, 0).
        ck_g, sk_g, d_km1 = sym_givens(s.dbar_km1, s.gamma)
        ck = jnp.where(it == 1, -jnp.ones((), T), ck_g)
        sk = jnp.where(it == 1, jnp.zeros((), FC), jnp.asarray(sk_g, FC))
        eps_km2 = s.s_km1 * s.beta
        lam2 = ck * s.beta + sk * alpha
        dbar2 = jnp.conj(sk) * s.beta - ck * alpha
        lam3 = -s.c_km1 * ck * s.beta + sk * alpha
        dbar3 = -s.c_km1 * jnp.conj(sk) * s.beta - ck * alpha
        lam_km1 = jnp.where(it == 2, lam2, lam3)
        dbar_k = jnp.where(it == 1, alpha, jnp.where(it == 2, dbar2, dbar3))

        # z̅ₖ components.
        eta1 = s.beta  # it == 1: ηₖ = β₁ (β is FC)
        zeta_km1_new = jnp.where(it >= 2, s.eta_km1 / _safe(d_km1), s.zeta_km1)
        zeta_km2_new = jnp.where(it >= 3, s.zeta_km1, s.zeta_km2)
        eta_k = jnp.where(
            it == 1, eta1,
            jnp.where(it == 2, -lam_km1 * zeta_km1_new,
                      -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new))

        # Directions and x update.
        x_new = jnp.where(
            it >= 2,
            s.x + (zeta_km1_new * ck).astype(FC) * s.dbar_vec
            + (zeta_km1_new * sk).astype(FC) * s.vk,
            s.x)
        dbar_vec_new = jnp.where(
            it == 1, s.vk,
            jnp.conj(sk).astype(FC) * s.dbar_vec - ck.astype(FC) * s.vk)

        # Advance the Lanczos vectors.
        nz = pHq != 0
        vk_new = jnp.where(nz, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(nz, p / _safe(jnp.conj(gamma_kp1)), s.uk)
        vkm1_new = s.vk
        ukm1_new = s.uk

        vHv = kdot(vkm1_new, vk_new)
        norm_vkp1 = knorm(vk_new)

        mu = s.beta * (s.s_km1 * zeta_km2_new - s.c_km1 * ck * zeta_km1_new) \
            + alpha * sk * zeta_km1_new
        om = beta_kp1.astype(FC) * sk * zeta_km1_new
        th = jnp.conj(mu) * om * vHv
        rNorm_lq = jnp.where(
            it == 1, s.rNorm,
            jnp.sqrt(jnp.abs(mu) ** 2 * s.norm_vk ** 2
                     + jnp.abs(om) ** 2 * norm_vkp1 ** 2 + 2 * jnp.real(th)))

        dbar_ok = jnp.abs(dbar_k) > eps_T
        zetabar = jnp.where(dbar_ok, eta_k / _safe(dbar_k), s.zetabar)
        rho = beta_kp1.astype(FC) * (sk * zeta_km1_new - ck * zetabar)
        rNorm_cg = jnp.abs(rho) * norm_vkp1

        solved_lq = rNorm_lq <= s.eps_lim
        solved_cg = transfer_to_bicg & dbar_ok & (rNorm_cg <= s.eps_lim)
        breakdown = (~solved_lq) & (~solved_cg) & (pHq == 0)

        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(UV_BREAKDOWN), code)
        code = jnp.where(solved_lq, jnp.int32(SOLVED_LQ_PT), code)
        code = jnp.where(solved_cg & ~solved_lq, jnp.int32(SOLVED_CG_PT2), code)

        hist = rt.hist_write(s.hist_r, it, rNorm_lq, history)
        s_new = s._replace(
            x=x_new, vk=vk_new, vkm1=vkm1_new, uk=uk_new, ukm1=ukm1_new,
            dbar_vec=dbar_vec_new,
            beta=beta_kp1.astype(FC), gamma=gamma_kp1,
            c_km1=ck, s_km1=jnp.asarray(sk, FC),
            dbar_km1=dbar_k, zeta_km1=zeta_km1_new, zeta_km2=zeta_km2_new,
            eta_km1=eta_k, zetabar=zetabar,
            norm_vk=norm_vkp1, rNorm=rNorm_lq, iter=it, status=code,
            solved_cg_flag=solved_cg & ~solved_lq, hist_r=hist,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}",
                         jnp.abs(alpha), s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    state = jax.lax.while_loop(cond, body, state)
    x_final = jnp.where(
        state.solved_cg_flag,
        state.x + state.zetabar * state.dbar_vec,
        state.x,
    )
    return state._replace(x=x_final)


def _bilq_solve(
    A, b, x0=None, *, c=None, transfer_to_bicg=True, atol=None, rtol=None,
    itmax=0, timemax=float("inf"), verbose=0, history=False, callback=None,
    **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    n = b.shape[0]
    if A.shape is not None and A.shape[0] != A.shape[1]:
        raise ValueError("System must be square")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "BILQ", ("k", "αₖ", "‖rₖ‖"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config (c = b, no warm start:
    # the kernel's shadow vector is its initial residual) → fused kernel.
    if (c is None and x0 is None and callback is None and verbose == 0
            and not history and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (bilq_dia_fused,
                                        bilq_dia_fused_supported)
        if bilq_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, code_d = bilq_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, atol, rtol,
                itmax, transfer_to_bicg=bool(transfer_to_bicg))
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

    c = b if c is None else jnp.asarray(c, dtype=b.dtype)

    def run(state, cap):
        return _bilq_core(
            A, b, c, x0, state, jnp.int32(cap), atol, rtol,
            transfer_to_bicg=bool(transfer_to_bicg), history=bool(history),
            hist_len=hist_len, callback=callback, verbose=int(verbose),
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


def bilq(A, b, x0=None, **kwargs):
    """x, stats = bilq(A, b; c=b, transfer_to_bicg=True, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (no custom shadow c)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("BILQ", _bilq_solve, A, b, x0, kwargs,
                         reject={"c": None})
    if hit is not None:
        return hit
    x, stats, _ = _bilq_solve(A, b, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# QMR
# ---------------------------------------------------------------------------

class QmrState(NamedTuple):
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
    tau: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("history", "hist_len", "callback", "verbose"),
)
def _qmr_core(
    A, b, c, x0, state_in, iter_cap, atol, rtol,
    *, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        bNorm = knorm(r0)
        cHb = kdot(c, r0)
        beta = jnp.sqrt(jnp.abs(cHb)).astype(FC)
        gamma = cHb / _safe(beta)
        vk = r0 / _safe(beta)
        uk = c / _safe(jnp.conj(gamma))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        status = jnp.where(
            bNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(cHb == 0, jnp.int32(BC_BREAKDOWN),
                      jnp.where(bNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                jnp.int32(rt.RUNNING))))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, bNorm, history)
        zc = jnp.zeros((), FC)
        state = QmrState(
            x=x, vk=vk, vkm1=jnp.zeros(n, FC), uk=uk, ukm1=jnp.zeros(n, FC),
            w_km2=jnp.zeros(n, FC), w_km1=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            c_km2=jnp.zeros((), T), s_km2=zc,
            c_km1=jnp.zeros((), T), s_km1=zc,
            # r₀ = β₁v₁ exactly, so ζbar₁ = β₁ (≠ ‖r₀‖ when c ≠ r₀).
            zetabar=beta, tau=bNorm * bNorm / jnp.abs(_safe(beta)) ** 2,
            rNorm=bNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, pHq, beta_kp1, gamma_kp1 = _bi_lanczos_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, FC)

        # QR of Tₖ₊₁.ₖ (reference :276-300).
        eps_km2 = jnp.where(it >= 3, s.s_km2 * s.gamma, jnp.zeros((), FC))
        lbar_km1 = jnp.where(it >= 3, -s.c_km2.astype(FC) * s.gamma,
                             jnp.where(it == 2, s.gamma, jnp.zeros((), FC)))
        lam_km1 = jnp.where(it >= 2,
                            s.c_km1.astype(FC) * lbar_km1 + s.s_km1 * alpha,
                            jnp.zeros((), FC))
        dbar_k = jnp.where(it >= 2,
                           jnp.conj(s.s_km1) * lbar_km1
                           - s.c_km1.astype(FC) * alpha,
                           alpha)
        ck, sk, d_k = sym_givens(dbar_k, beta_kp1.astype(FC))
        zeta_k = ck.astype(FC) * s.zetabar
        zetabar_next = jnp.conj(sk) * s.zetabar

        # Direction wₖ.
        w1 = s.vk / _safe(d_k)
        w2 = (s.vk - lam_km1 * s.w_km1) / _safe(d_k)
        w3 = (s.vk - lam_km1 * s.w_km1 - eps_km2 * s.w_km2) / _safe(d_k)
        w_k = jnp.where(it == 1, w1, jnp.where(it == 2, w2, w3))

        x_new = s.x + zeta_k * w_k

        nz = pHq != 0
        vk_new = jnp.where(nz, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(nz, p / _safe(jnp.conj(gamma_kp1)), s.uk)

        tau = s.tau + kdotr(vk_new, vk_new)
        rNorm = jnp.abs(zetabar_next) * jnp.sqrt(tau)

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (~solved) & (pHq == 0)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(UV_BREAKDOWN), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        hist = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            w_km2=jnp.where(it >= 2, s.w_km1, s.w_km2), w_km1=w_k,
            beta=beta_kp1.astype(FC), gamma=gamma_kp1,
            c_km2=s.c_km1, s_km2=s.s_km1,
            c_km1=jnp.real(ck), s_km1=jnp.asarray(sk, FC),
            zetabar=zetabar_next, tau=tau, rNorm=rNorm,
            iter=it, status=code, hist_r=hist,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}",
                         jnp.abs(alpha), s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _qmr_solve(
    A, b, x0=None, *, c=None, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    n = b.shape[0]
    if A.shape is not None and A.shape[0] != A.shape[1]:
        raise ValueError("System must be square")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "QMR", ("k", "αₖ", "‖rₖ‖"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config (c = b, no warm start) →
    # fused whole-solve kernel.
    if (c is None and x0 is None and callback is None and verbose == 0
            and not history and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (qmr_dia_fused,
                                        qmr_dia_fused_supported)
        if qmr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                   stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, niter, rnorm, code_d = qmr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, atol, rtol,
                itmax)
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    c = b if c is None else jnp.asarray(c, dtype=b.dtype)

    def run(state, cap):
        return _qmr_core(
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
        niter=niter, solved=rt.is_solved_code(code), inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, stats, state


def qmr(A, b, x0=None, **kwargs):
    """x, stats = qmr(A, b; c=b, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (no custom shadow c)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("QMR", _qmr_solve, A, b, x0, kwargs,
                         reject={"c": None})
    if hit is not None:
        return hit
    x, stats, _ = _qmr_solve(A, b, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# BiLQR — Ax = b (BiLQ) and Aᴴy = c (QMR-style dual) simultaneously.
# ---------------------------------------------------------------------------

class BilqrState(NamedTuple):
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
    norm_vk: jax.Array
    tau: jax.Array
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
    breakdown: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_s: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("transfer_to_bicg", "history", "hist_len", "callback",
                     "verbose"),
)
def _bilqr_core(
    A, b, c, x0, y0, state_in, iter_cap, atol, rtol,
    *, transfer_to_bicg, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    eps_T = jnp.finfo(T).eps

    if state_in is None:
        x = jnp.zeros(n, FC)
        y = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - A.matvec(x0)
        s0 = c if y0 is None else c - A.rmatvec(y0)
        bNorm = knorm(r0)
        cNorm = knorm(s0)
        cHb = kdot(s0, r0)
        beta = jnp.sqrt(jnp.abs(cHb)).astype(FC)
        gamma = cHb / _safe(beta)
        vk = r0 / _safe(beta)
        uk = s0 / _safe(jnp.conj(gamma))
        epsL = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * bNorm
        epsQ = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * cNorm
        solved_primal0 = bNorm == 0
        solved_dual0 = cNorm == 0
        status = jnp.where(
            cHb == 0, jnp.int32(BC_BREAKDOWN),
            jnp.where(solved_primal0 & solved_dual0,
                      jnp.int32(rt.ZERO_RESIDUAL), jnp.int32(rt.RUNNING)))
        zc = jnp.zeros((), FC)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, bNorm, history)
        hs = rt.hist_init(hist_len, T)
        hs = rt.hist_write(hs, 0, cNorm, history)
        state = BilqrState(
            x=x, y=y, vk=vk, vkm1=jnp.zeros(n, FC), uk=uk,
            ukm1=jnp.zeros(n, FC), dbar_vec=jnp.zeros(n, FC),
            w_km3=jnp.zeros(n, FC), w_km2=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            c_km1=-jnp.ones((), T), s_km1=zc,
            dbar_km1=zc, zeta_km1=zc, zeta_km2=zc, eta_km1=zc, zetabar=zc,
            psibar_km1=zc, eps_km3=zc, lam_km2=zc,
            norm_vk=bNorm / jnp.abs(_safe(beta)), tau=jnp.zeros((), T),
            rNorm=bNorm, sNorm=cNorm, epsL=epsL, epsQ=epsQ,
            solved_primal=solved_primal0, solved_dual=solved_dual0,
            solved_lq_tol=jnp.zeros((), jnp.bool_),
            solved_lq_mach=jnp.zeros((), jnp.bool_),
            solved_cg_tol=jnp.zeros((), jnp.bool_),
            solved_cg_mach=jnp.zeros((), jnp.bool_),
            solved_qr_tol=jnp.zeros((), jnp.bool_),
            solved_qr_mach=jnp.zeros((), jnp.bool_),
            solved_cg_flag=jnp.zeros((), jnp.bool_),
            breakdown=jnp.zeros((), jnp.bool_),
            iter=jnp.int32(0), status=status, hist_r=hr, hist_s=hs,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q, p, alpha, pHq, beta_kp1, gamma_kp1 = _bi_lanczos_step(
            A, s.vk, s.uk, s.vkm1, s.ukm1, s.beta, s.gamma, FC)

        # Shared LQ factorization of Tₖ (no rotation at iter 1).
        ck_g, sk_g, d_km1 = sym_givens(s.dbar_km1, s.gamma)
        ck = jnp.where(it == 1, -jnp.ones((), T), ck_g)
        sk = jnp.where(it == 1, jnp.zeros((), FC), jnp.asarray(sk_g, FC))
        eps_km2 = s.s_km1 * s.beta
        lam2 = ck * s.beta + sk * alpha
        dbar2 = jnp.conj(sk) * s.beta - ck * alpha
        lam3 = -s.c_km1 * ck * s.beta + sk * alpha
        dbar3 = -s.c_km1 * jnp.conj(sk) * s.beta - ck * alpha
        lam_km1 = jnp.where(it == 2, lam2, lam3)
        dbar_k = jnp.where(it == 1, alpha, jnp.where(it == 2, dbar2, dbar3))

        # --- primal block (skipped once solved) ---
        pm = ~s.solved_primal
        zeta_km1_new = jnp.where(pm & (it >= 2), s.eta_km1 / _safe(d_km1),
                                 s.zeta_km1)
        zeta_km2_new = jnp.where(pm & (it >= 3), s.zeta_km1, s.zeta_km2)
        eta_k = jnp.where(
            pm,
            jnp.where(it == 1, s.beta,
                      jnp.where(it == 2, -lam_km1 * zeta_km1_new,
                                -eps_km2 * zeta_km2_new
                                - lam_km1 * zeta_km1_new)),
            s.eta_km1)
        x_new = jnp.where(
            pm & (it >= 2),
            s.x + (zeta_km1_new * ck).astype(FC) * s.dbar_vec
            + (zeta_km1_new * sk).astype(FC) * s.vk,
            s.x)
        dbar_vec_new = jnp.where(
            pm,
            jnp.where(it == 1, s.vk,
                      jnp.conj(sk).astype(FC) * s.dbar_vec
                      - ck.astype(FC) * s.vk),
            s.dbar_vec)

        # --- dual block (uses the *old* uₖ₋₁/uₖ buffers) ---
        dm = ~s.solved_dual
        psi_km1 = jnp.where(it == 1, jnp.zeros((), FC),
                            ck.astype(FC) * s.psibar_km1)
        psibar_k = jnp.where(it == 1, jnp.conj(s.gamma),
                             sk * s.psibar_km1)
        # Direction wₖ₋₁ from old u's (it ≥ 2).
        w2 = s.ukm1 / _safe(jnp.conj(d_km1))
        w3 = (s.ukm1 - jnp.conj(s.lam_km2) * s.w_km2) / _safe(jnp.conj(d_km1))
        w4 = (s.ukm1 - jnp.conj(s.lam_km2) * s.w_km2
              - jnp.conj(s.eps_km3) * s.w_km3) / _safe(jnp.conj(d_km1))
        w_km1 = jnp.where(it == 2, w2, jnp.where(it == 3, w3, w4))
        y_new = jnp.where(dm & (it >= 2), s.y + psi_km1 * w_km1, s.y)
        tau = jnp.where(dm, s.tau + kdotr(s.uk, s.uk), s.tau)
        sNorm = jnp.where(dm, jnp.abs(psibar_k) * jnp.sqrt(tau), s.sNorm)

        # Advance the Lanczos vectors.
        nz = pHq != 0
        vk_new = jnp.where(nz, q / _safe(beta_kp1).astype(FC), s.vk)
        uk_new = jnp.where(nz, p / _safe(jnp.conj(gamma_kp1)), s.uk)
        vHv = kdot(s.vk, vk_new)
        norm_vkp1 = knorm(vk_new)

        mu = s.beta * (s.s_km1 * zeta_km2_new - s.c_km1 * ck * zeta_km1_new) \
            + alpha * sk * zeta_km1_new
        om = beta_kp1.astype(FC) * sk * zeta_km1_new
        th = jnp.conj(mu) * om * vHv
        rNorm_lq = jnp.where(
            it == 1, s.rNorm,
            jnp.sqrt(jnp.abs(mu) ** 2 * s.norm_vk ** 2
                     + jnp.abs(om) ** 2 * norm_vkp1 ** 2 + 2 * jnp.real(th)))
        rNorm_lq = jnp.where(pm, rNorm_lq, s.rNorm)

        dbar_ok = jnp.abs(dbar_k) > eps_T
        zetabar = jnp.where(pm & dbar_ok, eta_k / _safe(dbar_k), s.zetabar)
        rho = beta_kp1.astype(FC) * (sk * zeta_km1_new - ck * zetabar)
        rNorm_cg = jnp.abs(rho) * norm_vkp1

        solved_lq_tol = jnp.where(pm, rNorm_lq <= s.epsL, s.solved_lq_tol)
        solved_lq_mach = jnp.where(pm, (rNorm_lq + 1.0) <= 1.0, s.solved_lq_mach)
        solved_cg_tol = jnp.where(
            pm, transfer_to_bicg & dbar_ok & (rNorm_cg <= s.epsL),
            s.solved_cg_tol)
        solved_cg_mach = jnp.where(
            pm, transfer_to_bicg & dbar_ok & ((rNorm_cg + 1.0) <= 1.0),
            s.solved_cg_mach)
        solved_lq = solved_lq_tol | solved_lq_mach
        solved_cg = solved_cg_tol | solved_cg_mach
        solved_primal = s.solved_primal | solved_lq | solved_cg

        solved_qr_tol = jnp.where(dm, sNorm <= s.epsQ, s.solved_qr_tol)
        solved_qr_mach = jnp.where(dm, (sNorm + 1.0) <= 1.0, s.solved_qr_mach)
        solved_dual = s.solved_dual | solved_qr_tol | solved_qr_mach

        breakdown = (~solved_lq) & (~solved_cg) & (pHq == 0)
        done = (solved_primal & solved_dual) | breakdown
        code = jnp.where(breakdown, jnp.int32(UV_BREAKDOWN),
                         jnp.where(solved_primal & solved_dual,
                                   jnp.int32(rt.SOLVED_PRIMAL_DUAL),
                                   jnp.int32(rt.RUNNING)))

        hr = rt.hist_write(s.hist_r, it, jnp.where(pm, rNorm_lq, jnp.nan),
                           history)
        hs = rt.hist_write(s.hist_s, it, jnp.where(dm, sNorm, jnp.nan),
                           history)
        s_new = s._replace(
            x=x_new, y=y_new, vk=vk_new, vkm1=s.vk, uk=uk_new, ukm1=s.uk,
            dbar_vec=dbar_vec_new,
            w_km3=jnp.where(it >= 2, s.w_km2, s.w_km3),
            w_km2=jnp.where(it >= 2, w_km1, s.w_km2),
            beta=beta_kp1.astype(FC), gamma=gamma_kp1,
            c_km1=ck, s_km1=jnp.asarray(sk, FC), dbar_km1=dbar_k,
            zeta_km1=zeta_km1_new, zeta_km2=zeta_km2_new, eta_km1=eta_k,
            zetabar=zetabar, psibar_km1=psibar_k,
            eps_km3=jnp.where(it >= 3, eps_km2, s.eps_km3),
            lam_km2=jnp.where(it >= 2, lam_km1, s.lam_km2),
            norm_vk=norm_vkp1, tau=tau, rNorm=rNorm_lq, sNorm=sNorm,
            solved_primal=solved_primal, solved_dual=solved_dual,
            solved_lq_tol=solved_lq_tol, solved_lq_mach=solved_lq_mach,
            solved_cg_tol=solved_cg_tol, solved_cg_mach=solved_cg_mach,
            solved_qr_tol=solved_qr_tol, solved_qr_mach=solved_qr_mach,
            solved_cg_flag=s.solved_cg_flag
            | (solved_cg & ~s.solved_primal & ~solved_lq),
            breakdown=breakdown,
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
    x_final = jnp.where(
        state.solved_cg_flag, state.x + state.zetabar * state.dbar_vec, state.x
    )
    return state._replace(x=x_final)


def _bilqr_status(state, code):
    if code in (rt.TIRED, rt.OVERTIMED, rt.USER_EXIT, BC_BREAKDOWN,
                rt.ZERO_RESIDUAL):
        return rt.decode_status(code, _STATUS)
    if bool(state.breakdown):
        return _STATUS[UV_BREAKDOWN]
    lq_t, lq_m = bool(state.solved_lq_tol), bool(state.solved_lq_mach)
    cg_t, cg_m = bool(state.solved_cg_tol), bool(state.solved_cg_mach)
    qr_t, qr_m = bool(state.solved_qr_tol), bool(state.solved_qr_mach)
    sp, sd = bool(state.solved_primal), bool(state.solved_dual)
    pt = "xᶜ" if (cg_t or cg_m) else "xᴸ"
    # reference src/bilqr.jl:453-467 precedence chain (later wins).
    status = "unknown"
    if lq_t and not sd:
        status = "Only the primal solution xᴸ is good enough given atol and rtol"
    if cg_t and not sd:
        status = "Only the primal solution xᶜ is good enough given atol and rtol"
    if (not sp) and qr_t:
        status = "Only the dual solution t is good enough given atol and rtol"
    if lq_t and qr_t:
        status = "Both primal and dual solutions (xᴸ, t) are good enough given atol and rtol"
    if cg_t and qr_t:
        status = "Both primal and dual solutions (xᶜ, t) are good enough given atol and rtol"
    if lq_m and not sd:
        status = "Only found approximate zero-residual primal solution xᴸ"
    if cg_m and not sd:
        status = "Only found approximate zero-residual primal solution xᶜ"
    if (not sp) and qr_m:
        status = "Only found approximate zero-residual dual solution t"
    if lq_m and qr_m:
        status = "Found approximate zero-residual primal and dual solutions (xᴸ, t)"
    if cg_m and qr_m:
        status = "Found approximate zero-residual primal and dual solutions (xᶜ, t)"
    if lq_m and qr_t:
        status = "Found approximate zero-residual primal solutions xᴸ and a dual solution t good enough given atol and rtol"
    if cg_m and qr_t:
        status = "Found approximate zero-residual primal solutions xᶜ and a dual solution t good enough given atol and rtol"
    if lq_t and qr_m:
        status = "Found a primal solution xᴸ good enough given atol and rtol and an approximate zero-residual dual solutions t"
    if cg_t and qr_m:
        status = "Found a primal solution xᶜ good enough given atol and rtol and an approximate zero-residual dual solutions t"
    return status


def _bilqr_solve(
    A, b, c, x0=None, y0=None, *, transfer_to_bicg=True, atol=None,
    rtol=None, itmax=0, timemax=float("inf"), verbose=0, history=False,
    callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    n = b.shape[0]
    if A.shape is not None and A.shape[0] != A.shape[1]:
        raise ValueError("Systems must be square")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "BILQR", ("k", "‖rₖ‖", "‖sₖ‖"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (x0 is None and y0 is None and not history and callback is None
            and verbose == 0 and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (bilqr_dia_fused,
                                        bilqr_dia_fused_supported)
        if bilqr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                     stencil_dtype=A._pd.dtype):
            import types
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, snorm, code_d, flags = bilqr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c, atol, rtol,
                itmax, transfer_to_bicg=bool(transfer_to_bicg))
            niter, code, flags = jax.device_get([niter, code_d, flags])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            fl = [bool(v) for v in flags]
            shim = types.SimpleNamespace(
                solved_lq_tol=fl[0], solved_lq_mach=fl[1],
                solved_cg_tol=fl[2], solved_cg_mach=fl[3],
                solved_qr_tol=fl[4], solved_qr_mach=fl[5],
                solved_primal=fl[6], solved_dual=fl[7], breakdown=fl[8])
            stats = AdjointStats(
                niter=niter,
                solved_primal=fl[6], solved_dual=fl[7],
                residuals_primal=np.zeros(0),
                residuals_dual=np.zeros(0),
                timer=time.perf_counter() - start,
                status=_bilqr_status(shim, code),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _bilqr_core(
            A, b, c, x0, y0, state, jnp.int32(cap), atol, rtol,
            transfer_to_bicg=bool(transfer_to_bicg), history=bool(history),
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

    stats = AdjointStats(
        niter=niter,
        solved_primal=bool(state.solved_primal),
        solved_dual=bool(state.solved_dual),
        residuals_primal=_trim(state.hist_r) if history else np.zeros(0),
        residuals_dual=_trim(state.hist_s) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=_bilqr_status(state, code),
    )
    return x, y, stats, state


def bilqr(A, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = bilqr(A, b, c) — solves Ax = b and Aᴴy = c.

    TPU extension: ``precision="double_word"`` — dw refinement of both
    TRUE residuals (b − Ax, c − Aᴴy) from f32 storage; returns
    AdjointStats with per-system certificates."""
    from ._refine import adjoint_dw
    hit = adjoint_dw("BILQR", _bilqr_solve, A, b, c, x0, y0, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _bilqr_solve(A, b, c, x0, y0, **kwargs)
    return x, y, stats
