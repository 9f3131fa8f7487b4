"""MINRES-QLP for Hermitian (singular/indefinite) Ax = b.

Returns the minimum-norm least-squares solution of singular systems.
Parity with reference src/minres_qlp.jl: λ shift, Artol inconsistency
test, linesearch npc exit, QLP (QR + LQ) factorization of the Lanczos
tridiagonal with the three-term direction recurrences, μmin/μmax
condition estimates.  The reference's iter==1/2/≥3 branches are realized
as where-selected scalar registers inside one while_loop.
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
from ..stats import SimpleStats


class MinresQlpState(NamedTuple):
    x: jax.Array
    vk: jax.Array            # normalized Lanczos vector vₖ (M-image)
    Minv_vk: jax.Array
    Minv_vkm1: jax.Array
    w_km1: jax.Array
    w_k: jax.Array
    npc_dir: jax.Array
    beta_k: jax.Array
    zetabar: jax.Array
    xi_km1: jax.Array
    tau_km2: jax.Array
    tau_km1: jax.Array
    tau_k: jax.Array
    psibar_km2: jax.Array
    mubis_km2: jax.Array
    mubar_km1: jax.Array
    c_km2: jax.Array
    c_km1: jax.Array
    s_km2: jax.Array
    s_km1: jax.Array
    mumin: jax.Array
    mumax: jax.Array
    anorm2: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    kappa: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    inconsistent: jax.Array
    indefinite: jax.Array
    npc_count: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "linesearch", "history", "hist_len", "callback",
                     "verbose", "MisI"),
)
def _minres_qlp_core(
    A, M, b, x0, state_in, iter_cap, itmax, atol, rtol, Artol, lam,
    *, ldiv, linesearch, history, hist_len, callback, verbose, MisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)
    tiny = jnp.finfo(T).tiny
    npc_shape = (n,) if linesearch else (0,)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        Minv_v = b if x0 is None else b - (A.matvec(x0) + lam.astype(FC) * x0)
        vk = M_apply(Minv_v)
        beta = jnp.sqrt(jnp.maximum(kdotr(vk, Minv_v), 0))
        safe_b = _safe(beta).astype(FC)
        Minv_v = jnp.where(beta != 0, Minv_v / safe_b, Minv_v)
        vk = Minv_v if MisI else jnp.where(beta != 0, vk / safe_b, vk)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(beta <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta, history)
        har = rt.hist_init(hist_len, T)
        state = MinresQlpState(
            x=x, vk=vk, Minv_vk=Minv_v, Minv_vkm1=jnp.zeros(n, FC),
            w_km1=jnp.zeros(n, FC), w_k=jnp.zeros(n, FC),
            npc_dir=vk if linesearch else vk[:0],
            beta_k=beta, zetabar=beta,
            xi_km1=jnp.zeros((), T), tau_km2=jnp.zeros((), T),
            tau_km1=jnp.zeros((), T), tau_k=jnp.zeros((), T),
            psibar_km2=jnp.zeros((), T), mubis_km2=jnp.zeros((), T),
            mubar_km1=jnp.zeros((), T),
            c_km2=jnp.ones((), T), c_km1=jnp.ones((), T),
            s_km2=jnp.zeros((), T), s_km1=jnp.zeros((), T),
            mumin=jnp.zeros((), T), mumax=jnp.zeros((), T),
            anorm2=jnp.zeros((), T), rNorm=beta,
            ArNorm=jnp.zeros((), T), kappa=jnp.zeros((), T),
            eps_lim=eps_lim, iter=jnp.int32(0), status=status,
            inconsistent=jnp.zeros((), jnp.bool_),
            indefinite=jnp.zeros((), jnp.bool_),
            npc_count=jnp.int32(0), hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        # Lanczos step.
        p = A.matvec(s.vk) + lam.astype(FC) * s.vk
        p = jnp.where(it >= 2, p - s.beta_k.astype(FC) * s.Minv_vkm1, p)
        alpha = kdotr(s.vk, p)
        p = p - alpha.astype(FC) * s.Minv_vk
        vkp1 = M_apply(p)
        beta_kp1 = jnp.sqrt(jnp.maximum(kdotr(vkp1, p), 0))
        norm_ok = beta_kp1 > btol
        safe_bk = _safe(beta_kp1).astype(FC)
        vkp1 = jnp.where(norm_ok, vkp1 / safe_bk, vkp1)
        p_scaled = p if MisI else jnp.where(norm_ok, p / safe_bk, p)
        if MisI:
            p_scaled = vkp1
        anorm2 = s.anorm2 + alpha * alpha + s.beta_k * s.beta_k \
            + beta_kp1 * beta_kp1

        # Apply previous reflections.
        eps_km2 = jnp.where(it >= 3, s.s_km2 * s.beta_k, jnp.zeros((), T))
        gbar_km1 = jnp.where(it >= 3, -s.c_km2 * s.beta_k,
                             jnp.where(it == 2, s.beta_k, jnp.zeros((), T)))
        g_km1 = s.c_km1 * gbar_km1 + s.s_km1 * alpha
        lbar_k = jnp.where(it == 1, alpha,
                           s.s_km1 * gbar_km1 - s.c_km1 * alpha)

        # Nonpositive-curvature exit (reference :304-327).
        if linesearch:
            cgam = jnp.where(it == 1, -alpha, s.c_km1 * lbar_k)
            npc_exit = cgam >= 0
        else:
            npc_exit = jnp.zeros((), jnp.bool_)

        ck, sk, l_k = sym_givens(lbar_k, beta_kp1)
        zeta = ck * s.zetabar
        zetabar_next = sk * s.zetabar

        npc_dir = s.npc_dir
        if linesearch:
            npc_dir_new = (sk * sk).astype(FC) * s.npc_dir \
                - (zetabar_next * ck).astype(FC) * vkp1
            npc_dir = jnp.where(npc_exit, s.npc_dir, npc_dir_new)

        # LQ update of Rₖ.
        cp2, sp2, mubis2 = sym_givens(s.mubar_km1, g_km1)   # it == 2 path
        cp3, sp3, mu_km2 = sym_givens(s.mubis_km2, eps_km2)  # it ≥ 3 path
        psi_km2 = cp3 * s.psibar_km2 + sp3 * g_km1
        theta_k = sp3 * s.psibar_km2 - cp3 * g_km1
        rho_km2 = sp3 * l_k
        eta_k = -cp3 * l_k
        cd, sd, mubis3 = sym_givens(s.mubar_km1, theta_k)
        psibar3 = sd * eta_k
        mubar3 = -cd * eta_k

        mubar_k = jnp.where(it == 1, l_k,
                            jnp.where(it == 2, -cp2 * l_k, mubar3))
        psibar_km1 = jnp.where(it == 2, sp2 * l_k,
                               jnp.where(it >= 3, psibar3, jnp.zeros((), T)))
        mubis_km1 = jnp.where(it == 2, mubis2,
                              jnp.where(it >= 3, mubis3, jnp.zeros((), T)))
        cp = jnp.where(it == 2, cp2, cp3)
        sp = jnp.where(it == 2, sp2, sp3)

        # Solve Lₖ tₖ = zₖ.
        tau_km2_new = jnp.where(
            it >= 3, s.tau_km1 * s.mubis_km2 / _safe(mu_km2), s.tau_km2)
        tau_km1_new = jnp.where(
            it == 2, s.tau_k * s.mubar_km1 / _safe(mubis2),
            jnp.where(it >= 3,
                      (s.xi_km1 - psi_km2 * tau_km2_new) / _safe(mubis3),
                      s.tau_km1))
        xi_k = jnp.where(it >= 3, zeta - rho_km2 * tau_km2_new, zeta)
        tau_k_new = jnp.where(
            it == 1, zeta / _safe(mubar_k),
            (xi_k - psibar_km1 * tau_km1_new) / _safe(mubar_k))

        # Direction updates (columns of Wₖ = Vₖ Pₖᴴ).
        # it == 1: w̄₁ = v₁.
        w_km1_1, w_k_1 = s.w_km1, s.vk
        # it == 2: swap then rotate with (cp, sp).
        wr_km1_2 = cp.astype(FC) * s.w_k + sp.astype(FC) * s.vk
        wbar_k_2 = sp.astype(FC) * s.w_k - cp.astype(FC) * s.vk
        # it ≥ 3:
        waux = sp.astype(FC) * s.w_km1 - cp.astype(FC) * s.vk
        x_add3 = (cp * tau_km2_new).astype(FC) * s.w_km1 \
            + (sp * tau_km2_new).astype(FC) * s.vk
        wr_km1_3 = cd.astype(FC) * s.w_k + sd.astype(FC) * waux
        wbar_k_3 = sd.astype(FC) * s.w_k - cd.astype(FC) * waux

        w_km1_new = jnp.where(it == 1, w_km1_1,
                              jnp.where(it == 2, wr_km1_2, wr_km1_3))
        w_k_new = jnp.where(it == 1, w_k_1,
                            jnp.where(it == 2, wbar_k_2, wbar_k_3))
        x_new = jnp.where(it >= 3, s.x + x_add3, s.x)

        # npc exit: x ← b when iter == 1 (reference :313-315).
        if linesearch:
            x_new = jnp.where(npc_exit, jnp.where(it == 1, b, s.x), x_new)

        rNorm = jnp.abs(zetabar_next)
        ArNorm = jnp.abs(s.zetabar) * jnp.sqrt(
            lbar_k * lbar_k + (s.c_km1 * beta_kp1) ** 2)
        kappa = jnp.where(it == 1,
                          jnp.asarray(atol, T) + jnp.asarray(Artol, T) * ArNorm,
                          s.kappa)

        abs_mubar = jnp.abs(mubar_k)
        mumin = jnp.where(it == 1, abs_mubar,
                          jnp.where(it == 2,
                                    jnp.minimum(s.mumin, jnp.minimum(mubis_km1, abs_mubar)),
                                    jnp.minimum(s.mumin,
                                                jnp.minimum(mu_km2,
                                                            jnp.minimum(mubis_km1, abs_mubar)))))
        mumax = jnp.where(it == 1, abs_mubar,
                          jnp.where(it == 2,
                                    jnp.maximum(s.mumax, jnp.maximum(mubis_km1, abs_mubar)),
                                    jnp.maximum(s.mumax,
                                                jnp.maximum(mu_km2,
                                                            jnp.maximum(mubis_km1, abs_mubar)))))
        acond = mumax / jnp.maximum(mumin, tiny)
        anorm = jnp.sqrt(anorm2)
        xnorm = knorm(x_new)
        backward = rNorm / jnp.maximum(anorm * xnorm, tiny)

        ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
        resid_decrease_mach = (1.0 + rNorm) <= 1.0
        zero_resid_mach = (1.0 + backward) <= 1.0
        tired = it >= itmax
        resid_decrease_lim = rNorm <= s.eps_lim
        zero_resid_lim = (backward <= jnp.finfo(T).eps) if MisI \
            else jnp.zeros((), jnp.bool_)
        breakdown = beta_kp1 <= btol
        zero_resid = zero_resid_mach | zero_resid_lim
        resid_decrease = resid_decrease_mach | resid_decrease_lim
        solved = resid_decrease | zero_resid
        inconsistent = ((ArNorm <= kappa) & (jnp.abs(mubar_k) <= Artol)) \
            | (breakdown & ~solved)

        # Status chain (reference :518-524, later wins).
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(inconsistent, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(zero_resid, jnp.int32(rt.SOLVED_ZERO), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)
        code = jnp.where(npc_exit, jnp.int32(rt.NPC), code)

        indefinite = s.indefinite | npc_exit
        npc_count = jnp.where(npc_exit, jnp.int32(1), s.npc_count)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(
            x=x_new,
            vk=jnp.where(npc_exit, s.vk, vkp1 if not MisI else p_scaled),
            Minv_vk=jnp.where(npc_exit, s.Minv_vk, p_scaled),
            Minv_vkm1=jnp.where(npc_exit, s.Minv_vkm1, s.Minv_vk),
            w_km1=w_km1_new, w_k=w_k_new, npc_dir=npc_dir,
            beta_k=jnp.where(npc_exit, s.beta_k, beta_kp1),
            zetabar=jnp.where(npc_exit, s.zetabar, zetabar_next),
            xi_km1=xi_k, tau_km2=tau_km2_new, tau_km1=tau_km1_new,
            tau_k=tau_k_new,
            psibar_km2=jnp.where(it >= 2, psibar_km1, s.psibar_km2),
            mubis_km2=jnp.where(it >= 2, mubis_km1, s.mubis_km2),
            mubar_km1=mubar_k,
            c_km2=jnp.where(it >= 2, s.c_km1, s.c_km2),
            s_km2=jnp.where(it >= 2, s.s_km1, s.s_km2),
            c_km1=ck, s_km1=sk,
            mumin=mumin, mumax=mumax, anorm2=anorm2,
            rNorm=rNorm, ArNorm=ArNorm, kappa=kappa,
            iter=it, status=code, inconsistent=inconsistent,
            indefinite=indefinite, npc_count=npc_count,
            hist_r=hr, hist_ar=har,
        )
        if verbose > 0:
            # reference column set src/minres_qlp.jl:208 (timer omitted):
            # Rₖ.ₖ = the rotated R diagonal, Lₖ.ₖ = the QLP μ̄ₖ diagonal
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  "
                         "{:8.1e}  {:7.1e}  {:7.1e}  {:8.1e}",
                         s_new.rNorm, s_new.ArNorm, beta_kp1, l_k,
                         mubar_k, jnp.sqrt(anorm2), s_new.kappa, backward)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _minres_qlp_solve(
    A, b, x0=None, *, M=None, ldiv=False, linesearch=False, lam=0.0,
    Artol=None, atol=None, rtol=None, itmax=0, timemax=float("inf"),
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
    if x0 is not None and linesearch:
        raise ValueError("warm_start and linesearch cannot be used together")
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    Artol = rt.default_tol(Artol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "MINRES-QLP",
                   ("k", "‖rₖ‖", "‖Arₖ₋₁‖", "βₖ₊₁", "Rₖ.ₖ", "Lₖ.ₖ",
                    "‖A‖", "κ(A)", "backward"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (M is None and not linesearch and callback is None and verbose == 0
            and not history and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (minres_qlp_dia_fused,
                                        minres_qlp_dia_fused_supported)
        if minres_qlp_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                          stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else \
                b - (A.matvec(x0) + jnp.asarray(lam, b.dtype) * x0)
            x, niter, rnorm, code_d, incon, arnorm = minres_qlp_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, Artol, float(lam),
                itmax)
            niter, code, incon = jax.device_get([niter, code_d, incon])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            inconsistent = bool(incon)
            if code == rt.ZERO_RESIDUAL:
                inconsistent = False
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=inconsistent,
                indefinite=False,
                npc_count=0,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _minres_qlp_core(
            A, M, b, x0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, Artol, float(lam),
            ldiv=bool(ldiv), linesearch=bool(linesearch),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)

    # Finalize x (reference :509-515), skipped on the npc exit.
    x = np.asarray(state.x)
    if code != rt.NPC:
        if niter >= 2:
            x = x + float(state.tau_km1) * np.asarray(state.w_km1)
        if not bool(state.inconsistent):
            x = x + float(state.tau_k) * np.asarray(state.w_k)
    x = jnp.asarray(x)
    if x0 is not None and code != rt.NPC:
        x = x + x0

    inconsistent = bool(state.inconsistent)
    if code in (rt.ZERO_RESIDUAL, rt.NPC):
        inconsistent = False
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        indefinite=bool(state.indefinite),
        npc_count=int(state.npc_count),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def minres_qlp(A, b, x0=None, **kwargs):
    """x, stats = minres_qlp(A, b; λ, Artol, linesearch, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/ldiv allowed; no
    λ/Artol/linesearch)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("MINRES-QLP", _minres_qlp_solve, A, b, x0, kwargs,
                         forward=("M", "ldiv"),
                         reject={"lam": 0.0, "Artol": None,
                                 "linesearch": False})
    if hit is not None:
        return hit
    x, stats, _ = _minres_qlp_solve(A, b, x0, **kwargs)
    return x, stats
