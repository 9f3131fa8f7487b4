"""MINARES for Hermitian Ax = b — minimizes ‖Aᴴrₖ‖ over the Krylov space.

Parity with reference src/minares.jl: λ shift, Artol stop on ‖Arₖ‖,
the QR-within-QR (Tₖ₊₁.ₖ then Nₖ) reflection cascade, the Dₖ direction
recurrences and the π/τ residual estimates, plus the ℓ early-termination
bookkeeping on Lanczos breakdown.  All scalar registers live in the
while_loop state; iter==1/2/≥3 branches become where-selects.
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
from ..ops.kops import kdotr, knorm, sym_givens
from ..stats import SimpleStats

SOLVED_ARTOL = 37  # "solution good enough given atol, rtol and Artol"
_STATUS = {SOLVED_ARTOL: "solution good enough given atol, rtol and Artol"}


class MinaresState(NamedTuple):
    x: jax.Array
    vk: jax.Array
    vkp1: jax.Array
    w_km2: jax.Array
    w_km1: jax.Array
    d_km2: jax.Array
    d_km1: jax.Array
    alpha_k: jax.Array
    beta_k: jax.Array
    beta_kp1: jax.Array
    gamma_km1: jax.Array
    lambdabar_k: jax.Array
    gammabar_k: jax.Array
    eps_km2: jax.Array
    eps_km1: jax.Array
    xi_km1: jax.Array
    tau_km2: jax.Array
    tau_km1: jax.Array
    tau_k: jax.Array
    thetabar_km2: jax.Array
    psibis_km2: jax.Array
    psibar_km1: jax.Array
    pi_km2: jax.Array
    pi_km1: jax.Array
    chibar_k: jax.Array
    zetabis_k: jax.Array
    zetabar_kp1: jax.Array
    ct4: jax.Array   # c̃₂ₖ₋₄
    st4: jax.Array
    ct3: jax.Array   # c̃₂ₖ₋₃
    st3: jax.Array
    ct2: jax.Array   # c̃₂ₖ₋₂
    st2: jax.Array
    ell: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    kappa: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


@functools.partial(
    jax.jit,
    static_argnames=("history", "hist_len", "callback", "verbose"),
)
def _minares_core(
    A, b, x0, state_in, iter_cap, itmax, atol, rtol, Artol, lam,
    *, history, hist_len, callback, verbose,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)

    def Ashift(u):
        return A.matvec(u) + lam.astype(FC) * u

    if state_in is None:
        x = jnp.zeros(n, FC)
        r0 = b if x0 is None else b - Ashift(x0)
        beta1 = knorm(r0)
        vk = r0 / _safe(beta1).astype(FC)
        # First Lanczos step (reference :160-170).
        q = Ashift(vk)
        alpha1 = kdotr(vk, q)
        q = q - alpha1.astype(FC) * vk
        beta2 = knorm(q)
        vkp1 = jnp.where(beta2 != 0, q / _safe(beta2).astype(FC), q)

        b1a1 = beta1 * alpha1
        b1b2 = beta1 * beta2
        ArNorm0 = jnp.sqrt(b1a1 * b1a1 + b1b2 * b1b2)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta1
        kappa = jnp.asarray(atol, T) + jnp.asarray(Artol, T) * ArNorm0
        status = jnp.where(
            beta1 == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where((beta1 <= eps_lim) | (ArNorm0 <= kappa),
                      jnp.int32(SOLVED_ARTOL), jnp.int32(rt.RUNNING)))
        z = jnp.zeros((), T)
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm0, history)
        state = MinaresState(
            x=x, vk=vk, vkp1=vkp1,
            w_km2=jnp.zeros(n, FC), w_km1=jnp.zeros(n, FC),
            d_km2=jnp.zeros(n, FC), d_km1=jnp.zeros(n, FC),
            alpha_k=alpha1, beta_k=beta1, beta_kp1=beta2,
            gamma_km1=z, lambdabar_k=z, gammabar_k=z,
            eps_km2=z, eps_km1=z, xi_km1=z,
            tau_km2=z, tau_km1=z, tau_k=z,
            thetabar_km2=z, psibis_km2=z, psibar_km1=z,
            pi_km2=z, pi_km1=z, chibar_k=z,
            zetabis_k=b1a1, zetabar_kp1=b1b2,
            ct4=z, st4=z, ct3=z, st3=z, ct2=z, st2=z,
            ell=jnp.int32(itmax + 2),
            rNorm=beta1, ArNorm=ArNorm0, kappa=kappa, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        lambdabar_k = jnp.where(it == 1, s.alpha_k, s.lambdabar_k)
        gammabar_k = jnp.where(it == 1, s.beta_kp1, s.gammabar_k)
        chibar_k = jnp.where(it == 1, s.beta_k, s.chibar_k)
        zetabis_k = s.zetabis_k
        zetabar_kp1 = s.zetabar_kp1

        ck, sk, l_k = sym_givens(lambdabar_k, s.beta_kp1)

        # Direction wₖ (columns of Wₖ = VₖRₖ⁻¹).
        w1 = s.vk / _safe(l_k).astype(FC)
        w2 = (s.vk - s.gamma_km1.astype(FC) * s.w_km1) / _safe(l_k).astype(FC)
        w3 = (s.vk - s.gamma_km1.astype(FC) * s.w_km1
              - s.eps_km2.astype(FC) * s.w_km2) / _safe(l_k).astype(FC)
        w_k = jnp.where(it == 1, w1, jnp.where(it == 2, w2, w3))

        # Continue the Lanczos process (when it ≤ ℓ-1).
        lan_ok = it <= s.ell - 1
        q = Ashift(s.vkp1) - s.beta_kp1.astype(FC) * s.vk
        alpha_kp1 = kdotr(q, s.vkp1)
        q = q - alpha_kp1.astype(FC) * s.vkp1
        beta_kp2 = knorm(q)
        brk = beta_kp2 <= btol
        ell = jnp.where(lan_ok & brk, it + 1, s.ell)
        v_next = jnp.where(lan_ok & ~brk, q / _safe(beta_kp2).astype(FC), q)
        alpha_kp1 = jnp.where(lan_ok, alpha_kp1, s.alpha_k)
        beta_kp2 = jnp.where(lan_ok, beta_kp2, jnp.zeros((), T))

        # Apply Qₖ.ₖ₊₁ (gated on ℓ).
        two_ok = it <= ell - 2
        one_ok = it <= ell - 1
        eps_k = jnp.where(two_ok, sk * beta_kp2, jnp.zeros((), T))
        gammabar_kp1 = jnp.where(two_ok, -ck * beta_kp2, jnp.zeros((), T))
        gamma_k = jnp.where(one_ok, ck * gammabar_k + sk * alpha_kp1,
                            jnp.zeros((), T))
        lambdabar_kp1 = jnp.where(one_ok, sk * gammabar_k - ck * alpha_kp1,
                                  jnp.zeros((), T))

        # QR of Nₖ: previous reflections.
        rho_km2 = jnp.where(it >= 3, s.st4 * l_k, jnp.zeros((), T))
        lhat_k = jnp.where(it >= 3, -s.ct4 * l_k,
                           jnp.where(it == 2, l_k, jnp.zeros((), T)))
        phibar_km1 = jnp.where(it >= 2, s.st3 * lhat_k, jnp.zeros((), T))
        mubar_k = jnp.where(it >= 2, -s.ct3 * lhat_k, l_k)
        phi_km1 = jnp.where(
            it >= 2,
            jnp.where(one_ok, s.ct2 * phibar_km1 + s.st2 * gamma_k,
                      phibar_km1),
            jnp.zeros((), T))
        ghat_k = jnp.where(it >= 2,
                           jnp.where(one_ok, s.st2 * phibar_km1 - s.ct2 * gamma_k,
                                     jnp.zeros((), T)),
                           gamma_k)

        ct1n, st1n, mubis_k_g = sym_givens(mubar_k, ghat_k)
        ct1 = jnp.where(one_ok, ct1n, jnp.ones((), T))
        st1 = jnp.where(one_ok, st1n, jnp.zeros((), T))
        mubis_k = jnp.where(one_ok, mubis_k_g, mubar_k)

        ct0n, st0n, mu_k_g = sym_givens(mubis_k, eps_k)
        ct0 = jnp.where(two_ok, ct0n, jnp.ones((), T))
        st0 = jnp.where(two_ok, st0n, jnp.zeros((), T))
        mu_k = jnp.where(two_ok, mu_k_g, mubis_k)

        # zₖ updates.
        zring_k = jnp.where(one_ok, ct1 * zetabis_k + st1 * zetabar_kp1,
                            zetabis_k)
        zetabis_kp1 = jnp.where(one_ok, st1 * zetabis_k - ct1 * zetabar_kp1,
                                jnp.zeros((), T))
        zeta_k = jnp.where(two_ok, ct0 * zring_k, zring_k)
        zetabar_kp2 = jnp.where(two_ok, st0 * zring_k, jnp.zeros((), T))

        # Direction dₖ.
        d1 = w_k / _safe(mu_k).astype(FC)
        d2 = (w_k - phi_km1.astype(FC) * s.d_km1) / _safe(mu_k).astype(FC)
        d3 = (w_k - phi_km1.astype(FC) * s.d_km1
              - rho_km2.astype(FC) * s.d_km2) / _safe(mu_k).astype(FC)
        d_k = jnp.where(it == 1, d1, jnp.where(it == 2, d2, d3))

        x = s.x + zeta_k.astype(FC) * d_k

        ArNorm = jnp.where(
            two_ok, jnp.sqrt(zetabis_kp1 ** 2 + zetabar_kp2 ** 2),
            jnp.where(it == ell - 1, jnp.abs(zetabis_kp1), jnp.zeros((), T)))

        # LQ of Uₖ.
        chm3_2, shm3_2, psibis2 = sym_givens(s.psibar_km1, phi_km1)  # it == 2
        chm4, shm4, psi_km2 = sym_givens(s.psibis_km2, rho_km2)      # it ≥ 3
        theta_km2 = chm4 * s.thetabar_km2 + shm4 * phi_km1
        delta_k = shm4 * s.thetabar_km2 - chm4 * phi_km1
        omega_km2 = shm4 * mu_k
        eta_k = -chm4 * mu_k
        chm3_3, shm3_3, psibis3 = sym_givens(s.psibar_km1, delta_k)

        psibar_k = jnp.where(it == 1, mu_k,
                             jnp.where(it == 2, -chm3_2 * mu_k,
                                       -chm3_3 * eta_k))
        thetabar_km1 = jnp.where(it == 2, shm3_2 * mu_k,
                                 jnp.where(it >= 3, shm3_3 * eta_k,
                                           jnp.zeros((), T)))
        psibis_km1 = jnp.where(it == 2, psibis2,
                               jnp.where(it >= 3, psibis3, jnp.zeros((), T)))
        chm3 = jnp.where(it == 2, chm3_2, chm3_3)
        shm3 = jnp.where(it == 2, shm3_2, shm3_3)

        # Solve L̂ₖtₖ = zₖ.
        tau_km2_new = jnp.where(it >= 3, s.tau_km1 * s.psibis_km2 / _safe(psi_km2),
                                s.tau_km2)
        tau_km1_new = jnp.where(
            it == 2, s.tau_k * s.psibar_km1 / _safe(psibis2),
            jnp.where(it >= 3,
                      (s.xi_km1 - theta_km2 * tau_km2_new) / _safe(psibis3),
                      s.tau_km1))
        xi_k = jnp.where(it >= 3, zeta_k - omega_km2 * tau_km2_new, zeta_k)
        tau_k_new = jnp.where(
            it == 1, zeta_k / _safe(psibar_k),
            (xi_k - thetabar_km1 * tau_km1_new) / _safe(psibar_k))

        # (Qₖ)ᵀβ₁e₁ components.
        chi_k = ck * chibar_k
        chibar_kp1 = sk * chibar_k

        # π updates.
        pi2_km1 = chm3_2 * s.pi_km1 + shm3_2 * chi_k
        pi2_k = shm3_2 * s.pi_km1 - chm3_2 * chi_k
        pi3a_km2 = chm4 * s.pi_km2 + shm4 * chi_k
        pi3a_k = shm4 * s.pi_km2 - chm4 * chi_k
        pi3_km1 = chm3_3 * s.pi_km1 + shm3_3 * pi3a_k
        pi3_k = shm3_3 * s.pi_km1 - chm3_3 * pi3a_k
        pi_km2_new = jnp.where(it >= 3, pi3a_km2, s.pi_km2)
        pi_km1_mid = jnp.where(it == 2, pi2_km1, jnp.where(it >= 3, pi3_km1, s.pi_km1))
        pi_k_new = jnp.where(it == 1, chi_k, jnp.where(it == 2, pi2_k, pi3_k))
        pi_kp1 = chibar_kp1

        rNorm = jnp.where(
            it == 1,
            jnp.sqrt((pi_k_new - tau_k_new) ** 2 + pi_kp1 ** 2),
            jnp.sqrt((pi_km1_mid - tau_km1_new) ** 2
                     + (pi_k_new - tau_k_new) ** 2 + pi_kp1 ** 2))

        solved = (rNorm <= s.eps_lim) | (ArNorm <= s.kappa)
        breakdown = s.beta_kp1 <= btol
        code = jnp.where(solved, jnp.int32(SOLVED_ARTOL),
                         jnp.where(breakdown, jnp.int32(rt.BREAKDOWN),
                                   jnp.int32(rt.RUNNING)))

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)

        ge2 = it >= 2
        s_new = s._replace(
            x=x, vk=s.vkp1, vkp1=v_next,
            w_km2=jnp.where(ge2, s.w_km1, s.w_km2), w_km1=w_k,
            d_km2=jnp.where(ge2, s.d_km1, s.d_km2), d_km1=d_k,
            alpha_k=jnp.where(one_ok, alpha_kp1, s.alpha_k),
            beta_k=s.beta_kp1,
            beta_kp1=jnp.where(one_ok, beta_kp2, s.beta_kp1),
            gamma_km1=jnp.where(one_ok, gamma_k, s.gamma_km1),
            lambdabar_k=jnp.where(one_ok, lambdabar_kp1, lambdabar_k),
            gammabar_k=jnp.where(two_ok, gammabar_kp1, gammabar_k),
            eps_km2=jnp.where(ge2, s.eps_km1, s.eps_km2),
            eps_km1=jnp.where(two_ok, eps_k, s.eps_km1),
            xi_km1=xi_k,
            tau_km2=tau_km2_new, tau_km1=tau_km1_new, tau_k=tau_k_new,
            thetabar_km2=jnp.where(ge2, thetabar_km1, s.thetabar_km2),
            psibis_km2=jnp.where(ge2, psibis_km1, s.psibis_km2),
            psibar_km1=psibar_k,
            pi_km2=jnp.where(ge2, pi_km1_mid, pi_km2_new),
            pi_km1=pi_k_new,
            chibar_k=chibar_kp1,
            zetabis_k=jnp.where(one_ok, zetabis_kp1, zetabis_k),
            zetabar_kp1=jnp.where(two_ok, zetabar_kp2, zetabar_kp1),
            ct4=jnp.where(ge2, s.ct2, s.ct4),
            st4=jnp.where(ge2, s.st2, s.st4),
            ct3=ct1, st3=st1, ct2=ct0, st2=st0,
            ell=ell, rNorm=rNorm, ArNorm=ArNorm,
            iter=it, status=code, hist_r=hr, hist_ar=har,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        if verbose > 0:
            rt.debug_row(verbose, it,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:8.1e}",
                         rNorm, ArNorm, beta_kp2, zeta_k)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _minares_solve(
    A, b, x0=None, *, lam=0.0, Artol=None, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A)
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
    Artol = rt.default_tol(Artol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    rt.debug_table(verbose, "MINARES", ("k", "‖rₖ‖", "‖Arₖ‖", "βₖ₊₁", "ζₖ"), n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel.
    if (callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (minares_dia_fused,
                                        minares_dia_fused_supported)
        if minares_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                       stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else \
                b - (A.matvec(x0) + jnp.asarray(lam, b.dtype) * x0)
            x, niter, rnorm, arnorm, code_d = minares_dia_fused(
                A._pd, A.dia.offsets, b_eff, atol, rtol, Artol, float(lam),
                itmax)
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code) or code == SOLVED_ARTOL,
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _minares_core(
            A, b, x0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, Artol, float(lam),
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
        solved=rt.is_solved_code(code) or code == SOLVED_ARTOL,
        inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, stats, state


def _minares_ir(A, b, x0, *, atol=None, rtol=None, itmax=0,
                timemax=float("inf"), **_defaults):
    """precision="double_word": iterative refinement to fp64-grade TRUE
    residuals from f32 storage for Hermitian systems — inner correction
    solves are plain working-precision MINARES (the fused
    whole-solve-in-VMEM kernel when eligible); shared dw driver in
    solvers/_refine.py."""
    from ._refine import ir_solve

    start = time.perf_counter()
    A = as_operator(A)
    b = jnp.asarray(b)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * b.shape[0])

    def inner(rhs, rtol_i, it_left, time_left):
        # Artol=0: the default sqrt(eps) ‖Aᴴr‖ stop would fire before
        # the residual reaches rtol_i on ill-conditioned systems and
        # stall the outer dw loop into a spurious ILL_COND_MACH
        d, st, _ = _minares_solve(A, rhs, atol=0.0, rtol=rtol_i,
                                  Artol=0.0,
                                  itmax=it_left,
                                  timemax=time_left
                                  if np.isfinite(time_left)
                                  else float("inf"))
        return d, st.niter

    return ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start)


def minares(A, b, x0=None, *, precision=None, **kwargs):
    """x, stats = minares(A, b; λ, Artol, ...) — minimizes ‖Aᴴr‖.

    TPU extension: ``precision="double_word"`` runs double-word iterative
    refinement around working-precision MINARES solves — fp64-grade TRUE
    residuals (rtol down to ~√eps(Float64)) from f32 device storage.
    Plain configuration only (no λ-shift, Artol, history, or callback).
    """
    from ._refine import check_ir_config

    if check_ir_config("MINARES", precision,
                       history=kwargs.get("history", False),
                       callback=kwargs.get("callback"),
                       lam=kwargs.get("lam", 0.0),
                       Artol=kwargs.get("Artol") or 0.0,
                       verbose=kwargs.get("verbose", 0)):
        x, stats, _ = _minares_ir(A, b, x0, **kwargs)
        return x, stats
    x, stats, _ = _minares_solve(A, b, x0, **kwargs)
    return x, stats
