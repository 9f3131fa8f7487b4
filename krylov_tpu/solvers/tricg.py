"""TriCG and TriMR for symmetric quasi-definite systems [τE A; Aᴴ νF].

Parity with reference src/tricg.jl (LDLᴴ of the block-tridiagonal Sₖ.ₖ)
and src/trimr.jl (QR of Sₖ₊₁.ₖ with the 4-reflection cascade): presets
spd (τ=1,ν=1), snd (τ=-1,ν=-1), flip (τ=-1,ν=1), sp (τ=1,ν=0, TriMR),
M/N centered preconditioning, warm start (unpreconditioned only).
Solves [τE A; Aᴴ νF][x; y] = [b; c].
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
from ..ops.kops import kdot, sym_givens
from ..stats import SimpleStats

INCONS_TRI = 28  # "inconsistent linear system" (shared with fom)
_STATUS = {INCONS_TRI: "inconsistent linear system"}


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


def _resolve_tau_nu(tau, nu, spd, snd, flip, sp):
    if spd:
        return 1.0, 1.0
    if snd:
        return -1.0, -1.0
    if flip:
        return -1.0, 1.0
    if sp:
        return 1.0, 0.0
    return tau, nu


class TricgState(NamedTuple):
    x: jax.Array
    y: jax.Array
    Minv_vk: jax.Array
    Minv_vkm1: jax.Array
    Ninv_uk: jax.Array
    Ninv_ukm1: jax.Array
    vk: jax.Array
    uk: jax.Array
    gx_odd: jax.Array      # gx₂ₖ₋₁
    gx_even: jax.Array     # gx₂ₖ
    gy_odd: jax.Array
    gy_even: jax.Array
    beta: jax.Array
    gamma: jax.Array
    d_m3: jax.Array        # d₂ₖ₋₃
    d_m2: jax.Array        # d₂ₖ₋₂
    pi_m3: jax.Array
    pi_m2: jax.Array
    delta_km1: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "MisI", "NisI"),
)
def _tricg_core(
    A, M, N, b, c, x0, y0, state_in, iter_cap, atol, rtol, tau, nu,
    *, ldiv, history, hist_len, callback, verbose, MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    tau = jnp.asarray(tau, T)
    nu = jnp.asarray(nu, T)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(m, FC)
        y = jnp.zeros(n, FC)
        if x0 is None:
            b0, c0 = b, c
        else:
            b0 = b - A.matvec(y0) - tau.astype(FC) * x0
            c0 = c - A.rmatvec(x0) - nu.astype(FC) * y0
        Minv_v = b0
        vk = M_apply(Minv_v)
        beta = jnp.sqrt(jnp.maximum(kdot(vk, Minv_v).real, 0))
        bnz = beta != 0
        Minv_v = jnp.where(bnz, Minv_v / _safe(beta).astype(FC), jnp.zeros(m, FC))
        vk = Minv_v if MisI else jnp.where(bnz, vk / _safe(beta).astype(FC),
                                           jnp.zeros(m, FC))
        Ninv_u = c0
        uk = N_apply(Ninv_u)
        gamma = jnp.sqrt(jnp.maximum(kdot(uk, Ninv_u).real, 0))
        gnz = gamma != 0
        Ninv_u = jnp.where(gnz, Ninv_u / _safe(gamma).astype(FC),
                           jnp.zeros(n, FC))
        uk = Ninv_u if NisI else jnp.where(gnz, uk / _safe(gamma).astype(FC),
                                           jnp.zeros(n, FC))
        rNorm = jnp.sqrt(gamma * gamma + beta * beta)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        status = jnp.where(rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        zc = jnp.zeros((), FC)
        state = TricgState(
            x=x, y=y, Minv_vk=Minv_v, Minv_vkm1=jnp.zeros(m, FC),
            Ninv_uk=Ninv_u, Ninv_ukm1=jnp.zeros(n, FC),
            vk=vk, uk=uk,
            gx_odd=jnp.zeros(m, FC), gx_even=jnp.zeros(m, FC),
            gy_odd=jnp.zeros(n, FC), gy_even=jnp.zeros(n, FC),
            beta=beta, gamma=gamma,
            d_m3=jnp.zeros((), T), d_m2=jnp.zeros((), T),
            pi_m3=zc, pi_m2=zc, delta_km1=zc,
            rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q = A.matvec(s.uk)
        p = A.rmatvec(s.vk)
        q = jnp.where(it >= 2, q - s.gamma.astype(FC) * s.Minv_vkm1, q)
        p = jnp.where(it >= 2, p - s.beta.astype(FC) * s.Ninv_ukm1, p)
        alpha = kdot(s.vk, q)
        q = q - alpha * s.Minv_vk
        p = p - jnp.conj(alpha) * s.Ninv_uk

        # LDLᴴ update of Sₖ.ₖ (reference :331-349).
        d_odd1 = tau
        delta1 = jnp.conj(alpha) / _safe(d_odd1).astype(FC)
        d_even1 = nu - jnp.abs(delta1) ** 2 * d_odd1
        sigma = s.beta.astype(FC) / _safe(s.d_m2).astype(FC)
        eta = s.gamma.astype(FC) / _safe(s.d_m3).astype(FC)
        lam = -(eta * jnp.conj(s.delta_km1) * s.d_m3) / _safe(s.d_m2).astype(FC)
        d_oddk = tau - jnp.abs(sigma) ** 2 * s.d_m2
        deltak = (jnp.conj(alpha) - lam * jnp.conj(sigma) * s.d_m2) \
            / _safe(d_oddk).astype(FC)
        d_evenk = nu - jnp.abs(eta) ** 2 * s.d_m3 \
            - jnp.abs(lam) ** 2 * s.d_m2 - jnp.abs(deltak) ** 2 * d_oddk
        d_odd = jnp.where(it == 1, d_odd1, d_oddk)
        delta = jnp.where(it == 1, delta1, deltak)
        d_even = jnp.where(it == 1, d_even1, d_evenk)

        # Solve LₖDₖpₖ = β₁e₁ + γ₁e₂ (reference :351-372).
        pi_odd1 = s.beta.astype(FC) / _safe(d_odd).astype(FC)
        pi_even1 = (s.gamma.astype(FC) - delta * s.beta.astype(FC)) \
            / _safe(d_even).astype(FC)
        pi_oddk = -(sigma * s.d_m2 * s.pi_m2) / _safe(d_odd).astype(FC)
        pi_evenk = -(delta * d_odd * pi_oddk + lam * s.d_m2 * s.pi_m2
                     + eta * s.d_m3 * s.pi_m3) / _safe(d_even).astype(FC)
        pi_odd = jnp.where(it == 1, pi_odd1, pi_oddk)
        pi_even = jnp.where(it == 1, pi_even1, pi_evenk)

        # Direction updates (reference :374-410).
        gx_odd1 = s.vk
        gx_even1 = -jnp.conj(delta) * gx_odd1
        gy_odd1 = jnp.zeros(n, FC)
        gy_even1 = s.uk

        gx_mid = jnp.conj(eta) * s.gx_odd + jnp.conj(lam) * s.gx_even
        gy_mid = jnp.conj(eta) * s.gy_odd + jnp.conj(lam) * s.gy_even
        gx_evenk = s.vk - jnp.conj(sigma) * s.gx_even
        gy_evenk = -jnp.conj(sigma) * s.gy_even
        gx_oddk = -gx_mid - jnp.conj(delta) * gx_evenk
        gy_oddk = s.uk - gy_mid - jnp.conj(delta) * gy_evenk
        # After the reference swap: odd slot ← "2k-1", even slot ← "2k";
        # the roles computed above are already post-swap.
        gx_odd = jnp.where(it == 1, gx_odd1, gx_evenk)
        gx_even = jnp.where(it == 1, gx_even1, gx_oddk)
        gy_odd = jnp.where(it == 1, gy_odd1, gy_evenk)
        gy_even = jnp.where(it == 1, gy_even1, gy_oddk)

        x_new = s.x + pi_odd * gx_odd + pi_even * gx_even
        y_new = s.y + pi_odd * gy_odd + pi_even * gy_even

        # Next basis vectors.
        vkp1 = M_apply(q)
        ukp1 = N_apply(p)
        beta_kp1 = jnp.sqrt(jnp.maximum(kdot(vkp1, q).real, 0))
        gamma_kp1 = jnp.sqrt(jnp.maximum(kdot(ukp1, p).real, 0))
        bok = beta_kp1 > btol
        gok = gamma_kp1 > btol
        q = jnp.where(bok, q / _safe(beta_kp1).astype(FC), q)
        vkp1 = q if MisI else jnp.where(bok, vkp1 / _safe(beta_kp1).astype(FC),
                                        vkp1)
        p = jnp.where(gok, p / _safe(gamma_kp1).astype(FC), p)
        ukp1 = p if NisI else jnp.where(gok, ukp1 / _safe(gamma_kp1).astype(FC),
                                        ukp1)

        zeta_odd = pi_odd - jnp.conj(delta) * pi_even
        zeta_even = pi_even
        rNorm = jnp.sqrt(jnp.abs(gamma_kp1 * zeta_odd) ** 2
                         + jnp.abs(beta_kp1 * zeta_even) ** 2)

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (beta_kp1 <= btol) & (gamma_kp1 <= btol)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(INCONS_TRI), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, y=y_new,
            Minv_vk=q, Minv_vkm1=s.Minv_vk,
            Ninv_uk=p, Ninv_ukm1=s.Ninv_uk,
            vk=vkp1, uk=ukp1,
            gx_odd=gx_odd, gx_even=gx_even, gy_odd=gy_odd, gy_even=gy_even,
            beta=beta_kp1, gamma=gamma_kp1,
            d_m3=d_odd, d_m2=d_even,
            pi_m3=pi_odd, pi_m2=pi_even, delta_km1=delta,
            rNorm=rNorm, iter=it, status=code, hist_r=hr,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}",
                         s_new.rNorm, beta_kp1, gamma_kp1)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _tricg_solve(
    A, b, c, x0=None, y0=None, *, M=None, N=None, ldiv=False,
    spd=False, snd=False, flip=False, sp=False, tau=1.0, nu=-1.0,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    M = as_operator(M)
    N = as_operator(N)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    tau, nu = _resolve_tau_nu(tau, nu, spd, snd, flip, sp)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "TRICG",
                   ("k", "‖rₖ‖", "βₖ₊₁", "γₖ₊₁"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (M is None and N is None and x0 is None and y0 is None
            and not history and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (tricg_dia_fused,
                                        tricg_dia_fused_supported)
        if tricg_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                     stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, code_d = tricg_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c,
                float(tau), float(nu), atol, rtol, itmax)
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=code == INCONS_TRI,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _tricg_core(
            A, M, N, b, c, x0, y0, state, jnp.int32(cap), atol, rtol,
            float(tau), float(nu),
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), MisI=M is None,
            NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    y = jnp.asarray(state.y)
    if x0 is not None:
        x = x + x0
        y = y + y0 if y0 is not None else y
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=code == INCONS_TRI,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, y, stats, state


def _tri_dw(method, solve_fn, A, b, c, x0, y0, kwargs):
    """``precision="double_word"`` for the SQD pair: dw refinement of the
    block residuals (b − τx − Ay, c − Aᴴx − νy) with the method's own
    working-precision saddle solves as inner corrections
    (solvers/_refine.pair_ir_wrap, kind="sqd").  Plain/preset τ-ν
    configurations; elliptic M/N change the system matrix itself and are
    rejected."""
    from ._refine import pair_ir_wrap

    tau, nu = _resolve_tau_nu(kwargs.get("tau", 1.0), kwargs.get("nu", -1.0),
                              kwargs.get("spd", False),
                              kwargs.get("snd", False),
                              kwargs.get("flip", False),
                              kwargs.get("sp", False))

    def inner(Aop, f1, f2, rtol_i, it_left, time_left):
        dx, dy, st, _ = solve_fn(Aop, f1, f2, atol=0.0, rtol=rtol_i,
                                 itmax=it_left, timemax=time_left,
                                 tau=tau, nu=nu)
        return dx, dy, st.niter

    return pair_ir_wrap(method, inner, A, b, c, kwargs, kind="sqd",
                        tau=tau, nu=nu, x0=x0, y0=y0,
                        reject={"M": None, "N": None},
                        # the ν=0 saddle corrections converge at the
                        # κ(A)²-grade rate (cf. _ls_ir) — budget wider
                        itmax_scale=16 if nu == 0.0 else 4)


def tricg(A, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = tricg(A, b, c; spd/snd/flip, τ, ν, M, N, ...).

    TPU extension: ``precision="double_word"`` — dw refinement of the
    SQD block residuals to fp64-grade accuracy from f32 storage."""
    hit = _tri_dw("TRICG", _tricg_solve, A, b, c, x0, y0, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _tricg_solve(A, b, c, x0, y0, **kwargs)
    return x, y, stats


# ---------------------------------------------------------------------------
# TriMR — QR of Sₖ₊₁.ₖ with a 4-reflection cascade per iteration.
# ---------------------------------------------------------------------------

class TrimrState(NamedTuple):
    x: jax.Array
    y: jax.Array
    Minv_vk: jax.Array
    Minv_vkm1: jax.Array
    Ninv_uk: jax.Array
    Ninv_ukm1: jax.Array
    vk: jax.Array
    uk: jax.Array
    gx: jax.Array          # (4, m): [gx₂ₖ₋₃ gx₂ₖ₋₂ gx₂ₖ₋₁ gx₂ₖ]
    gy: jax.Array          # (4, n)
    beta: jax.Array
    gamma: jax.Array
    # rotation registers from iteration k-1
    oc1: jax.Array
    os1: jax.Array
    oc2: jax.Array
    os2: jax.Array
    oc3: jax.Array
    os3: jax.Array
    oc4: jax.Array
    os4: jax.Array
    sbar_m2: jax.Array     # σbar₂ₖ₋₂
    ebar_m3: jax.Array     # ηbar₂ₖ₋₃
    lbar_m3: jax.Array     # λbar₂ₖ₋₃
    mu_m5: jax.Array
    mu_m4: jax.Array
    lam_m4: jax.Array
    pibar_odd: jax.Array
    pibar_even: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "MisI", "NisI"),
)
def _trimr_core(
    A, M, N, b, c, x0, y0, state_in, iter_cap, atol, rtol, tau, nu,
    *, ldiv, history, hist_len, callback, verbose, MisI, NisI,
):
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    tau_c = jnp.asarray(tau, T).astype(FC)
    nu_c = jnp.asarray(nu, T).astype(FC)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(m, FC)
        y = jnp.zeros(n, FC)
        if x0 is None:
            b0, c0 = b, c
        else:
            b0 = b - A.matvec(y0) - tau_c * x0
            c0 = c - A.rmatvec(x0) - nu_c * y0
        Minv_v = b0
        vk = M_apply(Minv_v)
        beta = jnp.sqrt(jnp.maximum(kdot(vk, Minv_v).real, 0))
        Minv_v = jnp.where(beta != 0, Minv_v / _safe(beta).astype(FC),
                           jnp.zeros(m, FC))
        vk = Minv_v if MisI else jnp.where(beta != 0,
                                           vk / _safe(beta).astype(FC),
                                           jnp.zeros(m, FC))
        Ninv_u = c0
        uk = N_apply(Ninv_u)
        gamma = jnp.sqrt(jnp.maximum(kdot(uk, Ninv_u).real, 0))
        Ninv_u = jnp.where(gamma != 0, Ninv_u / _safe(gamma).astype(FC),
                           jnp.zeros(n, FC))
        uk = Ninv_u if NisI else jnp.where(gamma != 0,
                                           uk / _safe(gamma).astype(FC),
                                           jnp.zeros(n, FC))
        rNorm = jnp.sqrt(gamma * gamma + beta * beta)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        status = jnp.where(rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        zc = jnp.zeros((), FC)
        zt = jnp.zeros((), T)
        state = TrimrState(
            x=x, y=y, Minv_vk=Minv_v, Minv_vkm1=jnp.zeros(m, FC),
            Ninv_uk=Ninv_u, Ninv_ukm1=jnp.zeros(n, FC), vk=vk, uk=uk,
            gx=jnp.zeros((4, m), FC), gy=jnp.zeros((4, n), FC),
            beta=beta, gamma=gamma,
            oc1=zt, os1=zc, oc2=zt, os2=zc, oc3=zt, os3=zc, oc4=zt, os4=zc,
            sbar_m2=zc, ebar_m3=zc, lbar_m3=zc,
            mu_m5=zc, mu_m4=zc, lam_m4=zc,
            pibar_odd=beta.astype(FC), pibar_even=gamma.astype(FC),
            rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        q = A.matvec(s.uk)
        p = A.rmatvec(s.vk)
        q = jnp.where(it >= 2, q - s.gamma.astype(FC) * s.Minv_vkm1, q)
        p = jnp.where(it >= 2, p - s.beta.astype(FC) * s.Ninv_ukm1, p)
        alpha = kdot(s.vk, q)
        q = q - alpha * s.Minv_vk
        p = p - jnp.conj(alpha) * s.Ninv_uk

        vkp1 = M_apply(q)
        ukp1 = N_apply(p)
        beta_kp1 = jnp.sqrt(jnp.maximum(kdot(vkp1, q).real, 0))
        gamma_kp1 = jnp.sqrt(jnp.maximum(kdot(ukp1, p).real, 0))
        bok = beta_kp1 > btol
        gok = gamma_kp1 > btol
        q = jnp.where(bok, q / _safe(beta_kp1).astype(FC), q)
        vkp1_n = q if MisI else jnp.where(bok, vkp1 / _safe(beta_kp1).astype(FC), vkp1)
        p = jnp.where(gok, p / _safe(gamma_kp1).astype(FC), p)
        ukp1_n = p if NisI else jnp.where(gok, ukp1 / _safe(gamma_kp1).astype(FC), ukp1)

        bc = beta_kp1.astype(FC)
        gc = gamma_kp1.astype(FC)

        # iter == 1 initial column values.
        thetabar1 = jnp.conj(alpha)
        dbar_odd1 = tau_c
        dbar_even1 = nu_c
        sbar_odd1 = alpha
        sbar_even1 = bc
        lbar_odd1 = gc
        ebar_odd1 = jnp.zeros((), FC)

        # iter ≥ 2: apply the four previous reflections (reference :370-404).
        sbis_m2 = s.oc1.astype(FC) * s.sbar_m2 + s.os1 * jnp.conj(alpha)
        ebis_m2 = s.os1 * nu_c
        lbis_m2 = s.os1 * bc
        thbis = jnp.conj(s.os1) * s.sbar_m2 - s.oc1.astype(FC) * jnp.conj(alpha)
        dbis_even = -s.oc1.astype(FC) * nu_c
        sbis_even = -s.oc1.astype(FC) * bc

        e_m3 = s.oc2.astype(FC) * s.ebar_m3 + s.os2 * sbis_m2
        l_m3 = s.oc2.astype(FC) * s.lbar_m3 + s.os2 * ebis_m2
        mu_m3 = s.os2 * lbis_m2
        shat_m2 = jnp.conj(s.os2) * s.ebar_m3 - s.oc2.astype(FC) * sbis_m2
        ehat_m2 = jnp.conj(s.os2) * s.lbar_m3 - s.oc2.astype(FC) * ebis_m2
        lhat_m2 = -s.oc2.astype(FC) * lbis_m2

        stmp_m2 = s.oc3.astype(FC) * shat_m2 + s.os3 * thbis
        etmp_m2 = s.oc3.astype(FC) * ehat_m2 + s.os3 * dbis_even
        ltmp_m2 = s.oc3.astype(FC) * lhat_m2 + s.os3 * sbis_even
        thetabar_k = jnp.conj(s.os3) * shat_m2 - s.oc3.astype(FC) * thbis
        dbar_even_k = jnp.conj(s.os3) * ehat_m2 - s.oc3.astype(FC) * dbis_even
        sbar_even_k = jnp.conj(s.os3) * lhat_m2 - s.oc3.astype(FC) * sbis_even

        s_m2 = s.oc4.astype(FC) * stmp_m2 + s.os4 * tau_c
        e_m2 = s.oc4.astype(FC) * etmp_m2 + s.os4 * alpha
        l_m2 = s.oc4.astype(FC) * ltmp_m2
        mu_m2 = s.os4 * gc
        dbar_odd_k = jnp.conj(s.os4) * stmp_m2 - s.oc4.astype(FC) * tau_c
        sbar_odd_k = jnp.conj(s.os4) * etmp_m2 - s.oc4.astype(FC) * alpha
        ebar_odd_k = jnp.conj(s.os4) * ltmp_m2
        lbar_odd_k = -s.oc4.astype(FC) * gc

        first = it == 1
        thetabar = jnp.where(first, thetabar1, thetabar_k)
        dbar_odd = jnp.where(first, dbar_odd1, dbar_odd_k)
        dbar_even = jnp.where(first, dbar_even1, dbar_even_k)
        sbar_odd = jnp.where(first, sbar_odd1, sbar_odd_k)
        sbar_even = jnp.where(first, sbar_even1, sbar_even_k)
        lbar_odd = jnp.where(first, lbar_odd1, lbar_odd_k)
        ebar_odd = jnp.where(first, ebar_odd1, ebar_odd_k)
        e_m3 = jnp.where(first, jnp.zeros((), FC), e_m3)
        l_m3 = jnp.where(first, jnp.zeros((), FC), l_m3)
        mu_m3 = jnp.where(first, jnp.zeros((), FC), mu_m3)
        s_m2 = jnp.where(first, jnp.zeros((), FC), s_m2)
        e_m2 = jnp.where(first, jnp.zeros((), FC), e_m2)
        l_m2 = jnp.where(first, jnp.zeros((), FC), l_m2)
        mu_m2 = jnp.where(first, jnp.zeros((), FC), mu_m2)

        # Current 4-reflection cascade (reference :406-443).
        c1, s1, theta_k = sym_givens(thetabar, gc)
        g_k = jnp.conj(s1) * dbar_even
        dbar_even2 = c1.astype(FC) * dbar_even
        c2, s2, d_odd = sym_givens(dbar_odd, theta_k)
        s_odd = c2.astype(FC) * sbar_odd + s2 * dbar_even2
        dbis_even2 = jnp.conj(s2) * sbar_odd - c2.astype(FC) * dbar_even2
        c3, s3, dhat_even = sym_givens(dbis_even2, g_k)
        c4, s4, d_even = sym_givens(dhat_even, bc)

        # Directions (reference :445-480); gx rows: [m3, m2, m1, 0] ↦
        # [g₂ₖ₋₃ g₂ₖ₋₂ g₂ₖ₋₁ g₂ₖ] *after* the end-of-iteration swaps.
        sd_odd = _safe(d_odd)
        sd_even = _safe(d_even)
        # it == 1
        gx1_odd = s.vk / sd_odd
        gx1_even = (-s_odd * gx1_odd) / sd_even
        gy1_odd = jnp.zeros(n, FC)
        gy1_even = s.uk / sd_even
        # it == 2 (old odd/even live in rows 2,3)
        gx2_odd = (s.vk - e_m3 * s.gx[2] - s_m2 * s.gx[3]) / sd_odd
        gx2_even = (-l_m3 * s.gx[2] - e_m2 * s.gx[3] - s_odd * gx2_odd) / sd_even
        gy2_odd = (-e_m3 * s.gy[2] - s_m2 * s.gy[3]) / sd_odd
        gy2_even = (s.uk - l_m3 * s.gy[2] - e_m2 * s.gy[3] - s_odd * gy2_odd) / sd_even
        # it ≥ 3
        gx3_odd = (s.vk - s.mu_m5 * s.gx[0] - s.lam_m4 * s.gx[1]
                   - e_m3 * s.gx[2] - s_m2 * s.gx[3]) / sd_odd
        gx3_even = (-s.mu_m4 * s.gx[1] - l_m3 * s.gx[2] - e_m2 * s.gx[3]
                    - s_odd * gx3_odd) / sd_even
        gy3_odd = (-s.mu_m5 * s.gy[0] - s.lam_m4 * s.gy[1]
                   - e_m3 * s.gy[2] - s_m2 * s.gy[3]) / sd_odd
        gy3_even = (s.uk - s.mu_m4 * s.gy[1] - l_m3 * s.gy[2] - e_m2 * s.gy[3]
                    - s_odd * gy3_odd) / sd_even

        gx_odd = jnp.where(first, gx1_odd, jnp.where(it == 2, gx2_odd, gx3_odd))
        gx_even = jnp.where(first, gx1_even, jnp.where(it == 2, gx2_even, gx3_even))
        gy_odd = jnp.where(first, gy1_odd, jnp.where(it == 2, gy2_odd, gy3_odd))
        gy_even = jnp.where(first, gy1_even, jnp.where(it == 2, gy2_even, gy3_even))

        # π updates (reference :482-494).
        pibis_even = c1.astype(FC) * s.pibar_even
        pibis_next_even = jnp.conj(s1) * s.pibar_even
        pi_odd = c2.astype(FC) * s.pibar_odd + s2 * pibis_even
        pihat_even = jnp.conj(s2) * s.pibar_odd - c2.astype(FC) * pibis_even
        pitmp = c3.astype(FC) * pihat_even + s3 * pibis_next_even
        pibar_next_even = jnp.conj(s3) * pihat_even - c3.astype(FC) * pibis_next_even
        pi_even = c4.astype(FC) * pitmp
        pibar_next_odd = jnp.conj(s4) * pitmp

        x_new = s.x + pi_odd * gx_odd + pi_even * gx_even
        y_new = s.y + pi_odd * gy_odd + pi_even * gy_even
        rNorm = jnp.sqrt(jnp.abs(pibar_next_odd) ** 2
                         + jnp.abs(pibar_next_even) ** 2)

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (beta_kp1 <= btol) & (gamma_kp1 <= btol)
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(breakdown, jnp.int32(INCONS_TRI), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        gx_new = jnp.stack([s.gx[2], s.gx[3], gx_odd, gx_even])
        gy_new = jnp.stack([s.gy[2], s.gy[3], gy_odd, gy_even])

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, y=y_new,
            Minv_vk=q, Minv_vkm1=s.Minv_vk,
            Ninv_uk=p, Ninv_ukm1=s.Ninv_uk,
            vk=vkp1_n, uk=ukp1_n,
            gx=gx_new, gy=gy_new,
            beta=beta_kp1, gamma=gamma_kp1,
            oc1=jnp.real(c1), os1=jnp.asarray(s1, FC),
            oc2=jnp.real(c2), os2=jnp.asarray(s2, FC),
            oc3=jnp.real(c3), os3=jnp.asarray(s3, FC),
            oc4=jnp.real(c4), os4=jnp.asarray(s4, FC),
            sbar_m2=sbar_even, ebar_m3=ebar_odd, lbar_m3=lbar_odd,
            mu_m5=jnp.where(it >= 2, mu_m3, s.mu_m5),
            mu_m4=jnp.where(it >= 2, mu_m2, s.mu_m4),
            lam_m4=jnp.where(it >= 2, l_m2, s.lam_m4),
            pibar_odd=pibar_next_odd, pibar_even=pibar_next_even,
            rNorm=rNorm, iter=it, status=code, hist_r=hr,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}",
                         s_new.rNorm, beta_kp1, gamma_kp1)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _trimr_solve(
    A, b, c, x0=None, y0=None, *, M=None, N=None, ldiv=False,
    spd=False, snd=False, flip=False, sp=False, tau=1.0, nu=-1.0,
    atol=None, rtol=None, itmax=0, timemax=float("inf"), verbose=0,
    history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    M = as_operator(M)
    N = as_operator(N)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m, n = A.shape
    tau, nu = _resolve_tau_nu(tau, nu, spd, snd, flip, sp)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "TRIMR",
                   ("k", "‖rₖ‖", "βₖ₊₁", "γₖ₊₁"), m, n)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: square DIA stencil + default config → fused kernel.
    if (M is None and N is None and x0 is None and y0 is None
            and not history and callback is None and verbose == 0
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (trimr_dia_fused,
                                        trimr_dia_fused_supported)
        if trimr_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                     stencil_dtype=A._pd.dtype):
            pd_adj, offs_adj = A.aligned_adjoint()
            x, y, niter, rnorm, code_d = trimr_dia_fused(
                A._pd, pd_adj, A.dia.offsets, offs_adj, b, c,
                float(tau), float(nu), atol, rtol, itmax)
            niter, code = jax.device_get([niter, code_d])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=code == INCONS_TRI,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code, _STATUS),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _trimr_core(
            A, M, N, b, c, x0, y0, state, jnp.int32(cap), atol, rtol,
            float(tau), float(nu),
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), MisI=M is None,
            NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    y = jnp.asarray(state.y)
    if x0 is not None:
        x = x + x0
        y = y + y0 if y0 is not None else y
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=code == INCONS_TRI,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code, _STATUS),
    )
    return x, y, stats, state


def trimr(A, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = trimr(A, b, c; spd/snd/flip/sp, τ, ν, M, N, ...).

    TPU extension: ``precision="double_word"`` — dw refinement of the
    SQD block residuals to fp64-grade accuracy from f32 storage."""
    hit = _tri_dw("TRIMR", _trimr_solve, A, b, c, x0, y0, kwargs)
    if hit is not None:
        return hit
    x, y, stats, _ = _trimr_solve(A, b, c, x0, y0, **kwargs)
    return x, y, stats

