"""LSQR: min ‖b − Ax‖ (+ λ regularization) via Golub-Kahan bidiagonalization.

Parity with reference src/lsqr.jl: λ/sqd regularization, M/N elliptic
norms, ``radius`` trust region, the Paige-Saunders stopping rules
(axtol/btol/conlim/etol + atol/rtol on ‖Aᴴr‖), forward-error window, and
the status vocabulary of src/lsqr.jl:414-423.  1 A-product and 1
Aᴴ-product per iteration.
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
from ..ops.kops import kdotr, kdotr2, sym_givens, to_boundary
from ..stats import SimpleStats


class LsqrState(NamedTuple):
    x: jax.Array
    u: jax.Array
    Mu: jax.Array
    v: jax.Array
    Nv: jax.Array
    w: jax.Array
    alpha: jax.Array
    beta: jax.Array
    phibar: jax.Array
    rhobar: jax.Array
    anorm2: jax.Array
    dnorm2: jax.Array
    xnorm2: jax.Array
    res2: jax.Array
    c2: jax.Array
    s2: jax.Array
    zsc: jax.Array
    xenorm2: jax.Array
    err_vec: jax.Array
    rNorm: jax.Array
    ArNorm: jax.Array
    ArNorm0: jax.Array
    beta1: jax.Array
    iter: jax.Array
    status: jax.Array
    zero_resid: jax.Array
    hist_r: jax.Array
    hist_ar: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("ldiv", "history", "hist_len", "callback", "verbose",
                     "window", "use_radius", "MisI", "NisI", "dot2"),
)
def _lsqr_core(
    A, M, N, b, state_in, iter_cap, itmax, lam, axtol, btol, atol, rtol,
    etol, conlim, radius,
    *, ldiv, history, hist_len, callback, verbose, window, use_radius,
    MisI, NisI, dot2=False,
):
    # precision="compensated": Dot2 reductions for the Golub-Kahan norms
    from ..ops import kops as _k
    kdotr = _k.kdotr2 if dot2 else _k.kdotr
    m, n = A.shape
    FC = b.dtype
    T = real_dtype(FC)
    lam = jnp.asarray(lam, T)
    lam2 = lam * lam
    radius = jnp.asarray(radius, T)
    ctol = jnp.where(jnp.asarray(conlim, T) > 0,
                     1.0 / jnp.asarray(conlim, T), jnp.zeros((), T))

    def M_apply(t):
        return precond_apply(M, t, ldiv)

    def N_apply(t):
        return precond_apply(N, t, ldiv)

    if state_in is None:
        x = jnp.zeros(n, FC)
        Mu = b
        u = M_apply(Mu)
        beta1 = jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))
        safe_b1 = jnp.where(beta1 == 0, jnp.ones_like(beta1), beta1)
        u = u / safe_b1.astype(FC)
        Mu = u if MisI else Mu / safe_b1.astype(FC)
        Ahu = A.rmatvec(u)
        Nv = Ahu
        v = N_apply(Nv)
        anorm2 = kdotr(v, Nv)
        alpha = jnp.sqrt(jnp.maximum(anorm2, 0))
        safe_a = jnp.where(alpha == 0, jnp.ones_like(alpha), alpha)
        v = v / safe_a.astype(FC)
        Nv = v if NisI else Nv / safe_a.astype(FC)
        ArNorm0 = alpha * beta1

        status = jnp.where(
            beta1 == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(alpha == 0, jnp.int32(rt.MIN_LSQ_X), jnp.int32(rt.RUNNING)),
        )
        # Pre-loop solved tests (reference :283-296).
        safe_rn = jnp.where(beta1 == 0, jnp.ones_like(beta1), beta1)
        t2 = ArNorm0 / (jnp.sqrt(jnp.maximum(anorm2, jnp.finfo(T).tiny)) * safe_rn)
        solved0 = (t2 <= axtol) | ((1.0 + t2) <= 1.0)
        status = jnp.where((status == rt.RUNNING) & solved0,
                           jnp.int32(rt.SOLVED_LSQ), status)

        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, beta1, history)
        har = rt.hist_init(hist_len, T)
        har = rt.hist_write(har, 0, ArNorm0, history)
        state = LsqrState(
            x=x, u=u, Mu=Mu, v=v, Nv=Nv, w=v,
            alpha=alpha, beta=beta1, phibar=beta1, rhobar=alpha,
            anorm2=anorm2, dnorm2=jnp.zeros((), T), xnorm2=jnp.zeros((), T),
            res2=jnp.zeros((), T), c2=-jnp.ones((), T), s2=jnp.zeros((), T),
            zsc=jnp.zeros((), T), xenorm2=jnp.zeros((), T),
            err_vec=jnp.zeros((window,), T),
            rNorm=beta1, ArNorm=ArNorm0, ArNorm0=ArNorm0, beta1=beta1,
            iter=jnp.int32(0), status=status,
            zero_resid=jnp.zeros((), jnp.bool_),
            hist_r=hr, hist_ar=har,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        # Golub-Kahan step.
        Av = A.matvec(s.v)
        Mu = Av - s.alpha.astype(FC) * s.Mu
        u = M_apply(Mu)
        beta = jnp.sqrt(jnp.maximum(kdotr(u, Mu), 0))
        bnz = beta != 0
        safe_b = jnp.where(bnz, beta, jnp.ones_like(beta))
        u = jnp.where(bnz, u / safe_b.astype(FC), u)
        Mu = u if MisI else jnp.where(bnz, Mu / safe_b.astype(FC), Mu)
        anorm2 = jnp.where(
            bnz, s.anorm2 + s.alpha * s.alpha + beta * beta
            + jnp.where(lam > 0, lam2, 0), s.anorm2
        )
        Ahu = A.rmatvec(u)
        Nv = jnp.where(bnz, Ahu - beta.astype(FC) * s.Nv, s.Nv)
        v = jnp.where(bnz, N_apply(Nv), s.v)
        alpha = jnp.where(bnz, jnp.sqrt(jnp.maximum(kdotr(v, Nv), 0)), s.alpha)
        anz = bnz & (alpha != 0)
        safe_a = jnp.where(anz, alpha, jnp.ones_like(alpha))
        v = jnp.where(anz, v / safe_a.astype(FC), v)
        Nv = v if NisI else jnp.where(anz, Nv / safe_a.astype(FC), Nv)

        # Rotation 1: eliminate λ.
        c1, s1, rhobar1 = sym_givens(s.rhobar, lam)
        psi = s1 * s.phibar
        phibar_mid = c1 * s.phibar
        # Rotation 2: eliminate β.
        c, sg, rho = sym_givens(rhobar1, beta)
        phi = c * phibar_mid
        phibar = sg * phibar_mid

        xenorm2 = s.xenorm2 + phi * phi
        err_vec = s.err_vec.at[jnp.mod(it, window)].set(phi)
        err_lbnd = jnp.linalg.norm(err_vec)

        tau = sg * phi
        theta = sg * alpha
        rhobar = -c * alpha
        safe_rho = jnp.where(rho == 0, jnp.ones_like(rho), rho)
        dnorm2 = s.dnorm2 + kdotr(s.w, s.w) / (safe_rho * safe_rho)

        sigma = phi / safe_rho
        on_boundary = jnp.zeros((), jnp.bool_)
        if use_radius:
            t1b, t2b = to_boundary(s.x, s.w, radius)
            tmax = jnp.maximum(t1b, t2b)
            tmin = jnp.minimum(t1b, t2b)
            on_boundary = (sigma > tmax) | (sigma < tmin)
            sigma = jnp.where(sigma > 0, jnp.minimum(sigma, tmax),
                              jnp.maximum(sigma, tmin))

        x = s.x + sigma.astype(FC) * s.w
        w = v - (theta / safe_rho).astype(FC) * s.w

        # Right rotation to estimate ‖x‖.
        delta = s.s2 * rho
        gbar = -s.c2 * rho
        rhs = phi - delta * s.zsc
        safe_g = jnp.where(gbar == 0, jnp.ones_like(gbar), gbar)
        zbar = rhs / safe_g
        xNorm = jnp.sqrt(s.xnorm2 + zbar * zbar)
        c2, s2, gamma = sym_givens(gbar, theta)
        safe_gm = jnp.where(gamma == 0, jnp.ones_like(gamma), gamma)
        zsc = rhs / safe_gm
        xnorm2 = s.xnorm2 + zsc * zsc

        anorm = jnp.sqrt(anorm2)
        acond = anorm * jnp.sqrt(dnorm2)
        res1 = phibar * phibar
        res2 = s.res2 + psi * psi
        rNorm = jnp.sqrt(res1 + res2)
        ArNorm = alpha * jnp.abs(tau)

        tiny = jnp.finfo(T).tiny
        test1 = rNorm / s.beta1
        test2 = ArNorm / jnp.maximum(anorm * rNorm, tiny)
        test3 = 1.0 / jnp.maximum(acond, tiny)
        t1 = test1 / (1.0 + anorm * xNorm / s.beta1)
        rNormtol = jnp.asarray(btol, T) + jnp.asarray(axtol, T) * anorm * xNorm / s.beta1

        ill_cond_mach = (1.0 + test3) <= 1.0
        solved_mach = (1.0 + test2) <= 1.0
        zero_resid_mach = (1.0 + t1) <= 1.0
        tired = it >= itmax
        ill_cond_lim = test3 <= ctol
        solved_lim = test2 <= axtol
        solved_opt = ArNorm <= jnp.asarray(atol, T) + jnp.asarray(rtol, T) * s.ArNorm0
        zero_resid_lim = test1 <= rNormtol
        fwd_err = (it >= window) & (
            err_lbnd <= jnp.asarray(etol, T) * jnp.sqrt(xenorm2)
        )

        ill_cond = ill_cond_mach | ill_cond_lim
        zero_resid = zero_resid_mach | zero_resid_lim
        solved = (solved_mach | solved_lim | solved_opt | zero_resid
                  | fwd_err | on_boundary)

        # Status chain (reference :414-423, later wins).
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ill_cond_mach, jnp.int32(rt.ILL_COND_MACH), code)
        code = jnp.where(ill_cond_lim, jnp.int32(rt.COND_EXCEEDED), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED_LSQ), code)
        code = jnp.where(solved & zero_resid, jnp.int32(rt.SOLVED_ZERO), code)
        code = jnp.where(solved & fwd_err, jnp.int32(rt.FWD_ERR), code)
        code = jnp.where(solved & on_boundary, jnp.int32(rt.ON_BOUNDARY), code)

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        har = rt.hist_write(s.hist_ar, it, ArNorm, history)
        s_new = s._replace(
            x=x, u=u, Mu=Mu, v=v, Nv=Nv, w=w,
            alpha=alpha, beta=beta, phibar=phibar, rhobar=rhobar,
            anorm2=anorm2, dnorm2=dnorm2, xnorm2=xnorm2, res2=res2,
            c2=c2, s2=s2, zsc=zsc, xenorm2=xenorm2, err_vec=err_vec,
            rNorm=rNorm, ArNorm=ArNorm, iter=it, status=code,
            zero_resid=zero_resid, hist_r=hr, hist_ar=har,
        )
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit, jnp.int32(rt.USER_EXIT), s_new.status)
            )
        if verbose > 0:
            rt.debug_row(
                verbose, it,
                "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  {:7.1e}  "
                "{:7.1e}  {:7.1e}  {:7.1e}",
                alpha, beta, rNorm, ArNorm, test1, test2, anorm, acond)
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _lsqr_fused_path(A, b, lam, axtol, btol, atol, rtol, etol, conlim,
                     itmax, window, start):
    """Whole-solve-in-VMEM fused LSQR (ops/pallas_fused.lsqr_dia_fused)."""
    from ..ops.pallas_fused import lsqr_dia_fused

    pd_adj, offs_adj = A.aligned_adjoint()
    x, niter, rnorm, arnorm, status, zr = lsqr_dia_fused(
        A._pd, pd_adj, A.dia.offsets, offs_adj, b, lam, axtol, btol,
        atol, rtol, etol, conlim, itmax, window=window)
    niter, code, zr = jax.device_get([niter, status, zr])
    niter = int(niter)
    code = rt.final_status_code(int(code), niter, itmax, False)
    inconsistent = not bool(zr)
    if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        inconsistent = False
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        residuals=np.zeros(0),
        Aresiduals=np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return jnp.asarray(x), stats, None


def _lsqr_solve(
    A, b, *, M=None, N=None, ldiv=False, sqd=False, lam=0.0, radius=0.0,
    axtol=None, btol=None, atol=0.0, rtol=0.0, etol=None, conlim=1.0e8,
    window=5, itmax=0, timemax=float("inf"), verbose=0, history=False,
    callback=None, precision=None,
):
    start = time.perf_counter()
    if precision not in (None, "working", "compensated"):
        raise ValueError(
            "lsqr precision must be None, 'working' or 'compensated'")
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
    axtol = rt.default_tol(axtol, T)
    btol = rt.default_tol(btol, T)
    etol = rt.default_tol(etol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    hist_len = itmax + 1 if history else 0
    rt.debug_header(verbose, f"LSQR: system of {m} equations in {n} variables")
    rt.debug_header(
        verbose,
        f"{'k':>5s}  {'α':>7s}  {'β':>7s}  {'‖r‖':>7s}  {'‖Aᴴr‖':>7s}  "
        f"{'compat':>7s}  {'backwrd':>7s}  {'‖A‖':>7s}  {'κ(A)':>7s}")

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (Golub-Kahan over the stencil and its adjoint, all vectors in VMEM).
    if (M is None and N is None and radius == 0 and not history
            and callback is None and verbose == 0
            and precision != "compensated"
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import lsqr_dia_fused_supported
        if lsqr_dia_fused_supported(A.dia.offsets, m, b.dtype,
                                    stencil_dtype=A._pd.dtype):
            return _lsqr_fused_path(
                A, b, float(lam), axtol, btol, float(atol), float(rtol),
                etol, float(conlim), itmax, int(window), start)

    def run(state, cap):
        return _lsqr_core(
            A, M, N, b, state, jnp.int32(cap), jnp.int32(itmax),
            float(lam), axtol, btol, float(atol), float(rtol), etol,
            float(conlim), float(radius),
            ldiv=bool(ldiv), history=bool(history), hist_len=hist_len,
            callback=callback, verbose=int(verbose), window=int(window),
            use_radius=bool(radius > 0), MisI=M is None, NisI=N is None,
            dot2=precision == "compensated",
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    inconsistent = not bool(state.zero_resid)
    if code in (rt.ZERO_RESIDUAL, rt.MIN_LSQ_X):
        inconsistent = False
    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        Aresiduals=rt.hist_trim(state.hist_ar, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return jnp.asarray(state.x), stats, state


def _ls_ir(method, solve_fn, A, b, *, lam=0.0, reg_of_lam=lambda l: l * l,
           atol=None, rtol=None, itmax=0, timemax=float("inf"),
           stats_cls=None, **stats_extra):
    """Shared dw wiring for the Golub-Kahan LS family
    (precision="double_word"): Carson-Higham augmented-system iterative
    refinement (solvers/_refine.ir_solve_ls; TriMR inner corrections).
    ``reg_of_lam`` maps the method's λ kwarg to the multiplier on x in
    the optimality system Aᴴ(b−Ax) = reg·x (λ² for LSQR/LSMR, λ for
    CGLS).  ``solve_fn`` is kept for signature symmetry with the square
    dw wrappers (the certificate is method-independent)."""
    from ._refine import ir_solve_ls
    from ..stats import SimpleStats

    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    b = jnp.asarray(b)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    m, n = A.shape
    # IR runs several inner solves; budget accordingly (a single-solve
    # default of m+n starves the outer loop; the nu=0 saddle corrections
    # of the unregularized case cost ~kappa(A)^2-grade TriMR iterations)
    itmax = rt.resolve_itmax(itmax, 16 * (m + n))
    reg = float(reg_of_lam(float(lam)))

    def first(rhs, it_left, time_left):
        d, st, _ = solve_fn(A, rhs, lam=lam, itmax=it_left,
                            timemax=time_left if np.isfinite(time_left)
                            else float("inf"))
        return d, st.niter

    return ir_solve_ls(A, b, None, reg, atol, rtol, itmax, timemax,
                       start, first=first, stats_cls=stats_cls or SimpleStats,
                       **stats_extra)


def _ls_ir_guard(method, kwargs):
    """check_ir_config flags for an LS-family dw request: every option the
    dw certificate cannot honor, with truthy-by-default options compared
    against their defaults (ADVICE r3: no silent swallowing)."""
    return dict(
        history=kwargs.get("history", False),
        callback=kwargs.get("callback"),
        M=kwargs.get("M"), N=kwargs.get("N"), ldiv=kwargs.get("ldiv", False),
        radius=kwargs.get("radius", 0.0), sqd=kwargs.get("sqd", False),
        etol=kwargs.get("etol") or 0.0,
        axtol=kwargs.get("axtol") is not None,
        btol=kwargs.get("btol") is not None,
        window=kwargs.get("window", 5) != 5,
        conlim=kwargs.get("conlim", 1.0e8) != 1.0e8,
        verbose=kwargs.get("verbose", 0),
    )


def lsqr(A, b, **kwargs):
    """x, stats = lsqr(A, b; λ, sqd, M, N, radius, ...).

    TPU extension: ``precision="double_word"`` runs least-squares
    iterative refinement (Carson & Higham 2018) — the dw
    normal-equations residual Aᴴ(b−Ax) − λ²x certifies fp64-grade LS
    optimality from f32 device storage.  Plain configuration only
    (λ allowed; no M/N/radius/sqd/etol/history/callback).
    """
    from ._refine import check_ir_config

    precision = kwargs.get("precision")
    if check_ir_config("LSQR", precision, compensated=True,
                       **_ls_ir_guard("LSQR", kwargs)):
        fwd = {k: kwargs[k] for k in ("lam", "atol", "rtol", "itmax",
                                      "timemax") if k in kwargs}
        x, stats, _ = _ls_ir("LSQR", _lsqr_solve, A, b, **fwd)
        return x, stats
    x, stats, _ = _lsqr_solve(A, b, **kwargs)
    return x, stats
