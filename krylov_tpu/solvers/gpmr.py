"""GPMR for generalized partitioned systems [λI A; B μI][x; y] = [b; c].

Parity with reference src/gpmr.jl: the only method applying two
independent operators A (m×n) and B (n×m); 4 preconditioners C, D, E, F
(CAF/DBE split), λ/μ block scalars, the orthogonal Hessenberg reduction
(Montoison-Orban process) with a 4-reflection QR cascade per iteration,
singular-R inconsistency detection.  The basis is preallocated at
min(iterations, memory_cap) static slots (jit static shapes; the
reference grows dynamically, src/gpmr.jl:305-313).
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
from ..ops.kops import knorm, sym_givens
from ..stats import SimpleStats


def _safe(d):
    return jnp.where(d == 0, jnp.ones_like(d), d)


class GpmrState(NamedTuple):
    V: jax.Array           # (mem+1, m)
    U: jax.Array           # (mem+1, n)
    R: jax.Array           # (2*mem+2, 2*mem) columns of the QR factor
    zt: jax.Array          # (2*mem+2,)
    gc: jax.Array          # (4*mem,)
    gs: jax.Array          # (4*mem,)
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


def _apply_quad_rotations(col_o, col_e, gc, gs, k, mem):
    """Vectorized reflection-quadruple chain for the two new S_{k+1,k}
    columns (reference src/gpmr.jl:381-409).

    Step i (1-based, active for i <= k-1) rotates rows
    (2i-1, 2i, 2i+1, 2i+2) with the quadruple (c1..c4, s1..s4); the pair
    it leaves at rows (2i+1, 2i+2) is what step i+1 reads as its leading
    pair, so the sequential dependence is a 2-vector affine recurrence
    carry_next = M_i @ carry + d_i (M_i from the stored (c, s) quadruple,
    d_i from the column's ORIGINAL rows 2i+1/2i+2), and the whole chain
    runs as one log2(mem)-depth lax.associative_scan over 2x2 affine
    maps.  Identical arithmetic to the sequential form (each coefficient
    below is the literal composition of the four rotations).
    """
    FC = col_o.dtype
    rows = col_o.shape[0] // 2          # mem + 1
    i0 = jnp.arange(mem)
    act = (i0 + 1) <= (k - 1)
    one = jnp.ones((), FC)
    zero = jnp.zeros((), FC)
    c1 = gc[4 * i0].astype(FC)
    c2 = gc[4 * i0 + 1].astype(FC)
    c3 = gc[4 * i0 + 2].astype(FC)
    c4 = gc[4 * i0 + 3].astype(FC)
    s1 = gs[4 * i0]
    s2 = gs[4 * i0 + 1]
    s3 = gs[4 * i0 + 2]
    s4 = gs[4 * i0 + 3]
    # r2b = c3*(conj(s2)*r1a - c2*r2) + s3*(conj(s1)*r1 - c1*r4),
    # with r1a = c1*r1 + s1*r4  (primes spelled a/b/c)
    a_r2b_r1 = c3 * jnp.conj(s2) * c1 + s3 * jnp.conj(s1)
    a_r2b_r2 = -c3 * c2
    b_r2b_r4 = c3 * jnp.conj(s2) * s1 - s3 * c1
    # carry_next = (r3a, r4b):
    m00 = jnp.conj(s4) * a_r2b_r1             # r3a wrt r1
    m01 = jnp.conj(s4) * a_r2b_r2             # r3a wrt r2
    m10 = jnp.conj(s3) * jnp.conj(s2) * c1 - c3 * jnp.conj(s1)
    m11 = -jnp.conj(s3) * c2
    b_r4b_r4 = jnp.conj(s3) * jnp.conj(s2) * s1 + c3 * c1
    # outputs written at row i-1:
    o1_r1 = c2 * c1                           # r1b wrt r1
    o1_r2 = s2
    o1_r4 = c2 * s1
    o2_r1 = c4 * a_r2b_r1                     # r2c wrt r1
    o2_r2 = c4 * a_r2b_r2
    o2_r3 = s4
    o2_r4 = c4 * b_r2b_r4
    M = jnp.stack([
        jnp.stack([jnp.where(act, m00, one), jnp.where(act, m01, zero)],
                  -1),
        jnp.stack([jnp.where(act, m10, zero), jnp.where(act, m11, one)],
                  -1),
    ], -2)                                    # (mem, 2, 2)

    def comb(p, q):
        Mp, dp = p
        Mq, dq = q
        return (jnp.einsum("...ij,...jk->...ik", Mq, Mp),
                jnp.einsum("...ij,...j->...i", Mq, dp) + dq)

    def run(col):
        C = col.reshape(rows, 2)
        r3 = C[1:mem + 1, 0]
        r4 = C[1:mem + 1, 1]
        d = jnp.stack([
            jnp.where(act, jnp.conj(s4) * b_r2b_r4 * r4 - c4 * r3, zero),
            jnp.where(act, b_r4b_r4 * r4, zero),
        ], -1)                                # (mem, 2)
        Mc, dc = jax.lax.associative_scan(comb, (M, d))
        carries = jnp.concatenate(
            [C[0][None], jnp.einsum("kij,j->ki", Mc, C[0]) + dc])
        cr1 = carries[:mem, 0]
        cr2 = carries[:mem, 1]
        out1 = o1_r1 * cr1 + o1_r2 * cr2 + o1_r4 * r4
        out2 = o2_r1 * cr1 + o2_r2 * cr2 + o2_r3 * r3 + o2_r4 * r4
        new_rows = jnp.where(act[:, None], jnp.stack([out1, out2], -1),
                             C[:mem])
        newC = jnp.concatenate([new_rows, C[mem:mem + 1]], 0)
        # the last active step (k-1) leaves its carry pair at row k-1
        sel = jnp.take(carries, jnp.clip(k - 1, 0, mem), axis=0)
        newC = jnp.where((jnp.arange(rows) == (k - 1))[:, None],
                         sel[None], newC)
        return newC.reshape(-1)

    return run(col_o), run(col_e)


@functools.partial(
    jax.jit,
    static_argnames=("mem", "ldiv", "reorthogonalization", "history",
                     "hist_len", "callback", "verbose",
                     "CisI", "DisI", "EisI", "FisI"),
)
def _gpmr_core(
    A, B, C, D, E, F, b, c, x0, y0, state_in, iter_cap, atol, rtol,
    lam, mu,
    *, mem, ldiv, reorthogonalization, history, hist_len, callback, verbose,
    CisI, DisI, EisI, FisI,
):
    m = b.shape[0]
    n = c.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    lam_c = jnp.asarray(lam, T).astype(FC)
    mu_c = jnp.asarray(mu, T).astype(FC)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)
    two = 2 * mem

    def ap(P, v):
        return precond_apply(P, v, ldiv)

    if state_in is None:
        if x0 is None:
            b0, c0 = b, c
        else:
            b0 = b - A.matvec(y0)
            c0 = c - B.matvec(x0)
        b0 = ap(C, b0)
        c0 = ap(D, c0)
        if x0 is not None:
            b0 = b0 - lam_c * x0
            c0 = c0 - mu_c * y0
        beta = knorm(b0)
        gamma = knorm(c0)
        V = jnp.zeros((mem + 1, m), FC)
        U = jnp.zeros((mem + 1, n), FC)
        V = V.at[0].set(jnp.where(beta != 0, b0 / _safe(beta).astype(FC), 0))
        U = U.at[0].set(jnp.where(gamma != 0, c0 / _safe(gamma).astype(FC), 0))
        rNorm = jnp.sqrt(beta * beta + gamma * gamma)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rNorm
        zt = jnp.zeros((two + 2,), FC)
        zt = zt.at[0].set(beta.astype(FC)).at[1].set(gamma.astype(FC))
        status = jnp.where(rNorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(rNorm <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hr = rt.hist_init(hist_len, T)
        hr = rt.hist_write(hr, 0, rNorm, history)
        state = GpmrState(
            V=V, U=U, R=jnp.zeros((two + 2, two), FC), zt=zt,
            gc=jnp.zeros((4 * mem,), T), gs=jnp.zeros((4 * mem,), FC),
            rNorm=rNorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hr,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1          # 1-based k
        k = it
        ki = it - 1              # 0-based slot of vₖ/uₖ
        vk = s.V[ki]
        uk = s.U[ki]
        wA = ap(F, uk)
        wB = ap(E, vk)
        q = ap(C, A.matvec(wA))
        p = ap(D, B.matvec(wB))

        # Orthogonalize against V[0..k-1] and U[0..k-1] (CGS + optional pass).
        maskV = (jnp.arange(mem + 1) < k)[:, None]
        Vm = jnp.where(maskV, s.V, 0)
        Um = jnp.where(maskV, s.U, 0)
        h = jnp.conj(Vm) @ q
        f = jnp.conj(Um) @ p
        q = q - Vm.T @ h
        p = p - Um.T @ f
        if reorthogonalization:
            h2 = jnp.conj(Vm) @ q
            f2 = jnp.conj(Um) @ p
            q = q - Vm.T @ h2
            p = p - Um.T @ f2
            h = h + h2
            f = f + f2
        Haux = knorm(q)
        Faux = knorm(p)

        # Build the two new columns of Sₖ₊₁.ₖ (rows 1-based in comments).
        rows = jnp.arange(two + 2)
        col_o = jnp.zeros((two + 2,), FC)
        col_e = jnp.zeros((two + 2,), FC)
        # col_o rows 2i (i=1..k): f_i,k  → 0-based index 2i-1
        idx_f = 2 * jnp.arange(mem + 1) + 1
        col_o = col_o.at[jnp.where(jnp.arange(mem + 1) < k, idx_f, two + 1)].add(
            jnp.where(jnp.arange(mem + 1) < k, f, 0))
        col_o = col_o.at[two + 1].set(0)
        # col_e rows 2i-1 (i=1..k): h_i,k → 0-based 2i-2
        idx_h = 2 * jnp.arange(mem + 1)
        col_e = col_e.at[jnp.where(jnp.arange(mem + 1) < k, idx_h, two + 1)].add(
            jnp.where(jnp.arange(mem + 1) < k, h, 0))
        col_e = col_e.at[two + 1].set(0)
        # Regularization terms: col_o row 2k-1 = λ, col_e row 2k = μ.
        col_o = col_o.at[2 * k - 2].set(lam_c)
        col_e = col_e.at[2 * k - 1].set(mu_c)

        # Apply previous reflection quadruples i = 1..k-1 (reference
        # :381-409), vectorized as an associative prefix scan: step i
        # reads (r1, r2) = the (r3', r4'') pair step i−1 wrote, so the
        # sequential dependence is the 2-vector affine recurrence
        # carry' = Mᵢ·carry + dᵢ (Mᵢ from the stored (c, s) quadruple, dᵢ
        # from the column's ORIGINAL rows 2i+1/2i+2).  The former
        # unrolled chain of ~8·mem dynamic updates measured ~0.5 ms/iter
        # of pure scalar-op overhead on TPU at mem=20.
        col_o, col_e = _apply_quad_rotations(col_o, col_e, s.gc, s.gs, k,
                                             mem)

        # Current reflections (reference :411-443).
        do = col_o[2 * k - 2]
        om = col_o[2 * k - 1]
        de1 = col_e[2 * k - 2]
        de2 = col_e[2 * k - 1]
        c1k, s1k, do = sym_givens(do, Faux.astype(FC))
        theta = jnp.conj(jnp.asarray(s1k, FC)) * de1
        de1 = c1k.astype(FC) * de1
        c2k, s2k, do = sym_givens(do, om)
        t = c2k.astype(FC) * de1 + jnp.asarray(s2k, FC) * de2
        de2 = jnp.conj(jnp.asarray(s2k, FC)) * de1 - c2k.astype(FC) * de2
        de1 = t
        c3k, s3k, de2 = sym_givens(de2, theta)
        c4k, s4k, de2 = sym_givens(de2, Haux.astype(FC))
        col_o = col_o.at[2 * k - 2].set(jnp.asarray(do, FC))
        col_o = col_o.at[2 * k - 1].set(0)
        col_e = col_e.at[2 * k - 2].set(de1)
        col_e = col_e.at[2 * k - 1].set(jnp.asarray(de2, FC))

        R_new = s.R.at[:, 2 * k - 2].set(col_o)
        R_new = R_new.at[:, 2 * k - 1].set(col_e)

        # Update t̄ₖ (reference :445-466).
        z1 = s.zt[2 * k - 2]
        z2 = s.zt[2 * k - 1]
        tbar_pp = jnp.conj(jnp.asarray(s1k, FC)) * z1
        z1 = c1k.astype(FC) * z1
        t = c2k.astype(FC) * z1 + jnp.asarray(s2k, FC) * z2
        z2 = jnp.conj(jnp.asarray(s2k, FC)) * z1 - c2k.astype(FC) * z2
        z1 = t
        t = c3k.astype(FC) * z2 + jnp.asarray(s3k, FC) * tbar_pp
        tbar_pp = jnp.conj(jnp.asarray(s3k, FC)) * z2 - c3k.astype(FC) * tbar_pp
        z2 = t
        tbar_p = jnp.conj(jnp.asarray(s4k, FC)) * z2
        z2 = c4k.astype(FC) * z2
        zt_new = s.zt.at[2 * k - 2].set(z1).at[2 * k - 1].set(z2)

        gc_new = s.gc.at[4 * k - 4].set(jnp.real(c1k)) \
            .at[4 * k - 3].set(jnp.real(c2k)) \
            .at[4 * k - 2].set(jnp.real(c3k)) \
            .at[4 * k - 1].set(jnp.real(c4k))
        gs_new = s.gs.at[4 * k - 4].set(jnp.asarray(s1k, FC)) \
            .at[4 * k - 3].set(jnp.asarray(s2k, FC)) \
            .at[4 * k - 2].set(jnp.asarray(s3k, FC)) \
            .at[4 * k - 1].set(jnp.asarray(s4k, FC))

        rNorm = jnp.sqrt(jnp.abs(tbar_p) ** 2 + jnp.abs(tbar_pp) ** 2)
        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = (Faux <= btol) & (Haux <= btol)
        tired_mem = k >= mem
        code = jnp.int32(rt.RUNNING)
        code = jnp.where(tired_mem, jnp.int32(rt.TIRED), code)
        code = jnp.where(breakdown, jnp.int32(rt.BREAKDOWN), code)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), code)

        cont = code == rt.RUNNING
        V_new = s.V.at[k].set(
            jnp.where(cont & (Haux > btol), q / _safe(Haux).astype(FC),
                      jnp.zeros(m, FC)))
        U_new = s.U.at[k].set(
            jnp.where(cont & (Faux > btol), p / _safe(Faux).astype(FC),
                      jnp.zeros(n, FC)))
        zt_new = zt_new.at[2 * k].set(jnp.where(cont, tbar_p, zt_new[2 * k]))
        zt_new = zt_new.at[2 * k + 1].set(jnp.where(cont, tbar_pp,
                                                    zt_new[2 * k + 1]))

        hr = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            V=V_new, U=U_new, R=R_new, zt=zt_new, gc=gc_new, gs=gs_new,
            rNorm=rNorm, iter=it, status=code, hist_r=hr,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter,
                         "{:5d}  {:7.1e}  {:7.1e}  {:7.1e}",
                         s_new.rNorm, Haux, Faux)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status))
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _gpmr_solve(
    A, B, b, c, x0=None, y0=None, *, C=None, D=None, E=None, F=None,
    ldiv=False, gsp=False, lam=1.0, mu=1.0, memory=20,
    reorthogonalization=False, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
    memory_cap=256, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A)
    B = as_operator(B)
    C, D, E, F = (as_operator(P) for P in (C, D, E, F))
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    m = b.shape[0]
    n = c.shape[0]
    if gsp:
        lam, mu = 1.0, 0.0
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    rt.debug_table(verbose, "GPMR",
                   ("k", "‖rₖ‖", "hₖ₊₁.ₖ", "fₖ₊₁.ₖ"), m, n)
    mem = max(2, min(max(int(memory), itmax), memory_cap, itmax))
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, dtype=b.dtype)

    # Fast path: BOTH operands are square DIA stencils + default config
    # → fused whole-solve kernel (V/U panels + SMEM triangle in VMEM).
    if (all(P is None for P in (C, D, E, F)) and x0 is None and y0 is None
            and not history and callback is None and verbose == 0
            and not reorthogonalization and timemax == float("inf")
            and m == n
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None
            and getattr(B, "use_pallas", False)
            and getattr(B, "_pd", None) is not None):
        from ..ops.pallas_fused import (gpmr_dia_fused,
                                        gpmr_dia_fused_supported)
        if gpmr_dia_fused_supported(A.dia.offsets, B.dia.offsets, n,
                                    b.dtype, mem,
                                    stencil_dtype=A._pd.dtype):
            x, y, niter, rnorm, code_d, incon = gpmr_dia_fused(
                A._pd, B._pd, A.dia.offsets, B.dia.offsets, b, c,
                float(lam), float(mu), atol, rtol, itmax, mem=mem)
            niter, code, incon = jax.device_get([niter, code_d, incon])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            inconsistent = bool(incon)
            if inconsistent and code != rt.SOLVED:
                code = rt.INCONSISTENT
            stats = SimpleStats(
                niter=niter, solved=rt.is_solved_code(code),
                inconsistent=inconsistent,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), jnp.asarray(y), stats, None

    def run(state, cap):
        return _gpmr_core(
            A, B, C, D, E, F, b, c, x0, y0, state, jnp.int32(cap),
            atol, rtol, float(lam), float(mu),
            mem=mem, ldiv=bool(ldiv),
            reorthogonalization=bool(reorthogonalization),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
            CisI=C is None, DisI=D is None, EisI=E is None, FisI=F is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)

    # Backward substitution on the 2k×2k triangle (host; reference :507-520).
    k2 = 2 * niter
    R = np.asarray(state.R)
    zt = np.asarray(state.zt).copy()
    btol = float(jnp.finfo(real_dtype(b.dtype)).eps) ** 0.75
    inconsistent = False
    for i in range(k2 - 1, -1, -1):
        acc = zt[i]
        for j in range(i + 1, k2):
            acc = acc - R[i, j] * zt[j]
        diag = R[i, i]
        if abs(diag) <= btol:
            zt[i] = 0.0
            inconsistent = True
        else:
            zt[i] = acc / diag
    V = np.asarray(state.V)
    U = np.asarray(state.U)
    x = np.zeros(m, dtype=V.dtype)
    y = np.zeros(n, dtype=U.dtype)
    for i in range(niter):
        x += zt[2 * i] * V[i]
        y += zt[2 * i + 1] * U[i]
    if E is not None:
        x = np.asarray(precond_apply(E, jnp.asarray(x), ldiv))
    if F is not None:
        y = np.asarray(precond_apply(F, jnp.asarray(y), ldiv))
    if x0 is not None:
        x = x + np.asarray(x0)
        y = y + np.asarray(y0) if y0 is not None else y

    if inconsistent and code != rt.SOLVED:
        code = rt.INCONSISTENT
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code),
        inconsistent=inconsistent,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return jnp.asarray(x), jnp.asarray(y), stats, state


def gpmr(A, B, b, c, x0=None, y0=None, **kwargs):
    """x, y, stats = gpmr(A, B, b, c; C, D, E, F, λ, μ, gsp, ...).

    TPU extension: ``precision="double_word"`` — dw refinement of the
    partitioned block residuals (b − λx − Ay, c − Bx − μy) to fp64-grade
    accuracy from f32 storage (unpreconditioned configurations; memory/
    reorthogonalization pass through to the inner solves)."""
    from ._refine import pair_ir_wrap

    lam = kwargs.get("lam", 1.0)
    mu = kwargs.get("mu", 1.0)
    if kwargs.get("gsp", False):
        lam, mu = 1.0, 0.0

    def inner(ops, f1, f2, rtol_i, it_left, time_left):
        Aop, Bop = ops
        fwd = {k: kwargs[k] for k in ("memory", "reorthogonalization")
               if k in kwargs}
        # dw corrections need robust inner convergence: f32 MGS loses
        # orthogonality on general dense blocks (measured: stalls at
        # true 2.0 on a κ=235 system, converges in 48 iterations with
        # reorthogonalization on)
        fwd.setdefault("reorthogonalization", True)
        dx, dy, st, _ = _gpmr_solve(Aop, Bop, f1, f2, atol=0.0,
                                    rtol=rtol_i, itmax=it_left,
                                    timemax=time_left, lam=lam, mu=mu,
                                    **fwd)
        return dx, dy, st.niter

    hit = pair_ir_wrap("GPMR", inner, A, b, c, kwargs, kind="gpmr", B=B,
                       tau=lam, nu=mu,
                       x0=x0, y0=y0,
                       reject={"C": None, "D": None, "E": None, "F": None})
    if hit is not None:
        return hit
    x, y, stats, _ = _gpmr_solve(A, B, b, c, x0, y0, **kwargs)
    return x, y, stats
