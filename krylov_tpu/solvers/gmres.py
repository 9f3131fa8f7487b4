"""GMRES and FGMRES for square non-Hermitian Ax = b.

Parity with reference src/gmres.jl / src/fgmres.jl: left/right
preconditioning (M, N), GMRES(k) restarts via Δx accumulation, Givens-QR
of the Hessenberg, singular-R inconsistency detection, breakdown
detection (h_{k+1,k} ≤ eps^(3/4)), warm start, history, callback.

TPU-first deviations (documented, SURVEY.md §7.2):
- Orthogonalization is classical Gram-Schmidt with a mandatory second
  pass (CGS2) expressed as two masked (mem,n)×(n,) matmuls per iteration,
  instead of the reference's sequential MGS (src/gmres.jl:259-262) —
  equivalent stability, MXU-friendly.  ``reorthogonalization=True`` adds
  a third pass.
- Without restart, the reference grows its basis dynamically
  (src/gmres.jl:244-252); jit requires static shapes, so the basis is
  preallocated at min(itmax, memory_cap) and the solve transparently
  falls back to restarted passes if that cap is hit.
- A breakdown exit with neither convergence nor inconsistency reports
  status "breakdown" (the reference leaves "unknown").
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


class GmresState(NamedTuple):
    x: jax.Array          # accumulated solution (origin 0, or x0 for restart)
    V: jax.Array          # (mem, n) Krylov basis
    Z: jax.Array          # (mem, n) flexible-precond directions (fgmres) or (0,)
    R: jax.Array          # (mem, mem) upper-triangular factor (by columns)
    c: jax.Array          # (mem,) Givens cosines (real)
    s: jax.Array          # (mem,) Givens sines (FC)
    z: jax.Array          # (mem+1,) transformed rhs
    inner_k: jax.Array    # 0-based position in current pass
    iter: jax.Array       # cumulative iterations
    npass: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    status: jax.Array
    inconsistent: jax.Array
    hist_r: jax.Array
    f_resid: jax.Array    # residual-decrease flag (pass-exit reason)
    f_break: jax.Array    # breakdown flag (pass-exit reason)


def _orthogonalize(V, q, k, mem, extra_pass):
    """CGS2 (+ optional third pass): project q against V[0..k].

    No masking: rows of V beyond the current inner_k are exactly zero
    inside a pass (V is rebuilt as zeros.at[0] on every restart and rows
    are written sequentially), so whole-basis matmuls project against
    V[0..k] for free.  The former jnp.where mask materialized a full
    (mem, n) copy of V twice per iteration — ~35 MB of pure HBM traffic
    at n=110592, mem=20, nearly half the measured 117 µs/iter general
    GMRES cost (round-4 panel work).
    """
    h = jnp.conj(V) @ q
    q = q - V.T @ h
    h2 = jnp.conj(V) @ q
    q = q - V.T @ h2
    h = h + h2
    if extra_pass:
        h3 = jnp.conj(V) @ q
        q = q - V.T @ h3
        h = h + h3
    return q, h


def _apply_prev_rotations(hcol, c, s, k, mem):
    """Apply Givens rotations Ω₀..Ω_{k-1} to the new column (masked).

    Vectorized as an associative prefix scan: rotation i reads
    carry_i (the value step i−1 left at position i) and the ORIGINAL
    h_{i+1}, so the sequential dependence is the first-order affine
    recurrence carry_{i+1} = conj(s_i)·carry_i − c_i·h_{i+1}, whose
    prefix maps compose associatively ((A,B)∘(A',B') on
    carry ↦ A·carry + B).  One log₂(mem)-depth scan on (mem,) arrays
    replaces the unrolled 2·mem dynamic-update chain, which XLA ran as
    ~40 sequential tiny ops costing ~70 µs/iter at mem=20 (round-4
    breakdown, tools/exp_gmres_general.py lineage)."""
    FC = hcol.dtype
    idx = jnp.arange(mem)
    active = idx < k
    cF = c.astype(FC)
    a = jnp.where(active, jnp.conj(s), jnp.ones((), FC))
    b = jnp.where(active, -cF * hcol[1:], jnp.zeros((), FC))
    A, B = jax.lax.associative_scan(
        lambda x, y: (y[0] * x[0], y[0] * x[1] + y[1]), (a, b))
    # carry_0 .. carry_mem (carry_j = h-value rotation j reads at slot j)
    carry = jnp.concatenate([hcol[:1], A * hcol[0] + B])
    out = jnp.where(active, cF * carry[:mem] + s * hcol[1:], hcol[:mem])
    # the last active rotation (k−1) leaves carry_k at slot k
    return jnp.concatenate([out, hcol[mem:]]).at[k].set(carry[k])


def _back_substitute(R, z, k, mem, btol):
    """Solve R[0:k,0:k] y = z[0:k]; zero singular pivots
    (reference src/gmres.jl:330-345).  Returns (y, inconsistent)."""
    FC = R.dtype
    y0 = jnp.where(jnp.arange(mem) < k, z[:mem], 0)

    def body(idx, carry):
        y, inconsistent = carry
        i = mem - 1 - idx
        active = i < k
        jmask = (jnp.arange(mem) > i) & (jnp.arange(mem) < k)
        acc = y[i] - jnp.sum(jnp.where(jmask, R[i] * y, 0))
        diag = R[i, i]
        sing = jnp.abs(diag) <= btol
        yi = jnp.where(sing, jnp.zeros((), FC),
                       acc / jnp.where(sing, jnp.ones((), FC), diag))
        y = y.at[i].set(jnp.where(active, yi, y[i]))
        inconsistent = inconsistent | (active & sing)
        return y, inconsistent

    return rt.unrolled_fori(0, mem, body, (y0, jnp.zeros((), jnp.bool_)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mem", "ldiv", "restart", "flexible", "reorthogonalization",
        "history", "hist_len", "callback", "verbose", "MisI", "NisI",
    ),
)
def _gmres_core(
    A, M, N, b, x0, state_in, iter_cap, itmax, atol, rtol,
    *, mem, ldiv, restart, flexible, reorthogonalization,
    history, hist_len, callback, verbose, MisI, NisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def N_apply(u):
        return precond_apply(N, u, ldiv)

    z_len = mem + 1

    if state_in is None:
        if restart and x0 is not None:
            x = x0
        else:
            x = jnp.zeros(n, FC)
        w = b if x0 is None else b - A.matvec(x0)
        r0 = M_apply(w)
        beta = knorm(r0)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(beta <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        safe_b = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        V = jnp.zeros((mem, n), FC).at[0].set(r0 / safe_b.astype(FC))
        z = jnp.zeros((z_len,), FC).at[0].set(beta.astype(FC))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, beta, history)
        state = GmresState(
            x=x, V=V,
            Z=jnp.zeros((mem, n), FC) if flexible else jnp.zeros((0,), FC),
            R=jnp.zeros((mem, mem), FC),
            c=jnp.zeros((mem,), T), s=jnp.zeros((mem,), FC),
            z=z, inner_k=jnp.int32(0), iter=jnp.int32(0),
            npass=jnp.int32(1), rNorm=beta, eps_lim=eps_lim,
            status=status, inconsistent=jnp.zeros((), jnp.bool_),
            hist_r=hist,
            f_resid=jnp.zeros((), jnp.bool_),
            f_break=jnp.zeros((), jnp.bool_),
        )
    else:
        state = state_in

    # Two-level loop: a per-ITERATION lax.cond around the pass epilogue
    # (back-substitution + x update + restart re-init) forced a copy of
    # the whole (mem, n) basis every iteration — measured ~90 µs/iter of
    # pure structure at n=110592, mem=20 (tools/exp_gmres_general.py,
    # exp_gmres_floor.py).  The inner while runs only the Arnoldi
    # iteration; the epilogue runs once per pass in the outer body.

    def inner_cond(s):
        done = (s.f_resid | s.f_break | (s.iter >= itmax)
                | (s.inner_k >= mem))
        return (s.status == rt.RUNNING) & ~done & (s.iter < iter_cap)

    def inner_body(s):
        k = s.inner_k
        vk = s.V[k]
        p = N_apply(vk)
        w = A.matvec(p)
        q = M_apply(w)

        q, hcol = _orthogonalize(s.V, q, k, mem, reorthogonalization)
        Hbis = knorm(q)

        hcol_ext = jnp.zeros((mem + 1,), FC).at[:mem].set(hcol)
        hcol_ext = _apply_prev_rotations(hcol_ext, s.c, s.s, k, mem)
        ck, sk, rkk = sym_givens(hcol_ext[k], Hbis.astype(FC))
        c_new = s.c.at[k].set(jnp.real(ck))
        s_new = s.s.at[k].set(jnp.asarray(sk, FC))
        Rcol = hcol_ext[:mem].at[k].set(jnp.asarray(rkk, FC))
        R_new = s.R.at[:, k].set(
            jnp.where(jnp.arange(mem) <= k, Rcol, s.R[:, k])
        )
        zeta_next = jnp.conj(jnp.asarray(sk, FC)) * s.z[k]
        z_new = s.z.at[k].set(jnp.real(ck).astype(FC) * s.z[k])

        rNorm = jnp.abs(zeta_next)
        it = s.iter + 1
        kk = k + 1

        resid_decrease = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = Hbis <= btol
        tired = it >= itmax
        inner_tired = kk >= mem
        inner_done = resid_decrease | breakdown | tired | inner_tired
        glob_done = resid_decrease | breakdown | tired

        Z_new = s.Z.at[k].set(p) if flexible else s.Z

        # Continuing within the pass: write the next basis vector.
        cont = ~inner_done
        safe_H = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
        V_next = s.V.at[(k + 1) % mem].set(
            jnp.where(cont, q / safe_H.astype(FC), s.V[(k + 1) % mem])
        )
        z_cont = z_new.at[k + 1].set(jnp.where(cont, zeta_next, z_new[k + 1]))

        s_out = s._replace(
            V=V_next, Z=Z_new, R=R_new, c=c_new, s=s_new, z=z_cont,
            inner_k=kk, iter=it, rNorm=rNorm,
            f_resid=resid_decrease, f_break=breakdown,
        )
        hist = rt.hist_write(s_out.hist_r, it, rNorm, history)
        s_out = s_out._replace(hist_r=hist)

        if callback is not None:
            # Mid-pass iterations only; at the pass-boundary iteration
            # the callback runs in the outer body on the post-epilogue
            # state (finalized x / restarted rNorm), preserving the
            # reference-order semantics of the single-loop formulation.
            user_exit = callback(s_out)
            s_out = s_out._replace(
                status=jnp.where(
                    user_exit & (s_out.status == rt.RUNNING) & ~inner_done,
                    jnp.int32(rt.USER_EXIT), s_out.status)
            )
        if verbose > 0:
            rt.debug_row(verbose, it, "{:5d}  {:5d}  {:7.1e}  {:7.1e}",
                         s_out.npass, rNorm, Hbis)
        return s_out

    def outer_cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def outer_body(ms):
        ms = jax.lax.while_loop(inner_cond, inner_body, ms)

        # Pass epilogue, executed UNconditionally with jnp.where selects:
        # any lax.cond in this loop nest defeats XLA's buffer aliasing
        # for the (mem, n) basis and taxes every inner iteration
        # (measured +78 µs/iter at n=110592, mem=20 —
        # tools/exp_gmres_bisect.py variants E vs F).  When the inner
        # loop stopped on iter_cap (chunked timemax re-entry) or a
        # mid-pass user exit, inner_done is False and every select keeps
        # the old state; the speculative back-substitution/matvec result
        # is discarded.
        tired = ms.iter >= itmax
        inner_done = (ms.f_resid | ms.f_break | tired
                      | (ms.inner_k >= mem))
        glob_done = ms.f_resid | ms.f_break | tired
        restart_now = inner_done & ~glob_done

        y, sing = _back_substitute(ms.R, ms.z, ms.inner_k, mem, btol)
        if flexible:
            xr = ms.Z.T @ y
        else:
            xr = ms.V.T @ y
            if not NisI:
                xr = N_apply(xr)
        x_fin = jnp.where(inner_done, ms.x + xr, ms.x)
        inconsistent = ms.inconsistent | (sing & inner_done)

        # Restart re-init (pass not globally done).
        w2 = b - A.matvec(x_fin)
        r0 = M_apply(w2)
        beta = knorm(r0)
        safe = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        Vr = jnp.zeros((mem, n), FC).at[0].set(r0 / safe.astype(FC))
        zr = jnp.zeros((z_len,), FC).at[0].set(beta.astype(FC))

        # Exit-status chain (reference src/gmres.jl:367-371, later wins);
        # a status already set by the callback (USER_EXIT) is preserved.
        code = jnp.int32(rt.BREAKDOWN)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(ms.f_resid, jnp.int32(rt.SOLVED), code)
        code = jnp.where(inconsistent, jnp.int32(rt.INCONSISTENT), code)
        code = jnp.where(~glob_done, jnp.int32(rt.RUNNING), code)
        code = jnp.where(ms.status == rt.RUNNING, code, ms.status)
        code = jnp.where(inner_done, code, ms.status)

        out = ms._replace(
            x=x_fin,
            V=jnp.where(restart_now, Vr, ms.V),
            z=jnp.where(restart_now, zr, ms.z),
            R=jnp.where(restart_now, jnp.zeros_like(ms.R), ms.R),
            c=jnp.where(restart_now, jnp.zeros_like(ms.c), ms.c),
            s=jnp.where(restart_now, jnp.zeros_like(ms.s), ms.s),
            inner_k=jnp.where(inner_done, jnp.int32(0), ms.inner_k),
            npass=jnp.where(restart_now, ms.npass + 1, ms.npass),
            rNorm=jnp.where(restart_now, beta, ms.rNorm),
            status=code, inconsistent=inconsistent,
            f_resid=ms.f_resid & ~inner_done,
            f_break=ms.f_break & ~inner_done,
        )
        if callback is not None:
            # The pass-boundary iteration's callback call, on the
            # post-epilogue state (single-loop formulation order).
            user_exit = callback(out)
            out = out._replace(
                status=jnp.where(
                    inner_done & user_exit & (out.status == rt.RUNNING),
                    jnp.int32(rt.USER_EXIT), out.status))
        return out

    return jax.lax.while_loop(outer_cond, outer_body, state)


def _gmres_like_solve(
    flexible, A, b, x0=None, *, M=None, N=None, ldiv=False, restart=False,
    reorthogonalization=False, memory=20, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
    memory_cap=512, basis_dtype=None,
):
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    N = as_operator(N)
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
    rt.debug_table(verbose, "FGMRES" if flexible else "GMRES", ("k", "pass", "‖rₖ‖", "hₖ₊₁.ₖ"), n)
    if restart:
        mem = min(int(memory), itmax)
    else:
        # Static-shape analogue of dynamic growth: preallocate up to the
        # cap; beyond it the solve continues as restarted passes.
        mem = min(itmax, memory_cap)
    mem = max(mem, 1)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    eff_restart = bool(restart) or mem < itmax

    # Fast path: DIA stencil + default config → fused whole-solve GMRES(mem)
    # kernel (Arnoldi panel in VMEM, in-kernel restarts).  FGMRES with
    # N = I is recurrence-identical to GMRES (the Z ring holds z = v), so
    # it routes here too.
    if (M is None and N is None and not history
            and callback is None and verbose == 0
            and not reorthogonalization
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (gmres_dia_fused,
                                        gmres_dia_fused_supported)
        bd = None if basis_dtype is None else jnp.dtype(basis_dtype)
        if gmres_dia_fused_supported(A.dia.offsets, n, b.dtype, mem,
                                     stencil_dtype=A._pd.dtype,
                                     basis_dtype=bd):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, status, incons, npass = gmres_dia_fused(
                A._pd, A.dia.offsets, b_eff, float(atol), float(rtol),
                itmax, mem=mem, basis_dtype=bd)
            niter, code, incons = jax.device_get([niter, status, incons])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=bool(incons),
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    if basis_dtype is not None:
        raise ValueError(
            "basis_dtype (compressed-basis GMRES) is a fused-path feature: "
            "it requires a DIA-stencil operator with use_pallas=True, "
            "M = N = None, no history/callback/verbose/timemax, and the "
            "compressed panel must fit VMEM")

    def run(state, cap):
        return _gmres_core(
            A, M, N, b, x0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol,
            mem=mem, ldiv=bool(ldiv), restart=eff_restart,
            flexible=bool(flexible),
            reorthogonalization=bool(reorthogonalization),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
    if x0 is not None and not eff_restart:
        x = x + x0

    stats = SimpleStats(
        niter=niter,
        solved=rt.is_solved_code(code),
        inconsistent=bool(state.inconsistent),
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def _gmres_ir(A, b, x0, *, atol=None, rtol=None, itmax=0,
              timemax=float("inf"), **inner_kw):
    """precision="double_word": GMRES-based iterative refinement
    (Carson & Higham, SIAM J. Sci. Comput. 2018) to fp64-grade TRUE
    residuals from f32 storage for general square systems — inner
    correction solves are plain working-precision GMRES with the caller's
    M/N/memory/restart options (the fused whole-solve-in-VMEM kernel when
    eligible); shared dw driver in solvers/_refine.py."""
    from ._refine import ir_solve

    start = time.perf_counter()
    A = as_operator(A)
    b = jnp.asarray(b)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * b.shape[0])

    def inner(rhs, rtol_i, it_left, time_left):
        d, st, _ = _gmres_like_solve(False, A, rhs, atol=0.0, rtol=rtol_i,
                                     itmax=it_left,
                                     timemax=time_left
                                     if np.isfinite(time_left)
                                     else float("inf"), **inner_kw)
        return d, st.niter

    return ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start)


def gmres(A, b, x0=None, *, precision=None, **kwargs):
    """x, stats = gmres(A, b; memory=20, restart=False, ...).

    TPU extensions:
    - ``basis_dtype=jnp.bfloat16`` stores the Krylov panel compressed on
      the fused DIA path (compressed-basis GMRES,
      arxiv.org/abs/2009.12101) — arithmetic stays in the working dtype
      and the VMEM gate admits ~2× larger problems/memory.
    - ``precision="double_word"`` runs GMRES-based iterative refinement
      (Carson & Higham 2018) — fp64-grade TRUE residuals from f32
      device storage.  M/N/memory/restart pass through to the inner
      solves; history and callback are not supported.
    """
    from ._refine import check_ir_config

    if check_ir_config("GMRES", precision,
                       history=kwargs.get("history", False),
                       callback=kwargs.get("callback")):
        x, stats, _ = _gmres_ir(A, b, x0, **kwargs)
        return x, stats
    x, stats, _ = _gmres_like_solve(False, A, b, x0, **kwargs)
    return x, stats


def fgmres(A, b, x0=None, **kwargs):
    """x, stats = fgmres(A, b; ...) — flexible right preconditioning.

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (the flexible N changes
    the iteration, not the fixed point, so it passes through)."""
    import functools as _ft
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("FGMRES", _ft.partial(_gmres_like_solve, True),
                         A, b, x0, kwargs,
                         forward=("M", "N", "ldiv", "memory", "restart",
                                  "reorthogonalization"))
    if hit is not None:
        return hit
    x, stats, _ = _gmres_like_solve(True, A, b, x0, **kwargs)
    return x, stats
