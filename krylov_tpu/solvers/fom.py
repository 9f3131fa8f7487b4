"""FOM, DIOM and DQGMRES for square non-Hermitian Ax = b.

FOM (reference src/fom.jl): full orthogonalization method — Arnoldi with
an LU factorization of the Hessenberg, restart support, breakdown status
"inconsistent linear system".

DIOM (reference src/diom.jl): truncated-memory FOM with circular stacks
of basis vectors V (size mem) and update directions P (size mem-1);
direct x update xₖ = xₖ₋₁ + ξₖ pₖ.

DQGMRES (reference src/dqgmres.jl): truncated-memory GMRES with circular
Givens rotations; residual-estimate lag accepted as in the reference.

TPU notes: window dot products are masked ring matmuls; the sequential
LU/rotation recurrences along the current Hessenberg column run in
bounded fori_loops (length mem, static).
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

INCONS_FOM = 28  # "inconsistent linear system"
_FOM_STATUS = {INCONS_FOM: "inconsistent linear system"}


# ---------------------------------------------------------------------------
# FOM — shares the pass structure of gmres.py but with LU of H.
# ---------------------------------------------------------------------------

class FomState(NamedTuple):
    x: jax.Array
    V: jax.Array
    U: jax.Array          # (mem, mem) upper factor, by columns
    l: jax.Array          # (mem,) subdiagonal multipliers
    z: jax.Array          # (mem,) forward-substituted rhs
    inner_k: jax.Array
    iter: jax.Array
    npass: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    status: jax.Array
    inconsistent: jax.Array
    hist_r: jax.Array
    f_resid: jax.Array    # residual-decrease flag (pass-exit reason)
    f_break: jax.Array    # breakdown flag (pass-exit reason)


def _orthogonalize(V, q, k, mem, extra_pass):
    # no masking: rows beyond inner_k are exactly zero within a pass
    # (see solvers/gmres.py:_orthogonalize)
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


def _fom_back_substitute(U, z, k, mem):
    FC = U.dtype
    y0 = jnp.where(jnp.arange(mem) < k, z[:mem], 0)

    def body(idx, y):
        i = mem - 1 - idx
        active = i < k
        jmask = (jnp.arange(mem) > i) & (jnp.arange(mem) < k)
        acc = y[i] - jnp.sum(jnp.where(jmask, U[i] * y, 0))
        diag = U[i, i]
        safe = jnp.where(diag == 0, jnp.ones((), FC), diag)
        y = y.at[i].set(jnp.where(active, acc / safe, y[i]))
        return y

    return rt.unrolled_fori(0, mem, body, y0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mem", "ldiv", "restart", "reorthogonalization", "history",
        "hist_len", "callback", "verbose", "MisI", "NisI",
    ),
)
def _fom_core(
    A, M, N, b, x0, state_in, iter_cap, itmax, atol, rtol,
    *, mem, ldiv, restart, reorthogonalization, history, hist_len,
    callback, verbose, MisI, NisI,
):
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def N_apply(u):
        return precond_apply(N, u, ldiv)

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
        z = jnp.zeros((mem,), FC).at[0].set(beta.astype(FC))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, beta, history)
        state = FomState(
            x=x, V=V, U=jnp.zeros((mem, mem), FC), l=jnp.zeros((mem,), FC),
            z=z, inner_k=jnp.int32(0), iter=jnp.int32(0), npass=jnp.int32(1),
            rNorm=beta, eps_lim=eps_lim, status=status,
            inconsistent=jnp.zeros((), jnp.bool_), hist_r=hist,
            f_resid=jnp.zeros((), jnp.bool_),
            f_break=jnp.zeros((), jnp.bool_),
        )
    else:
        state = state_in

    # Two-level loop with an UNconditional, jnp.where-selected pass
    # epilogue — same restructure as _gmres_core: any lax.cond in the
    # loop nest defeats XLA's buffer aliasing for the (mem, n) basis and
    # taxes every inner iteration (tools/exp_gmres_bisect.py).

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

        # LU column update: uᵢ.ₖ = hᵢ.ₖ - lᵢ₋₁ uᵢ₋₁.ₖ
        # (reference src/fom.jl:274-280) — a first-order affine
        # recurrence in uᵢ, vectorized as one associative prefix scan
        # (rt.affine_chain_scan; the unrolled sequential chain cost
        # ~70 µs/iter at mem=20 on TPU).
        iidx = jnp.arange(1, mem)
        act = (iidx <= k)
        a_ch = jnp.where(act, -s.l[:mem - 1], jnp.zeros((), FC))
        ucol = rt.affine_chain_scan(a_ch, hcol[1:mem], hcol[0])

        ukk = ucol[k]
        safe_u = jnp.where(ukk == 0, jnp.ones((), FC), ukk)
        # ζₖ = -lₖ₋₁ ζₖ₋₁  (z[0] = β set at pass init)
        z_new = jnp.where(
            k >= 1,
            s.z.at[k].set(-s.l[k - 1] * s.z[k - 1]),
            s.z,
        )
        l_new = s.l.at[k].set(Hbis.astype(FC) / safe_u)
        U_new = s.U.at[:, k].set(
            jnp.where(jnp.arange(mem) <= k, ucol, s.U[:, k])
        )

        rNorm = Hbis * jnp.abs(z_new[k] / safe_u)
        it = s.iter + 1
        kk = k + 1

        resid_decrease = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = Hbis <= btol
        tired = it >= itmax
        inner_tired = kk >= mem
        inner_done = resid_decrease | breakdown | tired | inner_tired
        glob_done = resid_decrease | breakdown | tired

        cont = ~inner_done
        safe_H = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
        V_next = s.V.at[(k + 1) % mem].set(
            jnp.where(cont, q / safe_H.astype(FC), s.V[(k + 1) % mem])
        )

        s_out = s._replace(V=V_next, U=U_new, l=l_new, z=z_new,
                           inner_k=kk, iter=it, rNorm=rNorm,
                           f_resid=resid_decrease, f_break=breakdown)
        s_out = s_out._replace(
            hist_r=rt.hist_write(s_out.hist_r, it, rNorm, history))
        if verbose > 0:
            rt.debug_row(verbose, s_out.iter, "{:5d}  {:5d}  {:7.1e}",
                         s_out.npass, s_out.rNorm)
        if callback is not None:
            # Mid-pass iterations only; the pass-boundary call runs in
            # the outer body on the post-epilogue state.
            user_exit = callback(s_out)
            s_out = s_out._replace(
                status=jnp.where(
                    user_exit & (s_out.status == rt.RUNNING) & ~inner_done,
                    jnp.int32(rt.USER_EXIT), s_out.status)
            )
        return s_out

    def outer_cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def outer_body(ms):
        ms = jax.lax.while_loop(inner_cond, inner_body, ms)

        tired = ms.iter >= itmax
        inner_done = (ms.f_resid | ms.f_break | tired
                      | (ms.inner_k >= mem))
        glob_done = ms.f_resid | ms.f_break | tired
        restart_now = inner_done & ~glob_done

        y = _fom_back_substitute(ms.U, ms.z, ms.inner_k, mem)
        xr = ms.V.T @ y
        if not NisI:
            xr = N_apply(xr)
        x_fin = jnp.where(inner_done, ms.x + xr, ms.x)

        # Restart re-init (pass not globally done), speculative + select.
        w2 = b - A.matvec(x_fin)
        r0 = M_apply(w2)
        beta = knorm(r0)
        safe = jnp.where(beta == 0, jnp.ones_like(beta), beta)
        Vr = jnp.zeros((mem, n), FC).at[0].set(r0 / safe.astype(FC))
        zr = jnp.zeros((mem,), FC).at[0].set(beta.astype(FC))

        # Status (reference src/fom.jl:355-359, later wins); a status
        # already set by the callback (USER_EXIT) is preserved.
        code = jnp.int32(rt.TIRED)
        code = jnp.where(ms.f_break, jnp.int32(INCONS_FOM), code)
        code = jnp.where(ms.f_resid, jnp.int32(rt.SOLVED), code)
        code = jnp.where(~glob_done, jnp.int32(rt.RUNNING), code)
        code = jnp.where(ms.status == rt.RUNNING, code, ms.status)
        code = jnp.where(inner_done, code, ms.status)

        out = ms._replace(
            x=x_fin,
            V=jnp.where(restart_now, Vr, ms.V),
            z=jnp.where(restart_now, zr, ms.z),
            U=jnp.where(restart_now, jnp.zeros_like(ms.U), ms.U),
            l=jnp.where(restart_now, jnp.zeros_like(ms.l), ms.l),
            inner_k=jnp.where(inner_done, jnp.int32(0), ms.inner_k),
            npass=jnp.where(restart_now, ms.npass + 1, ms.npass),
            rNorm=jnp.where(restart_now, beta, ms.rNorm),
            status=code,
            inconsistent=ms.inconsistent
            | (ms.f_break & ~ms.f_resid & inner_done),
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


def _fom_solve(
    A, b, x0=None, *, M=None, N=None, ldiv=False, restart=False,
    reorthogonalization=False, memory=20, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
    memory_cap=512,
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
    rt.debug_table(verbose, "FOM", ("k", "pass", "‖rₖ‖"), n)
    mem = min(int(memory), itmax) if restart else min(itmax, memory_cap)
    mem = max(mem, 2)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    eff_restart = bool(restart) or mem < itmax

    # Fast path: DIA stencil + default config → fused whole-solve FOM(mem)
    # kernel (Arnoldi panel in VMEM, SMEM LU, in-kernel restarts).
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and not reorthogonalization
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (fom_dia_fused,
                                        fom_dia_fused_supported)
        if fom_dia_fused_supported(A.dia.offsets, n, b.dtype, mem,
                                   stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, status, incons, npass = fom_dia_fused(
                A._pd, A.dia.offsets, b_eff, float(atol), float(rtol),
                itmax, mem=mem)
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
                status=rt.decode_status(code, _FOM_STATUS),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _fom_core(
            A, M, N, b, x0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol, mem=mem, ldiv=bool(ldiv), restart=eff_restart,
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
        status=rt.decode_status(code, _FOM_STATUS),
    )
    return x, stats, state


def fom(A, b, x0=None, **kwargs):
    """x, stats = fom(A, b; memory=20, restart=False, ...).

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage (M/N/memory/restart pass
    through to the inner correction solves)."""
    from ._refine import square_ir_wrap
    hit = square_ir_wrap("FOM", _fom_solve, A, b, x0, kwargs,
                         forward=("M", "N", "ldiv", "memory", "restart",
                                  "reorthogonalization"))
    if hit is not None:
        return hit
    x, stats, _ = _fom_solve(A, b, x0, **kwargs)
    return x, stats


# ---------------------------------------------------------------------------
# DIOM / DQGMRES — truncated-memory methods with circular stacks.
# ---------------------------------------------------------------------------

class TruncState(NamedTuple):
    x: jax.Array
    V: jax.Array          # (mem, n) circular basis
    P: jax.Array          # (mP, n) circular update directions
    L: jax.Array          # diom: (mem-1,) pivots; dqgmres: (mem,) cosines
    Ssin: jax.Array       # dqgmres: (mem,) sines; diom: unused (0,)
    xi: jax.Array         # diom: ξₖ scalar; dqgmres: γₖ
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


def _ring_window_dots(V, w, k, mem):
    """⟨vᵢ, w⟩ for every valid ring slot; returns (h_slots, i_idx, valid)."""
    j = jnp.arange(mem)
    pos = jnp.mod(k, mem)
    i_idx = k - jnp.mod(pos - j, mem)
    valid = i_idx >= 0
    Vm = jnp.where(valid[:, None], V, 0)
    h = jnp.conj(Vm) @ w
    return h, i_idx, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "mem", "ldiv", "variant", "reorthogonalization", "history",
        "hist_len", "callback", "verbose", "MisI", "NisI",
    ),
)
def _trunc_core(
    A, M, N, b, x0, state_in, iter_cap, atol, rtol,
    *, mem, ldiv, variant, reorthogonalization, history, hist_len,
    callback, verbose, MisI, NisI,
):
    """variant: 'diom' or 'dqgmres'."""
    n = b.shape[0]
    FC = b.dtype
    T = real_dtype(FC)
    diom = variant == "diom"
    mP = (mem - 1) if diom else mem

    def M_apply(u):
        return precond_apply(M, u, ldiv)

    def N_apply(u):
        return precond_apply(N, u, ldiv)

    if state_in is None:
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
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, beta, history)
        state = TruncState(
            x=x, V=V, P=jnp.zeros((mP, n), FC),
            L=jnp.zeros((mem,), FC) if diom else jnp.zeros((mem,), T),
            Ssin=jnp.zeros((0,), FC) if diom else jnp.zeros((mem,), FC),
            xi=beta.astype(FC), rNorm=beta, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        k = s.iter                      # 0-based column index
        it1 = k + 1                     # 1-based iteration (reference iter)
        pos = jnp.mod(k, mem)
        vk = s.V[pos]
        z = N_apply(vk)
        t = A.matvec(z)
        w = M_apply(t)

        # Window orthogonalization (masked ring dots → CGS over window).
        h_slots, i_idx, valid = _ring_window_dots(s.V, w, k, mem)
        w = w - s.V.T @ jnp.where(valid, h_slots, 0)
        if reorthogonalization:
            h2, _, _ = _ring_window_dots(s.V, w, k, mem)
            h_slots = h_slots + jnp.where(valid, h2, 0)
            w = w - s.V.T @ jnp.where(valid, h2, 0)
        Haux = knorm(w)

        # Diagonal-indexed column H[diag], diag = k - i + 1 ∈ [1, mem].
        diag_idx = jnp.where(valid, k - i_idx + 1, 0)
        H = jnp.zeros((mem + 2,), FC).at[diag_idx].add(
            jnp.where(valid, h_slots, 0)
        )
        H = H.at[0].set(0)

        if diom:
            # LU column update (reference src/diom.jl:251-266) — the
            # window chain H[diag] = H_orig[diag] - L*(previous H[diag+1])
            # is a first-order affine recurrence (the value each step
            # writes at diag is what the next step reads at its diag+1),
            # vectorized as one associative prefix scan over the window
            # (rt.affine_chain_scan; the unrolled sequential form cost
            # ~70 us/iter of tiny-op overhead on TPU at mem=20).
            Lh = mem + 2
            d0 = jnp.minimum(it1 - 1, mem - 1)   # number of active steps
            o_ix = jnp.arange(mem)
            act_o = o_ix < d0
            i_1b = jnp.maximum(2, it1 - mem + 2) + o_ix
            Lcoef = s.L[jnp.mod(i_1b - 1, mem - 1)]
            Hrev = H[::-1]
            Hpad = jnp.concatenate([Hrev, jnp.zeros((mem,), FC)])
            # H_orig[diag] for diag = d0 - o (start >= 2, never clamps)
            segR = jax.lax.dynamic_slice(Hpad, (Lh - 1 - d0,), (mem,))
            a_ch = jnp.where(act_o, -Lcoef, jnp.zeros((), FC))
            carry0 = H[jnp.clip(d0 + 1, 0, Lh - 1)]
            carries = rt.affine_chain_scan(a_ch, segR, carry0)
            upd = jnp.where(act_o, carries[1:], segR)
            Hpad = jax.lax.dynamic_update_slice(Hpad, upd, (Lh - 1 - d0,))
            H = Hpad[:Lh][::-1]
            xi = jnp.where(it1 >= 2,
                           -s.L[jnp.mod(it1 - 1, mem - 1)] * s.xi, s.xi)
            ukk = H[1]
            safe_u = jnp.where(ukk == 0, jnp.ones((), FC), ukk)
            L_new = s.L.at[jnp.mod(it1, mem - 1)].set(Haux.astype(FC) / safe_u)
            Ssin_new = s.Ssin
            gamma_step = xi          # x += ξ·pₖ with pₖ already /u
            rNorm = Haux * jnp.abs(xi / safe_u)
            xi_next = xi
            denom = safe_u
        else:
            # Apply previous rotations (reference src/dqgmres.jl:257-266)
            # — same affine-chain vectorization as
            # gmres._apply_prev_rotations, over the sliding window: step i
            # reads H[diag+1] (the "low" value step i-1 wrote), so
            # carry' = conj(s_i)*carry - c_i*H_orig[diag]; kept entries
            # are c_i*carry + s_i*H_orig[diag].
            Lh = mem + 2
            d0 = jnp.minimum(it1 - 1, mem)       # number of active steps
            o_ix = jnp.arange(mem)
            act_o = o_ix < d0
            i_1b = jnp.maximum(1, it1 - mem) + o_ix
            slot = jnp.mod(i_1b - 1, mem)
            ci = s.L[slot].astype(FC)
            si = s.Ssin[slot]
            Hrev = H[::-1]
            Hpad = jnp.concatenate([Hrev, jnp.zeros((mem,), FC)])
            segR = jax.lax.dynamic_slice(Hpad, (Lh - 1 - d0,), (mem,))
            a_ch = jnp.where(act_o, jnp.conj(si), jnp.ones((), FC))
            b_ch = jnp.where(act_o, -ci * segR, jnp.zeros((), FC))
            carry0 = H[jnp.clip(d0 + 1, 0, Lh - 1)]
            carries = rt.affine_chain_scan(a_ch, b_ch, carry0)
            tmp = ci * carries[:mem] + si * segR
            seg_up = jax.lax.dynamic_slice(Hpad, (Lh - 2 - d0,), (mem,))
            upd = jnp.where(act_o, tmp, seg_up)
            Hpad = jax.lax.dynamic_update_slice(Hpad, upd, (Lh - 2 - d0,))
            H = Hpad[:Lh][::-1]
            H = H.at[1].set(jnp.take(carries, d0))
            ck, sk, rkk = sym_givens(H[1], Haux.astype(FC))
            H = H.at[1].set(jnp.asarray(rkk, FC))
            L_new = s.L.at[pos].set(jnp.real(ck))
            Ssin_new = s.Ssin.at[pos].set(jnp.asarray(sk, FC))
            gamma_next = jnp.conj(jnp.asarray(sk, FC)) * s.xi
            gamma_k = jnp.real(ck).astype(FC) * s.xi
            gamma_step = gamma_k
            rNorm = jnp.abs(gamma_next)
            xi_next = gamma_next
            safe_u = jnp.where(H[1] == 0, jnp.ones((), FC), H[1])
            denom = safe_u

        # Direction pₖ from the P ring (sum over window, masked).
        jP = jnp.arange(mP)
        iP = (k - 1) - jnp.mod((k - 1) - jP, mP)     # index stored in P slot
        lowP = (k - mem + 1) if diom else (k - mem)
        validP = (iP >= 0) & (iP >= lowP) & (iP <= k - 1)
        diagP = k - iP + 1
        coef = H[jnp.where(validP, diagP, 0)]
        coef = jnp.where(validP, coef, 0)
        psum = s.P.T @ coef
        p_new = (z - psum) / denom
        ppos = jnp.mod(k, mP)
        P_new = s.P.at[ppos].set(p_new)

        x_new = s.x + gamma_step * p_new

        # Next basis vector (lucky breakdown keeps the slot).
        safe_H = jnp.where(Haux == 0, jnp.ones_like(Haux), Haux)
        next_pos = jnp.mod(k + 1, mem)
        V_new = s.V.at[next_pos].set(
            jnp.where(Haux != 0, w / safe_H.astype(FC), s.V[next_pos])
        )

        it = k + 1
        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING))
        hist = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            x=x_new, V=V_new, P=P_new, L=L_new, Ssin=Ssin_new,
            xi=xi_next, rNorm=rNorm, iter=it, status=code, hist_r=hist,
        )
        if verbose > 0:
            rt.debug_row(verbose, s_new.iter, "{:5d}  {:7.1e}",
                         s_new.rNorm)
        if callback is not None:
            user_exit = callback(s_new)
            s_new = s_new._replace(
                status=jnp.where(user_exit & (s_new.status == rt.RUNNING),
                                 jnp.int32(rt.USER_EXIT), s_new.status)
            )
        return s_new

    return jax.lax.while_loop(cond, body, state)


def _trunc_solve(
    variant, A, b, x0=None, *, M=None, N=None, ldiv=False,
    reorthogonalization=False, memory=20, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
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
    rt.debug_table(verbose, variant.upper(), ("k", "‖rₖ‖"), n)
    mem = max(int(memory), 2)
    hist_len = itmax + 1 if history else 0
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (V/P rings as VMEM panels, window CGS, SMEM LU / rotation ring).
    if (M is None and N is None and not history and callback is None
            and verbose == 0 and not reorthogonalization
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (trunc_dia_fused,
                                        trunc_dia_fused_supported)
        if trunc_dia_fused_supported(A.dia.offsets, n, b.dtype, mem,
                                     stencil_dtype=A._pd.dtype):
            b_eff = b if x0 is None else b - A.matvec(x0)
            x, niter, rnorm, status = trunc_dia_fused(
                A._pd, A.dia.offsets, b_eff, float(atol), float(rtol),
                itmax, mem=mem, variant=variant)
            niter, code = jax.device_get([niter, status])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if x0 is not None:
                x = x + x0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=False,
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(x), stats, None

    def run(state, cap):
        return _trunc_core(
            A, M, N, b, x0, state, jnp.int32(cap), atol, rtol,
            mem=mem, ldiv=bool(ldiv), variant=variant,
            reorthogonalization=bool(reorthogonalization),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None, NisI=N is None,
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
        inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, state


def _trunc_dw(variant, A, b, x0, kwargs):
    import functools as _ft
    from ._refine import square_ir_wrap
    return square_ir_wrap(variant.upper(),
                          _ft.partial(_trunc_solve, variant),
                          A, b, x0, kwargs,
                          forward=("M", "N", "ldiv", "memory",
                                   "reorthogonalization"))


def diom(A, b, x0=None, **kwargs):
    """x, stats = diom(A, b; memory=20, ...) — truncated FOM.

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage."""
    hit = _trunc_dw("diom", A, b, x0, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _trunc_solve("diom", A, b, x0, **kwargs)
    return x, stats


def dqgmres(A, b, x0=None, **kwargs):
    """x, stats = dqgmres(A, b; memory=20, ...) — truncated GMRES.

    TPU extension: ``precision="double_word"`` — iterative refinement to
    fp64-grade TRUE residuals from f32 storage."""
    hit = _trunc_dw("dqgmres", A, b, x0, kwargs)
    if hit is not None:
        return hit
    x, stats, _ = _trunc_solve("dqgmres", A, b, x0, **kwargs)
    return x, stats
