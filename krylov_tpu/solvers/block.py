"""Block MINRES and block GMRES — multiple right-hand sides AX = B.

Parity targets: reference src/block_minres.jl (Hermitian A, block
tridiagonal reduction) and src/block_gmres.jl (block Arnoldi, restart,
M/N preconditioning, ``memory`` workspace option, itmax default
2·div(n,p)).  TPU-first design: the block basis lives as a (mem+1, n, p)
array, orthogonalization is block CGS2 via batched matmuls (MXU), block
normalization is jnp.linalg.qr (replacing the reference's LAPACK
Householder kgeqrf!/korgqr! calls, src/block_krylov_utils.jl:210-301),
and the small least-squares problem min ‖H̄Y − E₁Γ‖_F is re-solved each
iteration with a dense masked QR — O((mem·p)³) scalar work that is
negligible next to the SpMM.  block_minres is the reference's
O(1)-memory block-tridiagonal recurrence (src/block_minres.jl:95-317):
7 (n,p) blocks independent of the iteration count.
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
from ..stats import SimpleStats


class BlockState(NamedTuple):
    X: jax.Array          # (n, p) accumulated solution
    V: jax.Array          # (mem+1, n, p) block basis
    R: jax.Array          # ((mem+1)p, mem·p) transformed Hessenberg (upper)
    g: jax.Array          # ((mem+1)p, p) transformed rhs Qᴴ·E₁Γ
    Qacc: jax.Array       # ((mem+1)p, (mem+1)p) accumulated block-QR factor
    inner_k: jax.Array
    iter: jax.Array
    rNorm: jax.Array
    eps_lim: jax.Array
    status: jax.Array
    hist_r: jax.Array
    f_resid: jax.Array    # residual-decrease flag (pass-exit reason)
    f_break: jax.Array    # breakdown flag (pass-exit reason)
    pass_beta: jax.Array  # TRUE residual at the current pass start
    npass: jax.Array      # 1-based pass counter (verbose col)


def _solve_Y(R, g, k, mem, p):
    """Back-solve the masked triangular system after k inner iterations.

    R holds the PROGRESSIVELY transformed block Hessenberg (the inner
    loop keeps Qaccᴴ·H̄ upper triangular incrementally), so Y costs one
    masked triangular solve per PASS — the round-4 formulation re-QR'd
    the dense ((mem+1)p × mem·p) Hessenberg every inner iteration, a
    ~130×128 Householder chain that dominated the block-GMRES general
    path (226 µs/block-iter vs 56 fused, BENCH_DETAIL r4)."""
    cols = mem * p
    cidx = jnp.arange(cols)
    cmask = cidx < k * p
    act = cmask[:, None] & cmask[None, :]
    Rsq = jnp.where(act, R[:cols], 0) \
        + jnp.where((~cmask) & (cidx[:, None] == cidx[None, :]),
                    jnp.ones((), R.dtype), 0)
    g_m = jnp.where(cmask[:, None], g[:cols], 0)
    return jax.scipy.linalg.solve_triangular(Rsq, g_m)


@functools.partial(
    jax.jit,
    static_argnames=("mem", "ldiv", "restart",
                     "reorthogonalization", "history", "hist_len",
                     "callback", "verbose", "MisI", "NisI"),
)
def _block_core(
    A, M, N, B, X0, state_in, iter_cap, itmax, atol, rtol,
    *, mem, ldiv, restart, reorthogonalization, history,
    hist_len, callback, verbose, MisI, NisI,
):
    n, p = B.shape
    FC = B.dtype
    T = real_dtype(FC)
    btol = jnp.asarray(jnp.finfo(T).eps ** 0.75, T)
    rows = (mem + 1) * p

    def M_apply(W):
        if M is None:
            return W
        return M.solve(W) if ldiv else (M.matmat(W) if hasattr(M, "matmat")
                                        else M.matvec(W))

    def N_apply(W):
        if N is None:
            return W
        return N.solve(W) if ldiv else (N.matmat(W) if hasattr(N, "matmat")
                                        else N.matvec(W))

    def init_pass(X):
        R0 = B - A.matmat(X)
        R0 = M_apply(R0)
        V1, Gamma = jnp.linalg.qr(R0)
        beta = jnp.linalg.norm(Gamma)
        V = jnp.zeros((mem + 1, n, p), FC).at[0].set(V1)
        rhs = jnp.zeros((rows, p), FC).at[:p].set(Gamma)
        return V, rhs, beta

    if state_in is None:
        X = jnp.zeros((n, p), FC) if X0 is None else X0
        V, rhs, beta = init_pass(X)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(beta <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, beta, history)
        state = BlockState(
            X=X, V=V, R=jnp.zeros((rows, mem * p), FC), g=rhs,
            Qacc=jnp.eye(rows, dtype=FC),
            inner_k=jnp.int32(0), iter=jnp.int32(0),
            rNorm=beta, eps_lim=eps_lim, status=status, hist_r=hist,
            f_resid=jnp.zeros((), jnp.bool_),
            f_break=jnp.zeros((), jnp.bool_),
            pass_beta=beta,
            npass=jnp.int32(1),
        )
    else:
        state = state_in

    # Two-level loop with an UNconditional, jnp.where-selected pass
    # epilogue — same restructure as _gmres_core: any lax.cond in the
    # loop nest defeats XLA's buffer aliasing for the (mem+1, n, p)
    # basis and taxes every inner iteration (tools/exp_gmres_bisect.py).

    def inner_cond(s):
        done = (s.f_resid | s.f_break | (s.iter >= itmax)
                | (s.inner_k >= mem))
        return (s.status == rt.RUNNING) & ~done & (s.iter < iter_cap)

    def inner_body(s):
        k = s.inner_k
        Vk = s.V[k]
        W = A.matmat(N_apply(Vk))
        W = M_apply(W)

        # Block orthogonalization: CGS2 over the previous blocks.  Only
        # blocks 0..k are nonzero during the inner loop (V is
        # zero-initialized, written sequentially at k+1 ≤ mem, zeroed on
        # restart; block index mem is never read back before the pass
        # ends), so the projection only needs V[:mem] — and for deep
        # memories the dominant cost is re-reading that (mem, n, p)
        # basis from HBM four times per iteration regardless of k.  When
        # mem divides into 8-block chunks, loop over just the ACTIVE
        # chunks with a dynamically bounded fori_loop: each chunk
        # (≤ a few MB) is read once per CGS pass and both GEMMs (Hᴴ
        # coefficients vs the ORIGINAL W, and the projection sum) reuse
        # it from VMEM — average traffic drops ~2× at k ~ mem/2.
        # Measured on-chip at 32³/p=4/mem=32 (VERDICT r4 ask #2):
        # 152.9 → 127.8 µs/block-iter (tools/exp_block_chunked_tpu.py).
        # Of the rest, ~32 µs is the V.at[k+1] commit: XLA materializes
        # a full basis copy because the carry is also dynamically
        # sliced in the same body — reordering the update first doesn't
        # help, and a Pallas aliased-DMA commit is rejected by Mosaic
        # (minor dim p=4 vs the 128-lane HBM tiling); see
        # tools/exp_block_vset_micro.py before attempting either again.
        CH = 8
        chunked = mem >= 16 and mem % CH == 0

        if chunked:
            def cgs_pass(Wp):
                def chunk_body(c, carry):
                    Hacc, P = carry
                    Vblk = jax.lax.dynamic_slice(
                        s.V, (c * CH, jnp.int32(0), jnp.int32(0)),
                        (CH, n, p))
                    Hc = jnp.einsum("inp,nq->ipq", jnp.conj(Vblk), Wp)
                    P = P + jnp.einsum("inp,ipq->nq", Vblk, Hc)
                    Hacc = jax.lax.dynamic_update_slice(
                        Hacc, Hc, (c * CH, jnp.int32(0), jnp.int32(0)))
                    return Hacc, P
                Hacc, P = jax.lax.fori_loop(
                    0, k // CH + 1, chunk_body,
                    (jnp.zeros((mem, p, p), FC), jnp.zeros_like(Wp)))
                return Hacc, Wp - P

            Hcol, W = cgs_pass(W)
            Hcol2, W = cgs_pass(W)
            Hcol = Hcol + Hcol2
            if reorthogonalization:
                Hcol3, W = cgs_pass(W)
                Hcol = Hcol + Hcol3
        else:
            Vm = s.V[:mem]
            Hcol = jnp.einsum("inp,nq->ipq", jnp.conj(Vm), W)   # (mem,p,p)
            W = W - jnp.einsum("inp,ipq->nq", Vm, Hcol)
            Hcol2 = jnp.einsum("inp,nq->ipq", jnp.conj(Vm), W)
            W = W - jnp.einsum("inp,ipq->nq", Vm, Hcol2)
            Hcol = Hcol + Hcol2
            if reorthogonalization:
                Hcol3 = jnp.einsum("inp,nq->ipq", jnp.conj(Vm), W)
                W = W - jnp.einsum("inp,ipq->nq", Vm, Hcol3)
                Hcol = Hcol + Hcol3

        # CholQR2 block normalization (Householder jnp.linalg.qr costs
        # 28 µs on this shape vs ~free for CholQR; the doubled pass
        # restores orthogonality for mildly conditioned panels).  A
        # rank-deficient panel NaNs the Cholesky — the breakdown test
        # below is written NaN-safe (~(Hbis > btol)) so the pass exits
        # and the poisoned candidate block is never committed.
        # Q = W·R⁻¹ via the TRANSPOSE solve (Rᵀ Zᵀ = Wᵀ) — conjugating
        # here would compute W·conj(R)⁻¹ and break the complex panels
        G1 = jnp.conj(W.T) @ W
        R1 = jnp.linalg.cholesky(G1, upper=True)
        Q1 = jax.scipy.linalg.solve_triangular(R1.T, W.T, lower=True).T
        G2 = jnp.conj(Q1.T) @ Q1
        R2 = jnp.linalg.cholesky(G2, upper=True)
        Vn = jax.scipy.linalg.solve_triangular(R2.T, Q1.T, lower=True).T
        Hk1 = R2 @ R1
        Hbis = jnp.linalg.norm(Hk1)
        # A (numerically) rank-deficient panel NaNs the Cholesky; an
        # exactly-converged pass has W ≈ 0.  Commit a ZERO subdiagonal
        # block instead (exact for a lucky breakdown: A·Vk = Σ Vi·Hi),
        # flag breakdown, and never commit the poisoned Vn.
        bad = ~jnp.isfinite(Hbis)
        Hk1 = jnp.where(bad, jnp.zeros_like(Hk1), Hk1)
        Hbis = jnp.where(bad, jnp.zeros_like(Hbis), Hbis)
        Vn = jnp.where(bad, jnp.zeros_like(Vn), Vn)

        # New column block k of H̄ (coefficients + subdiagonal block).
        Hcol_flat = Hcol.reshape(rows - p, p)
        Hfull = jnp.zeros((rows, p), FC).at[:rows - p].set(Hcol_flat)
        Hfull = jax.lax.dynamic_update_slice(Hfull, Hk1,
                                             ((k + 1) * p, jnp.int32(0)))

        # Incremental block QR: apply the accumulated transform, then
        # eliminate the subdiagonal block with ONE tiny (2p × p)
        # complete-QR pivot — O(rows²·p) matmul work on the MXU instead
        # of a full dense re-QR per iteration.
        Z = jnp.conj(s.Qacc.T) @ Hfull                      # (rows, p)
        Zblk = jax.lax.dynamic_slice(Z, (k * p, jnp.int32(0)), (2 * p, p))
        Qs, Rs = jnp.linalg.qr(Zblk, mode="complete")       # (2p,2p),(2p,p)
        Z = jax.lax.dynamic_update_slice(Z, Rs, (k * p, jnp.int32(0)))
        R_new = jax.lax.dynamic_update_slice(s.R, Z, (jnp.int32(0), k * p))
        gblk = jax.lax.dynamic_slice(s.g, (k * p, jnp.int32(0)), (2 * p, p))
        g_new = jax.lax.dynamic_update_slice(
            s.g, jnp.conj(Qs.T) @ gblk, (k * p, jnp.int32(0)))
        Qcols = jax.lax.dynamic_slice(
            s.Qacc, (jnp.int32(0), k * p), (rows, 2 * p)) @ Qs
        Qacc_new = jax.lax.dynamic_update_slice(
            s.Qacc, Qcols, (jnp.int32(0), k * p))

        kk = k + 1
        it = s.iter + 1
        # block residual = trailing p×p block of the transformed rhs
        rNorm = jnp.linalg.norm(jax.lax.dynamic_slice(
            g_new, (kk * p, jnp.int32(0)), (p, p)))

        resid_decrease = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        breakdown = ~(Hbis > btol)          # NaN-safe (CholQR2 panel)
        tired = it >= itmax
        inner_tired = kk >= mem
        inner_done = resid_decrease | breakdown | tired | inner_tired
        glob_done = resid_decrease | breakdown | tired

        # Unconditional commit: when the pass ends here the candidate
        # block is never read (Y uses blocks 0..kk−1; restart zeroes V),
        # and the select's read-modify of the (mem+1, n, p) basis is
        # pure overhead.  Breakdown panels are pre-sanitized to zero.
        V_next = s.V.at[k + 1].set(Vn)

        s_out = s._replace(V=V_next, R=R_new, g=g_new, Qacc=Qacc_new,
                           inner_k=kk, iter=it, rNorm=rNorm,
                           f_resid=resid_decrease, f_break=breakdown)
        s_out = s_out._replace(
            hist_r=rt.hist_write(s_out.hist_r, it, rNorm, history))
        if verbose > 0:
            # reference column order src/block_gmres.jl:181 (pass, k, R);
            # cadence gates on the ITERATION counter, not the pass
            rt.debug_row_vals(verbose, s_out.iter,
                              "{:5d}  {:5d}  {:7.1e}",
                              s_out.npass, s_out.iter, s_out.rNorm)
        if callback is not None:
            # Mid-pass iterations only; the pass-boundary call runs in
            # the outer body on the post-epilogue state.
            user_exit = callback(s_out)
            s_out = s_out._replace(
                status=jnp.where(
                    user_exit & (s_out.status == rt.RUNNING) & ~inner_done,
                    jnp.int32(rt.USER_EXIT), s_out.status))
        return s_out

    def outer_cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def outer_body(ms):
        ms = jax.lax.while_loop(inner_cond, inner_body, ms)

        tired = ms.iter >= itmax
        inner_done = (ms.f_resid | ms.f_break | tired
                      | (ms.inner_k >= mem))

        # X += N·(Σ_j V_j Y_j), Y back-solved once per pass.
        Y = _solve_Y(ms.R, ms.g, ms.inner_k, mem, p)
        Yb = Y.reshape(mem, p, p)
        XR = jnp.einsum("inp,ipq->nq", ms.V[:mem], Yb)
        XR = N_apply(XR)
        X_fin = jnp.where(inner_done, ms.X + XR, ms.X)

        # Pass-boundary TRUE residual (also the restart re-init).  The
        # recurrence residual of a CholQR2 panel can under-report when a
        # block goes rank-deficient (round-3 lesson: rhs mass stranded
        # on singular pivots), so BOTH convergence claims (f_resid) and
        # breakdowns are verified here: claim confirmed → solved; claim
        # unconfirmed but the pass made progress → restart and keep
        # going; no progress → stop (exact-arithmetic breakdown:
        # restarting would regenerate the same exhausted space).
        Vr, rhsr, beta_r = init_pass(X_fin)
        true_conv = beta_r <= ms.eps_lim
        progress = beta_r <= 0.9 * ms.pass_beta
        claimed = ms.f_resid | ms.f_break
        glob_done = tired | true_conv | (claimed & ~progress)
        restart_now = inner_done & ~glob_done

        code = jnp.int32(rt.BREAKDOWN)
        code = jnp.where(tired, jnp.int32(rt.TIRED), code)
        code = jnp.where(true_conv, jnp.int32(rt.SOLVED), code)
        code = jnp.where(~glob_done, jnp.int32(rt.RUNNING), code)
        code = jnp.where(ms.status == rt.RUNNING, code, ms.status)
        code = jnp.where(inner_done, code, ms.status)

        out = ms._replace(
            X=X_fin,
            V=jnp.where(restart_now, Vr, ms.V),
            g=jnp.where(restart_now, rhsr, ms.g),
            R=jnp.where(restart_now, jnp.zeros_like(ms.R), ms.R),
            Qacc=jnp.where(restart_now, jnp.eye(rows, dtype=FC), ms.Qacc),
            inner_k=jnp.where(inner_done, jnp.int32(0), ms.inner_k),
            rNorm=jnp.where(inner_done, beta_r, ms.rNorm),
            pass_beta=jnp.where(restart_now, beta_r, ms.pass_beta),
            npass=jnp.where(restart_now, ms.npass + 1, ms.npass),
            status=code,
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


def _block_solve(
    A, B, X0=None, *, M=None, N=None, ldiv=False, restart=False,
    reorthogonalization=False, memory=5, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None,
    memory_cap=128, basis_dtype=None, **_ig,
):
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    N = as_operator(N)
    B = jnp.asarray(B)
    n, p = B.shape
    if A.shape is not None and A.shape[0] != A.shape[1]:
        raise ValueError("System must be square")
    T = real_dtype(B.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, max(2 * (n // p), 2))
    rt.debug_table(verbose, "BLOCK-GMRES",
                   ("pass", "k", "‖Rₖ‖"), n)
    if restart:
        mem = min(int(memory), itmax)
    else:
        mem = min(itmax, memory_cap)
    mem = max(mem, 2)
    hist_len = itmax + 1 if history else 0
    X0 = None if X0 is None else jnp.asarray(X0, dtype=B.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (one launch; block basis, CholQR2 and the banded block-Hessenberg
    # QR all VMEM/SMEM-resident — see ops/pallas_fused.py).
    if (M is None and N is None and not reorthogonalization
            and callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (block_gmres_dia_fused,
                                        block_gmres_dia_fused_supported)
        bd = None if basis_dtype is None else jnp.dtype(basis_dtype)
        if block_gmres_dia_fused_supported(A.dia.offsets, n, p, B.dtype,
                                           mem, stencil_dtype=A._pd.dtype,
                                           basis_dtype=bd):
            B_eff = B if X0 is None else B - A.matmat(X0)
            # Rank-deficient rhs blocks go to the general core: its
            # Householder QR completes deficient panels with arbitrary
            # orthonormal directions (like the reference's LAPACK
            # kgeqrf!), while the kernel's CholQR collapses them to zero
            # columns (honest but slower — the space grows < p
            # directions per iteration).  One small QR probe.
            with jax.default_matmul_precision("highest"):
                Rdiag = jnp.abs(jnp.diagonal(jnp.linalg.qr(B_eff, mode="r")))
            T_ = real_dtype(B.dtype)
            full_rank = bool(jnp.all(
                Rdiag > float(np.finfo(T_).eps) ** 0.75
                * jnp.maximum(jnp.max(Rdiag), 1.0)))
        else:
            full_rank = False
        if full_rank:
            X, niter, rnorm, status, incons, npass = block_gmres_dia_fused(
                A._pd, A.dia.offsets, B_eff, float(atol), float(rtol),
                itmax, mem=mem, p=p, basis_dtype=bd)
            niter, code, incons = jax.device_get([niter, status, incons])
            niter = int(niter)
            code = rt.final_status_code(int(code), niter, itmax, False)
            if X0 is not None:
                X = X + X0
            stats = SimpleStats(
                niter=niter,
                solved=rt.is_solved_code(code),
                inconsistent=bool(incons),
                residuals=np.zeros(0),
                timer=time.perf_counter() - start,
                status=rt.decode_status(code),
            )
            return jnp.asarray(X), stats, None

    if basis_dtype is not None:
        raise ValueError(
            "basis_dtype (compressed-basis block-GMRES) is a fused-path "
            "feature: it requires a DIA-stencil operator with "
            "use_pallas=True, a full-rank rhs block, M = N = None, no "
            "history/callback/verbose/timemax, and the compressed panel "
            "must fit VMEM")

    def run(state, cap):
        return _block_core(
            A, M, N, B, X0, state, jnp.int32(cap), jnp.int32(itmax),
            atol, rtol,
            mem=mem, ldiv=bool(ldiv), restart=bool(restart) or mem < itmax,
            reorthogonalization=bool(reorthogonalization),
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose), MisI=M is None, NisI=N is None,
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code), inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return jnp.asarray(state.X), stats, state


# ---------------------------------------------------------------------------
# Block MINRES — O(1)-memory block-tridiagonal recurrence (reference
# src/block_minres.jl:95-317).  Memory: 7 (n,p) blocks independent of the
# iteration count; the reference's Householder reflections Θₖ (2p×p
# kgeqrf/kormqr) are realized as complete QR factors Qθ (2p×2p) applied by
# matmul — MXU-friendly p×p work.
# ---------------------------------------------------------------------------

class BlockMinresState(NamedTuple):
    X: jax.Array          # (n, p)
    Vkm1: jax.Array       # (n, p)
    Vk: jax.Array         # (n, p)
    w_km2: jax.Array      # (n, p)
    w_km1: jax.Array      # (n, p)
    Psi_k: jax.Array      # (p, p) subdiagonal block Ψₖ
    Phibar: jax.Array     # (p, p) Φbarₖ
    Q2_km2: jax.Array     # (2p, 2p) reflection Θₖ₋₂
    Q2_km1: jax.Array     # (2p, 2p) reflection Θₖ₋₁
    rNorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    hist_r: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("history", "hist_len", "callback", "verbose"),
)
def _block_minres_core(
    A, B, X0, state_in, iter_cap, itmax, atol, rtol,
    *, history, hist_len, callback, verbose,
):
    n, p = B.shape
    FC = B.dtype
    T = real_dtype(FC)

    if state_in is None:
        X = jnp.zeros((n, p), FC)
        R0 = B if X0 is None else B - A.matmat(X0)
        V1, Gamma = jnp.linalg.qr(R0)
        beta = jnp.linalg.norm(Gamma)
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * beta
        status = jnp.where(beta == 0, jnp.int32(rt.ZERO_RESIDUAL),
                           jnp.where(beta <= eps_lim, jnp.int32(rt.SOLVED),
                                     jnp.int32(rt.RUNNING)))
        hist = rt.hist_init(hist_len, T)
        hist = rt.hist_write(hist, 0, beta, history)
        state = BlockMinresState(
            X=X, Vkm1=jnp.zeros((n, p), FC), Vk=V1,
            w_km2=jnp.zeros((n, p), FC), w_km1=jnp.zeros((n, p), FC),
            Psi_k=jnp.zeros((p, p), FC), Phibar=Gamma,
            Q2_km2=jnp.eye(2 * p, dtype=FC), Q2_km1=jnp.eye(2 * p, dtype=FC),
            rNorm=beta, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, hist_r=hist,
        )
    else:
        state = state_in

    def cond(s):
        return (s.status == rt.RUNNING) & (s.iter < iter_cap)

    def body(s):
        it = s.iter + 1
        # Block Lanczos step.
        Q = A.matmat(s.Vk)
        Omega = jnp.conj(s.Vk.T) @ Q
        Q = jnp.where(it >= 2, Q - s.Vkm1 @ jnp.conj(s.Psi_k.T), Q)
        Q = Q - s.Vk @ Omega

        PsiH = jnp.conj(s.Psi_k.T)
        # Θₖ₋₂ applied to [0; Ψₖᴴ] (it ≥ 3).
        st2 = jnp.conj(s.Q2_km2.T) @ jnp.concatenate(
            [jnp.zeros((p, p), FC), PsiH])
        Pi_km2 = jnp.where(it >= 3, st2[:p], jnp.zeros((p, p), FC))
        Gbar_mid = jnp.where(it >= 3, st2[p:], PsiH)
        # Θₖ₋₁ applied to [Γbarₖ₋₁; Ωₖ] (it ≥ 2).
        st1 = jnp.conj(s.Q2_km1.T) @ jnp.concatenate([Gbar_mid, Omega])
        Gamma_km1 = jnp.where(it >= 2, st1[:p], jnp.zeros((p, p), FC))
        Lambda_bar = jnp.where(it >= 2, st1[p:], Omega)

        # Vₖ₊₁, Ψₖ₊₁ from QR of Q.
        Vkp1, Psi_kp1 = jnp.linalg.qr(Q)

        # Current reflection Θₖ: complete QR of [Λbarₖ; Ψₖ₊₁].
        stack = jnp.concatenate([Lambda_bar, Psi_kp1])
        Q2, R2 = jnp.linalg.qr(stack, mode="complete")
        Lambda_k = R2[:p]

        # Zₖ update: [Φₖ; Φbarₖ₊₁] = Qθᴴ [Φbarₖ; 0].
        z = jnp.conj(Q2.T) @ jnp.concatenate(
            [s.Phibar, jnp.zeros((p, p), FC)])
        Phi_k = z[:p]
        Phibar_kp1 = z[p:]

        # Direction wₖ = (Vₖ - wₖ₋₁Γₖ₋₁ - wₖ₋₂Πₖ₋₂) Λₖ⁻¹ (right solve).
        Wnum = s.Vk - s.w_km1 @ Gamma_km1 - s.w_km2 @ Pi_km2
        diag = jnp.diagonal(Lambda_k)
        Lsafe = Lambda_k + jnp.diag(
            jnp.where(diag == 0, jnp.ones_like(diag), jnp.zeros_like(diag)))
        w_k = jax.scipy.linalg.solve_triangular(
            Lsafe.T, Wnum.T, lower=True, trans="N").T

        X_new = s.X + w_k @ Phi_k
        rNorm = jnp.linalg.norm(Phibar_kp1)

        solved = (rNorm <= s.eps_lim) | ((rNorm + 1.0) <= 1.0)
        code = jnp.where(solved, jnp.int32(rt.SOLVED), jnp.int32(rt.RUNNING))

        hist = rt.hist_write(s.hist_r, it, rNorm, history)
        s_new = s._replace(
            X=X_new, Vkm1=s.Vk, Vk=Vkp1,
            w_km2=s.w_km1, w_km1=w_k,
            Psi_k=Psi_kp1, Phibar=Phibar_kp1,
            Q2_km2=s.Q2_km1, Q2_km1=Q2,
            rNorm=rNorm, iter=it, status=code, hist_r=hist,
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

    return jax.lax.while_loop(cond, body, state)


def _block_minres_solve(
    A, B, X0=None, *, M=None, ldiv=False, atol=None, rtol=None, itmax=0,
    timemax=float("inf"), verbose=0, history=False, callback=None, **_ig,
):
    start = time.perf_counter()
    if M is not None:
        raise ValueError("Block-MINRES doesn't support preconditioning yet.")
    A = as_operator(A)
    B = jnp.asarray(B)
    n, p = B.shape
    if A.shape is not None and A.shape[0] != A.shape[1]:
        raise ValueError("System must be square")
    T = real_dtype(B.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, max(2 * (n // p), 2))
    rt.debug_table(verbose, "BLOCK-MINRES", ("k", "‖Rₖ‖"), n)
    hist_len = itmax + 1 if history else 0
    X0 = None if X0 is None else jnp.asarray(X0, dtype=B.dtype)

    # Fast path: DIA stencil + default config → fused whole-solve kernel
    # (rank-deficient rhs blocks fall back like block-GMRES, see there).
    if (callback is None and verbose == 0 and not history
            and timemax == float("inf")
            and getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        from ..ops.pallas_fused import (block_minres_dia_fused,
                                        block_minres_dia_fused_supported)
        if block_minres_dia_fused_supported(A.dia.offsets, n, p, B.dtype,
                                            stencil_dtype=A._pd.dtype):
            B_eff = B if X0 is None else B - A.matmat(X0)
            with jax.default_matmul_precision("highest"):
                Rdiag = jnp.abs(jnp.diagonal(jnp.linalg.qr(B_eff, mode="r")))
            full_rank = bool(jnp.all(
                Rdiag > float(np.finfo(T).eps) ** 0.75
                * jnp.maximum(jnp.max(Rdiag), 1.0)))
            if full_rank:
                X, niter, rnorm, status = block_minres_dia_fused(
                    A._pd, A.dia.offsets, B_eff, float(atol), float(rtol),
                    itmax, p=p)
                niter, code = jax.device_get([niter, status])
                niter = int(niter)
                code = rt.final_status_code(int(code), niter, itmax, False)
                if X0 is not None:
                    X = X + X0
                stats = SimpleStats(
                    niter=niter, solved=rt.is_solved_code(code),
                    inconsistent=False, residuals=np.zeros(0),
                    timer=time.perf_counter() - start,
                    status=rt.decode_status(code),
                )
                return jnp.asarray(X), stats, None

    def run(state, cap):
        return _block_minres_core(
            A, B, X0, state, jnp.int32(cap), jnp.int32(itmax), atol, rtol,
            history=bool(history), hist_len=hist_len, callback=callback,
            verbose=int(verbose),
        )

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    X = jnp.asarray(state.X)
    if X0 is not None:
        X = X + X0
    stats = SimpleStats(
        niter=niter, solved=rt.is_solved_code(code), inconsistent=False,
        residuals=rt.hist_trim(state.hist_r, niter) if history else np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return X, stats, state


def _block_gmres_solve(A, B, X0=None, **kwargs):
    return _block_solve(A, B, X0, **kwargs)


def block_minres(A, B, X0=None, **kwargs):
    """X, stats = block_minres(A, B; ...) — Hermitian multi-RHS, O(1) memory.

    TPU extension: ``precision="double_word"`` — dw refinement of the
    TRUE block residual B − AX to fp64-grade Frobenius accuracy from
    f32 storage."""
    from ._refine import block_ir_wrap
    hit = block_ir_wrap("BLOCK-MINRES", _block_minres_solve, A, B, X0,
                        kwargs)
    if hit is not None:
        return hit
    X, stats, _ = _block_minres_solve(A, B, X0, **kwargs)
    return X, stats


def block_gmres(A, B, X0=None, **kwargs):
    """X, stats = block_gmres(A, B; memory=5, restart, M, N, ...).

    TPU extension: ``precision="double_word"`` — dw refinement of the
    TRUE block residual B − AX to fp64-grade Frobenius accuracy from
    f32 storage (memory/restart/M/N pass through to the inner
    corrections)."""
    from ._refine import block_ir_wrap
    hit = block_ir_wrap("BLOCK-GMRES", _block_solve, A, B, X0, kwargs,
                        forward=("M", "N", "ldiv", "memory", "restart",
                                 "reorthogonalization"))
    if hit is not None:
        return hit
    X, stats, _ = _block_solve(A, B, X0, **kwargs)
    return X, stats
