"""Whole-solve fused Pallas kernels — the solver loop lives in VMEM.

Round-1 profiling showed the jitted ``lax.while_loop`` CG core already
runs at ~15-20 µs/iteration on a v5e (HBM-roofline territory); what
dominated the round-1 bench was host↔device round-trips.  This module
removes the remaining on-device gap: the ENTIRE solve — stencil SpMV,
reductions, vector updates, convergence logic — executes inside one
``pallas_call`` with every vector resident in VMEM.  Per iteration the
kernel touches only VMEM (≫10× HBM bandwidth) and HBM traffic for the
whole solve is: diagonals once in, b once in, x once out.

Capability scope: the default-path hot loops of CG (reference src/cg.jl,
M ∈ {I, Jacobi}), CR, MINRES, LSQR, GMRES(m), and BiCGSTAB over a
DIA-stencil operator.  The public wrappers route here automatically when
the configuration matches; anything else uses the general while_loop
core.

Index scheme matches ops/pallas_dia.py: vectors are (rows, 128) lane
matrices; each diagonal offset k = 128·q + r becomes a static row
slice of a zero-padded p buffer plus a lane rotation (pltpu.roll).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SUBLANES = 8

# device-side status codes — MUST match krylov_tpu/_runtime.py
_RUNNING = 0
_SOLVED = 1
_ZERO_RESIDUAL = 2
_ZERO_CURVATURE = 5


def _roundup(x, m):
    return -(-x // m) * m


def _plan(offsets, n):
    """rows (sublane-aligned), halo pad rows P covering every offset."""
    rows = _roundup(-(-n // LANES), _SUBLANES)
    need = 1
    for k in offsets:
        q = abs(int(k)) // LANES + 2   # q rows + 1 for lane-roll spill
        need = max(need, q)
    P = _roundup(need, _SUBLANES)
    return rows, P


def _stencil(ppad_ref, pd_ref, shifts, P, rows, acc_dtype):
    """A·p from the zero-padded p buffer (interior rows [P, P+rows))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    acc = jnp.zeros((rows, LANES), acc_dtype)
    for d, (q, r) in enumerate(shifts):
        w = pd_ref[d]
        if r == 0:
            sx = ppad_ref[P + q: P + q + rows]
        else:
            seg = ppad_ref[P + q: P + q + rows + 1]
            rolled = pltpu.roll(seg, np.int32(LANES - r), 1)
            sx = jnp.where(lane < LANES - r, rolled[:rows], rolled[1:])
        acc = acc + w.astype(acc_dtype) * sx.astype(acc_dtype)
    return acc


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def cg_dia_fused(pd, offsets, b, atol, rtol, itmax, dinv=None,
                 interpret=None):
    """Full CG solve of A x = b for a DIA matrix, one kernel launch.

    Args:
      pd: (nd, n) output-aligned diagonals (see ops/pallas_dia.dia_align).
      offsets: static tuple of diagonal offsets.
      b: (n,) right-hand side (real floating dtype).
      atol, rtol: dynamic tolerance scalars (ε = atol + rtol‖r₀‖).
      itmax: dynamic int32 iteration cap.
      dinv: optional (n,) diagonal preconditioner applied as z = dinv·r
        (Jacobi: dinv = 1/diag(A)); rNorm is then the M-norm √(rᴴz) as
        in the general core.
    Returns:
      (x, niter, rNorm, status_code, posdef_violation) — device arrays;
      status codes follow krylov_tpu._runtime (RUNNING = cap hit).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    eps_T = float(jnp.finfo(T).eps)
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)

    shifts = tuple(
        (int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    atol_s = jnp.asarray(atol, T).reshape(1, 1)
    rtol_s = jnp.asarray(rtol, T).reshape(1, 1)
    precond = dinv is not None
    if precond:
        dw = jnp.zeros((npad,), T).at[:n].set(dinv).reshape(rows, LANES)

    def kernel(itmax_ref, atol_ref, rtol_ref, b_ref, pd_ref, *rest):
        if precond:
            (d_ref, x_ref, niter_ref, rnorm_ref, status_ref, viol_ref,
             ppad_ref, r_ref) = rest
        else:
            (x_ref, niter_ref, rnorm_ref, status_ref, viol_ref,
             ppad_ref, r_ref) = rest
        bv = b_ref[:]
        z0 = d_ref[:] * bv if precond else bv
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = z0
        r_ref[:] = bv
        x_ref[:] = jnp.zeros((rows, LANES), T)

        gamma0 = jnp.sum(bv * z0)
        viol0 = (gamma0 < 0).astype(jnp.int32)
        rnorm0 = jnp.sqrt(jnp.maximum(gamma0, 0))
        eps_lim = atol_ref[0, 0] + rtol_ref[0, 0] * rnorm0
        cap = itmax_ref[0, 0]
        status0 = jnp.where(
            gamma0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            it, gamma, pNorm2, rnorm, status, viol = c
            return (status == _RUNNING) & (it < cap)

        def body(c):
            it, gamma, pNorm2, rnorm, status, viol = c
            ap = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            p_int = ppad_ref[P: P + rows]
            pAp = jnp.sum(p_int * ap)

            # curvature handling (reference src/cg.jl:198-211): with
            # linesearch=false and radius=0, tiny |pAp| is an exact
            # zero-curvature exit; pAp<0 of magnitude continues (and the
            # host wrapper's SPD check cannot trigger since γ=‖r‖²≥0).
            curv_small = pAp <= eps_T * pNorm2
            zero_curv = curv_small & (jnp.abs(pAp) <= eps_T * pNorm2)
            skip = zero_curv

            alpha = gamma / jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
            a_eff = jnp.where(skip, jnp.zeros_like(alpha), alpha)
            x_ref[:] = x_ref[:] + a_eff * p_int
            r_ref[:] = r_ref[:] - a_eff * ap

            rv = r_ref[:]
            zv = d_ref[:] * rv if precond else rv
            gamma_next = jnp.sum(rv * zv)
            viol_n = viol | (gamma_next < 0).astype(jnp.int32)
            rnorm_next = jnp.sqrt(jnp.maximum(gamma_next, 0))
            resid_mach = (rnorm_next + 1) <= 1
            solved = (rnorm_next <= eps_lim) | resid_mach

            beta = gamma_next / jnp.where(
                gamma == 0, jnp.ones_like(gamma), gamma)
            stay = jnp.logical_not(solved | skip)
            cr = jnp.where(stay, jnp.ones_like(beta), jnp.zeros_like(beta))
            cp = jnp.where(stay, beta, jnp.ones_like(beta))
            ppad_ref[P: P + rows] = cr * zv + cp * p_int

            gamma_new = jnp.where(stay, gamma_next, gamma)
            pNorm2_new = jnp.where(
                stay, gamma_next + beta * beta * pNorm2, pNorm2)
            rnorm_new = jnp.where(skip, rnorm, rnorm_next)
            it_new = it + jnp.where(skip, jnp.int32(0), jnp.int32(1))

            status_new = jnp.where(
                zero_curv, jnp.int32(_ZERO_CURVATURE),
                jnp.where(solved, jnp.int32(_SOLVED), jnp.int32(_RUNNING)))
            return (it_new, gamma_new, pNorm2_new, rnorm_new, status_new,
                    viol_n)

        it, gamma, pNorm2, rnorm, status, viol = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), gamma0, gamma0, rnorm0, status0, viol0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rnorm
        status_ref[0, 0] = status
        viol_ref[0, 0] = viol

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    vmem_bytes = nd * pd_bytes \
        + (4 + (1 if precond else 0)) * vec_bytes \
        + 2 * P * LANES * np.dtype(T).itemsize

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [itmax_s, atol_s, rtol_s, bw, pdw]
    if precond:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(dw)

    x, niter, rnorm, status, viol = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes * 1.5) + (1 << 20)),
        interpret=interpret,
    )(*operands)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            viol[0, 0])


def _fused_bytes(offsets, n, dtype, nvec, stencil_dtype=None):
    """Working-set bytes of a fused kernel: nd diagonals (which may be
    stored narrower, e.g. bf16) + ``nvec`` solve vectors."""
    rows, P = _plan(tuple(offsets), n)
    nd = len(tuple(offsets))
    sd = jnp.dtype(dtype if stencil_dtype is None else stencil_dtype)
    return rows * LANES * (nd * sd.itemsize
                           + nvec * jnp.dtype(dtype).itemsize)


def cg_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: does the whole working set fit in VMEM (~100 MB)?"""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 4, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "degree", "interpret"))
def cg_cheby_dia_fused(pd, offsets, b, atol, rtol, itmax, lmin, lmax,
                       degree, interpret=None):
    """Chebyshev-preconditioned CG, whole solve in one kernel launch.

    The preconditioner application z = M·r (M = degree-``degree``
    Chebyshev polynomial ≈ A⁻¹ on [lmin, lmax], the semi-iteration
    recurrence of krylov_tpu/precond.py:ChebyshevPreconditioner.matvec)
    runs IN-KERNEL: each of its ``degree−1`` stencil applications reads
    the VMEM-resident z buffer, so a whole preconditioned CG iteration
    — ``degree`` stencil SpMVs, 2 reductions, all vector updates —
    costs zero HBM traffic and zero launches.  This is the fused
    analogue of the reference's preconditioned-CG headline
    (ic0-preconditioned CG in test/gpu/nvidia.jl:57-59; polynomial
    preconditioning is the TPU-idiomatic substitute for ic0/ilu0 —
    see precond.py).

    Convergence semantics mirror the general core with a centered
    preconditioner: γ = ⟨r, z⟩, rNorm = √γ (the M-norm), γ < 0 flags a
    posdef violation.

    Args:
      pd: (nd, n) output-aligned diagonals; offsets: static tuple.
      b: (n,) rhs.  atol/rtol/itmax: dynamic scalars.
      lmin/lmax: dynamic spectral-interval bounds of the polynomial.
      degree: static polynomial degree ≥ 1 (d−1 in-kernel matvecs per
        application).
    Returns:
      (x, niter, rNorm, status_code, posdef_violation).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    eps_T = float(jnp.finfo(T).eps)
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    tol_s = jnp.stack([jnp.asarray(atol, T), jnp.asarray(rtol, T),
                       jnp.asarray(lmin, T),
                       jnp.asarray(lmax, T)]).reshape(1, 4)

    def kernel(itmax_ref, tol_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, viol_ref,
               ppad_ref, zpad_ref, r_ref, d_ref):
        theta = (tol_ref[0, 3] + tol_ref[0, 2]) * T.type(0.5)
        delta = (tol_ref[0, 3] - tol_ref[0, 2]) * T.type(0.5)
        sigma = theta / delta
        rho0 = 1.0 / sigma

        zpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)

        def cheby(rv):
            # z lives in zpad's interior; d in d_ref; (rho) is carried.
            d_ref[:] = rv / theta
            zpad_ref[P: P + rows] = d_ref[:]

            def step(i, rho):
                w = _stencil(zpad_ref, pd_ref, shifts, P, rows, T)
                rho_n = 1.0 / (2.0 * sigma - rho)
                d_ref[:] = (rho_n * rho) * d_ref[:] \
                    + (2.0 * rho_n / delta) * (rv - w)
                zpad_ref[P: P + rows] = zpad_ref[P: P + rows] + d_ref[:]
                return rho_n

            jax.lax.fori_loop(0, degree - 1, step, rho0)
            return zpad_ref[P: P + rows]

        bv = b_ref[:]
        z0 = cheby(bv)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = z0
        r_ref[:] = bv
        x_ref[:] = jnp.zeros((rows, LANES), T)

        gamma0 = jnp.sum(bv * z0)
        viol0 = (gamma0 < 0).astype(jnp.int32)
        rnorm0 = jnp.sqrt(jnp.maximum(gamma0, 0))
        eps_lim = tol_ref[0, 0] + tol_ref[0, 1] * rnorm0
        cap = itmax_ref[0, 0]
        status0 = jnp.where(
            gamma0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            it, gamma, pNorm2, rnorm, status, viol = c
            return (status == _RUNNING) & (it < cap)

        def body(c):
            it, gamma, pNorm2, rnorm, status, viol = c
            ap = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            p_int = ppad_ref[P: P + rows]
            pAp = jnp.sum(p_int * ap)

            curv_small = pAp <= eps_T * pNorm2
            zero_curv = curv_small & (jnp.abs(pAp) <= eps_T * pNorm2)
            skip = zero_curv

            alpha = gamma / jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
            a_eff = jnp.where(skip, jnp.zeros_like(alpha), alpha)
            x_ref[:] = x_ref[:] + a_eff * p_int
            r_ref[:] = r_ref[:] - a_eff * ap

            rv = r_ref[:]
            zv = cheby(rv)
            gamma_next = jnp.sum(rv * zv)
            viol_n = viol | (gamma_next < 0).astype(jnp.int32)
            rnorm_next = jnp.sqrt(jnp.maximum(gamma_next, 0))
            resid_mach = (rnorm_next + 1) <= 1
            solved = (rnorm_next <= eps_lim) | resid_mach

            beta = gamma_next / jnp.where(
                gamma == 0, jnp.ones_like(gamma), gamma)
            stay = jnp.logical_not(solved | skip)
            cr = jnp.where(stay, jnp.ones_like(beta), jnp.zeros_like(beta))
            cp = jnp.where(stay, beta, jnp.ones_like(beta))
            ppad_ref[P: P + rows] = cr * zv + cp * p_int

            gamma_new = jnp.where(stay, gamma_next, gamma)
            pNorm2_new = jnp.where(
                stay, gamma_next + beta * beta * pNorm2, pNorm2)
            rnorm_new = jnp.where(skip, rnorm, rnorm_next)
            it_new = it + jnp.where(skip, jnp.int32(0), jnp.int32(1))

            status_new = jnp.where(
                zero_curv, jnp.int32(_ZERO_CURVATURE),
                jnp.where(solved, jnp.int32(_SOLVED), jnp.int32(_RUNNING)))
            return (it_new, gamma_new, pNorm2_new, rnorm_new, status_new,
                    viol_n)

        it, gamma, pNorm2, rnorm, status, viol = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), gamma0, gamma0, rnorm0, status0, viol0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rnorm
        status_ref[0, 0] = status
        viol_ref[0, 0] = viol

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    vmem_bytes = nd * pd_bytes + 7 * vec_bytes \
        + 4 * P * LANES * np.dtype(T).itemsize

    x, niter, rnorm, status, viol = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes * 1.5) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, tol_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            viol[0, 0])


def cg_cheby_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: diagonals + 7 vectors (p/z padded, r, x, b, d, out)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 7, stencil_dtype) < 100 * (1 << 20)


# additional status codes used by MINRES (krylov_tpu/_runtime.py)
_COND_EXCEEDED = 11
_SOLVED_LSQ = 20
_SOLVED_ZERO = 21
_FWD_ERR = 22
_ILL_COND_MACH = 23
_MIN_LSQ_X = 24


@partial(jax.jit, static_argnames=("offsets", "window", "interpret"))
def minres_dia_fused(pd, offsets, b, atol, rtol, etol, ctol, lam, itmax,
                     window=5, dinv=None, interpret=None):
    """Full MINRES solve of (A + λI) x = b for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/minres.py:_minres_core
    (reference src/minres.jl): unnormalized-Lanczos recurrence, Givens
    chain, forward-error window (`window` shift registers), conlim and
    machine-precision stops.  ``dinv`` optionally applies a diagonal
    (Jacobi) centered preconditioner in-kernel (v = dinv·r₂, β² = ⟨r₂,v⟩
    — the general core's M semantics).  Returns (x, niter, rNorm,
    status_code, inconsistent, precond_violation) — status codes follow
    krylov_tpu._runtime.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    eps_T = float(jnp.finfo(T).eps)
    tiny = float(jnp.finfo(T).tiny)
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray(
        [atol, rtol, etol, ctol, lam], T).reshape(5, 1)
    precond = dinv is not None
    if precond:
        dw = jnp.zeros((npad,), T).at[:n].set(dinv).reshape(rows, LANES)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, *rest):
        if precond:
            (d_ref, x_ref, niter_ref, rnorm_ref, status_ref, incon_ref,
             viol_ref, vpad_ref, r1_ref, w1_ref, w2_ref, r2_ref) = rest
        else:
            (x_ref, niter_ref, rnorm_ref, status_ref, incon_ref,
             viol_ref, vpad_ref, r1_ref, w1_ref, w2_ref) = rest
        r2pad_ref = vpad_ref
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        etol_v = s_ref[2, 0]
        ctol_v = s_ref[3, 0]
        lam_v = s_ref[4, 0]
        cap = itmax_ref[0, 0]

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        r1_ref[:] = bv
        r2pad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        if precond:
            v0 = d_ref[:] * bv
            r2pad_ref[P: P + rows] = v0
            r2_ref[:] = bv
            beta1_sq = jnp.sum(bv * v0)
        else:
            r2pad_ref[P: P + rows] = bv
            beta1_sq = jnp.sum(bv * bv)
        w1_ref[:] = jnp.zeros((rows, LANES), T)
        w2_ref[:] = jnp.zeros((rows, LANES), T)
        viol_ref[0, 0] = (beta1_sq < 0).astype(jnp.int32)

        beta1 = jnp.sqrt(jnp.maximum(beta1_sq, 0))
        eps_lim = atol_v + rtol_v * beta1
        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta1 <= eps_lim, jnp.int32(_SOLVED_ZERO),
                      jnp.int32(_RUNNING)))

        zero = jnp.zeros((), T)
        phis0 = (zero,) * window
        carry0 = (jnp.int32(0), zero, beta1, zero, zero, beta1,
                  zero, jnp.asarray(jnp.inf, T), -jnp.ones((), T), zero,
                  zero, zero, beta1, jnp.int32(1), status0) + phis0

        def cond(c):
            return (c[14] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, oldbeta, beta, dbar, eps_prev, phibar, gmax, gmin,
             cs, sn, anorm2, xenorm2, rNorm, incon, status) = c[:15]
            phis = c[15:]
            it = it0 + 1

            v = r2pad_ref[P: P + rows]
            y = _stencil(r2pad_ref, pd_ref, shifts, P, rows, T) + lam_v * v
            y = y / beta
            safe_ob = jnp.where(oldbeta == 0, jnp.ones_like(oldbeta),
                                oldbeta)
            y = jnp.where(it >= 2, y - (beta / safe_ob) * r1_ref[:], y)
            alpha = jnp.sum(v * y) / beta
            r2c = r2_ref[:] if precond else v
            y = y - (alpha / beta) * r2c

            delta = cs * dbar + sn * alpha
            w_unscaled = v / beta - delta * w2_ref[:] - eps_prev * w1_ref[:]

            r1_ref[:] = r2c
            oldbeta_n = beta
            if precond:
                r2_ref[:] = y
                v_next = d_ref[:] * y
                r2pad_ref[P: P + rows] = v_next
                beta_sq = jnp.sum(y * v_next)
                viol_ref[0, 0] = viol_ref[0, 0] | (beta_sq < 0).astype(
                    jnp.int32)
                beta_sq = jnp.maximum(beta_sq, 0)
            else:
                r2pad_ref[P: P + rows] = y
                beta_sq = jnp.sum(y * y)
            beta_n = jnp.sqrt(beta_sq)
            anorm2_n = anorm2 + alpha * alpha + oldbeta_n * oldbeta_n \
                + beta_sq

            gbar = sn * dbar - cs * alpha
            eps_new = sn * beta_n
            dbar_n = -cs * beta_n
            root = jnp.sqrt(gbar * gbar + dbar_n * dbar_n)
            gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta_sq), eps_T)
            w = w_unscaled / gamma

            cs_n = gbar / gamma
            sn_n = beta_n / gamma
            phi = cs_n * phibar
            phibar_n = sn_n * phibar

            x_ref[:] = x_ref[:] + phi * w
            w1_ref[:] = w2_ref[:]
            w2_ref[:] = w
            xenorm2_n = xenorm2 + phi * phi

            phis_n = phis[1:] + (phi,)
            err2 = zero
            for p_ in phis_n:
                err2 = err2 + p_ * p_
            err_lbnd = jnp.sqrt(err2)

            gmax_n = jnp.maximum(gmax, gamma)
            gmin_n = jnp.minimum(gmin, gamma)
            anorm = jnp.sqrt(anorm2_n)
            xv = x_ref[:]
            xnorm = jnp.sqrt(jnp.sum(xv * xv))
            rNorm_n = phibar_n
            test1 = rNorm_n / jnp.maximum(anorm * xnorm, tiny)
            test2 = root / jnp.maximum(anorm, tiny)
            acond = gmax_n / jnp.where(gmin_n == 0, tiny, gmin_n)

            min_lsq_early = (it == 1) & (beta_n / beta1 <= 10 * eps_T)
            ill_cond_mach = (1.0 + 1.0 / acond) <= 1.0
            solved_mach = (1.0 + test2) <= 1.0
            zero_resid_mach = (1.0 + test1) <= 1.0
            resid_mach = (rNorm_n + 1.0) <= 1.0
            ill_cond_lim = (1.0 / acond) <= ctol_v
            solved_lim = test2 <= eps_lim
            zero_resid_lim = ((test1 <= eps_T)       # MisI-only test
                              if not precond else jnp.zeros((), jnp.bool_))
            resid_lim = rNorm_n <= eps_lim
            fwd_err = (it >= window) & (
                err_lbnd <= etol_v * jnp.sqrt(xenorm2_n))
            zero_resid = zero_resid_mach | zero_resid_lim
            resid_decrease = resid_mach | resid_lim
            solved = (solved_mach | solved_lim | zero_resid | fwd_err
                      | resid_decrease)

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(zero_resid, jnp.int32(_SOLVED_ZERO), code)
            code = jnp.where(fwd_err, jnp.int32(_FWD_ERR), code)
            code = jnp.where(min_lsq_early, jnp.int32(_MIN_LSQ_X), code)

            incon_n = jnp.where(
                min_lsq_early, jnp.int32(1),
                jnp.where(zero_resid, jnp.int32(0), jnp.int32(1)))

            return (it, oldbeta_n, beta_n, dbar_n, eps_new, phibar_n,
                    gmax_n, gmin_n, cs_n, sn_n, anorm2_n, xenorm2_n,
                    rNorm_n, incon_n, code) + phis_n

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[12]
        status_ref[0, 0] = out[14]
        incon_ref[0, 0] = out[13]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [itmax_s, scal_s, bw, pdw]
    scratch = [
        pltpu.VMEM((rows + 2 * P, LANES), T),
        pltpu.VMEM((rows, LANES), T),
        pltpu.VMEM((rows, LANES), T),
        pltpu.VMEM((rows, LANES), T),
    ]
    if precond:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(dw)
        scratch.append(pltpu.VMEM((rows, LANES), T))
    x, niter, rnorm, status, incon, viol = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (nd * pd_bytes
                 + (9 if precond else 7) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(*operands)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            incon[0, 0], viol[0, 0])


def minres_dia_fused_supported(offsets, n, dtype, stencil_dtype=None,
                               precond=False):
    """Static gate: working set (pd + 7 vectors, 9 with a Jacobi M)
    fits in VMEM (~100 MB).

    A bf16-stored stencil halves the diagonal bytes, admitting 128³
    7-point problems (2M unknowns) that the f32 stencil would not.
    """
    if jnp.dtype(dtype).kind != "f":
        return False
    nvec = 9 if precond else 7
    return _fused_bytes(offsets, n, dtype, nvec,
                        stencil_dtype) < 100 * (1 << 20)


# CR-specific status codes (krylov_tpu/solvers/cr.py)
_NUMERICAL = 25
_ZERO_CURV_B = 26


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def cr_dia_fused(pd, offsets, b, atol, rtol, itmax, interpret=None):
    """Full CR (conjugate residuals) solve for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/cr.py:_cr_core on the
    default path (M = I, no trust region, no linesearch; reference
    src/cr.jl).  Returns (x, niter, rNorm, status_code, indef_error) —
    indef_error mirrors the general core's "indefinite system and no
    trust region" raise.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    sqeps = float(np.sqrt(np.finfo(np.dtype(T)).eps))
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    atol_s = jnp.asarray(atol, T).reshape(1, 1)
    rtol_s = jnp.asarray(rtol, T).reshape(1, 1)

    def kernel(itmax_ref, atol_ref, rtol_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, indef_ref,
               rpad_ref, p_ref, q_ref):
        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        rpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        rpad_ref[P: P + rows] = bv
        rnorm2_0 = jnp.sum(bv * bv)
        rnorm0 = jnp.sqrt(rnorm2_0)
        Ar0 = _stencil(rpad_ref, pd_ref, shifts, P, rows, T)
        rho0 = jnp.sum(bv * Ar0)
        p_ref[:] = bv
        q_ref[:] = Ar0
        eps_lim = atol_ref[0, 0] + rtol_ref[0, 0] * rnorm0
        cap = itmax_ref[0, 0]
        status0 = jnp.where(
            rnorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rho0 == 0, jnp.int32(_ZERO_CURV_B),
                      jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                                jnp.int32(_RUNNING))))

        def cond(c):
            it, rho, rnorm2, rnorm, pNorm2, pr, pAp, status, indef = c
            return (status == _RUNNING) & (it < cap)

        def body(c):
            it, rho, rnorm2, rnorm, pNorm2, pr, pAp, status, indef = c
            indef_n = indef | (pAp <= 0).astype(jnp.int32)

            qv = q_ref[:]
            qMq = jnp.sum(qv * qv)
            alpha = rho / jnp.where(qMq == 0, jnp.ones_like(qMq), qMq)
            pv = p_ref[:]
            x_ref[:] = x_ref[:] + alpha * pv
            rv = rpad_ref[P: P + rows] - alpha * qv
            rpad_ref[P: P + rows] = rv
            rnorm2_n = jnp.sum(rv * rv)
            rnorm_n = jnp.sqrt(rnorm2_n)
            Ar = _stencil(rpad_ref, pd_ref, shifts, P, rows, T)

            it_n = it + 1
            solved = (rnorm_n <= eps_lim) | ((rnorm_n + 1.0) <= 1.0)

            rho_n = jnp.sum(rv * Ar)
            beta = rho_n / jnp.where(rho == 0, jnp.ones_like(rho), rho)
            stay = jnp.logical_not(solved)
            cb = jnp.where(stay, jnp.ones_like(beta), jnp.zeros_like(beta))
            bb = jnp.where(stay, beta, jnp.ones_like(beta))
            p_ref[:] = cb * rv + bb * pv
            q_ref[:] = cb * Ar + bb * qv

            pNorm2_n = rnorm2_n + 2 * beta * pr - 2 * beta * alpha * pAp \
                + beta * beta * pNorm2
            pnorm_bad = pNorm2_n <= -sqeps
            pr_n = rnorm2_n + beta * pr - beta * alpha * pAp
            pAp_n = rho_n + beta * beta * pAp

            code = jnp.where(solved, jnp.int32(_SOLVED), jnp.int32(_RUNNING))
            code = jnp.where((~solved) & pnorm_bad, jnp.int32(_NUMERICAL),
                             code)

            rho_o = jnp.where(solved, rho, rho_n)
            pNorm2_o = jnp.where(solved, pNorm2, pNorm2_n)
            pr_o = jnp.where(solved, pr, pr_n)
            pAp_o = jnp.where(solved, pAp, pAp_n)
            return (it_n, rho_o, rnorm2_n, rnorm_n, pNorm2_o, pr_o, pAp_o,
                    code, indef_n)

        out = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), rho0, rnorm2_0, rnorm0, rnorm2_0, rnorm2_0, rho0,
             status0, jnp.int32(0)))
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[3]
        status_ref[0, 0] = out[7]
        indef_ref[0, 0] = out[8]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status, indef = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 6 * vec_bytes) * 1.3) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, atol_s, rtol_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            indef[0, 0])


def cr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: working set (pd + 6 vectors) fits in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 6, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def car_dia_fused(pd, offsets, b, atol, rtol, itmax, interpret=None):
    """Full CAR solve (min ‖Arₖ‖, Hermitian definite) for a DIA matrix.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/cr.py:_car_core on the
    default path (M = I; reference src/car.jl).  One stencil application
    per iteration; x, r, p, q, u VMEM-resident, s lives in the padded
    stencil buffer.  Returns (x, niter, rNorm, ArNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, arnorm_ref, status_ref,
               spad_ref, r_ref, p_ref, q_ref, u_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        rNorm0 = jnp.sqrt(jnp.sum(bv * bv))
        spad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        spad_ref[P: P + rows] = bv                       # r₀
        sv = _stencil(spad_ref, pd_ref, shifts, P, rows, T)   # s = A r
        spad_ref[P: P + rows] = sv
        tv = _stencil(spad_ref, pd_ref, shifts, P, rows, T)   # t = A s
        r_ref[:] = bv
        p_ref[:] = bv
        q_ref[:] = sv
        u_ref[:] = tv
        rho0 = jnp.sum(tv * sv)
        ArNorm0 = jnp.sqrt(jnp.sum(sv * sv))
        eps_lim = atol_v + rtol_v * rNorm0
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            return (c[4] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, rho, rNorm, ArNorm, status = c
            uv = u_ref[:]
            uMu = jnp.sum(uv * uv)
            alpha = rho / jnp.where(uMu == 0, jnp.ones_like(uMu), uMu)
            x_ref[:] = x_ref[:] + alpha * p_ref[:]
            rv = r_ref[:] - alpha * q_ref[:]
            r_ref[:] = rv
            s_new = spad_ref[P: P + rows] - alpha * uv
            spad_ref[P: P + rows] = s_new
            rNorm_n = jnp.sqrt(jnp.sum(rv * rv))
            it = it0 + 1
            solved = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)

            tv_ = _stencil(spad_ref, pd_ref, shifts, P, rows, T)
            rho_next = jnp.sum(tv_ * s_new)
            beta = rho_next / jnp.where(rho == 0, jnp.ones_like(rho), rho)
            p_ref[:] = jnp.where(solved, p_ref[:], rv + beta * p_ref[:])
            q_ref[:] = jnp.where(solved, q_ref[:], s_new + beta * q_ref[:])
            u_ref[:] = jnp.where(solved, u_ref[:], tv_ + beta * u_ref[:])
            ArNorm_n = jnp.where(solved, ArNorm,
                                 jnp.sqrt(jnp.sum(s_new * s_new)))
            code = jnp.where(solved, jnp.int32(_SOLVED),
                             jnp.int32(_RUNNING))
            rho_n = jnp.where(solved, rho, rho_next)
            return (it, rho_n, rNorm_n, ArNorm_n, code)

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), rho0, rNorm0, ArNorm0, status0))
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[2]
        arnorm_ref[0, 0] = out[3]
        status_ref[0, 0] = out[4]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, arnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 8 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], arnorm[0, 0],
            status[0, 0])


def car_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 8 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 8, stencil_dtype) < 100 * (1 << 20)


# CG-LANCZOS negative-curvature code (krylov_tpu/solvers/cg_lanczos.py)
_NEG_CURV = 27


@partial(jax.jit, static_argnames=("offsets", "check_curvature",
                                   "interpret"))
def cg_lanczos_dia_fused(pd, offsets, b, atol, rtol, itmax,
                         check_curvature=False, interpret=None):
    """Full CG-LANCZOS solve for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of solvers/cg_lanczos.py:_cg_lanczos_core on
    the default path (M = I; reference src/cg_lanczos.jl) including the
    check_curvature exit (reference `continue`: the offending iteration
    is not applied).  Returns (x, niter, rNorm, Anorm, status_code,
    indefinite).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, anorm_ref, status_ref,
               indef_ref, vpad_ref, vprev_ref, p_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * beta0
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        p_ref[:] = bv                                    # p₀ = r₀ (unnormalized)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe_b0
        vprev_ref[:] = vpad_ref[P: P + rows]

        # carry: it, beta, sigma, omega, gamma, anorm2, beta_prev,
        #        rNorm, status, indefinite
        carry0 = (jnp.int32(0), beta0, beta0, zero, one, zero, zero,
                  beta0, status0, jnp.int32(0))

        def cond(c):
            return (c[8] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, beta, sigma, omega, gamma_old, anorm2, beta_prev,
             rNorm, status, indef) = c
            vv = vpad_ref[P: P + rows]
            Mv_next = _stencil(vpad_ref, pd_ref, shifts, P, rows, T)
            delta = jnp.sum(vv * Mv_next)

            gamma = 1.0 / (delta - omega / gamma_old)
            indef_n = (indef == 1) | (gamma <= 0)
            if check_curvature:
                skip = indef_n
            else:
                skip = jnp.zeros((), jnp.bool_)

            Mv_next = Mv_next - delta * vv
            Mv_next = jnp.where(it0 > 0,
                                Mv_next - beta * vprev_ref[:], Mv_next)
            beta_n = jnp.sqrt(jnp.sum(Mv_next * Mv_next))
            safe_b = jnp.where(beta_n == 0, jnp.ones_like(beta_n), beta_n)
            v_new = Mv_next / safe_b
            anorm2_n = anorm2 + beta_prev * beta_prev + beta_n * beta_n \
                + delta * delta

            om = beta_n * gamma
            sigma_n = -om * sigma
            om2 = om * om
            rNorm_n = jnp.abs(sigma_n)
            solved = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)

            x_ref[:] = jnp.where(skip, x_ref[:], x_ref[:] + gamma * p_ref[:])
            p_ref[:] = jnp.where(skip, p_ref[:],
                                 sigma_n * v_new + om2 * p_ref[:])
            vprev_keep = vprev_ref[:]
            vprev_ref[:] = jnp.where(skip, vprev_keep, vv)
            vpad_ref[P: P + rows] = jnp.where(skip, vv, v_new)

            it = jnp.where(skip, it0, it0 + 1)
            code = jnp.int32(_RUNNING)
            code = jnp.where(skip, jnp.int32(_NEG_CURV), code)
            code = jnp.where((~skip) & solved, jnp.int32(_SOLVED), code)

            return (it,
                    jnp.where(skip, beta, beta_n),
                    jnp.where(skip, sigma, sigma_n),
                    jnp.where(skip, omega, om2),
                    jnp.where(skip, gamma_old, gamma),
                    jnp.where(skip, anorm2, anorm2_n),
                    jnp.where(skip, beta_prev, beta_n),
                    jnp.where(skip, rNorm, rNorm_n),
                    code, indef_n.astype(jnp.int32))

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[7]
        anorm_ref[0, 0] = jnp.sqrt(out[5])
        status_ref[0, 0] = out[8]
        indef_ref[0, 0] = out[9]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, anorm, status, indef = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 5,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 7 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], anorm[0, 0],
            status[0, 0], indef[0, 0])


def cg_lanczos_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 7 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 7, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "nshifts", "check_curvature",
                                   "interpret"))
def cg_lanczos_shift_dia_fused(pd, offsets, b, shifts, nshifts, atol, rtol,
                               itmax, check_curvature=False,
                               interpret=None):
    """All shifted systems (A + σᵢI)xᵢ = b from ONE in-VMEM Lanczos stream.

    Whole-solve-in-VMEM port of solvers/cg_lanczos.py:
    _cg_lanczos_shift_core on the default path (M = I; reference
    src/cg_lanczos_shift.jl).  The shift recurrences are unrolled over
    the static ``nshifts`` axis: per-shift x/p live as row-block panels
    of one VMEM scratch, per-shift scalars ride the while-loop carry.
    Returns (X (nshifts, n), niter, rNorms (nshifts,), status_code,
    indefinite (nshifts,)).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts_s = jnp.asarray(shifts, T).reshape(nshifts, 1)
    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)
    shiftsT = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    NS = nshifts

    def kernel(itmax_ref, s_ref, sh_ref, b_ref, pd_ref,
               X_ref, niter_ref, rnorms_ref, status_ref, indef_ref,
               vpad_ref, vprev_ref, P_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        bv = b_ref[:]
        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * beta0
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe_b0
        vprev_ref[:] = vpad_ref[P: P + rows]
        for i in range(NS):
            X_ref[i * rows:(i + 1) * rows] = jnp.zeros((rows, LANES), T)
            P_ref[i * rows:(i + 1) * rows] = bv       # p = r₀ unnormalized

        conv0 = tuple(
            (beta0 <= eps_lim).astype(jnp.int32) for _ in range(NS))
        all0 = conv0[0]
        for c_ in conv0[1:]:
            all0 = all0 & c_
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(all0 == 1, jnp.int32(_SOLVED), jnp.int32(_RUNNING)))

        # carry: it, beta, status, σᵢ…, ωᵢ…, γᵢ…, rNormᵢ…, convᵢ…, indefᵢ…
        carry0 = ((jnp.int32(0), beta0, status0)
                  + tuple(beta0 for _ in range(NS))
                  + tuple(zero for _ in range(NS))
                  + tuple(one for _ in range(NS))
                  + tuple(beta0 for _ in range(NS))
                  + conv0
                  + tuple(jnp.int32(0) for _ in range(NS)))

        def cond(c):
            return (c[2] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, beta, status = c[:3]
            sig = c[3: 3 + NS]
            om_ = c[3 + NS: 3 + 2 * NS]
            gam = c[3 + 2 * NS: 3 + 3 * NS]
            rn = c[3 + 3 * NS: 3 + 4 * NS]
            cv = c[3 + 4 * NS: 3 + 5 * NS]
            idf = c[3 + 5 * NS: 3 + 6 * NS]

            vv = vpad_ref[P: P + rows]
            Mv_next = _stencil(vpad_ref, pd_ref, shiftsT, P, rows, T)
            delta = jnp.sum(vv * Mv_next)
            Mv_next = Mv_next - delta * vv
            Mv_next = jnp.where(it0 > 0,
                                Mv_next - beta * vprev_ref[:], Mv_next)
            beta_n = jnp.sqrt(jnp.sum(Mv_next * Mv_next))
            safe_b = jnp.where(beta_n == 0, jnp.ones_like(beta_n), beta_n)
            v_new = Mv_next / safe_b
            vprev_ref[:] = vv
            vpad_ref[P: P + rows] = v_new

            sig_n, om_n, gam_n, rn_n, cv_n, idf_n = [], [], [], [], [], []
            for i in range(NS):
                delta_hat = delta + sh_ref[i, 0]
                gamma_i = 1.0 / (delta_hat - om_[i] / gam[i])
                indef_i = (idf[i] == 1) | (gamma_i <= 0)
                if check_curvature:
                    mask = ~((cv[i] == 1) | indef_i)
                else:
                    mask = ~(cv[i] == 1)
                xi = X_ref[i * rows:(i + 1) * rows]
                pi = P_ref[i * rows:(i + 1) * rows]
                X_ref[i * rows:(i + 1) * rows] = jnp.where(
                    mask, xi + gamma_i * pi, xi)
                omg = beta_n * gamma_i
                sig_i = jnp.where(mask, -omg * sig[i], sig[i])
                om2 = jnp.where(mask, omg * omg, om_[i])
                P_ref[i * rows:(i + 1) * rows] = jnp.where(
                    mask, sig_i * v_new + om2 * pi, pi)
                rn_i = jnp.where(mask, jnp.abs(sig_i), rn[i])
                cv_i = jnp.where(mask, (rn_i <= eps_lim).astype(jnp.int32),
                                 cv[i])
                sig_n.append(sig_i)
                om_n.append(om2)
                gam_n.append(jnp.where(mask, gamma_i, gam[i]))
                rn_n.append(rn_i)
                cv_n.append(cv_i)
                idf_n.append(indef_i.astype(jnp.int32))

            done = jnp.ones((), jnp.bool_)
            for i in range(NS):
                if check_curvature:
                    done = done & ((cv_n[i] == 1) | (idf_n[i] == 1))
                else:
                    done = done & (cv_n[i] == 1)
            it = it0 + 1
            code = jnp.where(done, jnp.int32(_SOLVED), jnp.int32(_RUNNING))
            return ((it, beta_n, code) + tuple(sig_n) + tuple(om_n)
                    + tuple(gam_n) + tuple(rn_n) + tuple(cv_n)
                    + tuple(idf_n))

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        status_ref[0, 0] = out[2]
        for i in range(NS):
            rnorms_ref[i, 0] = out[3 + 3 * NS + i]
            indef_ref[i, 0] = out[3 + 5 * NS + i]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    X, niter, rnorms, status, indef = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((NS * rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((NS, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((NS, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((NS * rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (2 * NS + 4) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, shifts_s, bw, pdw)
    Xm = X.reshape(NS, rows * LANES)[:, :n]
    return Xm, niter[0, 0], rnorms[:, 0], status[0, 0], indef[:, 0]


def cg_lanczos_shift_dia_fused_supported(offsets, n, dtype, nshifts,
                                         stencil_dtype=None):
    """Static gate: stencil + 2·nshifts+4 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 2 * nshifts + 4,
                        stencil_dtype) < 100 * (1 << 20)


# LSQR status codes (krylov_tpu/_runtime.py)
_TIRED = 3
_MIN_LSQ_X_CODE = 24


def dia_align_adjoint(pd, offsets, n):
    """Output-aligned diagonals of Aᴴ from those of A.

    With y[i] = Σ_d pd[d,i]·x[i+k_d], the adjoint satisfies
    (Aᴴu)[j] = Σ_d conj(pd[d, j−k_d])·u[j−k_d]: offsets negate and each
    aligned diagonal shifts by +k_d.  One-time O(nnz) device op.
    """
    rows = []
    for d, k in enumerate(offsets):
        v = jnp.conj(pd[d])
        k = int(k)
        if k == 0:
            rows.append(v)
        elif k > 0:
            rows.append(jnp.pad(v[: n - k], (k, 0)))
        else:
            rows.append(jnp.pad(v[-k:], (0, -k)))
    return jnp.stack(rows), tuple(-int(k) for k in offsets)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "window",
                                   "interpret"))
def lsqr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, axtol, btol,
                   atol, rtol, etol, conlim, itmax, window=5,
                   interpret=None):
    """Full LSQR solve of min ‖b − Ax‖ (+λ) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/lsqr.py:_lsqr_core on
    the default path (M = N = I, radius = 0; reference src/lsqr.jl
    Golub-Kahan + Paige-Saunders stopping rules).  Returns
    (x, niter, rNorm, ArNorm, status_code, zero_resid).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    tiny = float(np.finfo(np.dtype(T)).tiny)
    rows, P = _plan(tuple(offsets) + tuple(offsets_adj), n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    pdaw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd_adj).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)
    shifts_a = tuple((int(k) // LANES, int(k) % LANES) for k in offsets_adj)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray(
        [lam, axtol, btol, atol, rtol, etol, conlim], T).reshape(7, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, arnorm_ref, status_ref,
               zr_ref, upad_ref, vpad_ref, w_ref):
        lam_v = s_ref[0, 0]
        axtol_v = s_ref[1, 0]
        btol_v = s_ref[2, 0]
        atol_v = s_ref[3, 0]
        rtol_v = s_ref[4, 0]
        etol_v = s_ref[5, 0]
        conlim_v = s_ref[6, 0]
        ctol = jnp.where(conlim_v > 0, 1.0 / conlim_v, jnp.zeros((), T))
        lam2 = lam_v * lam_v
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)

        beta1 = jnp.sqrt(jnp.sum(bv * bv))
        safe_b1 = jnp.where(beta1 == 0, jnp.ones_like(beta1), beta1)
        upad_ref[P: P + rows] = bv / safe_b1
        Ahu = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
        anorm2_0 = jnp.sum(Ahu * Ahu)
        alpha0 = jnp.sqrt(anorm2_0)
        safe_a0 = jnp.where(alpha0 == 0, jnp.ones_like(alpha0), alpha0)
        vpad_ref[P: P + rows] = Ahu / safe_a0
        w_ref[:] = vpad_ref[P: P + rows]
        ArNorm0 = alpha0 * beta1

        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(alpha0 == 0, jnp.int32(_MIN_LSQ_X),
                      jnp.int32(_RUNNING)))
        t2_0 = ArNorm0 / (jnp.sqrt(jnp.maximum(anorm2_0, tiny)) * safe_b1)
        solved0 = (t2_0 <= axtol_v) | ((1.0 + t2_0) <= 1.0)
        status0 = jnp.where((status0 == _RUNNING) & solved0,
                            jnp.int32(_SOLVED_LSQ), status0)

        errs0 = (zero,) * window
        # carry: it, alpha, beta, phibar, rhobar, anorm2, dnorm2, xnorm2,
        #        res2, c2, s2, zsc, xenorm2, rNorm, ArNorm, status, zero_resid
        carry0 = (jnp.int32(0), alpha0, beta1, beta1, alpha0, anorm2_0,
                  zero, zero, zero, -jnp.ones((), T), zero, zero, zero,
                  beta1, ArNorm0, status0, jnp.int32(0)) + errs0

        def cond(c):
            return (c[15] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, alpha, beta, phibar, rhobar, anorm2, dnorm2, xnorm2,
             res2, c2, s2, zsc, xenorm2, rNorm, ArNorm, status,
             zero_resid) = c[:17]
            errs = c[17:]
            it = it0 + 1

            # Golub-Kahan step (M = N = I).
            u_old = upad_ref[P: P + rows]
            Av = _stencil(vpad_ref, pd_ref, shifts, P, rows, T)
            u_un = Av - alpha * u_old
            beta_n = jnp.sqrt(jnp.sum(u_un * u_un))
            bnz = beta_n != 0
            safe_b = jnp.where(bnz, beta_n, jnp.ones_like(beta_n))
            upad_ref[P: P + rows] = jnp.where(bnz, u_un / safe_b, u_un)
            anorm2_n = jnp.where(
                bnz, anorm2 + alpha * alpha + beta_n * beta_n
                + jnp.where(lam_v > 0, lam2, 0), anorm2)

            v_old = vpad_ref[P: P + rows]
            Ahu_ = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
            v_un = jnp.where(bnz, Ahu_ - beta_n * v_old, v_old)
            alpha_n = jnp.where(bnz, jnp.sqrt(jnp.sum(v_un * v_un)), alpha)
            anz = bnz & (alpha_n != 0)
            safe_a = jnp.where(anz, alpha_n, jnp.ones_like(alpha_n))
            vv = jnp.where(anz, v_un / safe_a, v_un)
            vpad_ref[P: P + rows] = vv

            # Rotation 1 (λ), rotation 2 (β) — reference lsqr.jl:319-333.
            c1, s1, rhobar1 = sym_givens(rhobar, lam_v)
            psi = s1 * phibar
            phibar_mid = c1 * phibar
            cg, sg, rho = sym_givens(rhobar1, beta_n)
            phi = cg * phibar_mid
            phibar_n = sg * phibar_mid

            xenorm2_n = xenorm2 + phi * phi
            errs_n = errs[1:] + (phi,)
            err2 = zero
            for e_ in errs_n:
                err2 = err2 + e_ * e_
            err_lbnd = jnp.sqrt(err2)

            tau = sg * phi
            theta = sg * alpha_n
            rhobar_n = -cg * alpha_n
            safe_rho = jnp.where(rho == 0, jnp.ones_like(rho), rho)
            wv = w_ref[:]
            dnorm2_n = dnorm2 + jnp.sum(wv * wv) / (safe_rho * safe_rho)

            sigma = phi / safe_rho
            x_ref[:] = x_ref[:] + sigma * wv
            w_ref[:] = vv - (theta / safe_rho) * wv

            # right rotation for ‖x‖ (reference lsqr.jl:351-360)
            delta = s2 * rho
            gbar = -c2 * rho
            rhs = phi - delta * zsc
            safe_g = jnp.where(gbar == 0, jnp.ones_like(gbar), gbar)
            zbar = rhs / safe_g
            xNorm = jnp.sqrt(xnorm2 + zbar * zbar)
            c2_n, s2_n, gamma = sym_givens(gbar, theta)
            safe_gm = jnp.where(gamma == 0, jnp.ones_like(gamma), gamma)
            zsc_n = rhs / safe_gm
            xnorm2_n = xnorm2 + zsc_n * zsc_n

            anorm = jnp.sqrt(anorm2_n)
            acond = anorm * jnp.sqrt(dnorm2_n)
            res1 = phibar_n * phibar_n
            res2_n = res2 + psi * psi
            rNorm_n = jnp.sqrt(res1 + res2_n)
            ArNorm_n = alpha_n * jnp.abs(tau)

            test1 = rNorm_n / beta1
            test2 = ArNorm_n / jnp.maximum(anorm * rNorm_n, tiny)
            test3 = 1.0 / jnp.maximum(acond, tiny)
            t1 = test1 / (1.0 + anorm * xNorm / beta1)
            rNormtol = btol_v + axtol_v * anorm * xNorm / beta1

            ill_cond_mach = (1.0 + test3) <= 1.0
            solved_mach = (1.0 + test2) <= 1.0
            zero_resid_mach = (1.0 + t1) <= 1.0
            ill_cond_lim = test3 <= ctol
            solved_lim = test2 <= axtol_v
            solved_opt = ArNorm_n <= atol_v + rtol_v * ArNorm0
            zero_resid_lim = test1 <= rNormtol
            fwd_err = (it >= window) & (
                err_lbnd <= etol_v * jnp.sqrt(xenorm2_n))

            zero_r = zero_resid_mach | zero_resid_lim
            solved = (solved_mach | solved_lim | solved_opt | zero_r
                      | fwd_err)

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(solved & zero_r, jnp.int32(_SOLVED_ZERO), code)
            code = jnp.where(solved & fwd_err, jnp.int32(_FWD_ERR), code)

            return (it, alpha_n, beta_n, phibar_n, rhobar_n, anorm2_n,
                    dnorm2_n, xnorm2_n, res2_n, c2_n, s2_n, zsc_n,
                    xenorm2_n, rNorm_n, ArNorm_n, code,
                    zero_r.astype(jnp.int32)) + errs_n

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[13]
        arnorm_ref[0, 0] = out[14]
        status_ref[0, 0] = out[15]
        zr_ref[0, 0] = out[16]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, arnorm, status, zr = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 8 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], arnorm[0, 0],
            status[0, 0], zr[0, 0])


def lsqr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 8 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 8, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "window",
                                   "interpret"))
def lsmr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, axtol, btol,
                   atol, rtol, etol, conlim, itmax, window=5,
                   interpret=None):
    """Full LSMR solve of min ‖b − Ax‖ (+λ) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/lsmr.py:_lsmr_core on
    the default path (M = N = I, radius = 0; reference src/lsmr.jl
    Golub-Kahan + the ‖r‖/‖A‖/cond estimate recurrences).  Returns
    (x, niter, rNorm, ArNorm, acond, anorm, xnorm, status, zero_resid).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    tiny = float(np.finfo(np.dtype(T)).tiny)
    rows, P = _plan(tuple(offsets) + tuple(offsets_adj), n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    pdaw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd_adj).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)
    shifts_a = tuple((int(k) // LANES, int(k) % LANES) for k in offsets_adj)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray(
        [lam, axtol, btol, atol, rtol, etol, conlim], T).reshape(7, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, arnorm_ref, acond_ref,
               anorm_ref, xnorm_ref, status_ref, zr_ref,
               upad_ref, vpad_ref, h_ref, hbar_ref):
        lam_v = s_ref[0, 0]
        axtol_v = s_ref[1, 0]
        btol_v = s_ref[2, 0]
        atol_v = s_ref[3, 0]
        rtol_v = s_ref[4, 0]
        etol_v = s_ref[5, 0]
        conlim_v = s_ref[6, 0]
        ctol = jnp.where(conlim_v > 0, 1.0 / conlim_v, jnp.zeros((), T))
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)

        beta1 = jnp.sqrt(jnp.sum(bv * bv))
        safe_b1 = jnp.where(beta1 == 0, jnp.ones_like(beta1), beta1)
        upad_ref[P: P + rows] = bv / safe_b1
        Ahu = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
        alpha0 = jnp.sqrt(jnp.sum(Ahu * Ahu))
        safe_a0 = jnp.where(alpha0 == 0, jnp.ones_like(alpha0), alpha0)
        vpad_ref[P: P + rows] = Ahu / safe_a0
        h_ref[:] = vpad_ref[P: P + rows]
        hbar_ref[:] = jnp.zeros((rows, LANES), T)
        ArNorm0 = alpha0 * beta1

        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(alpha0 == 0, jnp.int32(_MIN_LSQ_X),
                      jnp.where(beta1 <= axtol_v, jnp.int32(_SOLVED_LSQ),
                                jnp.int32(_RUNNING))))

        errs0 = (zero,) * window
        big = jnp.asarray(np.finfo(np.dtype(T)).max, T)
        # carry: it, alpha, beta, zetabar, alphabar, rho, rhobar, cbar,
        #   sbar, betadd, betad, rhodold, tautildeold, thetatilde, zeta,
        #   dd, anorm2, maxrbar, minrbar, xenorm2, rNorm, ArNorm, acond,
        #   anorm, xnorm, status, zero_resid
        carry0 = (jnp.int32(0), alpha0, beta1, alpha0 * beta1, alpha0,
                  one, one, one, zero, beta1, zero, one, zero, zero,
                  zero, zero, alpha0 * alpha0, zero, big, zero,
                  beta1, ArNorm0, zero, alpha0, zero, status0,
                  jnp.int32(0)) + errs0

        def cond(c):
            return (c[25] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, alpha, beta, zetabar_c, alphabar, rho_c, rhobar_c,
             cbar_c, sbar_c, betadd, betad_c, rhodold_c, tautildeold_c,
             thetatilde_c, zeta_c, dd_c, anorm2, maxrbar, minrbar,
             xenorm2, rNorm, ArNorm, acond, anorm_c, xnorm,
             status, zero_resid) = c[:27]
            errs = c[27:]
            it = it0 + 1

            # Golub-Kahan step (M = N = I).
            u_old = upad_ref[P: P + rows]
            Av = _stencil(vpad_ref, pd_ref, shifts, P, rows, T)
            u_un = Av - alpha * u_old
            beta_n = jnp.sqrt(jnp.sum(u_un * u_un))
            bnz = beta_n != 0
            safe_b = jnp.where(bnz, beta_n, jnp.ones_like(beta_n))
            upad_ref[P: P + rows] = jnp.where(bnz, u_un / safe_b, u_un)

            v_old = vpad_ref[P: P + rows]
            Ahu_ = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
            v_un = jnp.where(bnz, Ahu_ - beta_n * v_old, v_old)
            alpha_n = jnp.where(bnz, jnp.sqrt(jnp.sum(v_un * v_un)), alpha)
            anz = bnz & (alpha_n != 0)
            safe_a = jnp.where(anz, alpha_n, jnp.ones_like(alpha_n))
            vv = jnp.where(anz, v_un / safe_a, v_un)
            vpad_ref[P: P + rows] = vv

            # LSMR rotations (reference src/lsmr.jl; solvers/lsmr.py body).
            chat, shat, alphahat = sym_givens(alphabar, lam_v)
            rhoold = rho_c
            cg, sg, rho = sym_givens(alphahat, beta_n)
            thetanew = sg * alpha_n
            alphabar_n = cg * alpha_n

            rhobarold = rhobar_c
            zetaold = zeta_c
            thetabar = sbar_c * rho
            rhotemp = cbar_c * rho
            cbar_n, sbar_n, rhobar_n = sym_givens(rhotemp, thetanew)
            zeta = cbar_n * zetabar_c
            zetabar_n = -sbar_n * zetabar_c

            xenorm2_n = xenorm2 + zeta * zeta
            errs_n = errs[1:] + (zeta,)
            err2 = zero
            for e_ in errs_n:
                err2 = err2 + e_ * e_
            err_lbnd = jnp.sqrt(err2)

            delta = thetabar * rho / jnp.maximum(rhoold * rhobarold, tiny)
            hv = h_ref[:]
            hbar_ref[:] = hv - delta * hbar_ref[:]

            safe_rr = jnp.maximum(rho * rhobar_n, tiny)
            sigma = zeta / safe_rr
            x_ref[:] = x_ref[:] + sigma * hbar_ref[:]
            h_ref[:] = vv - (thetanew / jnp.maximum(rho, tiny)) * hv

            # ‖r‖ estimate recurrences.
            betaacute = chat * betadd
            betacheck = -shat * betadd
            betahat = cg * betaacute
            betadd_n = -sg * betaacute

            thetatildeold = thetatilde_c
            ctildeold, stildeold, rhotildeold = sym_givens(
                rhodold_c, thetabar)
            thetatilde_n = stildeold * rhobar_n
            rhodold_n = ctildeold * rhobar_n
            betad_n = -stildeold * betad_c + ctildeold * betahat

            tautildeold_n = (zetaold - thetatildeold * tautildeold_c) \
                / jnp.maximum(rhotildeold, tiny)
            taud = (zeta - thetatilde_n * tautildeold_n) \
                / jnp.maximum(rhodold_n, tiny)
            dd_n = dd_c + betacheck * betacheck
            rNorm_n = jnp.sqrt(dd_n + (betad_n - taud) ** 2
                               + betadd_n * betadd_n)

            anorm2_mid = anorm2 + beta_n * beta_n
            anorm = jnp.sqrt(anorm2_mid)
            anorm2_n = anorm2_mid + alpha_n * alpha_n

            maxrbar_n = jnp.maximum(maxrbar, rhobarold)
            minrbar_n = jnp.where(it > 1, jnp.minimum(minrbar, rhobarold),
                                  minrbar)
            acond_n = jnp.maximum(maxrbar_n, rhotemp) / jnp.maximum(
                jnp.minimum(minrbar_n, rhotemp), tiny)

            ArNorm_n = jnp.abs(zetabar_n)
            xv = x_ref[:]
            xNorm = jnp.sqrt(jnp.sum(xv * xv))

            test1 = rNorm_n / beta1
            test2 = ArNorm_n / jnp.maximum(anorm * rNorm_n, tiny)
            test3 = 1.0 / jnp.maximum(acond_n, tiny)
            t1 = test1 / (1.0 + anorm * xNorm / beta1)
            rNormtol = btol_v + axtol_v * anorm * xNorm / beta1

            ill_cond_mach = (1.0 + test3) <= 1.0
            solved_mach = (1.0 + test2) <= 1.0
            zero_resid_mach = (1.0 + t1) <= 1.0
            ill_cond_lim = test3 <= ctol
            solved_lim = test2 <= axtol_v
            solved_opt = ArNorm_n <= atol_v + rtol_v * ArNorm0
            zero_resid_lim = test1 <= rNormtol
            fwd_err = (it >= window) & (
                err_lbnd <= etol_v * jnp.sqrt(xenorm2_n))

            zero_r = zero_resid_mach | zero_resid_lim
            solved = (solved_mach | solved_lim | solved_opt | zero_r
                      | fwd_err)

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(solved & zero_r, jnp.int32(_SOLVED_ZERO), code)
            code = jnp.where(solved & fwd_err, jnp.int32(_FWD_ERR), code)

            return (it, alpha_n, beta_n, zetabar_n, alphabar_n, rho,
                    rhobar_n, cbar_n, sbar_n, betadd_n, betad_n,
                    rhodold_n, tautildeold_n, thetatilde_n, zeta,
                    dd_n, anorm2_n, maxrbar_n, minrbar_n, xenorm2_n,
                    rNorm_n, ArNorm_n, acond_n, anorm, xNorm, code,
                    zero_r.astype(jnp.int32)) + errs_n

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[20]
        arnorm_ref[0, 0] = out[21]
        acond_ref[0, 0] = out[22]
        anorm_ref[0, 0] = out[23]
        xnorm_ref[0, 0] = out[24]
        status_ref[0, 0] = out[25]
        zr_ref[0, 0] = out[26]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 8,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 9 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    (x, niter, rnorm, arnorm, acond, anorm, xnorm, status, zr) = outs
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], arnorm[0, 0],
            acond[0, 0], anorm[0, 0], xnorm[0, 0], status[0, 0], zr[0, 0])


def lsmr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 9 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 9, stencil_dtype) < 100 * (1 << 20)


# GMRES status codes (krylov_tpu/_runtime.py)
_BREAKDOWN = 7
_INCONSISTENT = 8
_TIRED_K = 100


@partial(jax.jit, static_argnames=("offsets", "mem", "basis_dtype",
                                   "interpret"))
def gmres_dia_fused(pd, offsets, b, atol, rtol, itmax, mem=20,
                    basis_dtype=None, interpret=None):
    """Full restarted GMRES(mem) solve of A x = b for a DIA matrix in one
    kernel launch.

    Whole-solve-in-VMEM port of solvers/gmres.py:_gmres_core on the
    default path (M = N = I; reference src/gmres.jl Arnoldi + Givens-QR +
    restart).  The (mem+1)-vector Krylov panel lives in VMEM scratch; the
    Arnoldi step uses sequential MGS (the reference's orthogonalization,
    src/gmres.jl:259-262) with dynamically bounded in-kernel loops, the
    Hessenberg QR runs on SMEM scalars, and restart re-seeds from the
    true residual without leaving the kernel.

    ``basis_dtype`` stores the Krylov panel compressed (bf16) while all
    arithmetic — MGS dots, Givens, residual estimates, x accumulation —
    stays in the working dtype: compressed-basis GMRES (Aliaga et al.,
    "Compressed Basis GMRES on High Performance GPUs",
    arxiv.org/abs/2009.12101).  The basis is the VMEM budget, so bf16
    roughly doubles the problem size the fused path admits; restarts
    re-seed from the true (uncompressed) residual, bounding the
    compression error like the paper's restarted variant.

    Returns (x, niter, rNorm, status_code, inconsistent, npass).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    BT = jnp.dtype(basis_dtype) if basis_dtype is not None else T
    eps_T = float(np.finfo(np.dtype(T)).eps)
    btol = eps_T ** 0.75
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, incons_ref,
               npass_ref,
               V_ref, ppad_ref, h_ref, c_ref, sn_ref, zz_ref, R_ref,
               y_ref, tmp_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        zero = jnp.zeros((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * beta0
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        V_ref[pl.ds(0, rows), :] = (bv / safe_b0).astype(BT)
        zz_ref[0] = beta0
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            it, k, rNorm, status, incons, npass, prev_tr = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it, k, rNorm, status, incons, npass, prev_tr = carry

            # --- Arnoldi step: w = A·V[k], MGS against V[0..k] ----------
            vk = V_ref[pl.ds(k * rows, rows), :].astype(T)
            ppad_ref[P: P + rows] = vk
            w = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)

            def mgs(i, w):
                vi = V_ref[pl.ds(i * rows, rows), :].astype(T)
                hij = jnp.sum(vi * w)
                h_ref[i] = hij
                return w - hij * vi

            w = jax.lax.fori_loop(0, k + 1, mgs, w)
            Hbis = jnp.sqrt(jnp.sum(w * w))
            safe_H = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
            V_ref[pl.ds((k + 1) * rows, rows), :] = (w / safe_H).astype(BT)

            # --- Givens-QR of the new Hessenberg column (SMEM) ----------
            def rot(i, _):
                hi, hi1 = h_ref[i], h_ref[i + 1]
                h_ref[i] = c_ref[i] * hi + sn_ref[i] * hi1
                h_ref[i + 1] = sn_ref[i] * hi - c_ref[i] * hi1
                return 0

            jax.lax.fori_loop(0, k, rot, 0)
            ck, sk, rkk = sym_givens(h_ref[k], Hbis)
            c_ref[k] = ck
            sn_ref[k] = sk
            h_ref[k] = rkk

            def wcol(i, _):
                R_ref[k * mem + i] = h_ref[i]
                return 0

            jax.lax.fori_loop(0, k + 1, wcol, 0)
            zeta_next = sk * zz_ref[k]
            zz_ref[k] = ck * zz_ref[k]
            zz_ref[k + 1] = zeta_next

            rNorm_n = jnp.abs(zeta_next)
            it_n = it + 1
            kk = k + 1

            resid_decrease = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            breakdown = Hbis <= btol
            tired = it_n >= cap
            inner_tired = kk >= mem
            inner_done = resid_decrease | breakdown | tired | inner_tired
            glob_done = resid_decrease | breakdown | tired

            tmp_ref[0] = rNorm_n                     # beta after restart
            tmp_ref[1] = zero                        # singular-pivot flag
            tmp_ref[3] = zero                        # true-residual confirm

            @pl.when(inner_done)
            def _finalize():
                # back substitution R[0:kk,0:kk] y = zz[0:kk] on SMEM
                def bs(idx, _):
                    i = kk - 1 - idx

                    def inner(j, acc):
                        return acc - R_ref[j * mem + i] * y_ref[j]

                    acc = jax.lax.fori_loop(i + 1, kk, inner, zz_ref[i])
                    diag = R_ref[i * mem + i]
                    sing = jnp.abs(diag) <= btol
                    y_ref[i] = jnp.where(
                        sing, zero,
                        acc / jnp.where(sing, jnp.ones_like(diag), diag))
                    tmp_ref[1] = jnp.maximum(
                        tmp_ref[1], jnp.where(sing, 1.0, 0.0))
                    return 0

                jax.lax.fori_loop(0, kk, bs, 0)

                def xacc(i, _):
                    vi = V_ref[pl.ds(i * rows, rows), :].astype(T)
                    x_ref[:] = x_ref[:] + y_ref[i] * vi
                    return 0

                jax.lax.fori_loop(0, kk, xacc, 0)

                if basis_dtype is not None:
                    # Compressed basis: the Givens-recurrence estimate
                    # tracks the residual of the COMPRESSED subspace
                    # problem, which can sit far below the true residual
                    # (the paper's error bound comes from restarting on
                    # the true residual).  Always recompute b − Ax here:
                    # convergence must be CONFIRMED against it, and the
                    # reseed uses the uncompressed residual.
                    ppad_ref[P: P + rows] = x_ref[:]
                    Ax = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
                    r = b_ref[:] - Ax
                    beta_r = jnp.sqrt(jnp.sum(r * r))
                    safe = jnp.where(beta_r == 0, jnp.ones_like(beta_r),
                                     beta_r)
                    V_ref[pl.ds(0, rows), :] = (r / safe).astype(BT)
                    zz_ref[0] = beta_r
                    tmp_ref[0] = beta_r
                    tmp_ref[3] = jnp.where(
                        (beta_r <= eps_lim) | ((beta_r + 1.0) <= 1.0),
                        jnp.ones((), T), zero)
                else:
                    @pl.when(~glob_done)
                    def _restart():
                        ppad_ref[P: P + rows] = x_ref[:]
                        Ax = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
                        r = b_ref[:] - Ax
                        beta_r = jnp.sqrt(jnp.sum(r * r))
                        safe = jnp.where(beta_r == 0,
                                         jnp.ones_like(beta_r), beta_r)
                        V_ref[pl.ds(0, rows), :] = (r / safe).astype(BT)
                        zz_ref[0] = beta_r
                        tmp_ref[0] = beta_r

            if basis_dtype is not None:
                # stop when the TRUE residual confirms the tolerance, or
                # when a confirmed pass stopped halving it — the f32
                # evaluation floor of b − Ax is reached and further
                # passes cannot improve the solution
                confirmed = tmp_ref[3] > 0
                stagnated = tmp_ref[0] > 0.5 * prev_tr
                resid_final = resid_decrease & (confirmed | stagnated)
                prev_n = jnp.where(inner_done & resid_decrease
                                   & ~resid_final, tmp_ref[0], prev_tr)
            else:
                resid_final = resid_decrease
                prev_n = prev_tr
            glob_final = resid_final | breakdown | tired
            incons_n = incons | (inner_done & (tmp_ref[1] > 0))
            code = jnp.int32(_BREAKDOWN)
            code = jnp.where(tired, jnp.int32(_TIRED_K), code)
            code = jnp.where(resid_final, jnp.int32(_SOLVED), code)
            code = jnp.where(incons_n, jnp.int32(_INCONSISTENT), code)
            code = jnp.where(~glob_final, jnp.int32(_RUNNING), code)
            status_n = jnp.where(inner_done, code, jnp.int32(_RUNNING))

            k_n = jnp.where(inner_done, jnp.int32(0), kk)
            npass_n = npass + jnp.where(inner_done & ~glob_final,
                                        jnp.int32(1), jnp.int32(0))
            rN_out = jnp.where(inner_done & ~glob_final, tmp_ref[0],
                               rNorm_n)
            return (it_n, k_n, rN_out, status_n, incons_n, npass_n, prev_n)

        carry0 = (jnp.int32(0), jnp.int32(0), beta0, status0,
                  jnp.zeros((), jnp.bool_), jnp.int32(1),
                  jnp.asarray(np.inf, T))
        it, k, rNorm, status, incons, npass, _pt = jax.lax.while_loop(
            cond, body, carry0)
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status
        incons_ref[0, 0] = incons.astype(jnp.int32)
        npass_ref[0, 0] = npass

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status, incons, npass = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((mem + 1) * rows, LANES), BT),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((mem * mem,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((4,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (mem + 1) * rows * LANES * BT.itemsize
                                  + 3 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            incons[0, 0], npass[0, 0])


def gmres_dia_fused_supported(offsets, n, dtype, mem, stencil_dtype=None,
                              basis_dtype=None):
    """Static gate: Krylov panel + stencil fit in VMEM (~100 MB).

    A compressed (bf16) basis counts at its own width — the point of
    compressed-basis GMRES is that this gate then admits ~2× larger
    problems/mem into the fused path."""
    if jnp.dtype(dtype).kind != "f":
        return False
    if basis_dtype is None:
        nvec_eff = mem + 4
    else:
        ratio = jnp.dtype(basis_dtype).itemsize / jnp.dtype(dtype).itemsize
        nvec_eff = int(np.ceil((mem + 1) * ratio)) + 3
    return _fused_bytes(offsets, n, dtype, nvec_eff,
                        stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "mem", "p", "basis_dtype",
                                   "interpret"))
def block_gmres_dia_fused(pd, offsets, B, atol, rtol, itmax, mem=16, p=4,
                          basis_dtype=None, interpret=None):
    """Full restarted block-GMRES(mem) solve of A X = B, one kernel launch.

    Whole-solve-in-VMEM analogue of solvers/block.py:_block_core on the
    default path (M = N = I; reference src/block_gmres.jl): the
    (mem+1)-panel block Krylov basis lives in VMEM scratch (each panel =
    ``p`` lane-matrix columns), block orthogonalization is CGS2 (the
    general core's scheme), panel normalization is CholQR2 (the
    TPU-idiomatic replacement for the reference's LAPACK Householder
    kgeqrf!, src/block_krylov_utils.jl:210-301 — p×p scalar Cholesky on
    SMEM instead of reflectors), and the banded block Hessenberg is
    QR-factorized incrementally with p scalar Givens rotations per
    column on SMEM, giving the exact block-LS residual ‖Z tail‖_F each
    iteration.  Restart re-seeds from the true block residual without
    leaving the kernel.

    Args:
      B: (n, p) right-hand-side block (real dtype).
      mem: restart length in BLOCK iterations; mem·p ≤ 128.
      basis_dtype: optional compressed (bf16) storage for the block
        Krylov basis — arithmetic stays in the working dtype
        (compressed-basis GMRES, arxiv.org/abs/2009.12101).
    Returns (X(n,p), niter, rNorm, status_code, inconsistent, npass).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = B.shape[0]
    assert B.shape[1] == p
    nd = pd.shape[0]
    T = B.dtype
    BT = jnp.dtype(basis_dtype) if basis_dtype is not None else T
    eps_T = float(np.finfo(np.dtype(T)).eps)
    btol = eps_T ** 0.75
    rows, P = _plan(offsets, n)
    npad = rows * LANES
    MP = mem * p                     # scalar columns of the block system
    MP1 = (mem + 1) * p

    Bw = jnp.zeros((p, npad), T).at[:, :n].set(B.T).reshape(
        p * rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, incons_ref,
               npass_ref,
               V_ref, W_ref, ppad_ref,
               hcol_ref, h2_ref, col_ref, c_ref, sn_ref, R_ref, zz_ref,
               y_ref, pp_ref, tmp_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        x_ref[:] = jnp.zeros((p * rows, LANES), T)

        def wcol(b_):
            return W_ref[b_ * rows: (b_ + 1) * rows]

        def cholqr(goff):
            """One CholQR pass on W (in place); upper R → pp_ref[goff:]."""
            for a_ in range(p):
                for b_ in range(a_, p):
                    pp_ref[2 * p * p + a_ * p + b_] = jnp.sum(
                        wcol(a_) * wcol(b_))
            for i_ in range(p):
                s = pp_ref[2 * p * p + i_ * p + i_]
                for t_ in range(i_):
                    s = s - pp_ref[goff + t_ * p + i_] ** 2
                di = jnp.sqrt(jnp.maximum(s, zero))
                pp_ref[goff + i_ * p + i_] = di
                safe = jnp.where(di <= btol, one, di)
                for j_ in range(i_ + 1, p):
                    s2 = pp_ref[2 * p * p + i_ * p + j_]
                    for t_ in range(i_):
                        s2 = s2 - pp_ref[goff + t_ * p + i_] \
                            * pp_ref[goff + t_ * p + j_]
                    pp_ref[goff + i_ * p + j_] = jnp.where(
                        di <= btol, zero, s2 / safe)
                for j_ in range(i_):
                    pp_ref[goff + i_ * p + j_] = zero
            for i_ in range(p):
                w = wcol(i_)
                for t_ in range(i_):
                    w = w - pp_ref[goff + t_ * p + i_] * wcol(t_)
                di = pp_ref[goff + i_ * p + i_]
                safe = jnp.where(di <= btol, one, di)
                W_ref[i_ * rows: (i_ + 1) * rows] = w / safe

        def cholqr2():
            """CholQR2 of W: Q overwrites W, R = R2·R1 → pp_ref[0:p·p]."""
            cholqr(0)
            cholqr(p * p)
            # R = R2 @ R1 (both upper) via the Gram temp slot, then copy
            # back (writing into [0:p·p] directly would clobber R1 rows
            # still needed by other (i, j) entries).
            for i_ in range(p):
                for j_ in range(i_, p):
                    s = zero
                    for t_ in range(i_, j_ + 1):
                        s = s + pp_ref[p * p + i_ * p + t_] \
                            * pp_ref[t_ * p + j_]
                    pp_ref[2 * p * p + i_ * p + j_] = s
            for i_ in range(p):
                for j_ in range(p):
                    pp_ref[i_ * p + j_] = (
                        pp_ref[2 * p * p + i_ * p + j_] if j_ >= i_
                        else zero)

        def gam_fro():
            s = zero
            for a_ in range(p):
                for b_ in range(p):
                    s = s + pp_ref[a_ * p + b_] ** 2
            return jnp.sqrt(s)

        def reseed():
            """W ← B − A·X; CholQR2 → V[0..p−1], Γ; reset Z; return ‖Γ‖_F."""
            for b_ in range(p):
                ppad_ref[P: P + rows] = x_ref[b_ * rows: (b_ + 1) * rows]
                ax = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
                W_ref[b_ * rows: (b_ + 1) * rows] = \
                    b_ref[b_ * rows: (b_ + 1) * rows] - ax
            cholqr2()
            for b_ in range(p):
                V_ref[pl.ds(b_ * rows, rows)] = wcol(b_).astype(BT)

            def zz_zero(i, _):
                for b_ in range(p):
                    zz_ref[i * p + b_] = zero
                return 0

            jax.lax.fori_loop(0, MP1, zz_zero, 0)
            for a_ in range(p):
                for b_ in range(p):
                    zz_ref[a_ * p + b_] = pp_ref[a_ * p + b_]
            tmp_ref[2] = zero          # stranded singular-pivot mass²
            return gam_fro()

        beta0 = reseed()
        eps_lim = atol_v + rtol_v * beta0
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            it, k, rNorm, status, incons, npass, prev_tr = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it, k, rNorm, status, incons, npass, prev_tr = carry

            # --- W = A·V[k] ------------------------------------------------
            for b_ in range(p):
                ppad_ref[P: P + rows] = V_ref[pl.ds((k * p + b_) * rows,
                                                    rows)].astype(T)
                W_ref[b_ * rows: (b_ + 1) * rows] = _stencil(
                    ppad_ref, pd_ref, shifts, P, rows, T)

            # --- block CGS2 against panels 0..k (general-core scheme) ------
            def dots(i, href):
                for a_ in range(p):
                    vi = V_ref[pl.ds((i * p + a_) * rows, rows)].astype(T)
                    for b_ in range(p):
                        href[(i * p + a_) * p + b_] = jnp.sum(vi * wcol(b_))
                return 0

            def subtract(i, href):
                for b_ in range(p):
                    w = wcol(b_)
                    for a_ in range(p):
                        w = w - href[(i * p + a_) * p + b_] \
                            * V_ref[pl.ds((i * p + a_) * rows,
                                          rows)].astype(T)
                    W_ref[b_ * rows: (b_ + 1) * rows] = w
                return 0

            jax.lax.fori_loop(0, k + 1, lambda i, _: dots(i, hcol_ref), 0)
            jax.lax.fori_loop(0, k + 1, lambda i, _: subtract(i, hcol_ref),
                              0)
            jax.lax.fori_loop(0, k + 1, lambda i, _: dots(i, h2_ref), 0)
            jax.lax.fori_loop(0, k + 1, lambda i, _: subtract(i, h2_ref), 0)

            def merge(i, _):
                for a_ in range(p):
                    for b_ in range(p):
                        idx = (i * p + a_) * p + b_
                        hcol_ref[idx] = hcol_ref[idx] + h2_ref[idx]
                return 0

            jax.lax.fori_loop(0, k + 1, merge, 0)

            # --- normalize: CholQR2 → V[k+1], Hₖ₊₁ₖ = Γ ---------------------
            cholqr2()
            Hbis = gam_fro()
            for b_ in range(p):
                V_ref[pl.ds(((k + 1) * p + b_) * rows, rows)] = \
                    wcol(b_).astype(BT)

            # --- p new scalar columns of the banded Hessenberg --------------
            for l_ in range(p):
                c = k * p + l_

                def fill(i, _):
                    for a_ in range(p):
                        col_ref[i * p + a_] = hcol_ref[(i * p + a_) * p + l_]
                    return 0

                jax.lax.fori_loop(0, k + 1, fill, 0)
                for a_ in range(p):
                    col_ref[(k + 1) * p + a_] = pp_ref[a_ * p + l_]

                # replay all previous rotations in creation order
                def replay(c2, _):
                    for j_ in range(p):
                        r = c2 + p - j_
                        ch = c_ref[c2 * p + j_]
                        sh = sn_ref[c2 * p + j_]
                        u, v = col_ref[r - 1], col_ref[r]
                        col_ref[r - 1] = ch * u + sh * v
                        col_ref[r] = sh * u - ch * v
                    return 0

                jax.lax.fori_loop(0, c, replay, 0)

                # p new rotations eliminate rows c+p … c+1 (bottom-up)
                for j_ in range(p):
                    r = c + p - j_
                    ch, sh, rr = sym_givens(col_ref[r - 1], col_ref[r])
                    c_ref[c * p + j_] = ch
                    sn_ref[c * p + j_] = sh
                    col_ref[r - 1] = rr
                    for b_ in range(p):
                        u = zz_ref[(r - 1) * p + b_]
                        v = zz_ref[r * p + b_]
                        zz_ref[(r - 1) * p + b_] = ch * u + sh * v
                        zz_ref[r * p + b_] = sh * u - ch * v

                def store(i, _):
                    R_ref[c * MP + i] = col_ref[i]
                    return 0

                jax.lax.fori_loop(0, c + 1, store, 0)

                # A singular pivot (rank-deficient block, e.g. an exactly
                # invariant direction) strands rhs mass on row c that the
                # Frobenius-tail formula below would silently drop: row c
                # is final once column c is processed (later columns only
                # rotate rows > c), so account it now.  Without this the
                # kernel can report convergence while a deficient rhs
                # column is unsolved.
                sing_mass = zero
                for b_ in range(p):
                    sing_mass = sing_mass + zz_ref[c * p + b_] ** 2
                tmp_ref[2] = tmp_ref[2] + jnp.where(
                    jnp.abs(col_ref[c]) <= btol, sing_mass, zero)

            # --- block-LS residual = ‖Z rows (k+1)p … (k+1)p+p−1‖_F ---------
            # (+ stranded singular-pivot mass; zero for full-rank blocks)
            ss = tmp_ref[2]
            for a_ in range(p):
                for b_ in range(p):
                    ss = ss + zz_ref[((k + 1) * p + a_) * p + b_] ** 2
            rNorm_n = jnp.sqrt(ss)

            it_n = it + 1
            kk = k + 1
            resid_decrease = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            breakdown = Hbis <= btol
            tired = it_n >= cap
            inner_tired = kk >= mem
            inner_done = resid_decrease | breakdown | tired | inner_tired
            glob_done = resid_decrease | breakdown | tired

            tmp_ref[0] = rNorm_n
            tmp_ref[1] = zero
            tmp_ref[3] = zero

            @pl.when(inner_done)
            def _finalize():
                cols = kk * p

                # back substitution R Y = Z_top (p rhs columns) on SMEM
                def bs(idx, _):
                    i = cols - 1 - idx
                    diag = R_ref[i * MP + i]
                    sing = jnp.abs(diag) <= btol
                    safe = jnp.where(sing, one, diag)
                    for b_ in range(p):
                        def inner(j, acc):
                            return acc - R_ref[j * MP + i] * y_ref[j * p + b_]

                        acc = jax.lax.fori_loop(i + 1, cols, inner,
                                                zz_ref[i * p + b_])
                        y_ref[i * p + b_] = jnp.where(sing, zero, acc / safe)
                    tmp_ref[1] = jnp.maximum(
                        tmp_ref[1], jnp.where(sing, one, zero))
                    return 0

                jax.lax.fori_loop(0, cols, bs, 0)

                def xacc(j, _):
                    vj = V_ref[pl.ds(j * rows, rows)].astype(T)
                    for b_ in range(p):
                        x_ref[b_ * rows: (b_ + 1) * rows] = \
                            x_ref[b_ * rows: (b_ + 1) * rows] \
                            + y_ref[j * p + b_] * vj
                    return 0

                jax.lax.fori_loop(0, cols, xacc, 0)

                if basis_dtype is not None:
                    # Compressed basis: confirm convergence against the
                    # TRUE block residual (see gmres_dia_fused) — reseed
                    # unconditionally; the state is unused if we stop.
                    beta_r = reseed()
                    tmp_ref[0] = beta_r
                    tmp_ref[3] = jnp.where(
                        (beta_r <= eps_lim) | ((beta_r + 1.0) <= 1.0),
                        one, zero)
                else:
                    @pl.when(~glob_done)
                    def _restart():
                        tmp_ref[0] = reseed()

            if basis_dtype is not None:
                # confirmed by the true residual, or its f32 evaluation
                # floor reached (a confirmed pass stopped halving it)
                confirmed = tmp_ref[3] > 0
                stagnated = tmp_ref[0] > 0.5 * prev_tr
                resid_final = resid_decrease & (confirmed | stagnated)
                prev_n = jnp.where(inner_done & resid_decrease
                                   & ~resid_final, tmp_ref[0], prev_tr)
            else:
                resid_final = resid_decrease
                prev_n = prev_tr
            glob_final = resid_final | breakdown | tired
            # singular backsub pivots are recorded as a diagnostic but do
            # not change the status: the reference's block_gmres has no
            # inconsistency branch (src/block_gmres.jl:342-346).
            incons_n = incons | (inner_done & (tmp_ref[1] > 0))
            code = jnp.int32(_BREAKDOWN)
            code = jnp.where(tired, jnp.int32(_TIRED_K), code)
            code = jnp.where(resid_final, jnp.int32(_SOLVED), code)
            code = jnp.where(~glob_final, jnp.int32(_RUNNING), code)
            status_n = jnp.where(inner_done, code, jnp.int32(_RUNNING))

            k_n = jnp.where(inner_done, jnp.int32(0), kk)
            npass_n = npass + jnp.where(inner_done & ~glob_final,
                                        jnp.int32(1), jnp.int32(0))
            rN_out = jnp.where(inner_done & ~glob_final, tmp_ref[0],
                               rNorm_n)
            return (it_n, k_n, rN_out, status_n, incons_n, npass_n, prev_n)

        carry0 = (jnp.int32(0), jnp.int32(0), beta0, status0,
                  jnp.zeros((), jnp.bool_), jnp.int32(1),
                  jnp.asarray(np.inf, T))
        it, k, rNorm, status, incons, npass, _pt = jax.lax.while_loop(
            cond, body, carry0)
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status
        incons_ref[0, 0] = incons.astype(jnp.int32)
        npass_ref[0, 0] = npass

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    X, niter, rnorm, status, incons, npass = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p * rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((mem + 1) * p * rows, LANES), BT),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((MP1 * p,), T),
            pltpu.SMEM((MP1 * p,), T),
            pltpu.SMEM((MP1,), T),
            pltpu.SMEM((MP * p,), T),
            pltpu.SMEM((MP * p,), T),
            pltpu.SMEM((MP * MP,), T),
            pltpu.SMEM((MP1 * p,), T),
            pltpu.SMEM((MP * p,), T),
            pltpu.SMEM((3 * p * p,), T),
            pltpu.SMEM((4,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (mem + 1) * p * rows * LANES
                                  * BT.itemsize
                                  + (3 * p + 4) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, Bw, pdw)
    Xc = X.reshape(p, npad)[:, :n].T
    return (Xc, niter[0, 0], rnorm[0, 0], status[0, 0],
            incons[0, 0], npass[0, 0])


def block_gmres_dia_fused_supported(offsets, n, p, dtype, mem,
                                    stencil_dtype=None, basis_dtype=None):
    """Static gate: block panel fits VMEM; SMEM triangle MP² stays small.
    A compressed (bf16) basis counts at its own width."""
    if jnp.dtype(dtype).kind != "f":
        return False
    if p < 1 or p > 8 or mem * p > 128 or mem < 2:
        return False
    if basis_dtype is None:
        nvec_eff = (mem + 1) * p + 2 * p + 4
    else:
        ratio = jnp.dtype(basis_dtype).itemsize / jnp.dtype(dtype).itemsize
        nvec_eff = int(np.ceil((mem + 1) * p * ratio)) + 2 * p + 4
    return _fused_bytes(offsets, n, dtype, nvec_eff,
                        stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "p", "interpret"))
def block_minres_dia_fused(pd, offsets, B, atol, rtol, itmax, p=4,
                           interpret=None):
    """Full block-MINRES solve of A X = B (Hermitian A), one launch.

    Whole-solve-in-VMEM analogue of solvers/block.py:_block_minres_core
    (reference src/block_minres.jl:95-317): the O(1)-memory block
    tridiagonal recurrence with 6 p-column panels VMEM-resident.  The
    reference's 2p×p Householder reflections Θₖ (LAPACK kgeqrf/kormqr)
    become explicit 2p×2p Givens products accumulated on SMEM scalars;
    block Lanczos normalization is CholQR2.  Returns
    (X(n,p), niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = B.shape[0]
    assert B.shape[1] == p
    nd = pd.shape[0]
    T = B.dtype
    btol = float(np.finfo(np.dtype(T)).eps) ** 0.75
    rows, P = _plan(offsets, n)
    npad = rows * LANES
    p2 = p * p
    q2 = 2 * p

    Bw = jnp.zeros((p, npad), T).at[:, :n].set(B.T).reshape(p * rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               Vkm1_ref, Vk_ref, W_ref, wm2_ref, wm1_ref, wt_ref, ppad_ref,
               pp_ref, psi_ref, om_ref, qt2_ref, qt1_ref, qtn_ref,
               stk_ref, sm_ref, phib_ref, gam_ref, pi_ref, lam_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        x_ref[:] = jnp.zeros((p * rows, LANES), T)

        def wcol(b_):
            return W_ref[b_ * rows: (b_ + 1) * rows]

        def cholqr(goff):
            for a_ in range(p):
                for b_ in range(a_, p):
                    pp_ref[2 * p2 + a_ * p + b_] = jnp.sum(
                        wcol(a_) * wcol(b_))
            for i_ in range(p):
                s = pp_ref[2 * p2 + i_ * p + i_]
                for t_ in range(i_):
                    s = s - pp_ref[goff + t_ * p + i_] ** 2
                di = jnp.sqrt(jnp.maximum(s, zero))
                pp_ref[goff + i_ * p + i_] = di
                safe = jnp.where(di <= btol, one, di)
                for j_ in range(i_ + 1, p):
                    s2 = pp_ref[2 * p2 + i_ * p + j_]
                    for t_ in range(i_):
                        s2 = s2 - pp_ref[goff + t_ * p + i_] \
                            * pp_ref[goff + t_ * p + j_]
                    pp_ref[goff + i_ * p + j_] = jnp.where(
                        di <= btol, zero, s2 / safe)
                for j_ in range(i_):
                    pp_ref[goff + i_ * p + j_] = zero
            for i_ in range(p):
                w = wcol(i_)
                for t_ in range(i_):
                    w = w - pp_ref[goff + t_ * p + i_] * wcol(t_)
                di = pp_ref[goff + i_ * p + i_]
                safe = jnp.where(di <= btol, one, di)
                W_ref[i_ * rows: (i_ + 1) * rows] = w / safe

        def cholqr2():
            cholqr(0)
            cholqr(p2)
            for i_ in range(p):
                for j_ in range(i_, p):
                    s = zero
                    for t_ in range(i_, j_ + 1):
                        s = s + pp_ref[p2 + i_ * p + t_] \
                            * pp_ref[t_ * p + j_]
                    pp_ref[2 * p2 + i_ * p + j_] = s
            for i_ in range(p):
                for j_ in range(p):
                    pp_ref[i_ * p + j_] = (
                        pp_ref[2 * p2 + i_ * p + j_] if j_ >= i_ else zero)

        # ---- init: V₁Γ = B (X starts at 0), Θ₋₁ = Θ₀ = I ------------------
        for b_ in range(p):
            W_ref[b_ * rows: (b_ + 1) * rows] = \
                b_ref[b_ * rows: (b_ + 1) * rows]
        cholqr2()
        for b_ in range(p):
            Vk_ref[b_ * rows: (b_ + 1) * rows] = wcol(b_)
            Vkm1_ref[b_ * rows: (b_ + 1) * rows] = jnp.zeros((rows, LANES), T)
            wm1_ref[b_ * rows: (b_ + 1) * rows] = jnp.zeros((rows, LANES), T)
            wm2_ref[b_ * rows: (b_ + 1) * rows] = jnp.zeros((rows, LANES), T)
        bsq = zero
        for a_ in range(p):
            for b_ in range(p):
                phib_ref[a_ * p + b_] = pp_ref[a_ * p + b_]
                psi_ref[a_ * p + b_] = zero
                bsq = bsq + pp_ref[a_ * p + b_] ** 2
        for a_ in range(q2):
            for b_ in range(q2):
                eye = one if a_ == b_ else zero
                qt2_ref[a_ * q2 + b_] = eye
                qt1_ref[a_ * q2 + b_] = eye
        beta0 = jnp.sqrt(bsq)
        eps_lim = atol_v + rtol_v * beta0
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            it, rNorm, status = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it0, rNorm, status = carry
            it = it0 + 1

            # -- block Lanczos step ------------------------------------
            for b_ in range(p):
                ppad_ref[P: P + rows] = Vk_ref[b_ * rows: (b_ + 1) * rows]
                W_ref[b_ * rows: (b_ + 1) * rows] = _stencil(
                    ppad_ref, pd_ref, shifts, P, rows, T)
            for a_ in range(p):
                va = Vk_ref[a_ * rows: (a_ + 1) * rows]
                for b_ in range(p):
                    om_ref[a_ * p + b_] = jnp.sum(va * wcol(b_))
            m2 = jnp.where(it >= 2, one, zero)
            for b_ in range(p):
                w = wcol(b_)
                for a_ in range(p):
                    # (Vkm1 Ψᴴ)[:,b] = Σₐ Vkm1[:,a]·conj(Ψ[b,a]); real T
                    w = w - m2 * psi_ref[b_ * p + a_] \
                        * Vkm1_ref[a_ * rows: (a_ + 1) * rows]
                    w = w - om_ref[a_ * p + b_] \
                        * Vk_ref[a_ * rows: (a_ + 1) * rows]
                W_ref[b_ * rows: (b_ + 1) * rows] = w

            # -- reflection algebra on SMEM (masked for it = 1, 2) -------
            m3 = jnp.where(it >= 3, one, zero)
            # st2 = Θₖ₋₂ᵀ [0; Ψₖᴴ] → Πₖ₋₂ (top, it≥3), Γbar_mid (bottom)
            for r_ in range(q2):
                for c_ in range(p):
                    s = zero
                    for t_ in range(p):
                        s = s + qt2_ref[r_ * q2 + (p + t_)] \
                            * psi_ref[c_ * p + t_]
                    sm_ref[r_ * p + c_] = s
            for a_ in range(p):
                for b_ in range(p):
                    pi_ref[a_ * p + b_] = m3 * sm_ref[a_ * p + b_]
                    gbar = jnp.where(it >= 3, sm_ref[(p + a_) * p + b_],
                                     psi_ref[b_ * p + a_])
                    stk_ref[a_ * p + b_] = gbar      # reuse stk top as temp
            # st1 = Θₖ₋₁ᵀ [Γbar_mid; Ωₖ] → Γₖ₋₁ (top, it≥2), Λbar (bottom)
            for r_ in range(q2):
                for c_ in range(p):
                    s = zero
                    for t_ in range(p):
                        s = s + qt1_ref[r_ * q2 + t_] * stk_ref[t_ * p + c_]
                        s = s + qt1_ref[r_ * q2 + (p + t_)] \
                            * om_ref[t_ * p + c_]
                    sm_ref[r_ * p + c_] = s
            for a_ in range(p):
                for b_ in range(p):
                    gam_ref[a_ * p + b_] = m2 * sm_ref[a_ * p + b_]
                    lam_ref[a_ * p + b_] = jnp.where(
                        it >= 2, sm_ref[(p + a_) * p + b_],
                        om_ref[a_ * p + b_])

            # -- Vₖ₊₁, Ψₖ₊₁ from CholQR2 of the Lanczos remainder --------
            cholqr2()

            # -- Θₖ: Givens QR of [Λbar; Ψₖ₊₁], Qt = Gₙ···G₁ accumulated --
            for a_ in range(p):
                for b_ in range(p):
                    stk_ref[a_ * p + b_] = lam_ref[a_ * p + b_]
                    stk_ref[(p + a_) * p + b_] = pp_ref[a_ * p + b_]
            for a_ in range(q2):
                for b_ in range(q2):
                    qtn_ref[a_ * q2 + b_] = one if a_ == b_ else zero
            for j_ in range(p):
                for r_ in range(q2 - 1, j_, -1):
                    ch, sh, rr = sym_givens(stk_ref[(r_ - 1) * p + j_],
                                            stk_ref[r_ * p + j_])
                    stk_ref[(r_ - 1) * p + j_] = rr
                    stk_ref[r_ * p + j_] = zero
                    for c_ in range(j_ + 1, p):
                        u = stk_ref[(r_ - 1) * p + c_]
                        v = stk_ref[r_ * p + c_]
                        stk_ref[(r_ - 1) * p + c_] = ch * u + sh * v
                        stk_ref[r_ * p + c_] = sh * u - ch * v
                    for c_ in range(q2):
                        u = qtn_ref[(r_ - 1) * q2 + c_]
                        v = qtn_ref[r_ * q2 + c_]
                        qtn_ref[(r_ - 1) * q2 + c_] = ch * u + sh * v
                        qtn_ref[r_ * q2 + c_] = sh * u - ch * v
            # Λₖ = top p×p of the rotated stack
            for a_ in range(p):
                for b_ in range(p):
                    lam_ref[a_ * p + b_] = stk_ref[a_ * p + b_]

            # -- Zₖ update: [Φₖ; Φbarₖ₊₁] = Qt [Φbarₖ; 0] ----------------
            for r_ in range(q2):
                for c_ in range(p):
                    s = zero
                    for t_ in range(p):
                        s = s + qtn_ref[r_ * q2 + t_] * phib_ref[t_ * p + c_]
                    sm_ref[r_ * p + c_] = s

            # -- wₖ = (Vₖ − wₖ₋₁Γₖ₋₁ − wₖ₋₂Πₖ₋₂) Λₖ⁻¹ (right solve) ------
            for j_ in range(p):
                w = Vk_ref[j_ * rows: (j_ + 1) * rows]
                for a_ in range(p):
                    w = w - gam_ref[a_ * p + j_] \
                        * wm1_ref[a_ * rows: (a_ + 1) * rows]
                    w = w - pi_ref[a_ * p + j_] \
                        * wm2_ref[a_ * rows: (a_ + 1) * rows]
                for t_ in range(j_):
                    w = w - lam_ref[t_ * p + j_] \
                        * wt_ref[t_ * rows: (t_ + 1) * rows]
                dj = lam_ref[j_ * p + j_]
                safe = jnp.where(dj == 0, one, dj)
                wt_ref[j_ * rows: (j_ + 1) * rows] = w / safe

            # -- X += wₖ Φₖ; advance panels and small state ---------------
            for b_ in range(p):
                xb = x_ref[b_ * rows: (b_ + 1) * rows]
                for t_ in range(p):
                    xb = xb + sm_ref[t_ * p + b_] \
                        * wt_ref[t_ * rows: (t_ + 1) * rows]
                x_ref[b_ * rows: (b_ + 1) * rows] = xb
            rsq = zero
            for a_ in range(p):
                for b_ in range(p):
                    phib_ref[a_ * p + b_] = sm_ref[(p + a_) * p + b_]
                    psi_ref[a_ * p + b_] = pp_ref[a_ * p + b_]
                    rsq = rsq + sm_ref[(p + a_) * p + b_] ** 2
            for b_ in range(p):
                Vkm1_ref[b_ * rows: (b_ + 1) * rows] = \
                    Vk_ref[b_ * rows: (b_ + 1) * rows]
                Vk_ref[b_ * rows: (b_ + 1) * rows] = wcol(b_)
                wm2_ref[b_ * rows: (b_ + 1) * rows] = \
                    wm1_ref[b_ * rows: (b_ + 1) * rows]
                wm1_ref[b_ * rows: (b_ + 1) * rows] = \
                    wt_ref[b_ * rows: (b_ + 1) * rows]
            for a_ in range(q2):
                for b_ in range(q2):
                    qt2_ref[a_ * q2 + b_] = qt1_ref[a_ * q2 + b_]
                    qt1_ref[a_ * q2 + b_] = qtn_ref[a_ * q2 + b_]

            rNorm_n = jnp.sqrt(rsq)
            solved = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            status_n = jnp.where(solved, jnp.int32(_SOLVED),
                                 jnp.int32(_RUNNING))
            return (it, rNorm_n, status_n)

        it, rNorm, status = jax.lax.while_loop(
            cond, body, (jnp.int32(0), beta0, status0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    X, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p * rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((p * rows, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((3 * p2,), T),
            pltpu.SMEM((p2,), T),
            pltpu.SMEM((p2,), T),
            pltpu.SMEM((q2 * q2,), T),
            pltpu.SMEM((q2 * q2,), T),
            pltpu.SMEM((q2 * q2,), T),
            pltpu.SMEM((q2 * p,), T),
            pltpu.SMEM((q2 * p,), T),
            pltpu.SMEM((p2,), T),
            pltpu.SMEM((p2,), T),
            pltpu.SMEM((p2,), T),
            pltpu.SMEM((p2,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (7 * p + 4) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, Bw, pdw)
    Xc = X.reshape(p, npad)[:, :n].T
    return Xc, niter[0, 0], rnorm[0, 0], status[0, 0]


def block_minres_dia_fused_supported(offsets, n, p, dtype,
                                     stencil_dtype=None):
    """Static gate: 7 p-column panels + stencil fit VMEM; p small."""
    if jnp.dtype(dtype).kind != "f":
        return False
    if p < 1 or p > 8:
        return False
    return _fused_bytes(offsets, n, dtype, 7 * p + 4,
                        stencil_dtype) < 100 * (1 << 20)


# BiCGSTAB status codes (krylov_tpu/solvers/bicgstab.py)
_BC_BREAKDOWN = 29
_ALPHA_BREAKDOWN = 30


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def bicgstab_dia_fused(pd, offsets, b, atol, rtol, itmax, interpret=None):
    """Full BiCGSTAB solve of A x = b for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of solvers/bicgstab.py:_bicgstab_core on the
    default path (M = N = I, shadow c = b; reference src/bicgstab.jl).
    Two stencil applications per iteration, all vectors VMEM-resident.

    Returns (x, niter, rNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               ppad_ref, r_ref, v_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]

        def _safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]                       # doubles as the shadow c
        x_ref[:] = jnp.zeros((rows, LANES), T)
        r_ref[:] = bv
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = bv          # p = r0 = b

        rnorm0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * rnorm0
        rho0 = jnp.sum(bv * bv)             # ⟨c, r0⟩ with c = b
        status0 = jnp.where(
            rnorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rho0 == 0, jnp.int32(_BC_BREAKDOWN),
                      jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                                jnp.int32(_RUNNING))))

        def cond(carry):
            it, rho, rnorm, status = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it, rho, rnorm, status = carry
            p = ppad_ref[P: P + rows]
            v = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            v_ref[:] = v
            alpha = rho / _safe(jnp.sum(bv * v))
            sv = r_ref[:] - alpha * v
            x_aux = x_ref[:] + alpha * p

            ppad_ref[P: P + rows] = sv
            t = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            omega = jnp.sum(t * sv) / _safe(jnp.sum(t * t))
            x_ref[:] = x_aux + omega * sv
            r_new = sv - omega * t
            r_ref[:] = r_new

            next_rho = jnp.sum(bv * r_new)
            beta = (next_rho / _safe(rho)) * (alpha / _safe(omega))
            ppad_ref[P: P + rows] = r_new + beta * (p - omega * v_ref[:])

            rnorm_n = jnp.sqrt(jnp.sum(r_new * r_new))
            it_n = it + 1
            solved = (rnorm_n <= eps_lim) | ((rnorm_n + 1.0) <= 1.0)
            breakdown = (alpha == 0) | jnp.isnan(alpha)
            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_ALPHA_BREAKDOWN), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)
            return (it_n, next_rho, rnorm_n, code)

        it, rho, rnorm, status = jax.lax.while_loop(
            cond, body, (jnp.int32(0), rho0, rnorm0, status0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rnorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 6 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def bicgstab_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 6 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 6, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def cgs_dia_fused(pd, offsets, b, atol, rtol, itmax, interpret=None):
    """Full CGS solve of A x = b for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of solvers/bicgstab.py:_cgs_core on the
    default path (M = N = I, shadow c = b; reference src/cgs.jl).  Two
    stencil applications per iteration sharing one padded buffer (p,
    then u + q).  Returns (x, niter, rNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               ppad_ref, r_ref, u_ref, pold_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]

        def _safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]                       # doubles as the shadow c
        x_ref[:] = jnp.zeros((rows, LANES), T)
        r_ref[:] = bv
        u_ref[:] = bv
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = bv          # p = u = r0 = b

        rnorm0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * rnorm0
        rho0 = jnp.sum(bv * bv)             # ⟨c, r0⟩ with c = b
        status0 = jnp.where(
            rnorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rho0 == 0, jnp.int32(_BC_BREAKDOWN),
                      jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                                jnp.int32(_RUNNING))))

        def cond(carry):
            it, rho, rnorm, status = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it, rho, rnorm, status = carry
            pold_ref[:] = ppad_ref[P: P + rows]
            t = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            alpha = rho / _safe(jnp.sum(bv * t))
            uv = u_ref[:]
            q = uv - alpha * t
            u_half = uv + q
            x_ref[:] = x_ref[:] + alpha * u_half

            ppad_ref[P: P + rows] = u_half
            sv = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            r_new = r_ref[:] - alpha * sv
            r_ref[:] = r_new

            rho_next = jnp.sum(bv * r_new)
            beta = rho_next / _safe(rho)
            u_new = r_new + beta * q
            u_ref[:] = u_new
            ppad_ref[P: P + rows] = u_new + beta * (q + beta * pold_ref[:])

            rnorm_n = jnp.sqrt(jnp.sum(r_new * r_new))
            it_n = it + 1
            solved = (rnorm_n <= eps_lim) | ((rnorm_n + 1.0) <= 1.0)
            breakdown = (alpha == 0) | jnp.isnan(alpha)
            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_ALPHA_BREAKDOWN), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)
            return (it_n, rho_next, rnorm_n, code)

        it, rho, rnorm, status = jax.lax.while_loop(
            cond, body, (jnp.int32(0), rho0, rnorm0, status0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rnorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 7 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def cgs_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 7 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 7, stencil_dtype) < 100 * (1 << 20)


# normal-equation family status codes (krylov_tpu/solvers/cgne.py, cgls.py)
_INCONS_CGNE = 32
_INCONS_CRMR = 33


def _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax, scal):
    """Shared host-side packing for the normal-equation fused kernels."""
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(tuple(offsets) + tuple(offsets_adj), n)
    npad = rows * LANES
    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    pdaw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd_adj).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)
    shifts_a = tuple((int(k) // LANES, int(k) % LANES) for k in offsets_adj)
    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray(scal, T).reshape(len(scal), 1)
    return (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a,
            itmax_s, scal_s)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def cgls_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol, rtol,
                   itmax, interpret=None):
    """Full CGLS solve of min ‖b − Ax‖ (+λ) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of solvers/cgls.py:_cgls_core on the default
    path (M = I, radius = 0; reference src/cgls.jl).  One A and one Aᴴ
    stencil application per iteration; p and r live in the two padded
    buffers.  Returns (x, niter, rNorm, ArNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, arnorm_ref, status_ref,
               ppad_ref, rpad_ref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        cap = itmax_ref[0, 0]

        def _safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        rpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        rpad_ref[P: P + rows] = bv
        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        sv0 = _stencil(rpad_ref, pda_ref, shifts_a, P, rows, T)
        gamma0 = jnp.sum(sv0 * sv0)
        ArNorm0 = jnp.sqrt(gamma0)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = sv0
        eps_lim = atol_v + rtol_v * ArNorm0
        status0 = jnp.where(
            bNorm == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(ArNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            return (c[4] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, gamma, rNorm, ArNorm, status = c
            pv = ppad_ref[P: P + rows]
            q = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
            delta = jnp.sum(q * q) + jnp.where(
                lam_v > 0, lam_v * jnp.sum(pv * pv), 0)
            alpha = gamma / _safe(delta)
            xv = x_ref[:] + alpha * pv
            x_ref[:] = xv
            rv = rpad_ref[P: P + rows] - alpha * q
            rpad_ref[P: P + rows] = rv
            sv = _stencil(rpad_ref, pda_ref, shifts_a, P, rows, T) \
                - jnp.where(lam_v > 0, lam_v, 0) * xv
            gamma_n = jnp.sum(sv * sv)
            beta = gamma_n / _safe(gamma)
            ppad_ref[P: P + rows] = sv + beta * pv
            rNorm_n = jnp.sqrt(jnp.sum(rv * rv))
            ArNorm_n = jnp.sqrt(gamma_n)
            it = it0 + 1
            solved = ArNorm_n <= eps_lim
            code = jnp.where(solved, jnp.int32(_SOLVED),
                             jnp.int32(_RUNNING))
            return (it, gamma_n, rNorm_n, ArNorm_n, code)

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), gamma0, bNorm, ArNorm0, status0))
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[2]
        arnorm_ref[0, 0] = out[3]
        status_ref[0, 0] = out[4]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, arnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 6 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], arnorm[0, 0],
            status[0, 0])


def cgls_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 6 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 6, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def crls_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol, rtol,
                   itmax, interpret=None):
    """Full CRLS solve of min ‖b − Ax‖ (+λ) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of solvers/cgls.py:_crls_core on the default
    path (M = I, radius = 0; reference src/crls.jl).  One A and one Aᴴ
    stencil application per iteration (on Ar and Ap respectively).
    Returns (x, niter, rNorm, ArNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, arnorm_ref, status_ref,
               arpad_ref, appad_ref, r_ref, p_ref, q_ref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        cap = itmax_ref[0, 0]

        def _safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        r_ref[:] = bv
        rNorm0 = jnp.sqrt(jnp.sum(bv * bv))
        arpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        arpad_ref[P: P + rows] = bv            # temp: r for the adjoint
        Ar0 = _stencil(arpad_ref, pda_ref, shifts_a, P, rows, T)
        arpad_ref[P: P + rows] = Ar0
        sv0 = _stencil(arpad_ref, pd_ref, shifts, P, rows, T)   # A·Ar
        p_ref[:] = Ar0
        appad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        appad_ref[P: P + rows] = sv0           # Ap = A·Ar
        q0 = _stencil(appad_ref, pda_ref, shifts_a, P, rows, T)
        ArNorm0 = jnp.sqrt(jnp.sum(Ar0 * Ar0))
        q0 = q0 + jnp.where(lam_v > 0, lam_v, 0) * p_ref[:]
        q_ref[:] = q0
        gamma0 = jnp.sum(sv0 * sv0) + jnp.where(
            lam_v > 0, lam_v * ArNorm0 * ArNorm0, 0)
        eps_lim = atol_v + rtol_v * ArNorm0
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(ArNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            return (c[4] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, gamma, rNorm, ArNorm, status = c
            qv = q_ref[:]
            alpha = gamma / _safe(jnp.sum(qv * qv))
            pv = p_ref[:]
            xv = x_ref[:] + alpha * pv
            x_ref[:] = xv
            Ar = arpad_ref[P: P + rows] - alpha * qv
            arpad_ref[P: P + rows] = Ar
            ArNorm_n = jnp.sqrt(jnp.sum(Ar * Ar))
            Apv = appad_ref[P: P + rows]
            rv = r_ref[:] - alpha * Apv
            r_ref[:] = rv
            sv = _stencil(arpad_ref, pd_ref, shifts, P, rows, T)  # A·Ar
            gamma_n = jnp.sum(sv * sv) + jnp.where(
                lam_v > 0, lam_v * ArNorm_n * ArNorm_n, 0)
            beta = gamma_n / _safe(gamma)
            p_new = Ar + beta * pv
            p_ref[:] = p_new
            Ap_new = sv + beta * Apv
            appad_ref[P: P + rows] = Ap_new
            q_new = _stencil(appad_ref, pda_ref, shifts_a, P, rows, T) \
                + jnp.where(lam_v > 0, lam_v, 0) * p_new
            q_ref[:] = q_new
            rNorm_n = jnp.where(
                lam_v > 0,
                jnp.sqrt(jnp.sum(rv * rv) + lam_v * jnp.sum(xv * xv)),
                jnp.sqrt(jnp.sum(rv * rv)))
            it = it0 + 1
            solved = ArNorm_n <= eps_lim
            code = jnp.where(solved, jnp.int32(_SOLVED),
                             jnp.int32(_RUNNING))
            return (it, gamma_n, rNorm_n, ArNorm_n, code)

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), gamma0, rNorm0, ArNorm0, status0))
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[2]
        arnorm_ref[0, 0] = out[3]
        status_ref[0, 0] = out[4]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, arnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 9 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], arnorm[0, 0],
            status[0, 0])


def crls_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 9 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 9, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "variant",
                                   "interpret"))
def cgne_crmr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol,
                        rtol, itmax, variant="cgne", interpret=None):
    """Full CGNE or CRMR solve (minimum-norm) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of solvers/cgne.py:_cgne_like_core on the
    default path (N = I; reference src/cgne.jl, src/crmr.jl), including
    the "probably inconsistent" detection.  Returns
    (x, niter, rNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cgne = variant == "cgne"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol])
    incons_code = _INCONS_CGNE if cgne else _INCONS_CRMR

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               ppad_ref, rpad_ref, s_vref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        cap = itmax_ref[0, 0]

        def _safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        rpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        rpad_ref[P: P + rows] = bv
        s_vref[:] = bv
        rNorm0 = jnp.sqrt(jnp.sum(bv * bv))
        p0 = _stencil(rpad_ref, pda_ref, shifts_a, P, rows, T)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = p0
        if cgne:
            gamma0 = rNorm0 * rNorm0
            indNorm0 = jnp.sqrt(jnp.sum(p0 * p0))
        else:
            gamma0 = jnp.sum(p0 * p0) + jnp.where(
                lam_v > 0, lam_v * rNorm0 * rNorm0, 0)
            indNorm0 = jnp.sqrt(gamma0)
        eps_c = atol_v + rtol_v * rNorm0
        eps_i = atol_v + rtol_v * indNorm0
        incons0 = (rNorm0 > 100 * eps_c) & (indNorm0 <= eps_i)
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rNorm0 <= eps_c, jnp.int32(_SOLVED),
                      jnp.where(incons0, jnp.int32(incons_code),
                                jnp.int32(_RUNNING))))

        def cond(c):
            return (c[2] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, gamma, status, rNorm = c
            pv = ppad_ref[P: P + rows]
            q = _stencil(ppad_ref, pd_ref, shifts, P, rows, T) \
                + jnp.where(lam_v > 0, lam_v, 0) * s_vref[:]
            if cgne:
                delta = jnp.sum(pv * pv) + jnp.where(
                    lam_v > 0, lam_v * jnp.sum(s_vref[:] * s_vref[:]), 0)
                alpha = gamma / _safe(delta)
                x_ref[:] = x_ref[:] + alpha * pv
                rv = rpad_ref[P: P + rows] - alpha * q
                rpad_ref[P: P + rows] = rv
                gamma_n = jnp.sum(rv * rv)
                beta = gamma_n / _safe(gamma)
                Ahz = _stencil(rpad_ref, pda_ref, shifts_a, P, rows, T)
                p_new = Ahz + beta * pv
                indNorm = jnp.sqrt(jnp.sum(p_new * p_new))
                rNorm_n = jnp.sqrt(jnp.maximum(gamma_n, 0))
            else:
                alpha = gamma / _safe(jnp.sum(q * q))
                x_ref[:] = x_ref[:] + alpha * pv
                rv = rpad_ref[P: P + rows] - alpha * q
                rpad_ref[P: P + rows] = rv
                rNorm_n = jnp.sqrt(jnp.sum(rv * rv))
                Ahr = _stencil(rpad_ref, pda_ref, shifts_a, P, rows, T)
                gamma_n = jnp.sum(Ahr * Ahr) + jnp.where(
                    lam_v > 0, lam_v * rNorm_n * rNorm_n, 0)
                beta = gamma_n / _safe(gamma)
                p_new = Ahr + beta * pv
                indNorm = jnp.sqrt(jnp.maximum(gamma_n, 0))
            ppad_ref[P: P + rows] = p_new
            s_vref[:] = rv + beta * s_vref[:]
            it = it0 + 1
            solved = (rNorm_n <= eps_c) | ((rNorm_n + 1.0) <= 1.0)
            incons = (rNorm_n > 100 * eps_c) & (indNorm <= eps_i)
            code = jnp.int32(_RUNNING)
            code = jnp.where(incons, jnp.int32(incons_code), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)
            return (it, gamma_n, code, rNorm_n)

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), gamma0, status0, rNorm0))
        niter_ref[0, 0] = out[0]
        status_ref[0, 0] = out[2]
        rnorm_ref[0, 0] = out[3]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 3,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + 7 * vec_bytes) * 1.2) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def cgne_crmr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 7 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 7, stencil_dtype) < 100 * (1 << 20)


# SYMMLQ-specific status codes (krylov_tpu/solvers/symmlq.py)
_SOLVED_GEN_SYMMLQ = 34
_SOLVED_LQ_SYMMLQ = 35
_SOLVED_CG_SYMMLQ = 36


@partial(jax.jit, static_argnames=("offsets", "transfer_to_cg", "interpret"))
def symmlq_dia_fused(pd, offsets, b, atol, rtol, ctol, lam, itmax,
                     transfer_to_cg=True, interpret=None):
    """Full SYMMLQ solve of (A + λI) x = b for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/symmlq.py:_symmlq_core
    on the default path (M = I, λest = 0; reference src/symmlq.jl): the
    unnormalized Lanczos stream, LQ Givens chain, CG-point transfer test
    and conlim / machine-precision stops.  Returns (x, niter, rNorm,
    status_code, anorm2, gmax, gmin) — status codes follow
    krylov_tpu._runtime plus the SYMMLQ-specific 34/35/36.
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    tiny = float(jnp.finfo(T).tiny)
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol, ctol, lam], T).reshape(4, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, out_ref, status_ref,
               vpad_ref, vold_ref, wbar_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        ctol_v = s_ref[2, 0]
        lam_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        beta1 = jnp.sqrt(jnp.sum(bv * bv))
        tol = atol_v + rtol_v * beta1

        vold = bv / safe(beta1)
        vold_ref[:] = vold
        wbar_ref[:] = vold
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = vold
        y = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) + lam_v * vold
        alpha = jnp.sum(vold * y)
        y = y - alpha * vold
        beta = jnp.sqrt(jnp.sum(y * y))
        vpad_ref[P: P + rows] = y / safe(beta)

        gbar0 = alpha
        eta0 = beta1
        zetabar0 = eta0 / safe(gbar0)
        rcg0 = beta1 * jnp.abs(zetabar0)
        solved_lq0 = beta1 <= tol
        solved_cg0 = ((gbar0 != 0) & transfer_to_cg
                      & (rcg0 <= tol)) if transfer_to_cg else (beta1 < -1)
        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(solved_lq0, jnp.int32(_SOLVED_LQ_SYMMLQ),
                      jnp.where(solved_cg0, jnp.int32(_SOLVED_CG_SYMMLQ),
                                jnp.int32(_RUNNING))))

        carry0 = (jnp.int32(0), beta, gbar0, beta, zero, jnp.ones((), T),
                  eta0, zero, zetabar0,
                  alpha * alpha + beta * beta,
                  jnp.asarray(-jnp.inf, T), jnp.asarray(jnp.inf, T),
                  zero, beta1, rcg0,
                  solved_cg0.astype(jnp.int32), status0)
        # (it, beta, gbar, dbar, eps_old, cold, eta, zold, zetabar,
        #  anorm2, gmax, gmin, xnorm2, rNorm, rcgNorm, cgflag, status)

        def cond(c):
            return (c[16] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, beta, gbar, dbar, eps_old, cold, eta, zold, zetabar,
             anorm2, gmax, gmin, xnorm2, rNorm, rcgNorm, cgflag,
             status) = c
            it = it0 + 1

            cs, sn, gamma = sym_givens(gbar, beta)
            zeta = eta / safe(gamma)
            v = vpad_ref[P: P + rows]
            x_ref[:] = x_ref[:] + (cs * zeta) * wbar_ref[:] \
                + (sn * zeta) * v
            wbar_ref[:] = sn * wbar_ref[:] - cs * v

            y = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) + lam_v * v
            alpha = jnp.sum(v * y)
            y = y - beta * vold_ref[:] - alpha * v
            vold_ref[:] = v
            beta_n = jnp.sqrt(jnp.sum(y * y))
            vpad_ref[P: P + rows] = y / safe(beta_n)

            anorm2_n = anorm2 + alpha * alpha + beta * beta \
                + beta_n * beta_n

            delta = dbar * cs + alpha * sn
            gbar_n = dbar * sn - alpha * cs
            eps_new = beta_n * sn
            dbar_n = -beta_n * cs
            eta_n = -eps_old * zold - delta * zeta

            rNorm_n = jnp.sqrt(gamma * gamma * zeta * zeta
                               + eps_old * eps_old * zold * zold)
            xnorm2_n = xnorm2 + zeta * zeta

            gbar_nz = gbar_n != 0
            zetabar_n = jnp.where(gbar_nz, eta_n / safe(gbar_n), zetabar)
            rcg_n = jnp.where(
                gbar_nz, beta_n * jnp.abs(sn * zeta - cs * zetabar_n),
                rcgNorm)

            gmax_n = jnp.maximum(gmax, gamma)
            gmin_n = jnp.minimum(gmin, gamma)
            acond = gmax_n / jnp.maximum(gmin_n, tiny)
            anorm = jnp.sqrt(anorm2_n)
            test1 = rNorm_n / jnp.maximum(anorm * jnp.sqrt(xnorm2_n), tiny)

            resid_decrease_mach = (1.0 + rNorm_n) <= 1.0
            ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
            zero_resid_mach = (1.0 + test1) <= 1.0
            ill_cond_lim = (1.0 / jnp.maximum(acond, tiny)) <= ctol_v
            zero_resid_lim = test1 <= tol
            solved_lq = rNorm_n <= tol
            solved_cg = (gbar_nz & (rcg_n <= tol)) if transfer_to_cg \
                else (rNorm_n < -1)
            zero_resid = solved_lq | solved_cg
            solved = (resid_decrease_mach | zero_resid | zero_resid_mach
                      | zero_resid_lim)

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_GEN_SYMMLQ), code)
            code = jnp.where(solved & solved_lq,
                             jnp.int32(_SOLVED_LQ_SYMMLQ), code)
            code = jnp.where(solved & solved_cg,
                             jnp.int32(_SOLVED_CG_SYMMLQ), code)

            return (it, beta_n, gbar_n, dbar_n, eps_new, cs, eta_n, zeta,
                    zetabar_n, anorm2_n, gmax_n, gmin_n, xnorm2_n,
                    rNorm_n, rcg_n, solved_cg.astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        # CG-point transfer when the CG test triggered the stop
        # (reference src/symmlq.jl:437-440).
        @pl.when(out[15] == 1)
        def _():
            x_ref[:] = x_ref[:] + out[8] * wbar_ref[:]

        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[13]
        out_ref[1, 0] = out[9]
        out_ref[2, 0] = out[10]
        out_ref[3, 0] = out[11]
        status_ref[0, 0] = out[16]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, scal_out, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((4, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * pd_bytes + 6 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], scal_out[0, 0], status[0, 0],
            scal_out[1, 0], scal_out[2, 0], scal_out[3, 0])


def symmlq_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 6 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 6, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def minres_qlp_dia_fused(pd, offsets, b, atol, rtol, artol, lam, itmax,
                         interpret=None):
    """Full MINRES-QLP solve of (A + λI) x = b for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/minres_qlp.py:_minres_qlp_core on the default path
    (M = I, linesearch = False; reference src/minres_qlp.jl): Lanczos
    stream, QR+LQ (QLP) factorization with the iter==1/2/≥3 register
    selects, Artol inconsistency test, μmin/μmax condition estimates and
    the in-kernel final x correction.  Returns
    (x, niter, rNorm, ArNorm, status_code, inconsistent).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    eps_T = float(jnp.finfo(T).eps)
    btol = eps_T ** 0.75
    tiny = float(jnp.finfo(T).tiny)
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol, artol, lam], T).reshape(4, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, out_ref, status_ref, incon_ref,
               vpad_ref, vkm1_ref, wkm1_ref, wk_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        artol_v = s_ref[2, 0]
        lam_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        vkm1_ref[:] = jnp.zeros((rows, LANES), T)
        wkm1_ref[:] = jnp.zeros((rows, LANES), T)
        wk_ref[:] = jnp.zeros((rows, LANES), T)
        beta1 = jnp.sqrt(jnp.sum(bv * bv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(beta1)
        eps_lim = atol_v + rtol_v * beta1
        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta1 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), beta1, beta1, zero, zero, zero, zero,
                  zero, zero, zero, one, one, zero, zero,
                  zero, zero, zero, beta1, zero, zero,
                  jnp.int32(0), status0)
        # (it, beta_k, zetabar, xi_km1, tau_km2, tau_km1, tau_k,
        #  psibar_km2, mubis_km2, mubar_km1, c_km2, c_km1, s_km2, s_km1,
        #  mumin, mumax, anorm2, rNorm, ArNorm, kappa, incon, status)

        def cond(c):
            return (c[21] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, beta_k, zetabar, xi_km1, tau_km2, tau_km1, tau_k,
             psibar_km2, mubis_km2, mubar_km1, c_km2, c_km1, s_km2,
             s_km1, mumin, mumax, anorm2, rNorm, ArNorm, kappa,
             incon, status) = c
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2
            ge3 = it >= 3

            vk = vpad_ref[P: P + rows]
            p = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) + lam_v * vk
            p = p - jnp.where(ge2, beta_k, zero) * vkm1_ref[:]
            alpha = jnp.sum(vk * p)
            p = p - alpha * vk
            beta_kp1 = jnp.sqrt(jnp.sum(p * p))
            norm_ok = beta_kp1 > btol
            vkp1 = jnp.where(norm_ok, p / safe(beta_kp1), p)
            anorm2_n = anorm2 + alpha * alpha + beta_k * beta_k \
                + beta_kp1 * beta_kp1

            eps_km2 = jnp.where(ge3, s_km2 * beta_k, zero)
            gbar_km1 = jnp.where(ge3, -c_km2 * beta_k,
                                 jnp.where(is2, beta_k, zero))
            g_km1 = c_km1 * gbar_km1 + s_km1 * alpha
            lbar_k = jnp.where(is1, alpha,
                               s_km1 * gbar_km1 - c_km1 * alpha)

            ck, sk, l_k = sym_givens(lbar_k, beta_kp1)
            zeta = ck * zetabar
            zetabar_next = sk * zetabar

            cp2, sp2, mubis2 = sym_givens(mubar_km1, g_km1)
            cp3, sp3, mu_km2 = sym_givens(mubis_km2, eps_km2)
            psi_km2 = cp3 * psibar_km2 + sp3 * g_km1
            theta_k = sp3 * psibar_km2 - cp3 * g_km1
            rho_km2 = sp3 * l_k
            eta_k = -cp3 * l_k
            cd, sd, mubis3 = sym_givens(mubar_km1, theta_k)
            psibar3 = sd * eta_k
            mubar3 = -cd * eta_k

            mubar_k = jnp.where(is1, l_k,
                                jnp.where(is2, -cp2 * l_k, mubar3))
            psibar_km1 = jnp.where(is2, sp2 * l_k,
                                   jnp.where(ge3, psibar3, zero))
            mubis_km1 = jnp.where(is2, mubis2,
                                  jnp.where(ge3, mubis3, zero))
            cp = jnp.where(is2, cp2, cp3)
            sp = jnp.where(is2, sp2, sp3)

            tau_km2_new = jnp.where(
                ge3, tau_km1 * mubis_km2 / safe(mu_km2), tau_km2)
            tau_km1_new = jnp.where(
                is2, tau_k * mubar_km1 / safe(mubis2),
                jnp.where(ge3,
                          (xi_km1 - psi_km2 * tau_km2_new) / safe(mubis3),
                          tau_km1))
            xi_k = jnp.where(ge3, zeta - rho_km2 * tau_km2_new, zeta)
            tau_k_new = jnp.where(
                is1, zeta / safe(mubar_k),
                (xi_k - psibar_km1 * tau_km1_new) / safe(mubar_k))

            wkm1_old = wkm1_ref[:]
            wk_old = wk_ref[:]
            waux = sp * wkm1_old - cp * vk
            wkm1_new = jnp.where(
                is1, wkm1_old,
                jnp.where(is2, cp * wk_old + sp * vk,
                          cd * wk_old + sd * waux))
            wk_new = jnp.where(
                is1, vk,
                jnp.where(is2, sp * wk_old - cp * vk,
                          sd * wk_old - cd * waux))
            x_add = jnp.where(ge3, tau_km2_new, zero)
            x_ref[:] = x_ref[:] + (x_add * cp) * wkm1_old \
                + (x_add * sp) * vk
            wkm1_ref[:] = wkm1_new
            wk_ref[:] = wk_new
            vkm1_ref[:] = vk
            vpad_ref[P: P + rows] = vkp1

            rNorm_n = jnp.abs(zetabar_next)
            ArNorm_n = jnp.abs(zetabar) * jnp.sqrt(
                lbar_k * lbar_k + (c_km1 * beta_kp1) ** 2)
            kappa_n = jnp.where(is1, atol_v + artol_v * ArNorm_n, kappa)

            abs_mubar = jnp.abs(mubar_k)
            mumin_n = jnp.where(
                is1, abs_mubar,
                jnp.where(is2,
                          jnp.minimum(mumin,
                                      jnp.minimum(mubis_km1, abs_mubar)),
                          jnp.minimum(mumin,
                                      jnp.minimum(mu_km2,
                                                  jnp.minimum(mubis_km1,
                                                              abs_mubar)))))
            mumax_n = jnp.where(
                is1, abs_mubar,
                jnp.where(is2,
                          jnp.maximum(mumax,
                                      jnp.maximum(mubis_km1, abs_mubar)),
                          jnp.maximum(mumax,
                                      jnp.maximum(mu_km2,
                                                  jnp.maximum(mubis_km1,
                                                              abs_mubar)))))
            acond = mumax_n / jnp.maximum(mumin_n, tiny)
            anorm = jnp.sqrt(anorm2_n)
            xv = x_ref[:]
            xnorm = jnp.sqrt(jnp.sum(xv * xv))
            backward = rNorm_n / jnp.maximum(anorm * xnorm, tiny)

            ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
            resid_decrease_mach = (1.0 + rNorm_n) <= 1.0
            zero_resid_mach = (1.0 + backward) <= 1.0
            resid_decrease_lim = rNorm_n <= eps_lim
            zero_resid_lim = backward <= eps_T          # MisI path
            breakdown = beta_kp1 <= btol
            zero_resid = zero_resid_mach | zero_resid_lim
            solved = (resid_decrease_mach | resid_decrease_lim
                      | zero_resid)
            incon_b = ((ArNorm_n <= kappa_n) & (abs_mubar <= artol_v)) \
                | (breakdown & ~solved)

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(incon_b, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(zero_resid, jnp.int32(_SOLVED_ZERO), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            return (it, beta_kp1, zetabar_next, xi_k, tau_km2_new,
                    tau_km1_new, tau_k_new,
                    jnp.where(ge2, psibar_km1, psibar_km2),
                    jnp.where(ge2, mubis_km1, mubis_km2),
                    mubar_k,
                    jnp.where(ge2, c_km1, c_km2),
                    ck,
                    jnp.where(ge2, s_km1, s_km2),
                    sk,
                    mumin_n, mumax_n, anorm2_n, rNorm_n, ArNorm_n,
                    kappa_n, incon_b.astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        nit, tau_km1_f, tau_k_f, incon_f = out[0], out[5], out[6], out[20]
        # Final x correction (reference src/minres_qlp.jl:509-515).
        add1 = jnp.where(nit >= 2, tau_km1_f, jnp.zeros((), T))
        add2 = jnp.where(incon_f == 0, tau_k_f, jnp.zeros((), T))
        @pl.when(nit >= 1)
        def _():
            x_ref[:] = x_ref[:] + add1 * wkm1_ref[:] + add2 * wk_ref[:]

        niter_ref[0, 0] = nit
        out_ref[0, 0] = out[17]
        out_ref[1, 0] = out[18]
        status_ref[0, 0] = out[21]
        incon_ref[0, 0] = incon_f

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, scal_out, status, incon = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * pd_bytes + 7 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], scal_out[0, 0], status[0, 0],
            incon[0, 0], scal_out[1, 0])


def minres_qlp_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 7 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 7, stencil_dtype) < 100 * (1 << 20)


_BREAKDOWN = 7
_SOLVED_ARTOL = 37   # krylov_tpu/solvers/minares.py


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def minares_dia_fused(pd, offsets, b, atol, rtol, artol, lam, itmax,
                      interpret=None):
    """Full MINARES solve of (A + λI) x = b for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/minares.py:_minares_core
    (reference src/minares.jl): the QR-within-QR reflection cascade, W/D
    direction recurrences, π/τ residual estimates and the ℓ breakdown
    bookkeeping, with every iter==1/2/≥3 branch a scalar where-select.
    The unified direction formulas w = (v − γw₁ − εw₂)/ℓ and
    d = (w − φd₁ − ρd₂)/μ are bit-identical to the core's selects because
    the gating scalars and buffers are zero before they activate.
    Returns (x, niter, rNorm, ArNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    btol = float(jnp.finfo(T).eps) ** 0.75
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shiftsT = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol, artol, lam], T).reshape(4, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, out_ref, status_ref,
               vpad_ref, vk_ref, wkm2_ref, wkm1_ref, dkm2_ref, dkm1_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        artol_v = s_ref[2, 0]
        lam_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        wkm2_ref[:] = jnp.zeros((rows, LANES), T)
        wkm1_ref[:] = jnp.zeros((rows, LANES), T)
        dkm2_ref[:] = jnp.zeros((rows, LANES), T)
        dkm1_ref[:] = jnp.zeros((rows, LANES), T)

        beta1 = jnp.sqrt(jnp.sum(bv * bv))
        vk = bv / safe(beta1)
        vk_ref[:] = vk
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = vk
        q = _stencil(vpad_ref, pd_ref, shiftsT, P, rows, T) + lam_v * vk
        alpha1 = jnp.sum(vk * q)
        q = q - alpha1 * vk
        beta2 = jnp.sqrt(jnp.sum(q * q))
        vpad_ref[P: P + rows] = jnp.where(beta2 != 0, q / safe(beta2), q)

        b1a1 = beta1 * alpha1
        b1b2 = beta1 * beta2
        ArNorm0 = jnp.sqrt(b1a1 * b1a1 + b1b2 * b1b2)
        eps_lim = atol_v + rtol_v * beta1
        kappa = atol_v + artol_v * ArNorm0
        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where((beta1 <= eps_lim) | (ArNorm0 <= kappa),
                      jnp.int32(_SOLVED_ARTOL), jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), alpha1, beta1, beta2,
                  zero, zero, zero, zero, zero, zero,
                  zero, zero, zero, zero, zero, zero,
                  zero, zero, zero, b1a1, b1b2,
                  zero, zero, zero, zero, zero, zero,
                  cap + jnp.int32(2),
                  beta1, ArNorm0, status0)
        # (it, alpha_k, beta_k, beta_kp1, gamma_km1, lambdabar_k,
        #  gammabar_k, eps_km2, eps_km1, xi_km1, tau_km2, tau_km1, tau_k,
        #  thetabar_km2, psibis_km2, psibar_km1, pi_km2, pi_km1, chibar_k,
        #  zetabis_k, zetabar_kp1, ct4, st4, ct3, st3, ct2, st2, ell,
        #  rNorm, ArNorm, status)

        def cond(c):
            return (c[30] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, alpha_k, beta_k, beta_kp1, gamma_km1, lambdabar_k0,
             gammabar_k0, eps_km2, eps_km1, xi_km1, tau_km2, tau_km1,
             tau_k, thetabar_km2, psibis_km2, psibar_km1, pi_km2, pi_km1,
             chibar_k0, zetabis_k, zetabar_kp1, ct4, st4, ct3, st3, ct2,
             st2, ell0, rNorm0, ArNorm0_, status) = c
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2
            ge3 = it >= 3

            lambdabar_k = jnp.where(is1, alpha_k, lambdabar_k0)
            gammabar_k = jnp.where(is1, beta_kp1, gammabar_k0)
            chibar_k = jnp.where(is1, beta_k, chibar_k0)

            ck, sk, l_k = sym_givens(lambdabar_k, beta_kp1)

            vk = vk_ref[:]
            w_k = (vk - gamma_km1 * wkm1_ref[:]
                   - eps_km2 * wkm2_ref[:]) / safe(l_k)

            # Continue the Lanczos process (when it ≤ ℓ-1).
            lan_ok = it <= ell0 - 1
            vkp1 = vpad_ref[P: P + rows]
            q = _stencil(vpad_ref, pd_ref, shiftsT, P, rows, T) \
                + lam_v * vkp1 - beta_kp1 * vk
            alpha_kp1 = jnp.sum(q * vkp1)
            q = q - alpha_kp1 * vkp1
            beta_kp2 = jnp.sqrt(jnp.sum(q * q))
            brk = beta_kp2 <= btol
            ell = jnp.where(lan_ok & brk, it + 1, ell0)
            v_next = jnp.where(lan_ok & ~brk, q / safe(beta_kp2), q)
            alpha_kp1 = jnp.where(lan_ok, alpha_kp1, alpha_k)
            beta_kp2 = jnp.where(lan_ok, beta_kp2, zero)

            two_ok = it <= ell - 2
            one_ok = it <= ell - 1
            eps_k = jnp.where(two_ok, sk * beta_kp2, zero)
            gammabar_kp1 = jnp.where(two_ok, -ck * beta_kp2, zero)
            gamma_k = jnp.where(one_ok, ck * gammabar_k + sk * alpha_kp1,
                                zero)
            lambdabar_kp1 = jnp.where(one_ok,
                                      sk * gammabar_k - ck * alpha_kp1,
                                      zero)

            rho_km2 = jnp.where(ge3, st4 * l_k, zero)
            lhat_k = jnp.where(ge3, -ct4 * l_k, jnp.where(is2, l_k, zero))
            phibar_km1 = jnp.where(ge2, st3 * lhat_k, zero)
            mubar_k = jnp.where(ge2, -ct3 * lhat_k, l_k)
            phi_km1 = jnp.where(
                ge2,
                jnp.where(one_ok, ct2 * phibar_km1 + st2 * gamma_k,
                          phibar_km1),
                zero)
            ghat_k = jnp.where(ge2,
                               jnp.where(one_ok,
                                         st2 * phibar_km1 - ct2 * gamma_k,
                                         zero),
                               gamma_k)

            ct1n, st1n, mubis_k_g = sym_givens(mubar_k, ghat_k)
            ct1 = jnp.where(one_ok, ct1n, one)
            st1 = jnp.where(one_ok, st1n, zero)
            mubis_k = jnp.where(one_ok, mubis_k_g, mubar_k)

            ct0n, st0n, mu_k_g = sym_givens(mubis_k, eps_k)
            ct0 = jnp.where(two_ok, ct0n, one)
            st0 = jnp.where(two_ok, st0n, zero)
            mu_k = jnp.where(two_ok, mu_k_g, mubis_k)

            zring_k = jnp.where(one_ok,
                                ct1 * zetabis_k + st1 * zetabar_kp1,
                                zetabis_k)
            zetabis_kp1 = jnp.where(one_ok,
                                    st1 * zetabis_k - ct1 * zetabar_kp1,
                                    zero)
            zeta_k = jnp.where(two_ok, ct0 * zring_k, zring_k)
            zetabar_kp2 = jnp.where(two_ok, st0 * zring_k, zero)

            d_k = (w_k - phi_km1 * dkm1_ref[:]
                   - rho_km2 * dkm2_ref[:]) / safe(mu_k)
            x_ref[:] = x_ref[:] + zeta_k * d_k

            ArNorm = jnp.where(
                two_ok, jnp.sqrt(zetabis_kp1 ** 2 + zetabar_kp2 ** 2),
                jnp.where(it == ell - 1, jnp.abs(zetabis_kp1), zero))

            chm3_2, shm3_2, psibis2 = sym_givens(psibar_km1, phi_km1)
            chm4, shm4, psi_km2 = sym_givens(psibis_km2, rho_km2)
            theta_km2 = chm4 * thetabar_km2 + shm4 * phi_km1
            delta_k = shm4 * thetabar_km2 - chm4 * phi_km1
            omega_km2 = shm4 * mu_k
            eta_k = -chm4 * mu_k
            chm3_3, shm3_3, psibis3 = sym_givens(psibar_km1, delta_k)

            psibar_k = jnp.where(is1, mu_k,
                                 jnp.where(is2, -chm3_2 * mu_k,
                                           -chm3_3 * eta_k))
            thetabar_km1 = jnp.where(is2, shm3_2 * mu_k,
                                     jnp.where(ge3, shm3_3 * eta_k, zero))
            psibis_km1 = jnp.where(is2, psibis2,
                                   jnp.where(ge3, psibis3, zero))

            tau_km2_new = jnp.where(ge3,
                                    tau_km1 * psibis_km2 / safe(psi_km2),
                                    tau_km2)
            tau_km1_new = jnp.where(
                is2, tau_k * psibar_km1 / safe(psibis2),
                jnp.where(ge3,
                          (xi_km1 - theta_km2 * tau_km2_new)
                          / safe(psibis3),
                          tau_km1))
            xi_k = jnp.where(ge3, zeta_k - omega_km2 * tau_km2_new, zeta_k)
            tau_k_new = jnp.where(
                is1, zeta_k / safe(psibar_k),
                (xi_k - thetabar_km1 * tau_km1_new) / safe(psibar_k))

            chi_k = ck * chibar_k
            chibar_kp1 = sk * chibar_k

            pi2_km1 = chm3_2 * pi_km1 + shm3_2 * chi_k
            pi2_k = shm3_2 * pi_km1 - chm3_2 * chi_k
            pi3a_km2 = chm4 * pi_km2 + shm4 * chi_k
            pi3a_k = shm4 * pi_km2 - chm4 * chi_k
            pi3_km1 = chm3_3 * pi_km1 + shm3_3 * pi3a_k
            pi3_k = shm3_3 * pi_km1 - chm3_3 * pi3a_k
            pi_km2_new = jnp.where(ge3, pi3a_km2, pi_km2)
            pi_km1_mid = jnp.where(is2, pi2_km1,
                                   jnp.where(ge3, pi3_km1, pi_km1))
            pi_k_new = jnp.where(is1, chi_k,
                                 jnp.where(is2, pi2_k, pi3_k))
            pi_kp1 = chibar_kp1

            rNorm = jnp.where(
                is1,
                jnp.sqrt((pi_k_new - tau_k_new) ** 2 + pi_kp1 ** 2),
                jnp.sqrt((pi_km1_mid - tau_km1_new) ** 2
                         + (pi_k_new - tau_k_new) ** 2 + pi_kp1 ** 2))

            solved = (rNorm <= eps_lim) | (ArNorm <= kappa)
            breakdown = beta_kp1 <= btol
            code = jnp.where(solved, jnp.int32(_SOLVED_ARTOL),
                             jnp.where(breakdown, jnp.int32(_BREAKDOWN),
                                       jnp.int32(_RUNNING)))

            # Shift the vector registers (read-olds captured above).
            wkm2_ref[:] = jnp.where(ge2, wkm1_ref[:], wkm2_ref[:])
            wkm1_ref[:] = w_k
            dkm2_ref[:] = jnp.where(ge2, dkm1_ref[:], dkm2_ref[:])
            dkm1_ref[:] = d_k
            vk_ref[:] = vkp1
            vpad_ref[P: P + rows] = v_next

            return (it,
                    jnp.where(one_ok, alpha_kp1, alpha_k),
                    beta_kp1,
                    jnp.where(one_ok, beta_kp2, beta_kp1),
                    jnp.where(one_ok, gamma_k, gamma_km1),
                    jnp.where(one_ok, lambdabar_kp1, lambdabar_k),
                    jnp.where(two_ok, gammabar_kp1, gammabar_k),
                    jnp.where(ge2, eps_km1, eps_km2),
                    jnp.where(two_ok, eps_k, eps_km1),
                    xi_k, tau_km2_new, tau_km1_new, tau_k_new,
                    jnp.where(ge2, thetabar_km1, thetabar_km2),
                    jnp.where(ge2, psibis_km1, psibis_km2),
                    psibar_k,
                    jnp.where(ge2, pi_km1_mid, pi_km2_new),
                    pi_k_new, chibar_kp1,
                    jnp.where(one_ok, zetabis_kp1, zetabis_k),
                    jnp.where(two_ok, zetabar_kp2, zetabar_kp1),
                    jnp.where(ge2, ct2, ct4),
                    jnp.where(ge2, st2, st4),
                    ct1, st1, ct0, st0,
                    ell, rNorm, ArNorm, code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[28]
        out_ref[1, 0] = out[29]
        status_ref[0, 0] = out[30]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, scal_out, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * pd_bytes + 9 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], scal_out[0, 0],
            scal_out[1, 0], status[0, 0])


def minares_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: stencil + 9 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 9, stencil_dtype) < 100 * (1 << 20)


# Bi-Lanczos family status codes (krylov_tpu/solvers/bilq.py)
_BC_BREAKDOWN = 29
_UV_BREAKDOWN = 38
_SOLVED_LQ_PT = 35
_SOLVED_CG_PT2 = 36


@partial(jax.jit, static_argnames=("offsets", "offsets_adj",
                                   "transfer_to_bicg", "interpret"))
def bilq_dia_fused(pd, pd_adj, offsets, offsets_adj, b, atol, rtol, itmax,
                   transfer_to_bicg=True, interpret=None):
    """Full BiLQ solve of A x = b for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/bilq.py:_bilq_core on
    the default real path (c = b; reference src/bilq.jl): the two-sided
    Lanczos step (one A and one Aᴴ stencil per iteration), LQ of Tₖ and
    the BiCG transfer test.  Returns (x, niter, rNorm, status_code).

    Parity note (validated on a real v5e): iteration counts match the
    general core exactly on normal operators (Poisson 32³: 97 = 97); on
    strongly non-normal stencils at f32 the two trajectories drift apart
    in iteration count while converging to equivalent true residuals —
    two-sided Lanczos amplifies rounding differences exponentially, and
    the general core shows the same spread against itself across
    reduction orders.  CPU f64 parity is exact (tests/test_fused.py).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    eps_T = float(jnp.finfo(b.dtype).eps)
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, dbar_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        vkm1_ref[:] = jnp.zeros((rows, LANES), T)
        ukm1_ref[:] = jnp.zeros((rows, LANES), T)
        dbar_ref[:] = jnp.zeros((rows, LANES), T)

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        cHb = bNorm * bNorm                  # c = b on the fused path
        beta0 = jnp.sqrt(jnp.abs(cHb))
        gamma0 = cHb / safe(beta0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(beta0)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = bv / safe(gamma0)
        eps_lim = atol_v + rtol_v * bNorm
        status0 = jnp.where(
            bNorm == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(cHb == 0, jnp.int32(_BC_BREAKDOWN),
                      jnp.where(bNorm <= eps_lim, jnp.int32(_SOLVED_LQ_PT),
                                jnp.int32(_RUNNING))))

        carry0 = (jnp.int32(0), beta0, gamma0, -one, zero, zero,
                  zero, zero, zero, zero, bNorm / safe(jnp.abs(beta0)),
                  bNorm, jnp.int32(0), status0)
        # (it, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1, zeta_km2,
        #  eta_km1, zetabar, norm_vk, rNorm, cgflag, status)

        def cond(c):
            return (c[13] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1, zeta_km2,
             eta_km1, zetabar0, norm_vk, rNorm0, cgflag, status) = c
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            q = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - gamma * vkm1_ref[:]
            p = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta * ukm1_ref[:]
            alpha = jnp.sum(uk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            pHq = jnp.sum(p * q)
            beta_kp1 = jnp.sqrt(jnp.abs(pHq))
            gamma_kp1 = pHq / safe(beta_kp1)

            ck_g, sk_g, d_km1 = sym_givens(dbar_km1, gamma)
            ck = jnp.where(is1, -one, ck_g)
            sk = jnp.where(is1, zero, sk_g)
            eps_km2 = s_km1 * beta
            lam2 = ck * beta + sk * alpha
            dbar2 = sk * beta - ck * alpha
            lam3 = -c_km1 * ck * beta + sk * alpha
            dbar3 = -c_km1 * sk * beta - ck * alpha
            lam_km1 = jnp.where(is2, lam2, lam3)
            dbar_k = jnp.where(is1, alpha, jnp.where(is2, dbar2, dbar3))

            zeta_km1_new = jnp.where(ge2, eta_km1 / safe(d_km1), zeta_km1)
            zeta_km2_new = jnp.where(it >= 3, zeta_km1, zeta_km2)
            eta_k = jnp.where(
                is1, beta,
                jnp.where(is2, -lam_km1 * zeta_km1_new,
                          -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new))

            x_add = jnp.where(ge2, zeta_km1_new, zero)
            x_ref[:] = x_ref[:] + (x_add * ck) * dbar_ref[:] \
                + (x_add * sk) * vk
            dbar_ref[:] = jnp.where(is1, vk,
                                    sk * dbar_ref[:] - ck * vk)

            nz = pHq != 0
            vk_new = jnp.where(nz, q / safe(beta_kp1), vk)
            uk_new = jnp.where(nz, p / safe(gamma_kp1), uk)
            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = vk_new
            upad_ref[P: P + rows] = uk_new

            vHv = jnp.sum(vk * vk_new)
            norm_vkp1 = jnp.sqrt(jnp.sum(vk_new * vk_new))

            mu = beta * (s_km1 * zeta_km2_new - c_km1 * ck * zeta_km1_new) \
                + alpha * sk * zeta_km1_new
            om = beta_kp1 * sk * zeta_km1_new
            th = mu * om * vHv
            rNorm_lq = jnp.where(
                is1, rNorm0,
                jnp.sqrt(mu * mu * norm_vk * norm_vk
                         + om * om * norm_vkp1 * norm_vkp1 + 2 * th))

            dbar_ok = jnp.abs(dbar_k) > eps_T
            zetabar = jnp.where(dbar_ok, eta_k / safe(dbar_k), zetabar0)
            rho = beta_kp1 * (sk * zeta_km1_new - ck * zetabar)
            rNorm_cg = jnp.abs(rho) * norm_vkp1

            solved_lq = rNorm_lq <= eps_lim
            solved_cg = (dbar_ok & (rNorm_cg <= eps_lim)) \
                if transfer_to_bicg else (rNorm_lq < -1)
            breakdown = (~solved_lq) & (~solved_cg) & (pHq == 0)

            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_UV_BREAKDOWN), code)
            code = jnp.where(solved_lq, jnp.int32(_SOLVED_LQ_PT), code)
            code = jnp.where(solved_cg & ~solved_lq,
                             jnp.int32(_SOLVED_CG_PT2), code)

            return (it, beta_kp1, gamma_kp1, ck, sk, dbar_k,
                    zeta_km1_new, zeta_km2_new, eta_k, zetabar,
                    norm_vkp1, rNorm_lq,
                    (solved_cg & ~solved_lq).astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        @pl.when(out[12] == 1)
        def _():
            x_ref[:] = x_ref[:] + out[9] * dbar_ref[:]
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[11]
        status_ref[0, 0] = out[13]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 9 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def bilq_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 9 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 9, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def qmr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, atol, rtol, itmax,
                  interpret=None):
    """Full QMR solve of A x = b for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/bilq.py:_qmr_core on
    the default real path (c = b; reference src/qmr.jl): the two-sided
    Lanczos step plus QR of Tₖ₊₁.ₖ with the W direction recurrence.
    Returns (x, niter, rNorm, status_code).  See the bilq_dia_fused
    parity note: exact on-chip niter parity on normal operators
    (Poisson 32³: 106 = 106); rounding-chaotic trajectory spread on
    strongly non-normal f32 stencils with equivalent true residuals.
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, wkm2_ref, wkm1_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        vkm1_ref[:] = jnp.zeros((rows, LANES), T)
        ukm1_ref[:] = jnp.zeros((rows, LANES), T)
        wkm2_ref[:] = jnp.zeros((rows, LANES), T)
        wkm1_ref[:] = jnp.zeros((rows, LANES), T)

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        cHb = bNorm * bNorm                  # c = b on the fused path
        beta0 = jnp.sqrt(jnp.abs(cHb))
        gamma0 = cHb / safe(beta0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(beta0)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = bv / safe(gamma0)
        eps_lim = atol_v + rtol_v * bNorm
        status0 = jnp.where(
            bNorm == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(cHb == 0, jnp.int32(_BC_BREAKDOWN),
                      jnp.where(bNorm <= eps_lim, jnp.int32(_SOLVED),
                                jnp.int32(_RUNNING))))

        carry0 = (jnp.int32(0), beta0, gamma0, zero, zero, zero, zero,
                  beta0, bNorm * bNorm / safe(jnp.abs(beta0)) ** 2,
                  bNorm, status0)
        # (it, beta, gamma, c_km2, s_km2, c_km1, s_km1, zetabar, tau,
        #  rNorm, status)

        def cond(c):
            return (c[10] == _RUNNING) & (c[0] < cap)

        def body(c):
            (it0, beta, gamma, c_km2, s_km2, c_km1, s_km1, zetabar, tau,
             rNorm0, status) = c
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2
            ge3 = it >= 3

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            q = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - gamma * vkm1_ref[:]
            p = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta * ukm1_ref[:]
            alpha = jnp.sum(uk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            pHq = jnp.sum(p * q)
            beta_kp1 = jnp.sqrt(jnp.abs(pHq))
            gamma_kp1 = pHq / safe(beta_kp1)

            eps_km2 = jnp.where(ge3, s_km2 * gamma, zero)
            lbar_km1 = jnp.where(ge3, -c_km2 * gamma,
                                 jnp.where(is2, gamma, zero))
            lam_km1 = jnp.where(ge2, c_km1 * lbar_km1 + s_km1 * alpha,
                                zero)
            dbar_k = jnp.where(ge2, s_km1 * lbar_km1 - c_km1 * alpha,
                               alpha)
            ck, sk, d_k = sym_givens(dbar_k, beta_kp1)
            zeta_k = ck * zetabar
            zetabar_next = sk * zetabar

            w_k = (vk - lam_km1 * wkm1_ref[:]
                   - eps_km2 * wkm2_ref[:]) / safe(d_k)
            x_ref[:] = x_ref[:] + zeta_k * w_k
            wkm2_ref[:] = jnp.where(ge2, wkm1_ref[:], wkm2_ref[:])
            wkm1_ref[:] = w_k

            nz = pHq != 0
            vk_new = jnp.where(nz, q / safe(beta_kp1), vk)
            uk_new = jnp.where(nz, p / safe(gamma_kp1), uk)
            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = vk_new
            upad_ref[P: P + rows] = uk_new

            tau_n = tau + jnp.sum(vk_new * vk_new)
            rNorm = jnp.abs(zetabar_next) * jnp.sqrt(tau_n)

            solved = (rNorm <= eps_lim) | ((rNorm + 1.0) <= 1.0)
            breakdown = (~solved) & (pHq == 0)
            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_UV_BREAKDOWN), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            return (it, beta_kp1, gamma_kp1, c_km1, s_km1, ck, sk,
                    zetabar_next, tau_n, rNorm, code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[9]
        status_ref[0, 0] = out[10]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 10 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def qmr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 10 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 10, stencil_dtype) < 100 * (1 << 20)


_INCONS_FOM = 28   # krylov_tpu/solvers/fom.py


@partial(jax.jit, static_argnames=("offsets", "mem", "interpret"))
def fom_dia_fused(pd, offsets, b, atol, rtol, itmax, mem=20,
                  interpret=None):
    """Full restarted FOM(mem) solve of A x = b for a DIA matrix in one
    kernel launch.

    Whole-solve-in-VMEM port of solvers/fom.py:_fom_core on the default
    path (M = N = I; reference src/fom.jl): the Krylov panel lives in
    VMEM scratch, the Arnoldi step uses sequential MGS, and the LU of
    the Hessenberg (l/U recurrences, reference src/fom.jl:274-280) runs
    on SMEM scalars with in-kernel restarts re-seeded from the true
    residual.  Returns (x, niter, rNorm, status_code, inconsistent,
    npass).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    eps_T = float(np.finfo(np.dtype(T)).eps)
    btol = eps_T ** 0.75
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, incons_ref,
               npass_ref,
               V_ref, ppad_ref, h_ref, l_ref, zz_ref, U_ref, y_ref,
               tmp_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        zero = jnp.zeros((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * beta0
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        V_ref[pl.ds(0, rows), :] = bv / safe_b0
        zz_ref[0] = beta0
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            it, k, rNorm, status, incons, npass = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it, k, rNorm, status, incons, npass = carry

            # --- Arnoldi step: w = A·V[k], MGS against V[0..k] ----------
            vk = V_ref[pl.ds(k * rows, rows), :]
            ppad_ref[P: P + rows] = vk
            w = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)

            def mgs(i, w):
                vi = V_ref[pl.ds(i * rows, rows), :]
                hij = jnp.sum(vi * w)
                h_ref[i] = hij
                return w - hij * vi

            w = jax.lax.fori_loop(0, k + 1, mgs, w)
            Hbis = jnp.sqrt(jnp.sum(w * w))
            safe_H = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
            V_ref[pl.ds((k + 1) * rows, rows), :] = w / safe_H

            # --- LU column update on SMEM (src/fom.jl:274-280) ----------
            def lu(i, _):
                h_ref[i] = h_ref[i] - l_ref[i - 1] * h_ref[i - 1]
                return 0

            jax.lax.fori_loop(1, k + 1, lu, 0)
            ukk = h_ref[k]
            safe_u = jnp.where(ukk == 0, jnp.ones_like(ukk), ukk)

            @pl.when(k >= 1)
            def _z():
                zz_ref[k] = -l_ref[k - 1] * zz_ref[k - 1]

            l_ref[k] = Hbis / safe_u

            def wcol(i, _):
                U_ref[k * mem + i] = h_ref[i]
                return 0

            jax.lax.fori_loop(0, k + 1, wcol, 0)

            rNorm_n = Hbis * jnp.abs(zz_ref[k] / safe_u)
            it_n = it + 1
            kk = k + 1

            resid_decrease = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            breakdown = Hbis <= btol
            tired = it_n >= cap
            inner_tired = kk >= mem
            inner_done = resid_decrease | breakdown | tired | inner_tired
            glob_done = resid_decrease | breakdown | tired

            tmp_ref[0] = rNorm_n                     # beta after restart

            @pl.when(inner_done)
            def _finalize():
                # back substitution U[0:kk,0:kk] y = zz[0:kk] on SMEM
                def bs(idx, _):
                    i = kk - 1 - idx

                    def inner(j, acc):
                        return acc - U_ref[j * mem + i] * y_ref[j]

                    acc = jax.lax.fori_loop(i + 1, kk, inner, zz_ref[i])
                    diag = U_ref[i * mem + i]
                    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
                    y_ref[i] = acc / safe
                    return 0

                jax.lax.fori_loop(0, kk, bs, 0)

                def xacc(i, _):
                    vi = V_ref[pl.ds(i * rows, rows), :]
                    x_ref[:] = x_ref[:] + y_ref[i] * vi
                    return 0

                jax.lax.fori_loop(0, kk, xacc, 0)

                @pl.when(~glob_done)
                def _restart():
                    ppad_ref[P: P + rows] = x_ref[:]
                    Ax = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)
                    r = b_ref[:] - Ax
                    beta_r = jnp.sqrt(jnp.sum(r * r))
                    safe = jnp.where(beta_r == 0, jnp.ones_like(beta_r),
                                     beta_r)
                    V_ref[pl.ds(0, rows), :] = r / safe
                    zz_ref[0] = beta_r
                    tmp_ref[0] = beta_r

            incons_n = incons | (inner_done & breakdown & ~resid_decrease)
            code = jnp.int32(_TIRED_K)
            code = jnp.where(breakdown, jnp.int32(_INCONS_FOM), code)
            code = jnp.where(resid_decrease, jnp.int32(_SOLVED), code)
            code = jnp.where(~glob_done, jnp.int32(_RUNNING), code)
            status_n = jnp.where(inner_done, code, jnp.int32(_RUNNING))

            k_n = jnp.where(inner_done, jnp.int32(0), kk)
            npass_n = npass + jnp.where(inner_done & ~glob_done,
                                        jnp.int32(1), jnp.int32(0))
            rN_out = jnp.where(inner_done & ~glob_done, tmp_ref[0], rNorm_n)
            return (it_n, k_n, rN_out, status_n, incons_n, npass_n)

        carry0 = (jnp.int32(0), jnp.int32(0), beta0, status0,
                  jnp.zeros((), jnp.bool_), jnp.int32(1))
        it, k, rNorm, status, incons, npass = jax.lax.while_loop(
            cond, body, carry0)
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status
        incons_ref[0, 0] = incons.astype(jnp.int32)
        npass_ref[0, 0] = npass

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status, incons, npass = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((mem + 1) * rows, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((mem * mem,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((2,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (mem + 4) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0],
            incons[0, 0], npass[0, 0])


def fom_dia_fused_supported(offsets, n, dtype, mem, stencil_dtype=None):
    """Static gate: Krylov panel + stencil fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, mem + 4,
                        stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "mem", "variant", "interpret"))
def trunc_dia_fused(pd, offsets, b, atol, rtol, itmax, mem=20,
                    variant="dqgmres", interpret=None):
    """Full DIOM or DQGMRES solve of A x = b for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of solvers/fom.py:_trunc_core on the default
    path (M = N = I; reference src/diom.jl, src/dqgmres.jl): the circular
    V basis and P direction rings live as VMEM row-block panels indexed
    by dynamic slices, window orthogonalization is CGS over the valid
    ring slots (matching the general core's masked formulation), and the
    diagonal-indexed Hessenberg column with the LU pivots (DIOM) or the
    rotation ring (DQGMRES) runs on SMEM.
    Returns (x, niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    diom = variant == "diom"
    mP = (mem - 1) if diom else mem
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(offsets, n)
    npad = rows * LANES

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)

    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([atol, rtol], T).reshape(2, 1)

    def kernel(itmax_ref, s_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               V_ref, P_ref, ppad_ref, hs_ref, H_ref, L_ref, S_ref):
        cap = itmax_ref[0, 0]
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        zero = jnp.zeros((), T)

        bv = b_ref[:]
        x_ref[:] = jnp.zeros((rows, LANES), T)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        # Zero the rings: the window loops read every slot with masked
        # (zero) coefficients, and 0·garbage from uninitialized VMEM
        # scratch can be NaN.
        V_ref[:] = jnp.zeros((mem * rows, LANES), T)
        P_ref[:] = jnp.zeros((mP * rows, LANES), T)
        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        eps_lim = atol_v + rtol_v * beta0
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        V_ref[pl.ds(0, rows), :] = bv / safe_b0
        for i in range(mem):
            L_ref[i] = zero
            S_ref[i] = zero
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(beta0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            k, xi, rNorm, status = carry
            return (status == _RUNNING) & (k < cap)

        def body(carry):
            k, xi, rNorm, status = carry
            it1 = k + 1
            pos = jnp.mod(k, mem)
            vk = V_ref[pl.ds(pos * rows, rows), :]
            ppad_ref[P: P + rows] = vk
            w = _stencil(ppad_ref, pd_ref, shifts, P, rows, T)

            # Window CGS: dots against the unmodified w, then subtract
            # (matches the general core's masked-CGS formulation).
            def dots(j, _):
                i_idx = k - jnp.mod(pos - j, mem)
                vj = V_ref[pl.ds(j * rows, rows), :]
                hj = jnp.sum(vj * w)
                hs_ref[j] = jnp.where(i_idx >= 0, hj, zero)
                return 0

            jax.lax.fori_loop(0, mem, dots, 0)

            def sub(j, w):
                vj = V_ref[pl.ds(j * rows, rows), :]
                return w - hs_ref[j] * vj

            w = jax.lax.fori_loop(0, mem, sub, w)
            Haux = jnp.sqrt(jnp.sum(w * w))

            # Diagonal-indexed Hessenberg column on SMEM:
            # H[diag], diag = k - i + 1 for slot value i.
            for d in range(mem + 2):
                H_ref[d] = zero

            def hcol(j, _):
                i_idx = k - jnp.mod(pos - j, mem)
                diag = k - i_idx + 1

                @pl.when(i_idx >= 0)
                def _():
                    H_ref[diag] = H_ref[diag] + hs_ref[j]
                return 0

            jax.lax.fori_loop(0, mem, hcol, 0)

            if diom:
                # LU column update (reference src/diom.jl:251-266).
                def lu(o, xi):
                    i = jnp.maximum(2, it1 - mem + 2) + o
                    active = i <= it1
                    lslot = jnp.mod(i - 1, mem - 1)
                    diag = it1 - i + 1

                    @pl.when(active)
                    def _():
                        H_ref[diag] = H_ref[diag] \
                            - L_ref[lslot] * H_ref[diag + 1]
                    return jnp.where(active & (i == it1),
                                     -L_ref[lslot] * xi, xi)

                xi_m = jax.lax.fori_loop(0, mem, lu, xi)
                ukk = H_ref[1]
                safe_u = jnp.where(ukk == 0, jnp.ones_like(ukk), ukk)
                L_ref[jnp.mod(it1, mem - 1)] = Haux / safe_u
                gamma_step = xi_m
                rNorm_n = Haux * jnp.abs(xi_m / safe_u)
                xi_next = xi_m
                denom = safe_u
            else:
                # Apply previous rotations (reference src/dqgmres.jl:257-266).
                def rot(o, _):
                    i = jnp.maximum(1, it1 - mem) + o
                    active = i <= it1 - 1
                    slot = jnp.mod(i - 1, mem)
                    diag = it1 - i

                    @pl.when(active)
                    def _():
                        ci = L_ref[slot]
                        si = S_ref[slot]
                        hi1 = H_ref[diag + 1]
                        hi0 = H_ref[diag]
                        H_ref[diag] = si * hi1 - ci * hi0
                        H_ref[diag + 1] = ci * hi1 + si * hi0
                    return 0

                jax.lax.fori_loop(0, mem, rot, 0)
                ck, sk, rkk = sym_givens(H_ref[1], Haux)
                H_ref[1] = rkk
                L_ref[pos] = ck
                S_ref[pos] = sk
                gamma_next = sk * xi
                gamma_step = ck * xi
                rNorm_n = jnp.abs(gamma_next)
                xi_next = gamma_next
                denom = jnp.where(rkk == 0, jnp.ones_like(rkk), rkk)

            # Direction pₖ from the P ring (masked window sum).
            def pacc(jp, acc):
                iP = (k - 1) - jnp.mod((k - 1) - jp, mP)
                lowP = (k - mem + 1) if diom else (k - mem)
                validP = (iP >= 0) & (iP >= lowP) & (iP <= k - 1)
                diagP = jnp.where(validP, k - iP + 1, 0)
                coef = jnp.where(validP, H_ref[diagP], zero)
                pj = P_ref[pl.ds(jp * rows, rows), :]
                return acc + coef * pj

            psum = jax.lax.fori_loop(
                0, mP, pacc, jnp.zeros((rows, LANES), T))
            p_new = (vk - psum) / denom
            ppos = jnp.mod(k, mP)
            P_ref[pl.ds(ppos * rows, rows), :] = p_new
            x_ref[:] = x_ref[:] + gamma_step * p_new

            next_pos = jnp.mod(k + 1, mem)

            @pl.when(Haux != 0)
            def _():
                V_ref[pl.ds(next_pos * rows, rows), :] = w / Haux

            solved = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            code = jnp.where(solved, jnp.int32(_SOLVED),
                             jnp.int32(_RUNNING))
            return (it1, xi_next, rNorm_n, code)

        carry0 = (jnp.int32(0), beta0, beta0, status0)
        k, xi, rNorm, status = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = k
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((mem * rows, LANES), T),
            pltpu.VMEM((mP * rows, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((mem + 2,), T),
            pltpu.SMEM((mem,), T),
            pltpu.SMEM((mem,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((nd * rows * LANES
                                  * np.dtype(pd.dtype).itemsize
                                  + (mem + mP + 5) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def trunc_dia_fused_supported(offsets, n, dtype, mem, stencil_dtype=None):
    """Static gate: V + P rings + stencil fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    return _fused_bytes(offsets, n, dtype, 2 * mem + 5,
                        stencil_dtype) < 100 * (1 << 20)


_INCONS_TRI = 28   # krylov_tpu/solvers/tricg.py (shared with fom)


def _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax, scal):
    """Host-side packing for the saddle-point fused kernels (b AND c)."""
    n = b.shape[0]
    nd = pd.shape[0]
    T = b.dtype
    rows, P = _plan(tuple(offsets) + tuple(offsets_adj), n)
    npad = rows * LANES
    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    cw = jnp.zeros((npad,), T).at[:n].set(c).reshape(rows, LANES)
    pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
        nd, rows, LANES)
    pdaw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd_adj).reshape(
        nd, rows, LANES)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)
    shifts_a = tuple((int(k) // LANES, int(k) % LANES) for k in offsets_adj)
    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray(scal, T).reshape(len(scal), 1)
    return (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a,
            itmax_s, scal_s)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def tricg_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, tau, nu,
                    atol, rtol, itmax, interpret=None):
    """Full TriCG solve of [τI A; Aᴴ νI][x;y]=[b;c], one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/tricg.py:_tricg_core
    on the default real path (M = N = I, square A; reference
    src/tricg.jl): the orthogonal SSY tridiagonalization (one A and one
    Aᴴ stencil per iteration), the LDLᴴ factorization of Sₖ.ₖ and the
    two-term gx/gy direction recurrences.
    Returns (x, y, niter, rNorm, status_code).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [tau, nu, atol, rtol])
    btol = float(jnp.finfo(T).eps) ** 0.75

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref,
               gxo_ref, gxe_ref, gyo_ref, gye_ref):
        tau_v = s_ref[0, 0]
        nu_v = s_ref[1, 0]
        atol_v = s_ref[2, 0]
        rtol_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        gxo_ref[:] = zv
        gxe_ref[:] = zv
        gyo_ref[:] = zv
        gye_ref[:] = zv

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = jnp.where(beta0 != 0, bv / safe(beta0), zv)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = jnp.where(gamma0 != 0, cv / safe(gamma0), zv)
        rNorm0 = jnp.sqrt(gamma0 * gamma0 + beta0 * beta0)
        eps_lim = atol_v + rtol_v * rNorm0
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), beta0, gamma0, zero, zero, zero, zero,
                  zero, rNorm0, status0)
        # (it, beta, gamma, d_m3, d_m2, pi_m3, pi_m2, delta_km1,
        #  rNorm, status)

        def cond(cr):
            return (cr[9] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, d_m3, d_m2, pi_m3, pi_m2, delta_km1,
             rNorm0_, status) = cr
            it = it0 + 1
            is1 = it == 1
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T)
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T)
            g2 = jnp.where(ge2, jnp.ones((), T), zero)
            q = q - (g2 * gamma) * vkm1_ref[:]
            p = p - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk

            # LDLᴴ update of Sₖ.ₖ (reference src/tricg.jl:331-349).
            delta1 = alpha / safe(tau_v)
            d_even1 = nu_v - delta1 * delta1 * tau_v
            sigma = beta / safe(d_m2)
            eta = gamma / safe(d_m3)
            lam = -(eta * delta_km1 * d_m3) / safe(d_m2)
            d_oddk = tau_v - sigma * sigma * d_m2
            deltak = (alpha - lam * sigma * d_m2) / safe(d_oddk)
            d_evenk = nu_v - eta * eta * d_m3 - lam * lam * d_m2 \
                - deltak * deltak * d_oddk
            d_odd = jnp.where(is1, tau_v, d_oddk)
            delta = jnp.where(is1, delta1, deltak)
            d_even = jnp.where(is1, d_even1, d_evenk)

            # Solve LₖDₖpₖ = β₁e₁ + γ₁e₂ (reference :351-372).
            pi_odd1 = beta / safe(d_odd)
            pi_even1 = (gamma - delta * beta) / safe(d_even)
            pi_oddk = -(sigma * d_m2 * pi_m2) / safe(d_odd)
            pi_evenk = -(delta * d_odd * pi_oddk + lam * d_m2 * pi_m2
                         + eta * d_m3 * pi_m3) / safe(d_even)
            pi_odd = jnp.where(is1, pi_odd1, pi_oddk)
            pi_even = jnp.where(is1, pi_even1, pi_evenk)

            # Direction updates (reference :374-410).
            gxo_old = gxo_ref[:]
            gxe_old = gxe_ref[:]
            gyo_old = gyo_ref[:]
            gye_old = gye_ref[:]
            gx_mid = eta * gxo_old + lam * gxe_old
            gy_mid = eta * gyo_old + lam * gye_old
            gx_evenk = vk - sigma * gxe_old
            gy_evenk = -sigma * gye_old
            gx_oddk = -gx_mid - delta * gx_evenk
            gy_oddk = uk - gy_mid - delta * gy_evenk
            gx_odd = jnp.where(is1, vk, gx_evenk)
            gx_even = jnp.where(is1, -delta * vk, gx_oddk)
            gy_odd = jnp.where(is1, zv, gy_evenk)
            gy_even = jnp.where(is1, uk, gy_oddk)
            gxo_ref[:] = gx_odd
            gxe_ref[:] = gx_even
            gyo_ref[:] = gy_odd
            gye_ref[:] = gy_even

            x_ref[:] = x_ref[:] + pi_odd * gx_odd + pi_even * gx_even
            y_ref[:] = y_ref[:] + pi_odd * gy_odd + pi_even * gy_even

            beta_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(q * q), 0))
            gamma_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(p * p), 0))
            bok = beta_kp1 > btol
            gok = gamma_kp1 > btol
            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = jnp.where(bok, q / safe(beta_kp1), q)
            upad_ref[P: P + rows] = jnp.where(gok, p / safe(gamma_kp1), p)

            zeta_odd = pi_odd - delta * pi_even
            zeta_even = pi_even
            rNorm = jnp.sqrt((gamma_kp1 * zeta_odd) ** 2
                             + (beta_kp1 * zeta_even) ** 2)

            solved = (rNorm <= eps_lim) | ((rNorm + 1.0) <= 1.0)
            breakdown = (beta_kp1 <= btol) & (gamma_kp1 <= btol)
            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_INCONS_TRI), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            return (it, beta_kp1, gamma_kp1, d_odd, d_even, pi_odd,
                    pi_even, delta, rNorm, code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[8]
        status_ref[0, 0] = out[9]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 14 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            rnorm[0, 0], status[0, 0])


def tricg_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 14 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 14, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def trimr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, tau, nu,
                    atol, rtol, itmax, interpret=None):
    """Full TriMR solve of [τI A; Aᴴ νI][x;y]=[b;c], one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/tricg.py:_trimr_core
    on the default real path (M = N = I, square A; reference
    src/trimr.jl): the SSY process plus the four-reflection QR cascade
    of Sₖ₊₂.ₖ with the 4-deep gx/gy direction recurrences.
    Returns (x, y, niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [tau, nu, atol, rtol])
    btol = float(jnp.finfo(T).eps) ** 0.75

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref,
               gx_ref, gy_ref):
        tau_v = s_ref[0, 0]
        nu_v = s_ref[1, 0]
        atol_v = s_ref[2, 0]
        rtol_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        gx_ref[:] = jnp.zeros((4 * rows, LANES), T)
        gy_ref[:] = jnp.zeros((4 * rows, LANES), T)

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = jnp.where(beta0 != 0, bv / safe(beta0), zv)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = jnp.where(gamma0 != 0, cv / safe(gamma0), zv)
        rNorm0 = jnp.sqrt(gamma0 * gamma0 + beta0 * beta0)
        eps_lim = atol_v + rtol_v * rNorm0
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), beta0, gamma0,
                  zero, zero, zero, zero, zero, zero, zero, zero,
                  zero, zero, zero, zero, zero, zero,
                  beta0, gamma0, rNorm0, status0)
        # (it, beta, gamma, oc1, os1, oc2, os2, oc3, os3, oc4, os4,
        #  sbar_m2, ebar_m3, lbar_m3, mu_m5, mu_m4, lam_m4,
        #  pibar_odd, pibar_even, rNorm, status)

        def cond(cr):
            return (cr[20] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, oc1, os1, oc2, os2, oc3, os3, oc4, os4,
             sbar_m2, ebar_m3, lbar_m3, mu_m5, mu_m4, lam_m4,
             pibar_odd, pibar_even, rNorm0_, status) = cr
            it = it0 + 1
            first = it == 1
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T)
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T)
            g2 = jnp.where(ge2, jnp.ones((), T), zero)
            q = q - (g2 * gamma) * vkm1_ref[:]
            p = p - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk

            beta_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(q * q), 0))
            gamma_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(p * p), 0))
            bok = beta_kp1 > btol
            gok = gamma_kp1 > btol
            qn = jnp.where(bok, q / safe(beta_kp1), q)
            pn = jnp.where(gok, p / safe(gamma_kp1), p)
            bc_ = beta_kp1
            gc_ = gamma_kp1

            # iter ≥ 2: apply the four previous reflections
            # (reference src/trimr.jl:370-404).
            sbis_m2 = oc1 * sbar_m2 + os1 * alpha
            ebis_m2 = os1 * nu_v
            lbis_m2 = os1 * bc_
            thbis = os1 * sbar_m2 - oc1 * alpha
            dbis_even = -oc1 * nu_v
            sbis_even = -oc1 * bc_

            e_m3 = oc2 * ebar_m3 + os2 * sbis_m2
            l_m3 = oc2 * lbar_m3 + os2 * ebis_m2
            mu_m3 = os2 * lbis_m2
            shat_m2 = os2 * ebar_m3 - oc2 * sbis_m2
            ehat_m2 = os2 * lbar_m3 - oc2 * ebis_m2
            lhat_m2 = -oc2 * lbis_m2

            stmp_m2 = oc3 * shat_m2 + os3 * thbis
            etmp_m2 = oc3 * ehat_m2 + os3 * dbis_even
            ltmp_m2 = oc3 * lhat_m2 + os3 * sbis_even
            thetabar_k = os3 * shat_m2 - oc3 * thbis
            dbar_even_k = os3 * ehat_m2 - oc3 * dbis_even
            sbar_even_k = os3 * lhat_m2 - oc3 * sbis_even

            s_m2 = oc4 * stmp_m2 + os4 * tau_v
            e_m2 = oc4 * etmp_m2 + os4 * alpha
            l_m2 = oc4 * ltmp_m2
            mu_m2 = os4 * gc_
            dbar_odd_k = os4 * stmp_m2 - oc4 * tau_v
            sbar_odd_k = os4 * etmp_m2 - oc4 * alpha
            ebar_odd_k = os4 * ltmp_m2
            lbar_odd_k = -oc4 * gc_

            thetabar = jnp.where(first, alpha, thetabar_k)
            dbar_odd = jnp.where(first, tau_v, dbar_odd_k)
            dbar_even = jnp.where(first, nu_v, dbar_even_k)
            sbar_odd = jnp.where(first, alpha, sbar_odd_k)
            sbar_even = jnp.where(first, bc_, sbar_even_k)
            lbar_odd = jnp.where(first, gc_, lbar_odd_k)
            ebar_odd = jnp.where(first, zero, ebar_odd_k)
            e_m3 = jnp.where(first, zero, e_m3)
            l_m3 = jnp.where(first, zero, l_m3)
            mu_m3 = jnp.where(first, zero, mu_m3)
            s_m2 = jnp.where(first, zero, s_m2)
            e_m2 = jnp.where(first, zero, e_m2)
            l_m2 = jnp.where(first, zero, l_m2)
            mu_m2 = jnp.where(first, zero, mu_m2)

            # Current 4-reflection cascade (reference :406-443).
            c1, s1, theta_k = sym_givens(thetabar, gc_)
            g_k = s1 * dbar_even
            dbar_even2 = c1 * dbar_even
            c2, s2, d_odd = sym_givens(dbar_odd, theta_k)
            s_odd = c2 * sbar_odd + s2 * dbar_even2
            dbis_even2 = s2 * sbar_odd - c2 * dbar_even2
            c3, s3, dhat_even = sym_givens(dbis_even2, g_k)
            c4, s4, d_even = sym_givens(dhat_even, bc_)

            sd_odd = safe(d_odd)
            sd_even = safe(d_even)
            gx0 = gx_ref[0 * rows: 1 * rows]
            gx1 = gx_ref[1 * rows: 2 * rows]
            gx2 = gx_ref[2 * rows: 3 * rows]
            gx3 = gx_ref[3 * rows: 4 * rows]
            gy0 = gy_ref[0 * rows: 1 * rows]
            gy1 = gy_ref[1 * rows: 2 * rows]
            gy2 = gy_ref[2 * rows: 3 * rows]
            gy3 = gy_ref[3 * rows: 4 * rows]

            # Unified window sums: the it==1/2 cases zero the inactive
            # coefficients AND the panels start zeroed, so the it ≥ 3
            # formula with masked scalars reproduces the general core's
            # per-iteration selects bit-for-bit.
            mu5 = jnp.where(first, zero, mu_m5)
            mu4 = jnp.where(first, zero, mu_m4)
            lam4 = jnp.where(first, zero, lam_m4)
            gx_odd = (vk - mu5 * gx0 - lam4 * gx1
                      - e_m3 * gx2 - s_m2 * gx3) / sd_odd
            gx_even = (-mu4 * gx1 - l_m3 * gx2 - e_m2 * gx3
                       - s_odd * gx_odd) / sd_even
            gy_odd = (-mu5 * gy0 - lam4 * gy1
                      - e_m3 * gy2 - s_m2 * gy3) / sd_odd
            gy_even = (uk - mu4 * gy1 - l_m3 * gy2 - e_m2 * gy3
                       - s_odd * gy_odd) / sd_even

            # π updates (reference :482-494).
            pibis_even = c1 * pibar_even
            pibis_next_even = s1 * pibar_even
            pi_odd = c2 * pibar_odd + s2 * pibis_even
            pihat_even = s2 * pibar_odd - c2 * pibis_even
            pitmp = c3 * pihat_even + s3 * pibis_next_even
            pibar_next_even = s3 * pihat_even - c3 * pibis_next_even
            pi_even = c4 * pitmp
            pibar_next_odd = s4 * pitmp

            x_ref[:] = x_ref[:] + pi_odd * gx_odd + pi_even * gx_even
            y_ref[:] = y_ref[:] + pi_odd * gy_odd + pi_even * gy_even

            # Shift the 4-deep panels.
            gx_ref[0 * rows: 1 * rows] = gx2
            gx_ref[1 * rows: 2 * rows] = gx3
            gx_ref[2 * rows: 3 * rows] = gx_odd
            gx_ref[3 * rows: 4 * rows] = gx_even
            gy_ref[0 * rows: 1 * rows] = gy2
            gy_ref[1 * rows: 2 * rows] = gy3
            gy_ref[2 * rows: 3 * rows] = gy_odd
            gy_ref[3 * rows: 4 * rows] = gy_even
            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = qn
            upad_ref[P: P + rows] = pn

            rNorm = jnp.sqrt(pibar_next_odd ** 2 + pibar_next_even ** 2)
            solved = (rNorm <= eps_lim) | ((rNorm + 1.0) <= 1.0)
            breakdown = (beta_kp1 <= btol) & (gamma_kp1 <= btol)
            code = jnp.int32(_RUNNING)
            code = jnp.where(breakdown, jnp.int32(_INCONS_TRI), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            return (it, beta_kp1, gamma_kp1, c1, s1, c2, s2, c3, s3,
                    c4, s4, sbar_even, ebar_odd, lbar_odd,
                    jnp.where(ge2, mu_m3, mu_m5),
                    jnp.where(ge2, mu_m2, mu_m4),
                    jnp.where(ge2, l_m2, lam_m4),
                    pibar_next_odd, pibar_next_even, rNorm, code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[19]
        status_ref[0, 0] = out[20]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((4 * rows, LANES), T),
            pltpu.VMEM((4 * rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 18 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            rnorm[0, 0], status[0, 0])


def trimr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 18 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 18, stencil_dtype) < 100 * (1 << 20)


_SOLVED_CRAIG = 39
_INCONS_CRAIG = 41   # krylov_tpu/solvers/craig.py


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "use_lam",
                                   "interpret"))
def craig_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol, rtol,
                    btol_in, conlim, itmax, use_lam=False, interpret=None):
    """Full CRAIG solve (min ‖x‖ s.t. Ax = b) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/craig.py:_craig_core
    on the default path (M = N = I; reference src/craig.jl): the
    Golub-Kahan process over the stencil and its adjoint, the λ-rotation
    registers, backward-error and ill-conditioning stops and the
    "system may be inconsistent" exit.
    Returns (x, y, niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiny = float(jnp.finfo(b.dtype).tiny)
    conlim_t = jnp.asarray(conlim, b.dtype)
    ctol_in = jnp.where(conlim_t > 0,
                        1.0 / jnp.where(conlim_t == 0, 1.0, conlim_t), 0.0)
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol, btol_in, ctol_in])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, w_ref, w2_ref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        bt = s_ref[3, 0]
        ctol = s_ref[4, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        w_ref[:] = zv
        w2_ref[:] = zv
        beta1 = jnp.sqrt(jnp.maximum(jnp.sum(bv * bv), 0))
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = bv / safe(beta1)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        eps_c = atol_v + rtol_v * beta1
        status0 = jnp.where(beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
                            jnp.int32(_RUNNING))

        carry0 = (jnp.int32(0), beta1, beta1, -one, lam_v, one,
                  zero, zero, zero, beta1, status0)
        # (it, beta, theta, xi, delta, rho_prev, anorm2, dnorm2, xnorm2,
        #  rNorm, status)

        def cond(cr):
            return (cr[10] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, theta, xi0, delta0, rho_prev, anorm2, dnorm2,
             xnorm2, rNorm0, status) = cr
            it = it0 + 1

            u = upad_ref[P: P + rows]
            v_old = vpad_ref[P: P + rows]
            nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta * v_old
            alpha = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
            incons = alpha == 0
            v = jnp.where(~incons, nv / safe(alpha), nv)
            vpad_ref[P: P + rows] = v

            anorm2_n = anorm2 + alpha * alpha + lam_v * lam_v
            if use_lam:
                c1, s1, rho = sym_givens(alpha, delta0)
            else:
                c1 = one
                s1 = zero
                rho = alpha
            xi = -theta / safe(rho) * xi0

            x_old = x_ref[:]
            w_old = w_ref[:]
            w2_old = w2_ref[:]
            if use_lam:
                x_new = x_old + (xi * c1) * v + (xi * s1) * w2_old
                w2_new = s1 * v - c1 * w2_old
            else:
                x_new = x_old + xi * v
                w2_new = w2_old
            w_new = u - (theta / rho_prev) * w_old
            y_new = y_ref[:] + (xi / rho) * w_new
            dnorm2_n = dnorm2 + jnp.sqrt(jnp.sum(w_new * w_new))

            mu = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) - alpha * u
            beta_n = jnp.sqrt(jnp.maximum(jnp.sum(mu * mu), 0))
            bnz = beta_n != 0
            u_new = jnp.where(bnz, mu / safe(beta_n), mu)
            upad_ref[P: P + rows] = jnp.where(incons, u, u_new)

            if use_lam:
                theta_n = beta_n * c1
                gamma = beta_n * s1
                c2, s2, delta_n = sym_givens(lam_v, gamma)
                w2_new = s2 * w2_new
            else:
                theta_n = beta_n
                delta_n = delta0

            anorm2_n = anorm2_n + beta_n * beta_n
            anorm = jnp.sqrt(anorm2_n)
            acond = anorm * jnp.sqrt(dnorm2_n)
            xnorm2_n = xnorm2 + xi * xi
            xnorm = jnp.sqrt(xnorm2_n)
            rNorm = beta_n * jnp.abs(xi)
            if use_lam:
                rNorm = rNorm * jnp.abs(c1)

            bkwerr = rNorm / jnp.sqrt(beta1 * beta1
                                      + anorm2_n * xnorm2_n + tiny)
            solved = ((1.0 + bkwerr) <= 1.0) | (bkwerr <= bt) \
                | (rNorm <= eps_c) \
                | (rNorm <= bt + atol_v * anorm * xnorm / safe(beta1))
            ill_cond_mach = (1.0 + 1.0 / jnp.maximum(acond, tiny)) <= 1.0
            ill_cond_lim = (1.0 / jnp.maximum(acond, tiny)) <= ctol

            code = jnp.int32(_RUNNING)
            code = jnp.where(solved, jnp.int32(_SOLVED_CRAIG), code)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(incons, jnp.int32(_INCONS_CRAIG), code)

            # On the inconsistency exit the updates never happened.
            x_ref[:] = jnp.where(incons, x_old, x_new)
            y_ref[:] = jnp.where(incons, y_ref[:], y_new)
            w_ref[:] = jnp.where(incons, w_old, w_new)
            w2_ref[:] = jnp.where(incons, w2_old, w2_new)

            return (jnp.where(incons, it0, it),
                    jnp.where(incons, beta, beta_n),
                    jnp.where(incons, theta, theta_n),
                    jnp.where(incons, xi0, xi),
                    jnp.where(incons, delta0, delta_n),
                    jnp.where(incons, rho_prev, rho),
                    jnp.where(incons, anorm2, anorm2_n),
                    jnp.where(incons, dnorm2, dnorm2_n),
                    jnp.where(incons, xnorm2, xnorm2_n),
                    jnp.where(incons, rNorm0, rNorm), code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[9]
        status_ref[0, 0] = out[10]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 10 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            rnorm[0, 0], status[0, 0])


def craig_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 10 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 10, stencil_dtype) < 100 * (1 << 20)


_SOLVED_MN = 40   # krylov_tpu/solvers/craig.py


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "use_lam",
                                   "interpret"))
def craigmr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol, rtol,
                      itmax, use_lam=False, interpret=None):
    """Full CRAIGMR solve (min-norm, min ‖r‖) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/craig.py:_craigmr_core on the default path
    (M = N = I; reference src/craigmr.jl): Golub-Kahan over the stencil
    pair with the λ-regularization rotation registers and the
    (rNorm, ArNorm) stopping pair.
    Returns (x, y, niter, rNorm, ArNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, out_ref, status_ref,
               vpad_ref, upad_ref, w_ref, wbar_ref, d_ref, q_ref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(dd):
            return jnp.where(dd == 0, jnp.ones_like(dd), dd)

        bv = b_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        w_ref[:] = zv
        d_ref[:] = zv

        beta0 = jnp.sqrt(jnp.maximum(jnp.sum(bv * bv), 0))
        u0 = bv / safe(beta0)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = u0
        nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
        alpha0 = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
        v0 = nv / safe(alpha0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = v0
        status0 = jnp.where(beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
                            jnp.where(alpha0 == 0, jnp.int32(_MIN_LSQ_X),
                                      jnp.int32(_RUNNING)))
        if use_lam:
            cp0, sp0, alphahat0 = sym_givens(alpha0, lam_v)
            q_ref[:] = sp0 * v0
        else:
            cp0 = one
            sp0 = one
            alphahat0 = alpha0
            q_ref[:] = zv
        rNorm0 = beta0
        ArNorm0 = alpha0
        eps_c = atol_v + rtol_v * rNorm0
        eps_i = atol_v + rtol_v * ArNorm0
        wbar_ref[:] = u0 / safe(alphahat0)

        carry0 = (jnp.int32(0), alpha0, beta0, beta0, alphahat0, zero,
                  cp0, sp0, lam_v, rNorm0, ArNorm0, status0)
        # (it, alpha, beta, zetabar, rhobar, theta, cp, sp, lam_k,
        #  rNorm, ArNorm, status)

        def cond(cr):
            return (cr[11] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, alpha, beta, zetabar0, rhobar, theta, cp, sp, lam_k,
             rNorm0_, ArNorm0_, status) = cr
            it = it0 + 1
            is1 = it == 1

            u_old = upad_ref[P: P + rows]
            v_old = vpad_ref[P: P + rows]
            mu = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - alpha * u_old
            beta_n = jnp.sqrt(jnp.maximum(jnp.sum(mu * mu), 0))
            bnz = beta_n != 0
            u = jnp.where(bnz, mu / safe(beta_n), mu)
            upad_ref[P: P + rows] = u

            if use_lam:
                betahat = cp * beta_n
                lam_aux = sp * beta_n
            else:
                betahat = beta_n
                lam_aux = zero

            c, sg, rho = sym_givens(rhobar, betahat)
            zeta = c * zetabar0
            zetabar = sg * zetabar0
            rNorm = jnp.abs(zetabar)

            w = wbar_ref[:] / safe(rho) - (theta / safe(rho)) * w_ref[:]
            w_ref[:] = w
            y_ref[:] = y_ref[:] + zeta * w

            if use_lam:
                d1 = (cp / safe(rho)) * v_old
                dk = (cp / safe(rho)) * v_old \
                    - (theta / safe(rho)) * d_ref[:] \
                    + (sp / safe(rho)) * q_ref[:]
                d_new = jnp.where(is1, d1, dk)
                q_ref[:] = jnp.where(is1, q_ref[:],
                                     sp * v_old - cp * q_ref[:])
            else:
                d_new = v_old / safe(rho) \
                    - (theta / safe(rho)) * d_ref[:]
            d_ref[:] = d_new
            x_ref[:] = x_ref[:] + zeta * d_new

            nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta_n * v_old
            alpha_n = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
            ArNorm = alpha_n * beta_n * jnp.abs(zeta / safe(rho))

            if use_lam:
                cd, sd, lam_next = sym_givens(lam_k, lam_aux)
                q_ref[:] = sd * q_ref[:]
                cp_n, sp_n, alphahat = sym_givens(alpha_n, lam_next)
            else:
                cp_n, sp_n = cp, sp
                lam_next = lam_k
                alphahat = alpha_n

            anz = alpha_n != 0
            v = jnp.where(anz, nv / safe(alpha_n), nv)
            vpad_ref[P: P + rows] = v
            wbar_ref[:] = jnp.where(
                anz, (u - betahat * wbar_ref[:]) / safe(alphahat),
                wbar_ref[:])
            theta_n = sg * alphahat
            rhobar_n = -c * alphahat

            solved = rNorm <= eps_c
            inconsistent = (rNorm > 100 * eps_c) & (ArNorm <= eps_i)
            code = jnp.int32(_RUNNING)
            code = jnp.where(inconsistent, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_MN), code)

            return (it, alpha_n, beta_n, zetabar, rhobar_n, theta_n,
                    cp_n, sp_n, lam_next, rNorm, ArNorm, code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[9]
        out_ref[1, 0] = out[10]
        status_ref[0, 0] = out[11]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, scal_out, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 12 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            scal_out[0, 0], scal_out[1, 0], status[0, 0])


def craigmr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 12 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 12, stencil_dtype) < 100 * (1 << 20)


_SOLVED_LNLQ_LQ = 42
_SOLVED_LNLQ_CG = 43   # krylov_tpu/solvers/craig.py


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "use_lam",
                                   "transfer_to_craig", "interpret"))
def lnlq_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, atol, rtol,
                   itmax, use_lam=False, transfer_to_craig=True,
                   interpret=None):
    """Full LNLQ solve (min-norm LQ) for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/craig.py:_lnlq_core on
    the default path (M = N = I; reference src/lnlq.jl): Golub-Kahan over
    the stencil pair, LQ recurrences with the CRAIG-point transfer and
    λ-regularization registers.
    Returns (x, y, niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    eps_T = float(jnp.finfo(b.dtype).eps)
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, wbar_ref, q_ref):
        lam_v = s_ref[0, 0]
        atol_v = s_ref[1, 0]
        rtol_v = s_ref[2, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(dd):
            return jnp.where(dd == 0, jnp.ones_like(dd), dd)

        bv = b_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv

        beta0 = jnp.sqrt(jnp.maximum(jnp.sum(bv * bv), 0))
        u0 = bv / safe(beta0)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = u0
        nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
        alpha0 = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
        v0 = jnp.where(alpha0 != 0, nv / safe(alpha0), nv)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = v0
        wbar_ref[:] = u0
        if use_lam:
            cp0, sp0, alphahat0 = sym_givens(alpha0, lam_v)
            q_ref[:] = sp0 * v0
        else:
            cp0 = one
            sp0 = one
            alphahat0 = alpha0
            q_ref[:] = zv
        epsbar0 = alphahat0
        tau0 = beta0 / safe(alphahat0)
        zetabar0 = tau0 / safe(epsbar0)
        theta0 = tau0
        eps_lim = atol_v + rtol_v * beta0
        status0 = jnp.where(beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
                            jnp.int32(_RUNNING))

        carry0 = (jnp.int32(0), alpha0, alphahat0, beta0, zero, zero,
                  zero, zetabar0, zero, theta0, epsbar0, tau0,
                  cp0, sp0, lam_v, beta0, jnp.int32(0), status0)
        # (it, alpha, alphahat, beta, c_k, s_k, zeta_km1, zetabar, eta,
        #  theta, epsbar, tau, cp, sp, lam_k, rNorm, cgflag, status)

        def cond(cr):
            return (cr[17] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, alpha, alphahat, beta, c_k, s_k, zeta_km1, zetabar,
             eta, theta, epsbar, tau, cp, sp, lam_k, rNorm0_, cgflag,
             status) = cr
            it = it0 + 1
            ge2 = it >= 2

            v_old = vpad_ref[P: P + rows]
            u_old = upad_ref[P: P + rows]
            if use_lam:
                x_ref[:] = x_ref[:] + (tau * cp) * v_old \
                    + jnp.where(ge2, tau * sp, zero) * q_ref[:]
                q_ref[:] = jnp.where(ge2, sp * v_old - cp * q_ref[:],
                                     q_ref[:])
            else:
                x_ref[:] = x_ref[:] + tau * v_old

            mu = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - alpha * u_old
            beta_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(mu * mu), 0))
            bnz = beta_kp1 != 0
            u = jnp.where(bnz, mu / safe(beta_kp1), mu)
            upad_ref[P: P + rows] = u

            nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta_kp1 * v_old
            alpha_kp1 = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
            anz = alpha_kp1 != 0
            v = jnp.where(anz, nv / safe(alpha_kp1), nv)
            vpad_ref[P: P + rows] = v

            if use_lam:
                betahat = cp * beta_kp1
                theta_kp1l = sp * beta_kp1
                cd, sd, lam_next = sym_givens(lam_v, theta_kp1l)
                q_ref[:] = sd * q_ref[:]
                cp1, sp1, alphahat_kp1 = sym_givens(alpha_kp1, lam_next)
            else:
                betahat = beta_kp1
                alphahat_kp1 = alpha_kp1
                cp1, sp1 = cp, sp
                lam_next = lam_k

            tau_kp1 = -betahat * tau / safe(alphahat_kp1)
            c_kp1, s_kp1, eps_k = sym_givens(epsbar, betahat)
            eta_kp1 = alphahat_kp1 * s_kp1
            epsbar_kp1 = -alphahat_kp1 * c_kp1
            zeta_k = theta / safe(eps_k)
            theta_kp1 = tau_kp1 - eta_kp1 * zeta_k
            zetabar_kp1 = theta_kp1 / safe(epsbar_kp1)

            y_ref[:] = y_ref[:] + (zeta_k * c_kp1) * wbar_ref[:] \
                + (zeta_k * s_kp1) * u
            wbar_ref[:] = s_kp1 * wbar_ref[:] - c_kp1 * u

            rNorm_lq = jnp.where(
                it == 1, rNorm0_,
                jnp.abs(alphahat) * jnp.sqrt(
                    (epsbar * zetabar) ** 2
                    + (betahat * s_k * zeta_km1) ** 2))
            rNorm_cg = jnp.abs(betahat * tau)

            solved_lq = rNorm_lq <= eps_lim
            solved_cg = ((jnp.abs(zetabar) > eps_T)
                         & (rNorm_cg <= eps_lim)) if transfer_to_craig \
                else (rNorm_lq < -1)
            code = jnp.int32(_RUNNING)
            code = jnp.where(solved_lq, jnp.int32(_SOLVED_LNLQ_LQ), code)
            code = jnp.where(solved_cg & ~solved_lq,
                             jnp.int32(_SOLVED_LNLQ_CG), code)

            return (it, alpha_kp1, alphahat_kp1, beta_kp1, c_kp1, s_kp1,
                    zeta_k, zetabar_kp1, eta_kp1, theta_kp1, epsbar_kp1,
                    tau_kp1, cp1, sp1, lam_next, rNorm_lq,
                    (solved_cg & ~solved_lq).astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        # CRAIG-point transfer (reference src/lnlq.jl:569-585).
        tau_f = out[11]
        zetabar_f = out[7]
        cp_f, sp_f = out[12], out[13]

        @pl.when((out[16] == 1) & (zetabar_f > eps_T))
        def _():
            v_f = vpad_ref[P: P + rows]
            if use_lam:
                x_ref[:] = x_ref[:] + (tau_f * cp_f) * v_f \
                    + (tau_f * sp_f) * q_ref[:]
            else:
                x_ref[:] = x_ref[:] + tau_f * v_f
            y_ref[:] = y_ref[:] + zetabar_f * wbar_ref[:]

        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[15]
        status_ref[0, 0] = out[17]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 10 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            rnorm[0, 0], status[0, 0])


def lnlq_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 10 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 10, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj",
                                   "transfer_to_usymcg", "interpret"))
def usymlq_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, atol, rtol,
                     itmax, transfer_to_usymcg=True, interpret=None):
    """Full USYMLQ solve of A x = b for a DIA matrix, one kernel launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/usymlq.py:_usymlq_core on the real path
    (reference src/usymlq.jl): the SSY orthogonal tridiagonalization
    (A·u and Aᴴ·v stencils per iteration), LQ of Tₖ and the USYMCG
    transfer test.  Returns (x, niter, rNorm, status_code).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    eps_T = float(jnp.finfo(b.dtype).eps)
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, niter_ref, rnorm_ref, status_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, dbar_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        dbar_ref[:] = zv

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(bNorm)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = cv / safe(gamma0)
        eps_lim = atol_v + rtol_v * bNorm
        status0 = jnp.where(
            bNorm == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(bNorm <= eps_lim, jnp.int32(_SOLVED_LQ_PT),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), bNorm, gamma0, -one, zero, zero,
                  zero, zero, zero, zero, bNorm, jnp.int32(0), status0)
        # (it, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1, zeta_km2,
        #  eta_km1, zetabar, rNorm, cgflag, status)

        def cond(cr):
            return (cr[12] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1,
             zeta_km2, eta_km1, zetabar0, rNorm0, cgflag, status) = cr
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            g2 = jnp.where(ge2, one, zero)
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T) \
                - (g2 * gamma) * vkm1_ref[:]
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T) \
                - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            beta_kp1 = jnp.sqrt(jnp.sum(q * q))
            gamma_kp1 = jnp.sqrt(jnp.sum(p * p))

            ck_g, sk_g, d_km1 = sym_givens(dbar_km1, gamma)
            ck = jnp.where(is1, -one, ck_g)
            sk = jnp.where(is1, zero, sk_g)
            eps_km2 = s_km1 * beta
            lam2 = ck * beta + sk * alpha
            dbar2 = sk * beta - ck * alpha
            lam3 = -c_km1 * ck * beta + sk * alpha
            dbar3 = -c_km1 * sk * beta - ck * alpha
            lam_km1 = jnp.where(is2, lam2, lam3)
            dbar_k = jnp.where(is1, alpha, jnp.where(is2, dbar2, dbar3))

            zeta_km1_new = jnp.where(ge2, eta_km1 / safe(d_km1), zeta_km1)
            zeta_km2_new = jnp.where(it >= 3, zeta_km1, zeta_km2)
            eta_k = jnp.where(
                is1, beta,
                jnp.where(is2, -lam_km1 * zeta_km1_new,
                          -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new))

            x_add = jnp.where(ge2, zeta_km1_new, zero)
            x_ref[:] = x_ref[:] + (x_add * ck) * dbar_ref[:] \
                + (x_add * sk) * uk
            dbar_ref[:] = jnp.where(is1, uk, sk * dbar_ref[:] - ck * uk)

            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = jnp.where(
                beta_kp1 != 0, q / safe(beta_kp1), vk)
            upad_ref[P: P + rows] = jnp.where(
                gamma_kp1 != 0, p / safe(gamma_kp1), uk)

            mu = beta * (s_km1 * zeta_km2_new - c_km1 * ck * zeta_km1_new) \
                + alpha * sk * zeta_km1_new
            om = beta_kp1 * sk * zeta_km1_new
            rNorm_lq = jnp.where(is1, rNorm0,
                                 jnp.sqrt(mu * mu + om * om))

            dbar_ok = jnp.abs(dbar_k) > eps_T
            zetabar = jnp.where(dbar_ok, eta_k / safe(dbar_k), zetabar0)
            rho = beta_kp1 * (sk * zeta_km1_new - ck * zetabar)
            rNorm_cg = jnp.abs(rho)

            solved_lq = rNorm_lq <= eps_lim
            solved_cg = (dbar_ok & (rNorm_cg <= eps_lim)) \
                if transfer_to_usymcg else (rNorm_lq < -1)
            code = jnp.int32(_RUNNING)
            code = jnp.where(solved_lq, jnp.int32(_SOLVED_LQ_PT), code)
            code = jnp.where(solved_cg & ~solved_lq,
                             jnp.int32(_SOLVED_CG_PT2), code)

            return (it, beta_kp1, gamma_kp1, ck, sk, dbar_k,
                    zeta_km1_new, zeta_km2_new, eta_k, zetabar,
                    rNorm_lq, (solved_cg & ~solved_lq).astype(jnp.int32),
                    code)

        out = jax.lax.while_loop(cond, body, carry0)
        @pl.when(out[11] == 1)
        def _():
            x_ref[:] = x_ref[:] + out[9] * dbar_ref[:]
        niter_ref[0, 0] = out[0]
        rnorm_ref[0, 0] = out[10]
        status_ref[0, 0] = out[12]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, rnorm, status = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 10 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0]


def usymlq_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 10 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 10, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "interpret"))
def usymqr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, atol, rtol,
                     itmax, interpret=None):
    """Full USYMQR solve of min ‖b − Ax‖ for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/usymlq.py:_usymqr_core on the real path
    (reference src/usymqr.jl): SSY process, QR of Tₖ₊₁.ₖ with the W
    direction recurrence and the ArNorm inconsistency test.
    Returns (x, niter, rNorm, ArNorm, status_code, inconsistent).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, niter_ref, out_ref, status_ref, incon_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, wkm2_ref, wkm1_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        wkm2_ref[:] = zv
        wkm1_ref[:] = zv

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(bNorm)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = cv / safe(gamma0)
        eps_lim = atol_v + rtol_v * bNorm
        status0 = jnp.where(
            bNorm == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(bNorm <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), bNorm, gamma0, zero, zero, zero, zero,
                  bNorm, zero, bNorm, zero, jnp.int32(0), status0)
        # (it, beta, gamma, c_km2, s_km2, c_km1, s_km1, zetabar, kappa,
        #  rNorm, ArNorm, incon, status)

        def cond(cr):
            return (cr[12] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, c_km2, s_km2, c_km1, s_km1, zetabar,
             kappa, rNorm0, ArNorm0, incon, status) = cr
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2
            ge3 = it >= 3

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            g2 = jnp.where(ge2, one, zero)
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T) \
                - (g2 * gamma) * vkm1_ref[:]
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T) \
                - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            beta_kp1 = jnp.sqrt(jnp.sum(q * q))
            gamma_kp1 = jnp.sqrt(jnp.sum(p * p))

            eps_km2 = jnp.where(ge3, s_km2 * gamma, zero)
            lbar_km1 = jnp.where(ge3, -c_km2 * gamma,
                                 jnp.where(is2, gamma, zero))
            lam_km1 = jnp.where(ge2, c_km1 * lbar_km1 + s_km1 * alpha,
                                zero)
            dbar_k = jnp.where(ge2, s_km1 * lbar_km1 - c_km1 * alpha,
                               alpha)
            ck, sk, d_k = sym_givens(dbar_k, beta_kp1)
            zeta_k = ck * zetabar
            zetabar_next = sk * zetabar

            w_k = (uk - lam_km1 * wkm1_ref[:]
                   - eps_km2 * wkm2_ref[:]) / safe(d_k)
            x_ref[:] = x_ref[:] + zeta_k * w_k
            wkm2_ref[:] = jnp.where(ge2, wkm1_ref[:], wkm2_ref[:])
            wkm1_ref[:] = w_k

            rNorm = jnp.abs(zetabar_next)
            ArNorm = jnp.abs(zetabar) * jnp.sqrt(
                dbar_k * dbar_k + (c_km1 * gamma_kp1) ** 2)
            kappa_n = jnp.where(is1, atol_v + rtol_v * ArNorm, kappa)

            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = jnp.where(
                beta_kp1 != 0, q / safe(beta_kp1), vk)
            upad_ref[P: P + rows] = jnp.where(
                gamma_kp1 != 0, p / safe(gamma_kp1), uk)

            solved = rNorm <= eps_lim
            incon_n = (~solved) & (ArNorm <= kappa_n)
            code = jnp.int32(_RUNNING)
            code = jnp.where(incon_n, jnp.int32(_INCONSISTENT), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            return (it, beta_kp1, gamma_kp1, c_km1, s_km1, ck, sk,
                    zetabar_next, kappa_n, rNorm, ArNorm,
                    incon_n.astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[9]
        out_ref[1, 0] = out[10]
        status_ref[0, 0] = out[12]
        incon_ref[0, 0] = out[11]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, scal_out, status, incon = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 11 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], niter[0, 0], scal_out[0, 0],
            scal_out[1, 0], status[0, 0], incon[0, 0])


def usymqr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 11 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 11, stencil_dtype) < 100 * (1 << 20)


_FWD_LBND = 44
_FWD_UBND = 45   # krylov_tpu/solvers/lslq.py


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "use_sigma",
                                   "transfer_to_lsqr", "window",
                                   "interpret"))
def lslq_dia_fused(pd, pd_adj, offsets, offsets_adj, b, lam, sigma,
                   atol, rtol, btol, etol, utol, conlim, itmax,
                   use_sigma=False, transfer_to_lsqr=False, window=5,
                   interpret=None):
    """Full LSLQ solve of min ‖b − Ax‖ (+λ) for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/lslq.py:_lslq_core on
    the default path (M = N = I; reference src/lslq.jl): Golub-Kahan
    over the stencil pair, the LQ recurrences with λ-regularization
    registers, the σ error-bound machinery, the forward-error window
    and the optional LSQR-point transfer.
    Returns (x, niter, rNorm, ArNorm, status_code, zero_resid,
    complex_bnd).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiny = float(jnp.finfo(b.dtype).tiny)
    conlim_t = jnp.asarray(conlim, b.dtype)
    ctol_in = jnp.where(conlim_t > 0,
                        1.0 / jnp.where(conlim_t == 0, 1.0, conlim_t), 0.0)
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [lam, sigma, atol, rtol, btol, etol, utol,
                           ctol_in])

    def kernel(itmax_ref, s_ref, b_ref, pd_ref, pda_ref,
               x_ref, niter_ref, out_ref, status_ref, flags_ref,
               vpad_ref, upad_ref, wbar_ref, ev_ref):
        lam0 = s_ref[0, 0]
        sigma_v = s_ref[1, 0]
        atol_v = s_ref[2, 0]
        rtol_v = s_ref[3, 0]
        btol_v = s_ref[4, 0]
        etol_v = s_ref[5, 0]
        utol_v = s_ref[6, 0]
        ctol = s_ref[7, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        for i in range(window):
            ev_ref[i] = zero

        beta1 = jnp.sqrt(jnp.maximum(jnp.sum(bv * bv), 0))
        u0 = bv / safe(beta1)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = u0
        nv = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
        alpha0 = jnp.sqrt(jnp.maximum(jnp.sum(nv * nv), 0))
        v0 = nv / safe(alpha0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = v0
        wbar_ref[:] = v0
        eps_lim = atol_v + rtol_v * beta1
        status0 = jnp.where(
            beta1 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(alpha0 == 0, jnp.int32(_MIN_LSQ_X),
                      jnp.where(beta1 <= eps_lim, jnp.int32(_SOLVED_ZERO),
                                jnp.int32(_RUNNING))))

        carry0 = (jnp.int32(0), alpha0, beta1, lam0,
                  alpha0 * alpha0, zero, jnp.asarray(jnp.inf, T),
                  alpha0, beta1, -one, zero, -one, alpha0 * beta1,
                  zero, zero, zero, -sigma_v, -one, zero,
                  zero, beta1, alpha0 * beta1,
                  jnp.int32(0), jnp.int32(0), status0)
        # (it, alpha, beta, lam_k, anorm2, smax, smin, gbar, psi, c, s,
        #  delta, tau, zeta, zetabar, zetatilde, rhobar_sig, csig, omega,
        #  xlqnorm2, rNorm, ArNorm, zero_resid, complex_bnd, status)

        def cond(cr):
            return (cr[24] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, alpha, beta, lam_k, anorm2, smax, smin, gbar, psi,
             c_prev, s_prev, delta0, tau0, zeta0, zetabar0, zetatilde0,
             rhobar_sig0, csig0, omega0, xlqnorm2, rNorm0, ArNorm0,
             zero_resid0, complex_bnd0, status) = cr
            it = it0 + 1

            v_old = vpad_ref[P: P + rows]
            u_old = upad_ref[P: P + rows]
            mu = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - alpha * u_old
            beta_n = jnp.sqrt(jnp.maximum(jnp.sum(mu * mu), 0))
            bnz = beta_n != 0
            u = jnp.where(bnz, mu / safe(beta_n), mu)
            upad_ref[P: P + rows] = u
            nv2 = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T)
            nv2 = jnp.where(bnz, nv2 - beta_n * v_old, v_old)
            alpha_n = jnp.where(
                bnz, jnp.sqrt(jnp.maximum(jnp.sum(nv2 * nv2), 0)), alpha)
            anz = bnz & (alpha_n != 0)
            v = jnp.where(anz, nv2 / safe(alpha_n), nv2)
            vpad_ref[P: P + rows] = v

            aL = alpha_n
            bL = beta_n
            lam_nz = lam_k != 0
            cL, sL, bLr = sym_givens(beta_n, lam_k)
            aL = jnp.where(lam_nz & bnz, cL * alpha_n, aL)
            bL = jnp.where(lam_nz & bnz, bLr, bL)
            lam_kn = jnp.where(
                lam_nz & bnz,
                jnp.sqrt(lam_k * lam_k + (sL * alpha_n) ** 2), lam_k)
            anorm2_n = jnp.where(bnz, anorm2 + aL * aL + bL * bL, anorm2)
            anorm = jnp.sqrt(anorm2_n)

            cp, sp, gamma = sym_givens(gbar, bL)
            tau = -tau0 * delta0 / safe(gamma)
            delta = sp * aL
            gbar_n = -cp * aL

            if use_sigma:
                mubar = -csig0 * gamma
                csig1, ssig1, rho1 = sym_givens(rhobar_sig0, gamma)
                rhobar_sig = ssig1 * mubar + csig1 * sigma_v
                mubar = -csig1 * delta
                h = delta * csig1 / safe(rhobar_sig)
                disc = sigma_v * (sigma_v - delta * h)
                complex_bnd = (complex_bnd0 == 1) | (disc < 0)
                omega = jnp.where(disc >= 0,
                                  jnp.sqrt(jnp.maximum(disc, 0)), omega0)
                csig2, ssig2, rho2 = sym_givens(rhobar_sig, delta)
                rhobar_sig = ssig2 * mubar + csig2 * sigma_v
                csig = csig2
            else:
                rhobar_sig, csig, omega = rhobar_sig0, csig0, omega0
                complex_bnd = complex_bnd0 == 1

            ebar = -gamma * c_prev
            eta = gamma * s_prev
            c, s, eps_ = sym_givens(ebar, delta)
            smax_n = jnp.maximum(smax, jnp.maximum(eps_, jnp.abs(ebar)))
            smin_n = jnp.minimum(smin, jnp.minimum(eps_, jnp.abs(ebar)))
            acond = smax_n / jnp.maximum(smin_n, tiny)

            zold = zeta0
            zeta = (tau - zeta0 * eta) / safe(eps_)
            zetabar = zeta / safe(c)
            rNorm = jnp.sqrt((psi * cp - zold * eta) ** 2 + (psi * sp) ** 2)
            ArNorm = jnp.sqrt((gamma * eps_ * zeta) ** 2
                              + (delta * eta * zold) ** 2)
            psi_n = psi * sp

            x_ref[:] = x_ref[:] + (c * zeta) * wbar_ref[:] \
                + (s * zeta) * v
            wbar_ref[:] = s * wbar_ref[:] - c * v
            xlqnorm2_n = xlqnorm2 + zeta * zeta
            xlqnorm = jnp.sqrt(xlqnorm2_n)
            xcgnorm2 = xlqnorm2_n + zetabar * zetabar

            ev_ref[jnp.mod(it0, window)] = zeta
            err2 = zero
            for i in range(window):
                err2 = err2 + ev_ref[i] * ev_ref[i]
            err_lbnd = jnp.sqrt(err2)
            fwd_err_lbnd = (it0 >= window) & (err_lbnd
                                              <= etol_v * xlqnorm)

            if use_sigma:
                etat = omega * s
                epst = -omega * c
                taut = -tau * delta / safe(omega)
                zetatilde = (taut - zeta * etat) / safe(epst)
                disc_cg = zetatilde0 ** 2 - zetabar ** 2
                complex_bnd = complex_bnd | ((it0 > 0) & (disc_cg < 0))
                err_ubnd_cg = jnp.sqrt(jnp.maximum(disc_cg, 0))
                fwd_err_ubnd = (it0 > 0) & (disc_cg >= 0) & (
                    err_ubnd_cg <= utol_v * jnp.sqrt(xcgnorm2))
            else:
                zetatilde = zetatilde0
                fwd_err_ubnd = it0 < -1

            test1 = rNorm
            test2 = ArNorm / jnp.maximum(anorm * rNorm, tiny)
            test3 = 1.0 / jnp.maximum(acond, tiny)
            t1 = test1 / (1.0 + anorm * xlqnorm)

            solved_mach = (1.0 + test2) <= 1.0
            zero_resid_mach = (1.0 + t1) <= 1.0
            ill_cond_mach = (1.0 + test3) <= 1.0
            ill_cond_lim = test3 <= ctol
            solved_lim = test2 <= atol_v
            zero_resid_lim = test1 <= eps_lim
            zero_resid = zero_resid_mach | zero_resid_lim
            solved = solved_mach | solved_lim | zero_resid \
                | fwd_err_lbnd | fwd_err_ubnd

            code = jnp.int32(_RUNNING)
            code = jnp.where(ill_cond_mach, jnp.int32(_ILL_COND_MACH), code)
            code = jnp.where(ill_cond_lim, jnp.int32(_COND_EXCEEDED), code)
            code = jnp.where(solved, jnp.int32(_SOLVED_LSQ), code)
            code = jnp.where(zero_resid, jnp.int32(_SOLVED_ZERO), code)
            code = jnp.where(fwd_err_lbnd, jnp.int32(_FWD_LBND), code)
            code = jnp.where(fwd_err_ubnd, jnp.int32(_FWD_UBND), code)

            return (it, alpha_n, beta_n, lam_kn, anorm2_n, smax_n,
                    smin_n, gbar_n, psi_n, c, s, delta, tau, zeta,
                    zetabar, zetatilde, rhobar_sig, csig, omega,
                    xlqnorm2_n, rNorm, ArNorm,
                    zero_resid.astype(jnp.int32),
                    complex_bnd.astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        if transfer_to_lsqr:
            @pl.when((out[24] != _ZERO_RESIDUAL) & (out[24] != _MIN_LSQ_X))
            def _():
                x_ref[:] = x_ref[:] + out[14] * wbar_ref[:]
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[20]
        out_ref[1, 0] = out[21]
        status_ref[0, 0] = out[24]
        flags_ref[0, 0] = out[22]
        flags_ref[1, 0] = out[23]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, niter, scal_out, status, flags = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.SMEM((window,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 8 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, pdw, pdaw)
    return (x.reshape(-1)[:n], niter[0, 0], scal_out[0, 0],
            scal_out[1, 0], status[0, 0], flags[0, 0], flags[1, 0])


def lslq_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 8 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 8, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "nshifts",
                                   "interpret"))
def cgls_lanczos_shift_dia_fused(pd, pd_adj, offsets, offsets_adj, b,
                                 shifts, nshifts, atol, rtol, itmax,
                                 interpret=None):
    """All shifted regularized LS systems min ‖b−Ax‖² + λᵢ‖x‖² from ONE
    in-VMEM Lanczos stream on AᴴA.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/cgls.py:_cgls_shift_core (reference
    src/cgls_lanczos_shift.jl): one A and one Aᴴ stencil per iteration;
    per-shift x/p panels and scalar recurrences unrolled over the static
    ``nshifts`` axis.  Returns (X (nshifts, n), niter, rNorms, status,
    indefinite).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, pdw, pdaw, shifts_st, shifts_a, itmax_s,
     scal_s) = _ne_prolog(pd, pd_adj, offsets, offsets_adj, b, itmax,
                          [atol, rtol])
    shifts_arr = jnp.asarray(shifts, T).reshape(nshifts, 1)
    NS = nshifts

    def kernel(itmax_ref, s_ref, sh_ref, b_ref, pd_ref, pda_ref,
               X_ref, niter_ref, rnorms_ref, status_ref, indef_ref,
               vpad_ref, qpad_ref, vprev_ref, P_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        bv = b_ref[:]
        qpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        qpad_ref[P: P + rows] = bv
        Mv0 = _stencil(qpad_ref, pda_ref, shifts_a, P, rows, T)
        beta0 = jnp.sqrt(jnp.sum(Mv0 * Mv0))
        eps_lim = atol_v + rtol_v * beta0
        safe_b0 = jnp.where(beta0 == 0, jnp.ones_like(beta0), beta0)
        v0 = Mv0 / safe_b0
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = v0
        vprev_ref[:] = v0
        for i in range(NS):
            X_ref[i * rows:(i + 1) * rows] = jnp.zeros((rows, LANES), T)
            P_ref[i * rows:(i + 1) * rows] = Mv0

        conv0 = tuple((beta0 <= eps_lim).astype(jnp.int32)
                      for _ in range(NS))
        all0 = conv0[0]
        for c_ in conv0[1:]:
            all0 = all0 & c_
        status0 = jnp.where(
            beta0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(all0 == 1, jnp.int32(_SOLVED), jnp.int32(_RUNNING)))

        carry0 = ((jnp.int32(0), beta0, status0)
                  + tuple(beta0 for _ in range(NS))
                  + tuple(zero for _ in range(NS))
                  + tuple(one for _ in range(NS))
                  + tuple(beta0 for _ in range(NS))
                  + conv0
                  + tuple(jnp.int32(0) for _ in range(NS)))

        def cond(c):
            return (c[2] == _RUNNING) & (c[0] < cap)

        def body(c):
            it0, beta, status = c[:3]
            sig = c[3: 3 + NS]
            om_ = c[3 + NS: 3 + 2 * NS]
            gam = c[3 + 2 * NS: 3 + 3 * NS]
            rn = c[3 + 3 * NS: 3 + 4 * NS]
            cv = c[3 + 4 * NS: 3 + 5 * NS]
            idf = c[3 + 5 * NS: 3 + 6 * NS]

            vv = vpad_ref[P: P + rows]
            t = _stencil(vpad_ref, pd_ref, shifts_st, P, rows, T)
            qpad_ref[P: P + rows] = t
            Mv_next = _stencil(qpad_ref, pda_ref, shifts_a, P, rows, T)
            delta = jnp.sum(vv * Mv_next)
            Mv_next = Mv_next - delta * vv
            Mv_next = jnp.where(it0 > 0,
                                Mv_next - beta * vprev_ref[:], Mv_next)
            beta_n = jnp.sqrt(jnp.sum(Mv_next * Mv_next))
            safe_b = jnp.where(beta_n == 0, jnp.ones_like(beta_n), beta_n)
            v_new = Mv_next / safe_b
            vprev_ref[:] = vv
            vpad_ref[P: P + rows] = v_new

            sig_n, om_n, gam_n, rn_n, cv_n, idf_n = [], [], [], [], [], []
            for i in range(NS):
                delta_hat = delta + sh_ref[i, 0]
                gamma_i = 1.0 / (delta_hat - om_[i] / gam[i])
                indef_i = (idf[i] == 1) | (gamma_i <= 0)
                mask = ~(cv[i] == 1)
                xi = X_ref[i * rows:(i + 1) * rows]
                pi = P_ref[i * rows:(i + 1) * rows]
                X_ref[i * rows:(i + 1) * rows] = jnp.where(
                    mask, xi + gamma_i * pi, xi)
                omg = beta_n * gamma_i
                sig_i = jnp.where(mask, -omg * sig[i], sig[i])
                om2 = jnp.where(mask, omg * omg, om_[i])
                P_ref[i * rows:(i + 1) * rows] = jnp.where(
                    mask, sig_i * v_new + om2 * pi, pi)
                rn_i = jnp.where(mask, jnp.abs(sig_i), rn[i])
                cv_i = jnp.where(mask, (rn_i <= eps_lim).astype(jnp.int32),
                                 cv[i])
                sig_n.append(sig_i)
                om_n.append(om2)
                gam_n.append(jnp.where(mask, gamma_i, gam[i]))
                rn_n.append(rn_i)
                cv_n.append(cv_i)
                idf_n.append(indef_i.astype(jnp.int32))

            done = jnp.ones((), jnp.bool_)
            for i in range(NS):
                done = done & (cv_n[i] == 1)
            it = it0 + 1
            code = jnp.where(done, jnp.int32(_SOLVED), jnp.int32(_RUNNING))
            return ((it, beta_n, code) + tuple(sig_n) + tuple(om_n)
                    + tuple(gam_n) + tuple(rn_n) + tuple(cv_n)
                    + tuple(idf_n))

        out = jax.lax.while_loop(cond, body, carry0)
        niter_ref[0, 0] = out[0]
        status_ref[0, 0] = out[2]
        for i in range(NS):
            rnorms_ref[i, 0] = out[3 + 3 * NS + i]
            indef_ref[i, 0] = out[3 + 5 * NS + i]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    X, niter, rnorms, status, indef = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ) + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((NS * rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((NS, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((NS, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((NS * rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes
                                  + (2 * NS + 6) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, shifts_arr, bw, pdw, pdaw)
    Xm = X.reshape(NS, rows * LANES)[:, :n]
    return Xm, niter[0, 0], rnorms[:, 0], status[0, 0], indef[:, 0]


def cgls_lanczos_shift_dia_fused_supported(offsets, n, dtype, nshifts,
                                           stencil_dtype=None):
    """Static gate: 2 stencils + 2·nshifts+6 vectors fit in VMEM."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 2 * nshifts + 6,
                        stencil_dtype) < 100 * (1 << 20)


_SOLVED_PRIMAL_DUAL = 15


@partial(jax.jit, static_argnames=("offsets", "offsets_adj",
                                   "transfer_to_bicg", "interpret"))
def bilqr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, atol, rtol,
                    itmax, transfer_to_bicg=True, interpret=None):
    """Full BiLQR solve of Ax = b and Aᴴy = c for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/bilq.py:_bilqr_core
    on the real path (reference src/bilqr.jl): one bi-Lanczos process
    feeding the primal BiLQ recurrences and the dual QMR-style
    recurrences with independent primal/dual convergence masks.
    Returns (x, y, niter, rNorm, sNorm, status_code, flags (9,))
    where flags = [lq_tol, lq_mach, cg_tol, cg_mach, qr_tol, qr_mach,
    solved_primal, solved_dual, breakdown].

    Precision note (validated on a real v5e): BiLQR's recurrence-based
    residual estimates collapse below machine precision at f32 on
    larger problems with an independent shadow c — the GENERAL core
    shows the same spurious "zero-residual" stop (true relres O(1) at
    48³ Poisson f32, both paths).  This is the algorithm's f32
    behavior, identical in the reference; f64 parity is exact
    (tests/test_fused.py asserts true residuals ≤ 2e-8).  Prefer f64
    (CPU) or the one-sided methods for f32 adjoint solves.
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    eps_T = float(jnp.finfo(b.dtype).eps)
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, out_ref, status_ref, flags_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, dbar_ref,
               wkm3_ref, wkm2_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)
        F = jnp.int32(0)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        dbar_ref[:] = zv
        wkm3_ref[:] = zv
        wkm2_ref[:] = zv

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        cNorm = jnp.sqrt(jnp.sum(cv * cv))
        cHb = jnp.sum(cv * bv)
        beta0 = jnp.sqrt(jnp.abs(cHb))
        gamma0 = cHb / safe(beta0)
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(beta0)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = cv / safe(gamma0)
        epsL = atol_v + rtol_v * bNorm
        epsQ = atol_v + rtol_v * cNorm
        sp0 = (bNorm == 0).astype(jnp.int32)
        sd0 = (cNorm == 0).astype(jnp.int32)
        status0 = jnp.where(
            cHb == 0, jnp.int32(_BC_BREAKDOWN),
            jnp.where((sp0 == 1) & (sd0 == 1), jnp.int32(_ZERO_RESIDUAL),
                      jnp.int32(_RUNNING)))

        carry0 = (jnp.int32(0), beta0, gamma0, -one, zero, zero,
                  zero, zero, zero, zero, zero, zero, zero,
                  bNorm / safe(jnp.abs(beta0)), zero, bNorm, cNorm,
                  sp0, sd0, F, F, F, F, F, F, F, F, status0)
        # (it, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1, zeta_km2,
        #  eta_km1, zetabar, psibar_km1, eps_km3, lam_km2, norm_vk, tau,
        #  rNorm, sNorm, solved_primal, solved_dual, lq_tol, lq_mach,
        #  cg_tol, cg_mach, qr_tol, qr_mach, cgflag, breakdown, status)

        def cond(cr):
            return (cr[27] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1,
             zeta_km2, eta_km1, zetabar0, psibar_km1, eps_km3, lam_km2,
             norm_vk, tau0, rNorm0, sNorm0, sp_, sd_, lq_t, lq_m, cg_t,
             cg_m, qr_t, qr_m, cgflag, brk0, status) = cr
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            q = _stencil(vpad_ref, pd_ref, shifts, P, rows, T) \
                - gamma * vkm1_ref[:]
            p = _stencil(upad_ref, pda_ref, shifts_a, P, rows, T) \
                - beta * ukm1_ref[:]
            alpha = jnp.sum(uk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            pHq = jnp.sum(p * q)
            beta_kp1 = jnp.sqrt(jnp.abs(pHq))
            gamma_kp1 = pHq / safe(beta_kp1)

            ck_g, sk_g, d_km1 = sym_givens(dbar_km1, gamma)
            ck = jnp.where(is1, -one, ck_g)
            sk = jnp.where(is1, zero, sk_g)
            eps_km2 = s_km1 * beta
            lam2 = ck * beta + sk * alpha
            dbar2 = sk * beta - ck * alpha
            lam3 = -c_km1 * ck * beta + sk * alpha
            dbar3 = -c_km1 * sk * beta - ck * alpha
            lam_km1 = jnp.where(is2, lam2, lam3)
            dbar_k = jnp.where(is1, alpha, jnp.where(is2, dbar2, dbar3))

            # --- primal block (skipped once solved) ---
            pm = sp_ == 0
            pm_s = jnp.where(pm, one, zero)
            zeta_km1_new = jnp.where(pm & ge2, eta_km1 / safe(d_km1),
                                     zeta_km1)
            zeta_km2_new = jnp.where(pm & (it >= 3), zeta_km1, zeta_km2)
            eta_k = jnp.where(
                pm,
                jnp.where(is1, beta,
                          jnp.where(is2, -lam_km1 * zeta_km1_new,
                                    -eps_km2 * zeta_km2_new
                                    - lam_km1 * zeta_km1_new)),
                eta_km1)
            x_add = jnp.where(pm & ge2, zeta_km1_new, zero)
            x_ref[:] = x_ref[:] + (x_add * ck) * dbar_ref[:] \
                + (x_add * sk) * vk
            dbar_ref[:] = jnp.where(
                pm, jnp.where(is1, vk, sk * dbar_ref[:] - ck * vk),
                dbar_ref[:])

            # --- dual block (uses the OLD uₖ₋₁ buffer) ---
            dmv = sd_ == 0
            psi_km1 = jnp.where(is1, zero, ck * psibar_km1)
            psibar_k = jnp.where(is1, gamma, sk * psibar_km1)
            w2 = ukm1_ref[:] / safe(d_km1)
            w3 = (ukm1_ref[:] - lam_km2 * wkm2_ref[:]) / safe(d_km1)
            w4 = (ukm1_ref[:] - lam_km2 * wkm2_ref[:]
                  - eps_km3 * wkm3_ref[:]) / safe(d_km1)
            w_km1 = jnp.where(is2, w2, jnp.where(it == 3, w3, w4))
            y_add = jnp.where(dmv & ge2, psi_km1, zero)
            y_ref[:] = y_ref[:] + y_add * w_km1
            tau = jnp.where(dmv, tau0 + jnp.sum(uk * uk), tau0)
            sNorm = jnp.where(dmv, jnp.abs(psibar_k) * jnp.sqrt(tau),
                              sNorm0)

            nz = pHq != 0
            vk_new = jnp.where(nz, q / safe(beta_kp1), vk)
            uk_new = jnp.where(nz, p / safe(gamma_kp1), uk)
            vHv = jnp.sum(vk * vk_new)
            norm_vkp1 = jnp.sqrt(jnp.sum(vk_new * vk_new))

            mu = beta * (s_km1 * zeta_km2_new - c_km1 * ck * zeta_km1_new) \
                + alpha * sk * zeta_km1_new
            om = beta_kp1 * sk * zeta_km1_new
            th = mu * om * vHv
            rNorm_lq = jnp.where(
                is1, rNorm0,
                jnp.sqrt(mu * mu * norm_vk * norm_vk
                         + om * om * norm_vkp1 * norm_vkp1 + 2 * th))
            rNorm_lq = jnp.where(pm, rNorm_lq, rNorm0)

            dbar_ok = jnp.abs(dbar_k) > eps_T
            zetabar = jnp.where(pm & dbar_ok, eta_k / safe(dbar_k),
                                zetabar0)
            rho = beta_kp1 * (sk * zeta_km1_new - ck * zetabar)
            rNorm_cg = jnp.abs(rho) * norm_vkp1

            if transfer_to_bicg:
                cg_t_b = dbar_ok & (rNorm_cg <= epsL)
                cg_m_b = dbar_ok & ((rNorm_cg + 1.0) <= 1.0)
            else:
                cg_t_b = rNorm_lq < -1
                cg_m_b = rNorm_lq < -1
            lq_t_n = jnp.where(pm, (rNorm_lq <= epsL).astype(jnp.int32),
                               lq_t)
            lq_m_n = jnp.where(pm, ((rNorm_lq + 1.0) <= 1.0)
                               .astype(jnp.int32), lq_m)
            cg_t_n = jnp.where(pm, cg_t_b.astype(jnp.int32), cg_t)
            cg_m_n = jnp.where(pm, cg_m_b.astype(jnp.int32), cg_m)
            solved_lq = (lq_t_n == 1) | (lq_m_n == 1)
            solved_cg = (cg_t_n == 1) | (cg_m_n == 1)
            sp_n = jnp.where(pm & (solved_lq | solved_cg), jnp.int32(1),
                             sp_)

            qr_t_n = jnp.where(dmv, (sNorm <= epsQ).astype(jnp.int32),
                               qr_t)
            qr_m_n = jnp.where(dmv, ((sNorm + 1.0) <= 1.0)
                               .astype(jnp.int32), qr_m)
            sd_n = jnp.where(dmv & ((qr_t_n == 1) | (qr_m_n == 1)),
                             jnp.int32(1), sd_)

            brk = (~solved_lq) & (~solved_cg) & (pHq == 0)
            code = jnp.where(
                brk, jnp.int32(_UV_BREAKDOWN),
                jnp.where((sp_n == 1) & (sd_n == 1),
                          jnp.int32(_SOLVED_PRIMAL_DUAL),
                          jnp.int32(_RUNNING)))

            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = vk_new
            upad_ref[P: P + rows] = uk_new
            wkm3_ref[:] = jnp.where(ge2, wkm2_ref[:], wkm3_ref[:])
            wkm2_ref[:] = jnp.where(ge2, w_km1, wkm2_ref[:])

            cgflag_n = jnp.where(
                (cgflag == 1) | (solved_cg & pm & ~solved_lq),
                jnp.int32(1), cgflag)

            return (it, beta_kp1, gamma_kp1, ck, sk, dbar_k,
                    zeta_km1_new, zeta_km2_new, eta_k, zetabar, psibar_k,
                    jnp.where(it >= 3, eps_km2, eps_km3),
                    jnp.where(ge2, lam_km1, lam_km2),
                    norm_vkp1, tau, rNorm_lq, sNorm,
                    sp_n, sd_n, lq_t_n, lq_m_n, cg_t_n, cg_m_n,
                    qr_t_n, qr_m_n, cgflag_n,
                    brk.astype(jnp.int32), code)

        out = jax.lax.while_loop(cond, body, carry0)
        @pl.when(out[25] == 1)
        def _():
            x_ref[:] = x_ref[:] + out[9] * dbar_ref[:]
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[15]
        out_ref[1, 0] = out[16]
        status_ref[0, 0] = out[27]
        for i, j in enumerate((19, 20, 21, 22, 23, 24, 17, 18, 26)):
            flags_ref[i, 0] = out[j]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, scal_out, status, flags = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((9, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 13 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            scal_out[0, 0], scal_out[1, 0], status[0, 0], flags[:, 0])


def bilqr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 13 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 13, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj",
                                   "transfer_to_usymcg", "interpret"))
def trilqr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, atol, rtol,
                     itmax, transfer_to_usymcg=True, interpret=None):
    """Full TriLQR solve of Ax = b and Aᴴy = c for a DIA matrix, one launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/usymlq.py:_trilqr_core on the real square path
    (reference src/trilqr.jl): one SSY process feeding the primal
    USYMLQ recurrences and the dual QR recurrences with independent
    masks and the dual inconsistency test.
    Returns (x, y, niter, rNorm, sNorm, status_code, flags (9,)) where
    flags = [lq_tol, lq_mach, cg_tol, cg_mach, qr_tol, qr_mach,
    solved_primal, solved_dual, inconsistent_dual].
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    eps_T = float(jnp.finfo(b.dtype).eps)
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, out_ref, status_ref, flags_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref, dbar_ref,
               wkm3_ref, wkm2_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)
        F = jnp.int32(0)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        dbar_ref[:] = zv
        wkm3_ref[:] = zv
        wkm2_ref[:] = zv

        bNorm = jnp.sqrt(jnp.sum(bv * bv))
        cNorm = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = bv / safe(bNorm)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = cv / safe(cNorm)
        epsL = atol_v + rtol_v * bNorm
        epsQ = atol_v + rtol_v * cNorm
        sp0 = (bNorm == 0).astype(jnp.int32)
        sd0 = (cNorm == 0).astype(jnp.int32)
        status0 = jnp.where((sp0 == 1) & (sd0 == 1),
                            jnp.int32(_ZERO_RESIDUAL),
                            jnp.int32(_RUNNING))

        carry0 = (jnp.int32(0), bNorm, cNorm, -one, zero, zero,
                  zero, zero, zero, zero, zero, zero, zero, zero,
                  bNorm, cNorm,
                  sp0, sd0, F, F, F, F, F, F, F, F, status0)
        # (it, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1, zeta_km2,
        #  eta_km1, zetabar, psibar_km1, eps_km3, lam_km2, kappa, rNorm,
        #  sNorm, solved_primal, solved_dual, lq_tol, lq_mach, cg_tol,
        #  cg_mach, qr_tol, qr_mach, cgflag, incons_dual, status)

        def cond(cr):
            return (cr[26] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, c_km1, s_km1, dbar_km1, zeta_km1,
             zeta_km2, eta_km1, zetabar0, psibar_km1, eps_km3, lam_km2,
             kappa, rNorm0, sNorm0, sp_, sd_, lq_t, lq_m, cg_t, cg_m,
             qr_t, qr_m, cgflag, incd, status) = cr
            it = it0 + 1
            is1 = it == 1
            is2 = it == 2
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            g2 = jnp.where(ge2, one, zero)
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T) \
                - (g2 * gamma) * vkm1_ref[:]
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T) \
                - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            beta_kp1 = jnp.sqrt(jnp.sum(q * q))
            gamma_kp1 = jnp.sqrt(jnp.sum(p * p))

            ck_g, sk_g, d_km1 = sym_givens(dbar_km1, gamma)
            ck = jnp.where(is1, -one, ck_g)
            sk = jnp.where(is1, zero, sk_g)
            eps_km2 = s_km1 * beta
            lam2 = ck * beta + sk * alpha
            dbar2 = sk * beta - ck * alpha
            lam3 = -c_km1 * ck * beta + sk * alpha
            dbar3 = -c_km1 * sk * beta - ck * alpha
            lam_km1 = jnp.where(is2, lam2, lam3)
            dbar_k = jnp.where(is1, alpha, jnp.where(is2, dbar2, dbar3))

            # --- primal (USYMLQ) ---
            pm = sp_ == 0
            zeta_km1_new = jnp.where(pm & ge2, eta_km1 / safe(d_km1),
                                     zeta_km1)
            zeta_km2_new = jnp.where(pm & (it >= 3), zeta_km1, zeta_km2)
            eta_k = jnp.where(
                pm,
                jnp.where(is1, beta,
                          jnp.where(is2, -lam_km1 * zeta_km1_new,
                                    -eps_km2 * zeta_km2_new
                                    - lam_km1 * zeta_km1_new)),
                eta_km1)
            x_add = jnp.where(pm & ge2, zeta_km1_new, zero)
            x_ref[:] = x_ref[:] + (x_add * ck) * dbar_ref[:] \
                + (x_add * sk) * uk
            dbar_ref[:] = jnp.where(
                pm, jnp.where(is1, uk, sk * dbar_ref[:] - ck * uk),
                dbar_ref[:])

            mu = beta * (s_km1 * zeta_km2_new - c_km1 * ck * zeta_km1_new) \
                + alpha * sk * zeta_km1_new
            om = beta_kp1 * sk * zeta_km1_new
            rNorm_lq = jnp.where(is1, rNorm0,
                                 jnp.sqrt(mu * mu + om * om))
            rNorm_lq = jnp.where(pm, rNorm_lq, rNorm0)

            dbar_ok = jnp.abs(dbar_k) > eps_T
            zetabar = jnp.where(pm & dbar_ok, eta_k / safe(dbar_k),
                                zetabar0)
            rho = beta_kp1 * (sk * zeta_km1_new - ck * zetabar)
            rNorm_cg = jnp.abs(rho)

            if transfer_to_usymcg:
                cg_t_b = dbar_ok & (rNorm_cg <= epsL)
                cg_m_b = dbar_ok & ((rNorm_cg + 1.0) <= 1.0)
            else:
                cg_t_b = rNorm_lq < -1
                cg_m_b = rNorm_lq < -1
            lq_t_n = jnp.where(pm, (rNorm_lq <= epsL).astype(jnp.int32),
                               lq_t)
            lq_m_n = jnp.where(pm, ((rNorm_lq + 1.0) <= 1.0)
                               .astype(jnp.int32), lq_m)
            cg_t_n = jnp.where(pm, cg_t_b.astype(jnp.int32), cg_t)
            cg_m_n = jnp.where(pm, cg_m_b.astype(jnp.int32), cg_m)
            solved_lq = (lq_t_n == 1) | (lq_m_n == 1)
            solved_cg = (cg_t_n == 1) | (cg_m_n == 1)
            sp_n = jnp.where(pm & (solved_lq | solved_cg), jnp.int32(1),
                             sp_)

            # --- dual (QR on Aᴴy = c), directions from the OLD vₖ₋₁ ---
            dmv = sd_ == 0
            psi_km1 = jnp.where(is1, zero, ck * psibar_km1)
            psibar_k = jnp.where(is1, gamma, sk * psibar_km1)
            w2d = vkm1_ref[:] / safe(d_km1)
            w3d = (vkm1_ref[:] - lam_km2 * wkm2_ref[:]) / safe(d_km1)
            w4d = (vkm1_ref[:] - lam_km2 * wkm2_ref[:]
                   - eps_km3 * wkm3_ref[:]) / safe(d_km1)
            w_km1d = jnp.where(is2, w2d, jnp.where(it == 3, w3d, w4d))
            y_add = jnp.where(dmv & ge2, psi_km1, zero)
            y_ref[:] = y_ref[:] + y_add * w_km1d
            sNorm = jnp.where(dmv, jnp.abs(psibar_k), sNorm0)
            AsNorm = jnp.abs(psibar_k) * jnp.sqrt(
                dbar_k * dbar_k + (ck * beta_kp1) ** 2)
            kappa_n = jnp.where(is1, atol_v + rtol_v * AsNorm, kappa)
            qr_t_n = jnp.where(dmv, (sNorm <= epsQ).astype(jnp.int32),
                               qr_t)
            qr_m_n = jnp.where(dmv, ((sNorm + 1.0) <= 1.0)
                               .astype(jnp.int32), qr_m)
            incd_n = jnp.where(dmv, (AsNorm <= kappa_n).astype(jnp.int32),
                               incd)
            sd_n = jnp.where(
                dmv & ((qr_t_n == 1) | (qr_m_n == 1) | (incd_n == 1)),
                jnp.int32(1), sd_)

            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = jnp.where(
                beta_kp1 != 0, q / safe(beta_kp1), vk)
            upad_ref[P: P + rows] = jnp.where(
                gamma_kp1 != 0, p / safe(gamma_kp1), uk)
            wkm3_ref[:] = jnp.where(ge2, wkm2_ref[:], wkm3_ref[:])
            wkm2_ref[:] = jnp.where(ge2, w_km1d, wkm2_ref[:])

            code = jnp.where((sp_n == 1) & (sd_n == 1),
                             jnp.int32(_SOLVED_PRIMAL_DUAL),
                             jnp.int32(_RUNNING))
            cgflag_n = jnp.where(
                (cgflag == 1) | (solved_cg & pm & ~solved_lq),
                jnp.int32(1), cgflag)

            return (it, beta_kp1, gamma_kp1, ck, sk, dbar_k,
                    zeta_km1_new, zeta_km2_new, eta_k, zetabar, psibar_k,
                    jnp.where(it >= 3, eps_km2, eps_km3),
                    jnp.where(ge2, lam_km1, lam_km2),
                    kappa_n, rNorm_lq, sNorm,
                    sp_n, sd_n, lq_t_n, lq_m_n, cg_t_n, cg_m_n,
                    qr_t_n, qr_m_n, cgflag_n, incd_n, code)

        out = jax.lax.while_loop(cond, body, carry0)
        @pl.when(out[24] == 1)
        def _():
            x_ref[:] = x_ref[:] + out[9] * dbar_ref[:]
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[14]
        out_ref[1, 0] = out[15]
        status_ref[0, 0] = out[26]
        for i, j in enumerate((18, 19, 20, 21, 22, 23, 16, 17, 25)):
            flags_ref[i, 0] = out[j]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, scal_out, status, flags = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((9, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 13 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            scal_out[0, 0], scal_out[1, 0], status[0, 0], flags[:, 0])


def trilqr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 13 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 13, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offsets", "offsets_adj", "ls", "ln",
                                   "interpret"))
def usymlqr_dia_fused(pd, pd_adj, offsets, offsets_adj, b, c, atol, rtol,
                      itmax, ls=True, ln=True, interpret=None):
    """Full USYMLQR solve of [I A; Aᴴ 0][x;y]=[b;c], one kernel launch.

    Whole-solve-in-VMEM port of
    krylov_tpu/solvers/usymlq.py:_usymlqr_core on the real square path
    (reference src/usymlqr.jl): one SSY process feeding the
    least-squares QR recurrences (y, r, ‖Aᴴr‖ inconsistency test) and
    the least-norm LQ recurrences (xᴸ, z), with the saddle-point
    composition x ← xᴸ + r, y ← yₖ + zᴸ applied in-kernel.
    Returns (x, y, niter, rNorm_ls, rNorm_ln, status_code, inconsistent).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (n, nd, T, rows, P, bw, cw, pdw, pdaw, shifts, shifts_a, itmax_s,
     scal_s) = _tri_prolog(pd, pd_adj, offsets, offsets_adj, b, c, itmax,
                           [atol, rtol])

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pd_ref, pda_ref,
               x_ref, y_ref, niter_ref, out_ref, status_ref, incon_ref,
               vpad_ref, upad_ref, vkm1_ref, ukm1_ref,
               r_ref, z_ref, wkm1_ref, wkm2_ref, dbar_ref):
        atol_v = s_ref[0, 0]
        rtol_v = s_ref[1, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)
        one = jnp.ones((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        z_ref[:] = zv
        vkm1_ref[:] = zv
        ukm1_ref[:] = zv
        wkm1_ref[:] = zv
        wkm2_ref[:] = zv
        dbar_ref[:] = zv

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        vpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        vpad_ref[P: P + rows] = jnp.where(beta0 != 0, bv / safe(beta0), zv)
        upad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        upad_ref[P: P + rows] = jnp.where(gamma0 != 0,
                                          cv / safe(gamma0), zv)
        r_ref[:] = bv if ls else zv
        eps_ls = atol_v + rtol_v * beta0
        eps_ln = atol_v + rtol_v * gamma0
        sls0 = ((beta0 <= eps_ls) if ls else (beta0 == beta0))
        sln0 = ((gamma0 <= eps_ln) if ln else (gamma0 == gamma0))
        if not ls:
            sls0 = beta0 == beta0     # always True
        if not ln:
            sln0 = gamma0 == gamma0
        status0 = jnp.where(sls0 & sln0, jnp.int32(_SOLVED),
                            jnp.int32(_RUNNING))

        carry0 = (jnp.int32(0), beta0, gamma0, -one, zero, -one, zero,
                  beta0, zero, zero, zero, zero, zero, beta0, gamma0,
                  jnp.asarray(jnp.inf, T),
                  sls0.astype(jnp.int32), sln0.astype(jnp.int32),
                  jnp.int32(0), status0)
        # (it, beta, gamma, c_km2, s_km2, c_km1, s_km1, phibar,
        #  zeta_km1, zeta_km2, eta_km1, delta_km1, kappa, rNorm_ls,
        #  rNorm_ln, AHrNorm, solved_ls, solved_ln, incons, status)

        def cond(cr):
            return (cr[19] == _RUNNING) & (cr[0] < cap)

        def body(cr):
            (it0, beta, gamma, c_km2, s_km2, c_km1, s_km1, phibar,
             zeta_km1, zeta_km2, eta_km1, delta_km1, kappa, rNorm_ls0,
             rNorm_ln0, AHrNorm0, sls, sln, incons0, status) = cr
            it = it0 + 1
            is1 = it == 1
            ge2 = it >= 2

            vk = vpad_ref[P: P + rows]
            uk = upad_ref[P: P + rows]
            g2 = jnp.where(ge2, one, zero)
            q = _stencil(upad_ref, pd_ref, shifts, P, rows, T) \
                - (g2 * gamma) * vkm1_ref[:]
            p = _stencil(vpad_ref, pda_ref, shifts_a, P, rows, T) \
                - (g2 * beta) * ukm1_ref[:]
            alpha = jnp.sum(vk * q)
            q = q - alpha * vk
            p = p - alpha * uk
            beta_kp1 = jnp.sqrt(jnp.sum(q * q))
            gamma_kp1 = jnp.sqrt(jnp.sum(p * p))

            eps_km2 = s_km2 * gamma
            lambdabar = -c_km2 * gamma
            lam_km1 = c_km1 * lambdabar + s_km1 * alpha
            deltabar = s_km1 * lambdabar - c_km1 * alpha
            ck, sk, delta = sym_givens(deltabar, beta_kp1)

            w_new = (uk - lam_km1 * wkm1_ref[:]
                     - eps_km2 * wkm2_ref[:]) / safe(delta)

            # --- least-squares part (reference usymlqr.jl:334-367) ---
            als_b = (sls == 0) if ls else (it < -1)
            als = jnp.where(als_b, one, zero)
            phi = ck * phibar
            phibar_next = sk * phibar
            y_ref[:] = y_ref[:] + (als * phi) * w_new
            rfac = jnp.where(beta_kp1 != 0,
                             -ck * phibar_next / safe(beta_kp1), zero)
            r_old = r_ref[:]
            r_ref[:] = jnp.where(als_b,
                                 (sk * sk) * r_old + rfac * q, r_old)
            rNorm_ls = jnp.where(als_b, jnp.abs(phibar_next), rNorm_ls0)
            AHrNorm = jnp.where(
                als_b,
                jnp.abs(phibar) * jnp.sqrt(
                    deltabar * deltabar + (c_km1 * gamma_kp1) ** 2),
                AHrNorm0)
            kappa_n = jnp.where((it == 1) if ls else (it < -1),
                                atol_v + rtol_v * AHrNorm, kappa)
            sls_n = jnp.where(als_b & (rNorm_ls <= eps_ls), jnp.int32(1),
                              sls)
            incons = jnp.where(
                als_b,
                (~(rNorm_ls <= eps_ls) & (AHrNorm <= kappa_n))
                .astype(jnp.int32),
                incons0)
            phibar_new = jnp.where(als_b, phibar_next, phibar)

            # --- least-norm part (reference usymlqr.jl:370-436) ---
            aln_b = (sln == 0) if ln else (it < -1)
            zeta_km1_new = jnp.where(aln_b & ge2,
                                     eta_km1 / safe(delta_km1), zeta_km1)
            zeta_km2_new = jnp.where(aln_b & (it >= 3), zeta_km1,
                                     zeta_km2)
            eta = jnp.where(
                aln_b,
                jnp.where(is1, gamma,
                          -eps_km2 * zeta_km2_new
                          - lam_km1 * zeta_km1_new),
                eta_km1)
            x_add = jnp.where(aln_b & ge2, zeta_km1_new, zero)
            x_ref[:] = x_ref[:] + (x_add * c_km1) * dbar_ref[:] \
                + (x_add * s_km1) * vk
            z_ref[:] = z_ref[:] - x_add * wkm1_ref[:]
            dbar_ref[:] = jnp.where(
                aln_b,
                jnp.where(is1, vk, s_km1 * dbar_ref[:] - c_km1 * vk),
                dbar_ref[:])
            mu = gamma * (s_km2 * zeta_km2_new
                          - c_km2 * c_km1 * zeta_km1_new) \
                + alpha * s_km1 * zeta_km1_new
            om = gamma_kp1 * s_km1 * zeta_km1_new
            rNorm_ln = jnp.where(
                aln_b & ge2, jnp.sqrt(mu * mu + om * om), rNorm_ln0)
            sln_n = jnp.where(aln_b & (rNorm_ln <= eps_ln), jnp.int32(1),
                              sln)
            eta_km1_new = jnp.where(aln_b, eta, eta_km1)

            vkm1_ref[:] = vk
            ukm1_ref[:] = uk
            vpad_ref[P: P + rows] = jnp.where(
                beta_kp1 != 0, q / safe(beta_kp1), zv)
            upad_ref[P: P + rows] = jnp.where(
                gamma_kp1 != 0, p / safe(gamma_kp1), zv)
            wkm2_ref[:] = wkm1_ref[:]
            wkm1_ref[:] = w_new

            solved = (sls_n == 1) & (sln_n == 1)
            code = jnp.where(
                solved, jnp.int32(_SOLVED),
                jnp.where(incons == 1, jnp.int32(_INCONSISTENT),
                          jnp.int32(_RUNNING)))

            return (it, beta_kp1, gamma_kp1, c_km1, s_km1, ck, sk,
                    phibar_new, zeta_km1_new, zeta_km2_new, eta_km1_new,
                    delta, kappa_n, rNorm_ls, rNorm_ln, AHrNorm,
                    sls_n, sln_n, incons, code)

        out = jax.lax.while_loop(cond, body, carry0)
        # Saddle-point composition (reference usymlqr.jl:494-497).
        x_ref[:] = x_ref[:] + r_ref[:]
        y_ref[:] = y_ref[:] + z_ref[:]
        niter_ref[0, 0] = out[0]
        out_ref[0, 0] = out[13]
        out_ref[1, 0] = out[14]
        status_ref[0, 0] = out[19]
        incon_ref[0, 0] = out[18]

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd.dtype).itemsize
    x, y, niter, scal_out, status, incon = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
            pltpu.VMEM((rows, LANES), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * nd * pd_bytes + 15 * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdw, pdaw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            scal_out[0, 0], scal_out[1, 0], status[0, 0], incon[0, 0])


def usymlqr_dia_fused_supported(offsets, n, dtype, stencil_dtype=None):
    """Static gate: 2 stencils + 15 vectors fit in VMEM (~100 MB)."""
    if jnp.dtype(dtype).kind != "f":
        return False
    both = tuple(offsets) + tuple(-int(k) for k in offsets)
    return _fused_bytes(both, n, dtype, 15, stencil_dtype) < 100 * (1 << 20)


@partial(jax.jit, static_argnames=("offs_a", "offs_b", "mem", "interpret"))
def gpmr_dia_fused(pd_a, pd_b, offs_a, offs_b, b, c, lam, mu,
                   atol, rtol, itmax, mem=20, interpret=None):
    """Full GPMR solve of [λI A; B μI][x;y]=[b;c], one kernel launch.

    Whole-solve-in-VMEM port of krylov_tpu/solvers/gpmr.py:_gpmr_core on
    the real path (C = D = E = F = I; reference src/gpmr.jl): the
    Montoison-Orban process with two independent DIA operators (A
    applied to the U stream, B to the V stream), the interleaved
    two-column Sₖ₊₁.ₖ updates with the reflection-quadruple ring on
    SMEM, and in-kernel back substitution + basis accumulation.
    Returns (x, y, niter, rNorm, status_code, inconsistent).
    """
    from .kops import sym_givens

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    nd_a = pd_a.shape[0]
    nd_b = pd_b.shape[0]
    T = b.dtype
    btol = float(jnp.finfo(T).eps) ** 0.75
    rows, P = _plan(tuple(offs_a) + tuple(offs_b), n)
    npad = rows * LANES
    two = 2 * mem

    bw = jnp.zeros((npad,), T).at[:n].set(b).reshape(rows, LANES)
    cw = jnp.zeros((npad,), T).at[:n].set(c).reshape(rows, LANES)
    pdaw = jnp.zeros((nd_a, npad), pd_a.dtype).at[:, :n].set(
        pd_a).reshape(nd_a, rows, LANES)
    pdbw = jnp.zeros((nd_b, npad), pd_b.dtype).at[:, :n].set(
        pd_b).reshape(nd_b, rows, LANES)
    sh_a = tuple((int(k) // LANES, int(k) % LANES) for k in offs_a)
    sh_b = tuple((int(k) // LANES, int(k) % LANES) for k in offs_b)
    itmax_s = jnp.asarray(itmax, jnp.int32).reshape(1, 1)
    scal_s = jnp.asarray([lam, mu, atol, rtol], T).reshape(4, 1)

    def kernel(itmax_ref, s_ref, b_ref, c_ref, pda_ref, pdb_ref,
               x_ref, y_ref, niter_ref, rnorm_ref, status_ref, incon_ref,
               V_ref, U_ref, qpad_ref, ppad_ref,
               h_ref, f_ref, co_ref, ce_ref, R_ref, zt_ref, gc_ref,
               gs_ref):
        lam_v = s_ref[0, 0]
        mu_v = s_ref[1, 0]
        atol_v = s_ref[2, 0]
        rtol_v = s_ref[3, 0]
        cap = itmax_ref[0, 0]
        zero = jnp.zeros((), T)

        def safe(d):
            return jnp.where(d == 0, jnp.ones_like(d), d)

        bv = b_ref[:]
        cv = c_ref[:]
        zv = jnp.zeros((rows, LANES), T)
        x_ref[:] = zv
        y_ref[:] = zv
        qpad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        V_ref[:] = jnp.zeros(((mem + 1) * rows, LANES), T)
        U_ref[:] = jnp.zeros(((mem + 1) * rows, LANES), T)
        for i in range(two + 2):
            zt_ref[i] = zero
        for i in range(4 * mem):
            gc_ref[i] = zero
            gs_ref[i] = zero

        beta0 = jnp.sqrt(jnp.sum(bv * bv))
        gamma0 = jnp.sqrt(jnp.sum(cv * cv))
        V_ref[pl.ds(0, rows), :] = jnp.where(beta0 != 0,
                                             bv / safe(beta0), zv)
        U_ref[pl.ds(0, rows), :] = jnp.where(gamma0 != 0,
                                             cv / safe(gamma0), zv)
        rNorm0 = jnp.sqrt(beta0 * beta0 + gamma0 * gamma0)
        eps_lim = atol_v + rtol_v * rNorm0
        zt_ref[0] = beta0
        zt_ref[1] = gamma0
        status0 = jnp.where(
            rNorm0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rNorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(carry):
            it, rNorm, incons, status = carry
            return (status == _RUNNING) & (it < cap)

        def body(carry):
            it0, rNorm, incons, status = carry
            k = it0 + 1            # 1-based
            ki = it0               # 0-based slot

            vk = V_ref[pl.ds(ki * rows, rows), :]
            uk = U_ref[pl.ds(ki * rows, rows), :]
            qpad_ref[P: P + rows] = uk
            q = _stencil(qpad_ref, pda_ref, sh_a, P, rows, T)   # A·uk
            ppad_ref[P: P + rows] = vk
            p = _stencil(ppad_ref, pdb_ref, sh_b, P, rows, T)   # B·vk

            # CGS against V[0..k-1] and U[0..k-1].
            def dots(j, _):
                vj = V_ref[pl.ds(j * rows, rows), :]
                uj = U_ref[pl.ds(j * rows, rows), :]
                h_ref[j] = jnp.sum(vj * q)
                f_ref[j] = jnp.sum(uj * p)
                return 0

            jax.lax.fori_loop(0, k, dots, 0)

            def sub(j, qp):
                qq, pp = qp
                vj = V_ref[pl.ds(j * rows, rows), :]
                uj = U_ref[pl.ds(j * rows, rows), :]
                return (qq - h_ref[j] * vj, pp - f_ref[j] * uj)

            q, p = jax.lax.fori_loop(0, k, sub, (q, p))
            Haux = jnp.sqrt(jnp.sum(q * q))
            Faux = jnp.sqrt(jnp.sum(p * p))

            # Build the two new columns of Sₖ₊₁.ₖ on SMEM.
            for d in range(two + 2):
                co_ref[d] = zero
                ce_ref[d] = zero

            def fill(j, _):
                co_ref[2 * j + 1] = f_ref[j]
                ce_ref[2 * j] = h_ref[j]
                return 0

            jax.lax.fori_loop(0, k, fill, 0)
            co_ref[2 * k - 2] = co_ref[2 * k - 2] + lam_v
            ce_ref[2 * k - 1] = ce_ref[2 * k - 1] + mu_v

            # Apply previous reflection quadruples i = 1..k-1.
            def rot(i0, _):
                @pl.when(i0 <= k - 2)
                def _():
                    c1 = gc_ref[4 * i0]
                    s1 = gs_ref[4 * i0]
                    c2 = gc_ref[4 * i0 + 1]
                    s2 = gs_ref[4 * i0 + 1]
                    c3 = gc_ref[4 * i0 + 2]
                    s3 = gs_ref[4 * i0 + 2]
                    c4 = gc_ref[4 * i0 + 3]
                    s4 = gs_ref[4 * i0 + 3]
                    for col in (co_ref, ce_ref):
                        r1 = col[2 * i0]
                        r2 = col[2 * i0 + 1]
                        r3 = col[2 * i0 + 2]
                        r4 = col[2 * i0 + 3]
                        t = c1 * r1 + s1 * r4
                        r4 = s1 * r1 - c1 * r4
                        r1 = t
                        t = c2 * r1 + s2 * r2
                        r2 = s2 * r1 - c2 * r2
                        r1 = t
                        t = c3 * r2 + s3 * r4
                        r4 = s3 * r2 - c3 * r4
                        r2 = t
                        t = c4 * r2 + s4 * r3
                        r3 = s4 * r2 - c4 * r3
                        r2 = t
                        col[2 * i0] = r1
                        col[2 * i0 + 1] = r2
                        col[2 * i0 + 2] = r3
                        col[2 * i0 + 3] = r4
                return 0

            jax.lax.fori_loop(0, mem, rot, 0)

            # Current reflections (reference src/gpmr.jl:411-443).
            do = co_ref[2 * k - 2]
            om_ = co_ref[2 * k - 1]
            de1 = ce_ref[2 * k - 2]
            de2 = ce_ref[2 * k - 1]
            c1k, s1k, do = sym_givens(do, Faux)
            theta = s1k * de1
            de1 = c1k * de1
            c2k, s2k, do = sym_givens(do, om_)
            t_ = c2k * de1 + s2k * de2
            de2 = s2k * de1 - c2k * de2
            de1 = t_
            c3k, s3k, de2 = sym_givens(de2, theta)
            c4k, s4k, de2 = sym_givens(de2, Haux)
            co_ref[2 * k - 2] = do
            co_ref[2 * k - 1] = zero
            ce_ref[2 * k - 2] = de1
            ce_ref[2 * k - 1] = de2

            def wR(i, _):
                R_ref[(2 * k - 2) * (two + 2) + i] = co_ref[i]
                R_ref[(2 * k - 1) * (two + 2) + i] = ce_ref[i]
                return 0

            jax.lax.fori_loop(0, 2 * k, wR, 0)

            # Update t̄ₖ (reference :445-466).
            z1 = zt_ref[2 * k - 2]
            z2 = zt_ref[2 * k - 1]
            tbar_pp = s1k * z1
            z1 = c1k * z1
            t_ = c2k * z1 + s2k * z2
            z2 = s2k * z1 - c2k * z2
            z1 = t_
            t_ = c3k * z2 + s3k * tbar_pp
            tbar_pp = s3k * z2 - c3k * tbar_pp
            z2 = t_
            tbar_p = s4k * z2
            z2 = c4k * z2
            zt_ref[2 * k - 2] = z1
            zt_ref[2 * k - 1] = z2

            gc_ref[4 * k - 4] = c1k
            gs_ref[4 * k - 4] = s1k
            gc_ref[4 * k - 3] = c2k
            gs_ref[4 * k - 3] = s2k
            gc_ref[4 * k - 2] = c3k
            gs_ref[4 * k - 2] = s3k
            gc_ref[4 * k - 1] = c4k
            gs_ref[4 * k - 1] = s4k

            rNorm_n = jnp.sqrt(tbar_p * tbar_p + tbar_pp * tbar_pp)
            solved = (rNorm_n <= eps_lim) | ((rNorm_n + 1.0) <= 1.0)
            breakdown = (Faux <= btol) & (Haux <= btol)
            tired_mem = k >= mem
            code = jnp.int32(_RUNNING)
            code = jnp.where(tired_mem, jnp.int32(_TIRED_K), code)
            code = jnp.where(breakdown, jnp.int32(_BREAKDOWN), code)
            code = jnp.where(solved, jnp.int32(_SOLVED), code)

            cont = code == _RUNNING

            @pl.when(cont)
            def _():
                V_ref[pl.ds(k * rows, rows), :] = jnp.where(
                    Haux > btol, q / safe(Haux), zv)
                U_ref[pl.ds(k * rows, rows), :] = jnp.where(
                    Faux > btol, p / safe(Faux), zv)
                zt_ref[2 * k] = tbar_p
                zt_ref[2 * k + 1] = tbar_pp

            return (k, rNorm_n, incons, code)

        carry0 = (jnp.int32(0), rNorm0, jnp.int32(0), status0)
        niter, rNorm, incons, status = jax.lax.while_loop(
            cond, body, carry0)

        # Back substitution on the 2k×2k triangle (reference :507-520).
        k2 = 2 * niter
        incon_ref[0, 0] = jnp.int32(0)

        def bs(idx, _):
            i = k2 - 1 - idx

            def inner(j, acc):
                return acc - R_ref[j * (two + 2) + i] * zt_ref[j]

            acc = jax.lax.fori_loop(i + 1, k2, inner, zt_ref[i])
            diag = R_ref[i * (two + 2) + i]
            sing = jnp.abs(diag) <= btol
            zt_ref[i] = jnp.where(sing, zero,
                                  acc / jnp.where(sing, jnp.ones_like(diag),
                                                  diag))
            @pl.when(sing)
            def _():
                incon_ref[0, 0] = jnp.int32(1)
            return 0

        jax.lax.fori_loop(0, k2, bs, 0)

        def xacc(i, _):
            vi = V_ref[pl.ds(i * rows, rows), :]
            ui = U_ref[pl.ds(i * rows, rows), :]
            x_ref[:] = x_ref[:] + zt_ref[2 * i] * vi
            y_ref[:] = y_ref[:] + zt_ref[2 * i + 1] * ui
            return 0

        jax.lax.fori_loop(0, niter, xacc, 0)
        niter_ref[0, 0] = niter
        rnorm_ref[0, 0] = rNorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    pd_bytes = rows * LANES * np.dtype(pd_a.dtype).itemsize
    x, y, niter, rnorm, status, incon = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((rows, LANES), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), T),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((mem + 1) * rows, LANES), T),
            pltpu.VMEM(((mem + 1) * rows, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.VMEM((rows + 2 * P, LANES), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((mem + 1,), T),
            pltpu.SMEM((two + 2,), T),
            pltpu.SMEM((two + 2,), T),
            pltpu.SMEM(((two + 2) * two,), T),
            pltpu.SMEM((two + 2,), T),
            pltpu.SMEM((4 * mem,), T),
            pltpu.SMEM((4 * mem,), T),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(((nd_a + nd_b) * pd_bytes
                                  + (2 * mem + 8) * vec_bytes) * 1.2)
            + (1 << 20)),
        interpret=interpret,
    )(itmax_s, scal_s, bw, cw, pdaw, pdbw)
    return (x.reshape(-1)[:n], y.reshape(-1)[:n], niter[0, 0],
            rnorm[0, 0], status[0, 0], incon[0, 0])


def gpmr_dia_fused_supported(offs_a, offs_b, n, dtype, mem,
                             stencil_dtype=None):
    """Static gate: both stencils + 2(mem+1)+6 vectors fit in VMEM and
    the SMEM triangle stays small (mem ≤ 64)."""
    if jnp.dtype(dtype).kind != "f" or mem > 64:
        return False
    both = tuple(offs_a) + tuple(offs_b)
    return _fused_bytes(both, n, dtype, 2 * mem + 8,
                        stencil_dtype) < 100 * (1 << 20)
