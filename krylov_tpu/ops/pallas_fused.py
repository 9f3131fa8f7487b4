"""Whole-solve fused Pallas kernels — the solver loop lives in VMEM.

Round-1 profiling showed the jitted ``lax.while_loop`` CG core already
runs at ~15-20 µs/iteration on a v5e (HBM-roofline territory); what
dominated the round-1 bench was host↔device round-trips.  This module
removes the remaining on-device gap: the ENTIRE solve — stencil SpMV,
reductions, vector updates, convergence logic — executes inside one
``pallas_call`` with every vector resident in VMEM.  Per iteration the
kernel touches only VMEM (≫10× HBM bandwidth) and HBM traffic for the
whole solve is: diagonals once in, b once in, x once out.

Capability scope: the CG fast path (reference src/cg.jl hot loop with
M = I, no trust region, no linesearch) over a DIA-stencil operator.
``krylov_tpu.cg`` routes here automatically when the configuration
matches; anything else uses the general while_loop core.

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
def cg_dia_fused(pd, offsets, b, atol, rtol, itmax, interpret=None):
    """Full CG solve of A x = b for a DIA matrix, one kernel launch.

    Args:
      pd: (nd, n) output-aligned diagonals (see ops/pallas_dia.dia_align).
      offsets: static tuple of diagonal offsets.
      b: (n,) right-hand side (real floating dtype).
      atol, rtol: dynamic tolerance scalars (ε = atol + rtol‖r₀‖).
      itmax: dynamic int32 iteration cap.
    Returns:
      (x, niter, rNorm, status_code) — all device arrays; status codes
      follow krylov_tpu._runtime (RUNNING means iteration cap hit).
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

    def kernel(itmax_ref, atol_ref, rtol_ref, b_ref, pd_ref,
               x_ref, niter_ref, rnorm_ref, status_ref, ppad_ref, r_ref):
        bv = b_ref[:]
        ppad_ref[:] = jnp.zeros((rows + 2 * P, LANES), T)
        ppad_ref[P: P + rows] = bv
        r_ref[:] = bv
        x_ref[:] = jnp.zeros((rows, LANES), T)

        gamma0 = jnp.sum(bv * bv)
        rnorm0 = jnp.sqrt(gamma0)
        eps_lim = atol_ref[0, 0] + rtol_ref[0, 0] * rnorm0
        cap = itmax_ref[0, 0]
        status0 = jnp.where(
            gamma0 == 0, jnp.int32(_ZERO_RESIDUAL),
            jnp.where(rnorm0 <= eps_lim, jnp.int32(_SOLVED),
                      jnp.int32(_RUNNING)))

        def cond(c):
            it, gamma, pNorm2, rnorm, status = c
            return (status == _RUNNING) & (it < cap)

        def body(c):
            it, gamma, pNorm2, rnorm, status = c
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
            gamma_next = jnp.sum(rv * rv)
            rnorm_next = jnp.sqrt(gamma_next)
            resid_mach = (rnorm_next + 1) <= 1
            solved = (rnorm_next <= eps_lim) | resid_mach

            beta = gamma_next / jnp.where(
                gamma == 0, jnp.ones_like(gamma), gamma)
            stay = jnp.logical_not(solved | skip)
            cr = jnp.where(stay, jnp.ones_like(beta), jnp.zeros_like(beta))
            cp = jnp.where(stay, beta, jnp.ones_like(beta))
            ppad_ref[P: P + rows] = cr * rv + cp * p_int

            gamma_new = jnp.where(stay, gamma_next, gamma)
            pNorm2_new = jnp.where(
                stay, gamma_next + beta * beta * pNorm2, pNorm2)
            rnorm_new = jnp.where(skip, rnorm, rnorm_next)
            it_new = it + jnp.where(skip, jnp.int32(0), jnp.int32(1))

            status_new = jnp.where(
                zero_curv, jnp.int32(_ZERO_CURVATURE),
                jnp.where(solved, jnp.int32(_SOLVED), jnp.int32(_RUNNING)))
            return it_new, gamma_new, pNorm2_new, rnorm_new, status_new

        it, gamma, pNorm2, rnorm, status = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), gamma0, gamma0, rnorm0, status0))
        niter_ref[0, 0] = it
        rnorm_ref[0, 0] = rnorm
        status_ref[0, 0] = status

    vec_bytes = rows * LANES * np.dtype(T).itemsize
    vmem_bytes = (nd + 4) * vec_bytes + 2 * P * LANES * np.dtype(T).itemsize

    x, niter, rnorm, status = pl.pallas_call(
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
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes * 1.5) + (1 << 20)),
        interpret=interpret,
    )(itmax_s, atol_s, rtol_s, bw, pdw)
    return (x.reshape(-1)[:n], niter[0, 0], rnorm[0, 0], status[0, 0])


def cg_dia_fused_supported(offsets, n, dtype):
    """Static gate: does the whole working set fit in VMEM (~100 MB)?"""
    if jnp.dtype(dtype).kind != "f":
        return False
    rows, P = _plan(offsets, n)
    nd = len(offsets) if isinstance(offsets, tuple) else len(tuple(offsets))
    bytes_ = (nd + 4) * rows * LANES * jnp.dtype(dtype).itemsize
    return bytes_ < 100 * (1 << 20)
