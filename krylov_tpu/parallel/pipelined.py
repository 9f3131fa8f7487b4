"""Pipelined (communication-hiding) CG — Ghysels & Vanroose.

TPU extension beyond the reference basket (PAPERS.md: "Efficient
executions of Pipelined Conjugate Gradient Method on Heterogeneous
Architectures", arxiv.org/abs/2105.06176; the recurrence is Ghysels &
Vanroose 2014).  Standard CG needs TWO dependent reduction rounds per
iteration (⟨p, Ap⟩ gates the update that ⟨r', z'⟩ reads), so a
row-sharded solve pays two sequential `psum` latencies per iteration.
PIPECG reorders the recurrences so the iteration's dot products
(γ = ⟨r, u⟩, δ = ⟨w, u⟩) are mutually independent and independent
of the iteration's matvec: under SPMD partitioning they fuse into ONE
all-reduce round that can overlap the matvec — halving (and hiding)
the per-iteration collective latency on a multi-chip mesh.  Stopping
matches cg's semantics: rNorm = √γ is the M-norm √⟨r, Mr⟩ (= ‖r‖ when
M = I).
`tests/test_parallel.py` pins the property by counting all-reduce
rounds in the partitioned HLO.

The price, as in the literature: one extra matvec-sized recurrence set
(8 vectors instead of 4) and residual-recurrence drift at low
precision — the final true residual can sit a small factor above
plain CG's.  Use for latency-bound distributed solves.
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


class PipeCgState(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array
    w: jax.Array
    z: jax.Array
    q: jax.Array
    p: jax.Array
    s: jax.Array
    alpha: jax.Array
    gamma: jax.Array
    rnorm: jax.Array
    eps_lim: jax.Array
    iter: jax.Array
    status: jax.Array
    precond_violation: jax.Array


@functools.partial(jax.jit, static_argnames=("MisI",))
def _pipecg_core(A, M, b, x0, state_in, iter_cap, atol, rtol, *, MisI):
    FC = b.dtype
    T = real_dtype(FC)

    def precond(v):
        return v if MisI else M.matvec(v)

    if state_in is None:
        # warm starts are handled by the wrapper (residual-system shift)
        x = jnp.zeros_like(b)
        r = b
        u = precond(r)
        w = A.matvec(u)
        # one fused reduction round: γ, δ (rNorm = √γ, cg's M-norm)
        gamma = jnp.real(jnp.vdot(r, u))
        delta = jnp.real(jnp.vdot(w, u))
        viol = gamma < 0
        rnorm = jnp.sqrt(jnp.maximum(gamma, 0))
        eps_lim = jnp.asarray(atol, T) + jnp.asarray(rtol, T) * rnorm
        safe_d = jnp.where(delta == 0, jnp.ones_like(delta), delta)
        alpha = gamma / safe_d
        status = jnp.where(
            rnorm == 0, jnp.int32(rt.ZERO_RESIDUAL),
            jnp.where(rnorm <= eps_lim, jnp.int32(rt.SOLVED),
                      jnp.int32(rt.RUNNING)))
        m = precond(w)
        n_v = A.matvec(m)
        state = PipeCgState(
            x=x, r=r, u=u, w=w, z=n_v, q=m, p=u, s=w,
            alpha=alpha, gamma=gamma, rnorm=rnorm, eps_lim=eps_lim,
            iter=jnp.int32(0), status=status, precond_violation=viol)
    else:
        state = state_in

    def cond(st):
        return (st.status == rt.RUNNING) & (st.iter < iter_cap)

    def body(st):
        a = st.alpha.astype(FC)
        x = st.x + a * st.p
        r = st.r - a * st.s
        u = st.u - a * st.q
        w = st.w - a * st.z

        # the iteration's ONLY reduction round: two independent dots
        gamma_n = jnp.real(jnp.vdot(r, u))
        delta = jnp.real(jnp.vdot(w, u))

        # matvec chain — independent of the dots above (this is the
        # overlap the pipelined reordering buys)
        m = precond(w)
        n_v = A.matvec(m)

        viol = st.precond_violation | (gamma_n < 0)
        rnorm = jnp.sqrt(jnp.maximum(gamma_n, 0))
        resid_mach = (rnorm + 1) <= 1
        solved = (rnorm <= st.eps_lim) | resid_mach

        safe_g = jnp.where(st.gamma == 0, jnp.ones_like(st.gamma), st.gamma)
        beta = gamma_n / safe_g
        safe_a = jnp.where(st.alpha == 0, jnp.ones_like(st.alpha), st.alpha)
        denom = delta - beta * gamma_n / safe_a
        safe_den = jnp.where(denom == 0, jnp.ones_like(denom), denom)
        alpha_n = gamma_n / safe_den

        bc = beta.astype(FC)
        z = n_v + bc * st.z
        q = m + bc * st.q
        p = u + bc * st.p
        s = w + bc * st.s

        status = jnp.where(solved, jnp.int32(rt.SOLVED),
                           jnp.int32(rt.RUNNING))
        return PipeCgState(
            x=x, r=r, u=u, w=w, z=z, q=q, p=p, s=s,
            alpha=alpha_n, gamma=gamma_n, rnorm=rnorm, eps_lim=st.eps_lim,
            iter=st.iter + 1, status=status, precond_violation=viol)

    return jax.lax.while_loop(cond, body, state)


def pipelined_cg(A, b, x0=None, *, M=None, atol=None, rtol=None, itmax=0,
                 timemax=float("inf")):
    """x, stats = pipelined_cg(A, b) — communication-hiding CG.

    Same problem class and stopping semantics as :func:`krylov_tpu.cg`
    (Hermitian positive definite, centered preconditioner ``M``,
    rNorm = the M-norm √⟨r, Mr⟩), with the Ghysels-Vanroose recurrence:
    one fused all-reduce round per iteration instead of CG's two
    dependent rounds.  Warm starts solve the residual system and shift
    back (the library-wide convention).  Intended for row-sharded
    multi-chip solves where collective latency dominates; on a single
    chip plain ``cg`` is preferable (fewer vectors, fused kernel).
    """
    start = time.perf_counter()
    A = as_operator(A)
    M = as_operator(M)
    b = jnp.asarray(b)
    n = b.shape[0]
    T = real_dtype(b.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)
    x0 = None if x0 is None else jnp.asarray(x0, dtype=b.dtype)
    b_eff = b if x0 is None else b - A.matvec(x0)

    def run(state, cap):
        return _pipecg_core(A, M, b_eff, None, state, jnp.int32(cap),
                            atol, rtol, MisI=M is None)

    state, overtimed = rt.drive(run, itmax, timemax, start)
    state = rt.host_state(state)
    if bool(state.precond_violation):
        raise ValueError(
            "The linear operator `A` or the preconditioner `M` is not "
            "symmetric positive definite.")
    niter = int(state.iter)
    code = rt.final_status_code(state.status, niter, itmax, overtimed)
    x = jnp.asarray(state.x)
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
    return x, stats
