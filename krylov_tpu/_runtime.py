"""Solver-loop runtime shared by all methods.

Design (SURVEY.md §7.2 "dynamic control flow under jit"):

* Every solver is a jitted core ``core(operands..., state_in, iter_cap, ...)``
  wrapping a single ``lax.while_loop``.  The loop condition is
  ``status == RUNNING && iter < iter_cap``; every data-dependent exit
  (convergence, breakdown, nonpositive curvature, user callback) writes a
  nonzero int32 status code into the state.  Status decoding to the
  reference's string vocabulary happens on the host after the solve.

* ``timemax`` (wall-clock limit, reference src/cg.jl:265-266) cannot be
  observed inside a traced loop; ``drive`` runs the core in host-checked
  chunks of iterations only when a finite timemax is requested.  The
  default (timemax=∞) pays zero overhead: one while_loop, one device
  round-trip.

* ``history=True`` preallocates an (itmax+1,) buffer (static length) that
  the loop writes at index ``iter``; the host trims it to ``niter+1``.

* The zero-allocation contract of the reference (test/test_allocations.jl)
  maps to: repeated solves with identical static configuration hit the jit
  cache (no retrace, no recompile) and allocate only the result buffers.
"""

import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import stats as _stats
from ._dtypes import sqrt_eps

# ---------------------------------------------------------------------------
# status codes (device-side int32) → reference status strings (host-side)
# ---------------------------------------------------------------------------

RUNNING = 0
SOLVED = 1
ZERO_RESIDUAL = 2
NPC = 3
ON_BOUNDARY = 4
ZERO_CURVATURE = 5
USER_EXIT = 6
BREAKDOWN = 7
INCONSISTENT = 8
SOLVED_AR = 9          # least-squares solution found (‖Aᴴr‖ criterion)
SOLVED_X = 10          # minimum-norm solution found
COND_EXCEEDED = 11
ERR_BOUND = 12         # forward-error bound small enough (etol-type stops)
XBIG = 13              # truncated step / solution too large (lslq utol)
NONPOSDEF = 14         # operator not positive definite (informational exits)
SOLVED_PRIMAL_DUAL = 15
BREAKDOWN_BETA = 16    # solver-specific breakdown variants
BREAKDOWN_RHO = 17
SOLVED_CG_POINT = 18
SOLVED_LSQ = 20        # "found approximate minimum least-squares solution"
SOLVED_ZERO = 21       # "found approximate zero-residual solution"
FWD_ERR = 22           # "truncated forward error small enough"
ILL_COND_MACH = 23     # "condition number seems too large for this machine"
MIN_LSQ_X = 24         # "x is a minimum least-squares solution"
# host-assigned:
TIRED = 100
OVERTIMED = 101

BASE_STATUS = {
    RUNNING: _stats.UNKNOWN,
    SOLVED: _stats.SOLVED,
    ZERO_RESIDUAL: _stats.ZERO_RESIDUAL,
    NPC: _stats.NPC,
    ON_BOUNDARY: _stats.ON_BOUNDARY,
    ZERO_CURVATURE: _stats.ZERO_CURVATURE,
    USER_EXIT: _stats.USER_EXIT,
    BREAKDOWN: "breakdown",
    INCONSISTENT: _stats.INCONSISTENT,
    SOLVED_AR: _stats.SOLVED_AR,
    SOLVED_X: _stats.SOLVED_X,
    COND_EXCEEDED: "condition number exceeds tolerance",
    ERR_BOUND: "error bound small enough",
    SOLVED_LSQ: "found approximate minimum least-squares solution",
    SOLVED_ZERO: "found approximate zero-residual solution",
    FWD_ERR: "truncated forward error small enough",
    ILL_COND_MACH: "condition number seems too large for this machine",
    MIN_LSQ_X: "x is a minimum least-squares solution",
    TIRED: _stats.TIRED,
    OVERTIMED: _stats.OVERTIMED,
}


def decode_status(code, overrides=None):
    """Map a device status code to the reference's status string."""
    code = int(code)
    if overrides and code in overrides:
        return overrides[code]
    return BASE_STATUS.get(code, _stats.UNKNOWN)


def is_solved_code(code):
    return int(code) in (
        SOLVED, ZERO_RESIDUAL, NPC, ON_BOUNDARY, SOLVED_AR, SOLVED_X,
        ERR_BOUND, SOLVED_PRIMAL_DUAL, SOLVED_CG_POINT,
        SOLVED_LSQ, SOLVED_ZERO, FWD_ERR, MIN_LSQ_X,
    )


# ---------------------------------------------------------------------------
# tolerances & history
# ---------------------------------------------------------------------------

def default_tol(tol, dtype):
    """atol/rtol default to √eps(T) of the real dtype (reference kwargs)."""
    return sqrt_eps(dtype) if tol is None else float(tol)


def resolve_itmax(itmax, default):
    """itmax=0 means the per-solver default (e.g. 2n for CG)."""
    itmax = int(itmax)
    return default if itmax == 0 else itmax


def affine_chain_scan(a, b, x0):
    """All states of the affine recurrence x_{i+1} = a_i·x_i + b_i.

    Returns (len(a)+1,): [x0, x1, ..., x_len].  The prefix maps
    (x ↦ A·x + B) compose associatively, so the whole chain runs as one
    log₂-depth lax.associative_scan — the vectorized replacement for the
    sequential Givens/LU scalar chains of the long-recurrence solvers
    (an unrolled mem=20 chain of tiny dynamic updates measured
    ~70 µs/iter on TPU; this form is a single fusion)."""
    import jax as _jax
    A, B = _jax.lax.associative_scan(
        lambda p, q: (q[0] * p[0], q[0] * p[1] + q[1]), (a, b))
    return jnp.concatenate([x0[None], A * x0 + B])


def unrolled_fori(lo, hi, body, init, unroll_bound=64):
    """fori_loop that unrolls when the static trip count is small.

    On TPU a ``lax.fori_loop`` of tiny scalar updates (Givens/LU chains
    over a solver's memory window) costs ~2 µs per trip — real
    sequential loop iterations — while the unrolled chain fuses into
    one kernel (measured 38 µs/iter saved on GMRES(20),
    tools/exp_gmres_general.py).  ``hi`` must be a Python int; large
    bounds keep the loop to bound trace size.
    """
    if hi - lo <= unroll_bound:
        carry = init
        for i in range(lo, hi):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(lo, hi, body, init)


def hist_init(hist_len, dtype):
    """Preallocated history buffer (NaN-filled; trimmed on host)."""
    return jnp.full((max(hist_len, 1),), jnp.nan, dtype=dtype)


def hist_write(hist, idx, value, enabled):
    """Write history[idx] = value when history collection is enabled (static)."""
    if not enabled:
        return hist
    return hist.at[idx].set(value)


def hist_trim(hist, niter):
    """Trim device history buffer to the first niter+1 entries, drop NaNs tail."""
    h = np.asarray(hist)[: int(niter) + 1]
    return h


# ---------------------------------------------------------------------------
# the chunked driver
# ---------------------------------------------------------------------------

def drive(run, itmax, timemax, start_time=None, chunk=64):
    """Run ``state = run(state_or_none, iter_cap)`` to completion.

    ``run`` must return a state pytree with int32 fields ``status`` and
    ``iter``.  With timemax=∞ this is a single call with iter_cap=itmax.
    Otherwise the core re-enters in chunks while wall-clock remains.
    Returns (state, overtimed: bool).
    """
    if start_time is None:
        start_time = time.perf_counter()
    # TPU matmuls default to bf16 passes for f32 operands; every
    # orthogonalization/QR inside the solver cores must run at true f32
    # (observed: block/Arnoldi methods stall at ~1e-3 relative accuracy
    # on a v5e without this).  The context is part of the jit cache key,
    # so cached re-solves stay cached.
    with jax.default_matmul_precision("highest"):
        if not math.isfinite(timemax):
            return run(None, itmax), False

        cap = 0
        state = None
        while True:
            cap = min(cap + chunk, itmax)
            state = run(state, cap)
            status = int(jax.device_get(state.status))
            if status != RUNNING or cap >= itmax:
                return state, False
            if time.perf_counter() - start_time > timemax:
                return state, True


def host_state(state, max_fetch_elems=256):
    """Fetch the small leaves of a solver state in ONE transfer.

    Through the remote TPU tunnel a full-state ``jax.device_get`` ships
    every solution/basis vector to the host (and the solvers then
    re-upload them via ``jnp.asarray``) — observed ~0.5 s of pure
    transfer on a 1 MB-vector CG whose actual solve loop takes 30 ms.
    Scalars and flags (≤ ``max_fetch_elems`` elements) are what the
    host-side epilogue reads eagerly; solution/basis vectors and
    history buffers stay on device — fetching them would also strip
    their sharding on re-upload — and convert lazily only if someone
    asks (history trim does one ``np.asarray`` per requested buffer).
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    small = [i for i, leaf in enumerate(leaves)
             if getattr(leaf, "size", 1) <= max_fetch_elems]
    fetched = jax.device_get([leaves[i] for i in small])
    for i, val in zip(small, fetched):
        leaves[i] = val
    return jax.tree_util.tree_unflatten(treedef, leaves)


def final_status_code(state_status, niter, itmax, overtimed):
    """Host-side: RUNNING after the loop means tired or overtimed."""
    code = int(state_status)
    if code == RUNNING:
        code = OVERTIMED if overtimed else TIRED
    return code


# ---------------------------------------------------------------------------
# verbose display
# ---------------------------------------------------------------------------

def kdisplay(iter_, verbose):
    """Traced analogue of reference kdisplay (print every `verbose` iters)."""
    return iter_ % verbose == 0


def debug_header(verbose, text):
    if verbose > 0:
        print(text, flush=True)


def debug_table(verbose, name, cols, m, n=None):
    """Problem line + column-label line (reference per-solver tables,
    e.g. src/cg.jl:132,182).  The reference's trailing `timer` column is
    not reproducible inside a jitted loop and is omitted."""
    if verbose > 0:
        if n is None or m == n:
            print(f"{name}: system of size {m}", flush=True)
        else:
            print(f"{name}: system of {m} equations in {n} variables",
                  flush=True)
        print("  ".join(f"{c:>7s}" for c in cols), flush=True)


def debug_row(verbose, iter_, fmt, *values):
    """Per-iteration display inside the traced loop via jax.debug.print,
    printed every `verbose` iterations (reference kdisplay,
    krylov_utils.jl:301)."""
    if verbose > 0:
        jax.lax.cond(
            iter_ % verbose == 0,
            lambda: jax.debug.print(fmt, iter_, *values),
            lambda: None)


def debug_row_vals(verbose, gate_iter, fmt, *values):
    """Like debug_row, but the cadence gate and the printed values are
    independent — for tables whose leading column is not the iteration
    counter (e.g. block_gmres prints pass first, src/block_gmres.jl:181)."""
    if verbose > 0:
        jax.lax.cond(
            gate_iter % verbose == 0,
            lambda: jax.debug.print(fmt, *values),
            lambda: None)
