"""Batched solves: many small systems in ONE compiled program.

The TPU-idiomatic replacement for a host loop over small solves (the
reference iterates on the CPU, e.g. the SuiteSparse sweeps in
benchmark/benchmarks.jl:23-33): ``batched_solve`` vmaps the same jitted
``lax.while_loop`` cores over a leading batch axis, so a thousand
400-unknown systems compile to one program and run as batched
vector/matrix work on the chip.  Under vmap the while loop runs to the
slowest item's iteration count with converged items masked — ideal when
the batch's iteration counts are comparable.

Per-item statistics (niter, status string, solved) come back as a
``BatchedStats``; history/callback/verbose are not supported (use the
scalar wrappers for those).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from . import _runtime as rt
from ._dtypes import real_dtype
from .operators import MatrixOperator, as_operator

__all__ = ["batched_solve", "batched_solve_xy", "BatchedStats"]

_COMPILED = {}  # (method, make_op, id(M), itmax, memory, dot2, dtype, n) -> fn


def _status_overrides(method):
    if method in ("bicgstab", "cgs"):
        from .solvers.bicgstab import _STATUS
        return _STATUS
    if method in ("bilq", "qmr"):
        from .solvers.bilq import _STATUS
        return _STATUS
    if method == "cr":
        from .solvers.cr import _CR_STATUS
        return _CR_STATUS
    if method == "fom":
        from .solvers.fom import _FOM_STATUS
        return _FOM_STATUS
    if method == "symmlq":
        from .solvers.symmlq import _STATUS
        return _STATUS
    return None


def _extra_solved_codes(method):
    """Per-method solved codes beyond rt.is_solved_code (the same sets
    the scalar wrappers use when building SimpleStats.solved)."""
    if method == "symmlq":
        from .solvers.symmlq import SOLVED_CG_PT, SOLVED_GEN, SOLVED_LQ
        return (SOLVED_GEN, SOLVED_LQ, SOLVED_CG_PT)
    if method == "bilq":
        from .solvers.bilq import SOLVED_CG_PT2, SOLVED_LQ_PT
        return (SOLVED_LQ_PT, SOLVED_CG_PT2)
    if method == "cr":
        from .solvers.cr import ZERO_CURV_B
        return (ZERO_CURV_B,)
    return ()


class BatchedStats:
    """Per-item solve statistics for a batched solve."""

    def __init__(self, niter, status, solved, timer):
        self.niter = niter      # (nb,) int array
        self.status = status    # list of nb reference status strings
        self.solved = solved    # (nb,) bool array
        self.timer = timer

    def __repr__(self):
        nb = len(self.status)
        return (f"BatchedStats(nb={nb}, solved={int(self.solved.sum())}"
                f"/{nb}, niter min/med/max="
                f"{int(self.niter.min())}/{int(np.median(self.niter))}/"
                f"{int(self.niter.max())}, timer={self.timer:.4f}s)")


def batched_solve(method, A, B, *, make_operator=None, M=None,
                  atol=None, rtol=None, itmax=0, memory=20, dot2=False,
                  lam=0.0, shape=None):
    """Solve ``A[i] x[i] = B[i]`` for every i in one compiled program.

    ``A`` is either a dense ``(nb, n, n)`` array, or — with
    ``make_operator`` given — any pytree of batched leaves that
    ``make_operator(leaf_slice)`` turns into an operator for one item
    (e.g. the ``data`` of CSR matrices sharing one sparsity pattern).
    ``B`` is ``(nb, n)``.  ``method`` is any of
    ``diff.SYMMETRIC_METHODS + diff.GENERAL_METHODS``; ``M`` is an
    optional preconditioner SHARED across the batch.

    Returns ``(X, stats)`` with ``X`` of shape ``(nb, n)`` and a
    :class:`BatchedStats`.  Differentiable end to end when used through
    ``jax.vmap`` of :func:`krylov_tpu.diff.solve` instead (this entry
    point materializes host-side stats, which AD cannot cross).
    """
    from .diff import (SYMMETRIC_METHODS, GENERAL_METHODS, LS_METHODS,
                       _traced_state)

    supported = SYMMETRIC_METHODS + GENERAL_METHODS + LS_METHODS
    if method not in supported:
        raise ValueError(
            f"batched_solve supports {supported}, got {method!r}")
    is_ls = method in LS_METHODS
    if M is not None and method in ("bilq", "qmr"):
        raise ValueError(f"{method} takes no preconditioner")
    if lam != 0.0 and not is_ls:
        raise ValueError("lam is a least-squares option (lsqr/lsmr/cgls)")
    if dot2 and method not in ("cg", "lsqr"):
        raise ValueError("dot2 (compensated inner products) is a "
                         "cg/lsqr option")
    start = time.perf_counter()
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError("B must be (nb, n)")
    nb, m = B.shape
    if make_operator is None:
        A = jnp.asarray(A)
        if A.ndim != 3 or A.shape[:2] != (nb, m):
            raise ValueError("dense A must be (nb, n, n) matching B"
                             if not is_ls else
                             "dense A must be (nb, m, n) with m = B cols")
        if not is_ls and A.shape[1] != A.shape[2]:
            raise ValueError("dense A must be (nb, n, n) matching B")
        n = A.shape[2]
        make_operator = MatrixOperator
    elif is_ls:
        if shape is None:
            raise ValueError("least-squares batched_solve with "
                             "make_operator needs shape=(m, n)")
        n = shape[1]
    else:
        n = m
    M = as_operator(M)
    T = real_dtype(B.dtype)
    if method in ("lsqr", "lsmr"):
        # scalar-wrapper semantics: the primary LSQR/LSMR stops are the
        # √eps axtol/btol backward-error tests; atol/rtol default to 0.
        atol = 0.0 if atol is None else float(atol)
        rtol = 0.0 if rtol is None else float(rtol)
    else:
        atol = rt.default_tol(atol, T)
        rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, (m + n) if is_ls else 2 * n)

    needs_adjoint = is_ls or method in ("bilq", "qmr")

    def _coerce(op):
        from .ops.sparse import CSRMatrix
        from .operators import CSROperator
        if isinstance(op, CSRMatrix):
            # Trace-safe segment-sum path: the TPU hybrid analysis and
            # the CSR adjoint construction are host-side and cannot run
            # on vmapped tracers.
            if needs_adjoint:
                raise ValueError(
                    f"batched {method} needs rmatvec: make_operator must "
                    "return an operator with adjoint storage built from "
                    "the batched leaves (e.g. a FunctionOperator whose "
                    "rmatvec uses a pre-computed transpose permutation)")
            return CSROperator(op)
        return as_operator(op)

    # Cache the compiled batched program: a fresh closure per call would
    # re-trace every time (observed 1.6 s/call vs ms once cached).  The
    # key uses make_operator/M by identity — pass the SAME objects
    # across calls to hit the cache (an inline-constructed lambda or M
    # retraces); atol/rtol/lam are traced arguments.  Bounded FIFO: a
    # process accumulating live compiled executables eventually trips
    # jaxlib's executable ceiling (CLAUDE.md round-3 note).
    key = (method, make_operator, None if M is None else id(M),
           itmax, memory, dot2, str(B.dtype), n)
    fn = _COMPILED.get(key)
    if fn is None:
        def one(data_i, b_i, atol_, rtol_, lam_):
            op = _coerce(make_operator(data_i))
            st = _traced_state(method, op, M, None, b_i, atol_, rtol_,
                               itmax, memory, dot2, lam=lam_)
            return st.x, st.iter, st.status

        fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None, None, None)))
        while len(_COMPILED) >= 32:
            _COMPILED.pop(next(iter(_COMPILED)))
        _COMPILED[key] = fn

    with jax.default_matmul_precision("highest"):
        X, iters, codes = fn(A, B, jnp.asarray(atol, T),
                             jnp.asarray(rtol, T), jnp.asarray(lam, T))
    iters, codes = jax.device_get([iters, codes])
    iters = np.asarray(iters)
    codes = np.asarray(codes)
    over = _status_overrides(method)
    extra = _extra_solved_codes(method)
    fixed = [rt.final_status_code(int(c), int(k), itmax, False)
             for c, k in zip(codes, iters)]
    status = [rt.decode_status(c, over) for c in fixed]
    solved = np.asarray([rt.is_solved_code(c) or c in extra
                         for c in fixed])
    stats = BatchedStats(iters, status, solved,
                         time.perf_counter() - start)
    return X, stats


def batched_solve_xy(method, A, B, C, *, make_operator=None, atol=None,
                     rtol=None, itmax=0, tau=1.0, nu=-1.0, shape=None):
    """Solve nb (x, y) systems in one compiled program.

    ``method`` ∈ :data:`krylov_tpu.diff.XY_METHODS`:

    * ``"tricg"`` / ``"trimr"`` — saddle-point systems
      ``[τI A[i]; A[i]ᴴ νI][x;y] = [B[i]; C[i]]`` (τ/ν SHARED across the
      batch; defaults τ=1, ν=−1 like the scalar wrappers).
    * ``"bilqr"`` — adjoint pairs ``A[i]x = B[i]`` and ``A[i]ᴴy = C[i]``.

    ``A`` is a dense ``(nb, m, n)`` array (``(nb, n, n)`` for bilqr) or,
    with ``make_operator``, any pytree of batched leaves; ``B`` is
    ``(nb, m)``, ``C`` is ``(nb, n)``.  Returns ``(X, Y, stats)``.
    Reference analogue: the C API drives every (x, y) method through one
    entry point (interfaces/src/LibKrylov.jl:125-142); this is the
    batched TPU equivalent.
    """
    from .diff import XY_METHODS, _traced_state_xy

    if method not in XY_METHODS:
        raise ValueError(f"batched_solve_xy supports {XY_METHODS}, "
                         f"got {method!r}")
    start = time.perf_counter()
    B = jnp.asarray(B)
    C = jnp.asarray(C, dtype=B.dtype)
    if B.ndim != 2 or C.ndim != 2 or B.shape[0] != C.shape[0]:
        raise ValueError("B and C must be (nb, m) and (nb, n)")
    nb, m = B.shape
    n = C.shape[1]
    if method == "bilqr" and m != n:
        raise ValueError("bilqr systems must be square")
    if make_operator is None:
        A = jnp.asarray(A)
        if A.ndim != 3 or A.shape[0] != nb or A.shape[1:] != (m, n):
            raise ValueError("dense A must be (nb, m, n) matching (B, C)")
        make_operator = MatrixOperator
    T = real_dtype(B.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n if method != "bilqr" else 2 * n)

    def _coerce(op):
        from .ops.sparse import CSRMatrix
        if isinstance(op, CSRMatrix):
            raise ValueError(
                f"batched {method} needs rmatvec: make_operator must "
                "return an operator with adjoint storage built from the "
                "batched leaves")
        return as_operator(op)

    key = (method, make_operator, itmax, float(tau), float(nu),
           str(B.dtype), m, n, "xy")
    fn = _COMPILED.get(key)
    if fn is None:
        def one(data_i, b_i, c_i, atol_, rtol_):
            op = _coerce(make_operator(data_i))
            st = _traced_state_xy(method, op, b_i, c_i, atol_, rtol_,
                                  itmax, tau=tau, nu=nu)
            extras = ()
            if method == "bilqr":
                extras = (st.solved_lq_tol, st.solved_lq_mach,
                          st.solved_cg_tol, st.solved_cg_mach,
                          st.solved_qr_tol, st.solved_qr_mach,
                          st.solved_primal, st.solved_dual, st.breakdown)
            return st.x, st.y, st.iter, st.status, extras

        fn = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None, None)))
        while len(_COMPILED) >= 32:
            _COMPILED.pop(next(iter(_COMPILED)))
        _COMPILED[key] = fn

    with jax.default_matmul_precision("highest"):
        X, Y, iters, codes, extras = fn(A, B, C, jnp.asarray(atol, T),
                                        jnp.asarray(rtol, T))
    iters, codes, extras = jax.device_get([iters, codes, extras])
    iters = np.asarray(iters)
    codes = np.asarray(codes)
    fixed = [rt.final_status_code(int(cd), int(k), itmax, False)
             for cd, k in zip(codes, iters)]
    if method == "bilqr":
        import types
        from .solvers.bilq import _bilqr_status
        names = ("solved_lq_tol", "solved_lq_mach", "solved_cg_tol",
                 "solved_cg_mach", "solved_qr_tol", "solved_qr_mach",
                 "solved_primal", "solved_dual", "breakdown")
        status = []
        solved = []
        for i, cd in enumerate(fixed):
            shim = types.SimpleNamespace(
                **{nm: bool(np.asarray(ex)[i])
                   for nm, ex in zip(names, extras)})
            status.append(_bilqr_status(shim, cd))
            solved.append(bool(shim.solved_primal and shim.solved_dual))
        solved = np.asarray(solved)
    else:
        from .solvers.tricg import _STATUS as _TRI_STATUS
        status = [rt.decode_status(cd, _TRI_STATUS) for cd in fixed]
        solved = np.asarray([rt.is_solved_code(cd) for cd in fixed])
    stats = BatchedStats(iters, status, solved,
                         time.perf_counter() - start)
    return X, Y, stats
