"""Ahead-of-time solver export for serving (jax.export).

Production deployments often cannot afford Python tracing at request
time (or cannot ship Python at all).  ``export_solver`` lowers one
fully-configured solve — method, shapes, dtypes, tolerances, operator
construction — to a serialized StableHLO artifact; ``load_solver``
rehydrates it into a callable that runs WITHOUT retracing (and, via
jax.export's C++ loading paths, without this library installed).

The exported computation is the same traced core the library runs
(diff._traced_state): inputs are the operator's array leaves and the
right-hand side, outputs are ``(x, niter, status_code)``.  Status codes
decode with :func:`decode_status` (the reference string vocabulary).

No reference analogue (the reference's closest notion is the juliac-
compiled C library — our ``native/`` — which re-implements the solvers;
this exports the ACTUAL jitted TPU program).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

from . import _runtime as rt
from ._dtypes import real_dtype

__all__ = ["export_solver", "export_solver_xy", "load_solver",
           "decode_status"]


def _spec(x):
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    x = jnp.asarray(x)
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def export_solver(method, make_operator, data, b, *, atol=None, rtol=None,
                  itmax=0, memory=20, lam=0.0, dot2=False, M=None,
                  platforms=None):
    """Serialize one configured solve to bytes.

    ``make_operator(data_leaves) -> operator`` (e.g. ``MatrixOperator``,
    or a closure building a ``DIAOperator``/``CSRMatrix`` from values);
    ``data`` and ``b`` are example arrays or ``jax.ShapeDtypeStruct``
    pytrees fixing shapes/dtypes.  Method set and option semantics match
    :func:`krylov_tpu.batched_solve` (scalar, not batched).  The fused
    whole-solve kernels are captured when exporting on a TPU host for a
    TPU target (the operator's ``use_pallas`` routing applies at trace
    time).

    Returns the serialized artifact (bytes) — write it to disk, ship it,
    and :func:`load_solver` it anywhere jax runs.
    """
    from .diff import (GENERAL_METHODS, LS_METHODS, SYMMETRIC_METHODS,
                       _traced_state)
    from .operators import as_operator

    supported = SYMMETRIC_METHODS + GENERAL_METHODS + LS_METHODS
    if method not in supported:
        raise ValueError(f"export_solver supports {supported}, "
                         f"got {method!r}")
    b_spec = _spec(b)
    data_spec = jax.tree_util.tree_map(_spec, data)
    T = real_dtype(b_spec.dtype)
    if method in ("lsqr", "lsmr"):
        atol = 0.0 if atol is None else float(atol)
        rtol = 0.0 if rtol is None else float(rtol)
    else:
        atol = rt.default_tol(atol, T)
        rtol = rt.default_tol(rtol, T)
    M = as_operator(M)

    def fn(data_leaves, rhs):
        op = as_operator(make_operator(data_leaves))
        n_cols = op.shape[1] if op.shape is not None else rhs.shape[0]
        cap = rt.resolve_itmax(
            itmax, (rhs.shape[0] + n_cols) if method in LS_METHODS
            else 2 * rhs.shape[0])
        st = _traced_state(method, op, M, None, rhs, atol, rtol, cap,
                           memory, dot2, lam=lam)
        return st.x, st.iter, st.status

    with jax.default_matmul_precision("highest"):
        exported = jexport.export(
            jax.jit(fn),
            platforms=platforms)(data_spec, b_spec)
    return exported.serialize()


def export_solver_xy(method, make_operator, data, b, c, *, atol=None,
                     rtol=None, itmax=0, tau=1.0, nu=-1.0,
                     platforms=None):
    """Serialize one configured (x, y) solve to bytes.

    ``method`` ∈ :data:`krylov_tpu.diff.XY_METHODS` ("tricg"/"trimr"
    saddle-point systems, "bilqr" adjoint pairs).  Inputs of the
    exported program are ``(data_leaves, b, c)``; outputs are
    ``(x, y, niter, status_code)``.  Same artifact/loading contract as
    :func:`export_solver` (load with :func:`load_solver`; call with
    three arguments).
    """
    from .diff import XY_METHODS, _traced_state_xy
    from .operators import as_operator

    if method not in XY_METHODS:
        raise ValueError(f"export_solver_xy supports {XY_METHODS}, "
                         f"got {method!r}")
    b_spec = _spec(b)
    c_spec = _spec(c)
    data_spec = jax.tree_util.tree_map(_spec, data)
    T = real_dtype(b_spec.dtype)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)

    def fn(data_leaves, rhs_b, rhs_c):
        op = as_operator(make_operator(data_leaves))
        cap = rt.resolve_itmax(
            itmax, 2 * rhs_b.shape[0] if method == "bilqr"
            else rhs_b.shape[0] + rhs_c.shape[0])
        st = _traced_state_xy(method, op, rhs_b, rhs_c, atol, rtol, cap,
                              tau=tau, nu=nu)
        return st.x, st.y, st.iter, st.status

    with jax.default_matmul_precision("highest"):
        exported = jexport.export(
            jax.jit(fn),
            platforms=platforms)(data_spec, b_spec, c_spec)
    return exported.serialize()


def load_solver(blob):
    """Rehydrate an :func:`export_solver` artifact.

    Returns ``solve(data, b) -> (x, niter, status_code)`` running the
    precompiled program (no tracing).  Decode the status with
    :func:`decode_status`.
    """
    exported = jexport.deserialize(blob)

    def solve(*args):
        return exported.call(*args)

    return solve


def decode_status(code, niter=None, itmax=None):
    """Status code -> reference status string (RUNNING -> TIRED when the
    iteration cap was hit; pass niter/itmax for that resolution)."""
    code = int(code)
    if niter is not None and itmax is not None:
        code = rt.final_status_code(code, int(niter), int(itmax), False)
    elif code == rt.RUNNING:
        code = rt.TIRED
    return rt.decode_status(code)
