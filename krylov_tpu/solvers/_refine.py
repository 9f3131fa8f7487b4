"""Double-word iterative refinement: fp64-grade TRUE residuals from f32
device storage (SURVEY.md §7.2 "fp64 on TPU").

Generic over the inner method.  The outer loop keeps the solution and the
residual in double-word (hi, lo) f32 pairs updated with compensated
products/sums (limit accuracy ~2^-48 instead of f32's 2^-24); each outer
step solves the correction system A·d = r with the *inner* Krylov method
at plain working precision — which means the inner solve rides the
method's own fast path (the fused whole-solve-in-VMEM kernels on DIA
stencils).  One device dispatch per outer iteration.

This matches the reference's Float64 behavior (convergence to √eps(T)
for every T, reference test/test_mp.jl:31-33) from f32-only device
storage: CG for SPD systems, MINRES for symmetric indefinite systems,
and GMRES for general square systems (GMRES-based iterative refinement,
Carson & Higham SIAM J. Sci. Comput. 2018 — see PAPERS.md).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import _runtime as rt
from .._dtypes import real_dtype
from ..ops.kops import knorm2, two_sum, dw_add, dw_norm
from ..stats import SimpleStats

__all__ = ["ir_solve", "ir_update", "check_ir_config"]


@functools.partial(jax.jit, static_argnames=("use_dia",))
def ir_update(A, b, x_hi, x_lo, d, *, use_dia):
    """One double-word refinement step: fold the correction ``d`` into the
    dw solution and recompute the dw residual r = b − A·(x_hi + x_lo) with
    compensated products/sums (one dispatch per outer iteration)."""
    from ..ops.dia import dia_spmv_dw

    x_hi, x_lo = dw_add(x_hi, x_lo, d)
    if use_dia:
        y_hi, y_lo = dia_spmv_dw(A.dia.data, A.dia.offsets, x_hi, x_lo)
    else:
        with jax.default_matmul_precision("highest"):
            y_hi = A.matvec(x_hi)
            y_lo = A.matvec(x_lo)
    s, e = two_sum(b, -y_hi)
    r_hi, r_lo = two_sum(s, e - y_lo)
    return x_hi, x_lo, r_hi, r_lo, dw_norm(r_hi, r_lo)


def check_ir_config(method, precision, *, compensated=False, history=False,
                    callback=None, **flags):
    """Validate precision kwarg; reject option combos IR cannot honor.

    ``flags`` are extra method options that must be at their defaults
    (falsy) for the double-word path (e.g. ``linesearch=...``,
    ``lam=...``).  ``compensated=True`` means the caller implements
    precision="compensated" (Dot2 reductions) itself.  Returns True iff
    the caller should take the IR path.
    """
    allowed = (None, "working", "double_word") + (
        ("compensated",) if compensated else ())
    if precision not in allowed:
        raise ValueError(
            f"precision must be one of {allowed} for {method}")
    if precision != "double_word":
        return False
    bad = [k for k, v in flags.items() if v]
    if history or callback is not None or bad:
        opts = "/".join(bad + (["history"] if history else [])
                        + (["callback"] if callback is not None else []))
        raise ValueError(
            f"precision='double_word' supports the plain {method} "
            f"configuration only (got {opts})")
    return True


def ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start):
    """Double-word iterative refinement driver.

    ``inner(rhs, rtol_i, it_left) -> (d, niter)`` solves A·d = rhs at
    working precision (the method's own wrapper, so its fused fast path
    applies).  Accumulates x and r = b − A·x in double-word f32 pairs;
    stops on the dw TRUE residual at ``atol + rtol·‖b‖`` — tolerances the
    working dtype alone cannot certify.  Returns x as a host f64 array
    (x_hi + x_lo exceeds f32 representation; on-chip state stays f32).
    """
    from ..operators import DIAOperator

    n = b.shape[0]
    T = real_dtype(b.dtype)
    use_dia = isinstance(A, DIAOperator)
    bNorm = float(knorm2(b))
    target = atol + rtol * bNorm
    # inner passes stop where working-precision rounding floors the true
    # residual
    inner_rtol = max(float(np.sqrt(np.finfo(T).eps)) * 0.2, 1e-5)

    zero = jnp.zeros(n, b.dtype)
    d0 = zero if x0 is None else jnp.asarray(x0, b.dtype)
    x_hi, x_lo, r_hi, r_lo, rnorm_d = ir_update(
        A, b, zero, zero, d0, use_dia=use_dia)
    rnorm = float(rnorm_d)
    total = 0
    code = rt.SOLVED if rnorm <= target else rt.RUNNING
    prev = float("inf")
    while code == rt.RUNNING:
        if total >= itmax:
            code = rt.TIRED
            break
        if time.perf_counter() - start > timemax:
            code = rt.OVERTIMED
            break
        if rnorm >= 0.5 * prev:
            # refinement stalled: working-precision inner solves can no
            # longer reduce the dw residual (operator too ill-conditioned
            # for IR at this storage precision)
            code = rt.ILL_COND_MACH
            break
        prev = rnorm
        rtol_i = max(inner_rtol, 0.1 * target / rnorm)
        d, niter = inner(r_hi + r_lo, rtol_i, itmax - total)
        total += max(int(niter), 1)
        x_hi, x_lo, r_hi, r_lo, rnorm_d = ir_update(
            A, b, x_hi, x_lo, d, use_dia=use_dia)
        rnorm = float(rnorm_d)
        if rnorm <= target:
            code = rt.SOLVED
    x = (np.asarray(x_hi, dtype=np.float64)
         + np.asarray(x_lo, dtype=np.float64))
    stats = SimpleStats(
        niter=total,
        solved=rt.is_solved_code(code),
        inconsistent=False,
        indefinite=False,
        npc_count=0,
        residuals=np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return x, stats, None
