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

__all__ = ["ir_solve", "ir_update", "check_ir_config", "gemv_dw",
           "dw_matvec", "ir_mode", "pair_ir_solve", "pair_ir_wrap",
           "ir_update_pair"]


def gemv_dw(Amat, x_hi, x_lo, adjoint=False):
    """Compensated dense GEMV: (y_hi, y_lo) ≈ A·(x_hi + x_lo).

    Per-element Dekker TwoProd of A with x_hi plus a compensated
    pairwise row reduction — the dense analogue of dia_spmv_dw, closing
    the ADVICE r3 finding that non-DIA residual recomputes carried
    eps_f32·‖A‖·‖x‖ noise.  O(mn) VPU work, once per outer IR step.
    """
    from ..ops.kops import _two_prod_vec

    if adjoint:
        Amat = jnp.conj(Amat.T)
    p, e = _two_prod_vec(Amat, x_hi[None, :])
    lo = e + Amat * x_lo[None, :]
    # compensated pairwise tree reduction along axis=1
    err = jnp.zeros(p.shape[:1], p.dtype)
    while p.shape[1] > 1:
        k = p.shape[1]
        if k % 2:
            pad = [(0, 0), (0, 1)]
            p = jnp.pad(p, pad)
            lo = jnp.pad(lo, pad)
        a, bb = p[:, 0::2], p[:, 1::2]
        s = a + bb
        bp = s - a
        t = (a - (s - bp)) + (bb - bp)
        p = s
        err = err + jnp.sum(t + lo[:, 0::2] + lo[:, 1::2], axis=1)
        lo = jnp.zeros_like(p)
    return two_sum(p[:, 0], err)


def ir_mode(A):
    """Classify an operator for the dw residual recompute.

    Returns "dia" or "dense"; raises for operator types whose residual
    cannot be recomputed in compensated arithmetic (the fp64-grade
    certificate would silently degrade to eps_f32·‖A‖·‖x‖ noise).
    """
    from ..operators import DIAOperator, MatrixOperator

    if isinstance(A, DIAOperator):
        return "dia"
    if isinstance(A, MatrixOperator):
        return "dense"
    raise ValueError(
        "precision='double_word' needs an operator whose residual can be "
        "recomputed in compensated arithmetic: DIAOperator or "
        "MatrixOperator (got %s). Wrap the matrix in one of those, or "
        "use precision='compensated' where available (docs/precision.md)."
        % type(A).__name__)


def dw_matvec(A, x_hi, x_lo, *, mode, adjoint=False):
    """(y_hi, y_lo) ≈ op·(x_hi + x_lo) in compensated arithmetic."""
    from ..ops.dia import dia_spmv_dw

    if mode == "dia":
        if adjoint:
            data, offsets = A.adjoint_dia()
        else:
            data, offsets = A.dia.data, A.dia.offsets
        return dia_spmv_dw(data, offsets, x_hi, x_lo)
    return gemv_dw(A.A, x_hi, x_lo, adjoint=adjoint)


@functools.partial(jax.jit, static_argnames=("mode",))
def ir_update(A, b, x_hi, x_lo, d, *, mode):
    """One double-word refinement step: fold the correction ``d`` into the
    dw solution and recompute the dw residual r = b − A·(x_hi + x_lo) with
    compensated products/sums (one dispatch per outer iteration)."""
    x_hi, x_lo = dw_add(x_hi, x_lo, d)
    y_hi, y_lo = dw_matvec(A, x_hi, x_lo, mode=mode)
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


def square_ir_wrap(method, solve_fn, A, b, x0, kwargs, forward=(),
                   reject=None):
    """Intercept ``precision="double_word"`` in a square-solve wrapper.

    Pops ``precision`` from ``kwargs``; returns (x, stats) when the dw
    path ran, or None (caller proceeds with the plain solve).
    ``solve_fn(A, rhs, **opts) -> (d, stats, state)`` is the method's
    working-precision entry (x0 defaulted) used for the corrections.
    ``forward`` — option names passed through to inner solves (e.g. a
    preconditioner: it changes the iteration, not the fixed point).
    ``reject`` — {name: default} options the dw certificate cannot honor;
    a non-default value raises (compared against the default, so
    truthy-by-default options are caught too — ADVICE r3).
    """
    from ..operators import as_operator

    precision = kwargs.pop("precision", None)
    flags = {}
    for k, d in (reject or {}).items():
        v = kwargs.get(k, d)
        flags[k] = (v is not None) if d is None else (v != d)
    flags["verbose"] = kwargs.get("verbose", 0)
    if not check_ir_config(method, precision,
                           history=kwargs.get("history", False),
                           callback=kwargs.get("callback"), **flags):
        return None
    start = time.perf_counter()
    A = as_operator(A)
    b = jnp.asarray(b)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(kwargs.get("atol"), T)
    rtol = rt.default_tol(kwargs.get("rtol"), T)
    itmax = rt.resolve_itmax(kwargs.get("itmax", 0), 2 * b.shape[0])
    timemax = kwargs.get("timemax", float("inf"))
    fwd = {k: kwargs[k] for k in forward if k in kwargs}
    x0a = None if x0 is None else jnp.asarray(x0, b.dtype)

    def inner(rhs, rtol_i, it_left, time_left):
        d, st, _ = solve_fn(A, rhs, atol=0.0, rtol=rtol_i, itmax=it_left,
                            timemax=time_left if np.isfinite(time_left)
                            else float("inf"), **fwd)
        return d, st.niter

    x, stats, _ = ir_solve(inner, A, b, x0a, atol, rtol, itmax, timemax,
                           start)
    return x, stats


def ir_solve(inner, A, b, x0, atol, rtol, itmax, timemax, start):
    """Double-word iterative refinement driver.

    ``inner(rhs, rtol_i, it_left, time_left) -> (d, niter)`` solves
    A·d = rhs at working precision (the method's own wrapper, so its
    fused fast path applies) within the remaining ``timemax`` budget.
    Accumulates x and r = b − A·x in double-word f32 pairs; stops on the
    dw TRUE residual at ``atol + rtol·‖b‖`` — tolerances the working
    dtype alone cannot certify.  Returns x as a host f64 array
    (x_hi + x_lo exceeds f32 representation; on-chip state stays f32).
    """
    n = A.shape[1] if getattr(A, "shape", None) is not None else b.shape[0]
    T = real_dtype(b.dtype)
    mode = ir_mode(A)
    bNorm = float(knorm2(b))
    target = atol + rtol * bNorm
    # inner passes stop where working-precision rounding floors the true
    # residual
    inner_rtol = max(float(np.sqrt(np.finfo(T).eps)) * 0.2, 1e-5)

    zero = jnp.zeros(n, b.dtype)
    d0 = zero if x0 is None else jnp.asarray(x0, b.dtype)
    x_hi, x_lo, r_hi, r_lo, rnorm_d = ir_update(
        A, b, zero, zero, d0, mode=mode)
    rnorm = float(rnorm_d)
    total = 0
    code = rt.SOLVED if rnorm <= target else rt.RUNNING
    prev = float("inf")
    strikes = 0
    while code == rt.RUNNING:
        if total >= itmax:
            code = rt.TIRED
            break
        time_left = timemax - (time.perf_counter() - start)
        if time_left <= 0:
            code = rt.OVERTIMED
            break
        # two-strike stall rule: SYMMLQ-style error-minimizing inners
        # contract slowly near the target — a hard 2x-per-pass demand cut
        # them off one pass short of the certificate
        strikes = strikes + 1 if rnorm >= 0.8 * prev else 0
        if strikes >= 2:
            # refinement stalled: working-precision inner solves can no
            # longer reduce the dw residual (operator too ill-conditioned
            # for IR at this storage precision)
            code = rt.ILL_COND_MACH
            break
        if not np.isfinite(rnorm):
            # an inner breakdown poisoned the correction (e.g. an
            # inconsistent system): report the machine-precision stall
            code = rt.ILL_COND_MACH
            break
        prev = rnorm
        rtol_i = max(inner_rtol, 0.1 * target / rnorm)
        d, niter = inner(r_hi + r_lo, rtol_i, itmax - total, time_left)
        total += max(int(niter), 1)
        x_hi, x_lo, r_hi, r_lo, rnorm_d = ir_update(
            A, b, x_hi, x_lo, d, mode=mode)
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


@functools.partial(jax.jit, static_argnames=("mode",))
def ir_update_ls(A, b, x_hi, x_lo, r_hi, r_lo, dx, dr, reg, *, mode):
    """One augmented-system dw refinement step for regularized LS.

    Folds the corrections into the dw pair (x, r) — r is carried as an
    independent unknown of the augmented system [I A; Aᴴ −reg·I][r; x]
    = [b; 0] (Carson-Higham LSIR) — then recomputes both dw augmented
    residuals in compensated arithmetic:
      f1 = b − r − A·x          (top block)
      g  = Aᴴ·r − reg·x         (optimality gradient; bottom rhs is −g)
    Returns (x_hi, x_lo, r_hi, r_lo, f1, f2, ‖f1‖_dw, ‖g‖_dw) with
    f1/f2 collapsed to working precision for the inner correction solve
    (their magnitudes shrink with the outer iteration, so the collapse
    loses nothing — the whole point of the augmented formulation).
    """
    from ..ops.kops import _two_prod_vec

    x_hi, x_lo = dw_add(x_hi, x_lo, dx)
    r_hi, r_lo = dw_add(r_hi, r_lo, dr)
    y_hi, y_lo = dw_matvec(A, x_hi, x_lo, mode=mode)
    s, e = two_sum(b, -y_hi)
    t_hi, t_lo = two_sum(s, e - y_lo)
    s2, e2 = two_sum(t_hi, -r_hi)
    f1_hi, f1_lo = two_sum(s2, e2 + t_lo - r_lo)
    g_hi, g_lo = dw_matvec(A, r_hi, r_lo, mode=mode, adjoint=True)
    p, pe = _two_prod_vec(jnp.full_like(x_hi, reg), x_hi)
    sg, eg = two_sum(g_hi, -p)
    g_hi, g_lo = two_sum(sg, g_lo + eg - pe - reg * x_lo)
    return (x_hi, x_lo, r_hi, r_lo, f1_hi + f1_lo, -(g_hi + g_lo),
            dw_norm(f1_hi, f1_lo), dw_norm(g_hi, g_lo))


def ir_solve_ls(A, b, x0, reg, atol, rtol, itmax, timemax, start,
                first=None, stats_cls=SimpleStats, **stats_extra):
    """Double-word iterative refinement for min ‖b − Ax‖² + reg·‖x‖².

    Carson-Higham least-squares IR (SIAM J. Sci. Comput. 2018; PAPERS.md)
    on the AUGMENTED system [I A; Aᴴ −reg·I][r; x] = [b; 0]: the dw outer
    loop carries both x and the residual r as unknowns, and each pass
    solves the saddle correction system with TriMR (τ=1, ν=−reg — the
    same structure the reference's trimr `sp`/SQD presets target) at
    working precision, where the shrinking rhs keeps a fixed inner
    relative tolerance sufficient.  A plain-LSQR inner correction floors
    at ε_inner·‖A‖·‖r*‖ for inconsistent systems — the augmented form is
    what breaks that floor.

    Stops when the dw optimality gradient ‖Aᴴr − reg·x‖ ≤ atol +
    rtol·‖Aᴴb‖ AND the dw consistency residual ‖b − r − Ax‖ ≤ atol +
    rtol·‖b‖.  reg is the multiplier on x in the optimality system: λ²
    for lsqr/lsmr, λ for cgls.  Returns x as a host f64 array.
    """
    from .tricg import _trimr_solve

    n = A.shape[1]
    m = A.shape[0]
    T = real_dtype(b.dtype)
    mode = ir_mode(A)
    reg_s = jnp.asarray(reg, T)
    zb = jnp.zeros_like(b)
    gb_hi, gb_lo = dw_matvec(A, b, zb, mode=mode, adjoint=True)
    target_g = atol + rtol * float(dw_norm(gb_hi, gb_lo))
    target_f = atol + rtol * float(knorm2(b))
    inner_rtol = 1e-4 if np.finfo(T).eps < 1e-10 else 1e-3

    zx = jnp.zeros(n, b.dtype)
    zr = jnp.zeros(m, b.dtype)
    total = 0
    dx0 = zx if x0 is None else jnp.asarray(x0, b.dtype)
    if first is not None and x0 is None:
        # pass 0 is the base method itself at working precision — TriMR's
        # SSY process breaks down on a zero bottom rhs, and this keeps the
        # first (dominant) solve on the method's own fast path
        dx0, n0 = first(b, itmax, timemax - (time.perf_counter() - start))
        total += max(int(n0), 1)
    x_hi, x_lo, r_hi, r_lo, f1, f2, fnorm_d, gnorm_d = ir_update_ls(
        A, b, zx, zx, zr, zr, dx0, zr, reg_s, mode=mode)
    # seed the residual unknown: r ← collapse(b − A·x) so the augmented
    # system's top residual starts at the dw rounding level
    x_hi, x_lo, r_hi, r_lo, f1, f2, fnorm_d, gnorm_d = ir_update_ls(
        A, b, x_hi, x_lo, r_hi, r_lo, zx, f1, reg_s, mode=mode)
    fnorm, gnorm = float(fnorm_d), float(gnorm_d)
    code = (rt.SOLVED if gnorm <= target_g and fnorm <= target_f
            else rt.RUNNING)
    prev = float("inf")
    strikes = 0
    while code == rt.RUNNING:
        if total >= itmax:
            code = rt.TIRED
            break
        time_left = timemax - (time.perf_counter() - start)
        if time_left <= 0:
            code = rt.OVERTIMED
            break
        err = max(gnorm / max(target_g, np.finfo(T).tiny),
                  fnorm / max(target_f, np.finfo(T).tiny))
        if not np.isfinite(err):
            code = rt.ILL_COND_MACH
            break
        strikes = strikes + 1 if err >= 0.8 * prev else 0
        if strikes >= 2:
            # refinement stalled: the working-precision saddle solves no
            # longer reduce the dw augmented residual
            code = rt.ILL_COND_MACH
            break
        prev = err
        kw = dict(sp=True) if reg == 0.0 else dict(tau=1.0, nu=-float(reg))
        # the correction system is linear: normalize the rhs so the inner
        # f32 solve never trips its absolute machine-precision floor
        # (rhs norms shrink below eps_f32 as the dw loop converges)
        scale = 1.0 / max(float(np.hypot(fnorm, gnorm)),
                          float(np.finfo(np.float64).tiny))
        scale = jnp.asarray(scale, T)
        dr, dx, ist, _ = _trimr_solve(
            A, scale * f1, scale * f2, atol=0.0, rtol=inner_rtol,
            itmax=min(itmax - total, 4 * (m + n)),
            timemax=time_left if np.isfinite(time_left) else float("inf"),
            **kw)
        dr = dr / scale
        dx = dx / scale
        total += max(int(ist.niter), 1)
        x_hi, x_lo, r_hi, r_lo, f1, f2, fnorm_d, gnorm_d = ir_update_ls(
            A, b, x_hi, x_lo, r_hi, r_lo, dx, dr, reg_s, mode=mode)
        fnorm, gnorm = float(fnorm_d), float(gnorm_d)
        if gnorm <= target_g and fnorm <= target_f:
            code = rt.SOLVED
    x = (np.asarray(x_hi, dtype=np.float64)
         + np.asarray(x_lo, dtype=np.float64))
    # solved via the ‖Aᴴr‖ certificate — the reference's SOLVED_AR string
    status = ("found approximate minimum least-squares solution"
              if rt.is_solved_code(code) else rt.decode_status(code))
    stats = stats_cls(
        niter=total,
        solved=rt.is_solved_code(code),
        inconsistent=False,
        residuals=np.zeros(0),
        timer=time.perf_counter() - start,
        status=status,
        **stats_extra,
    )
    return x, stats, None


# ---------------------------------------------------------------------------
# Two-vector families: least-norm (x, y) duals, saddle/SQD pairs, adjoint
# pairs (VERDICT r4 ask #3 — the reference converges every method at
# Float64 to √eps(T), reference test/test_mp.jl:31-60; these wrappers give
# the same certificate from f32 device storage).
# ---------------------------------------------------------------------------

def _dw_scale(alpha, hi, lo):
    """Compensated α·(hi + lo) → dw pair (α a scalar)."""
    from ..ops.kops import _two_prod_vec

    p, pe = _two_prod_vec(jnp.full_like(hi, alpha), hi)
    return p, pe + alpha * lo


@functools.partial(jax.jit, static_argnames=("modeA", "modeB", "kind"))
def ir_update_pair(A, B, b, c, x_hi, x_lo, y_hi, y_lo, dx, dy, tau, nu,
                   *, modeA, modeB, kind):
    """One dw refinement step for a two-vector family.

    Folds the corrections (dx, dy) into the dw pairs, then recomputes the
    family's residual block(s) in compensated arithmetic:

    - ``kind="ln"``      x ∈ Rⁿ primal, y ∈ Rᵐ dual of min ‖x‖ s.t. Ax=b:
                         f1 = b − A·x (the dual is accumulated dw but has
                         no residual of its own — each inner correction
                         satisfies dx = Aᴴ·dy at working precision, so x
                         stays in range(Aᴴ) and keeps the min-norm
                         property).
    - ``kind="adjoint"`` two square systems Ax = b and Aᴴy = c:
                         f1 = b − A·x, f2 = c − Aᴴ·y.
    - ``kind="sqd"``     [τI A; Aᴴ νI][x; y] = [b; c] (x ∈ Rᵐ, y ∈ Rⁿ):
                         f1 = b − τx − A·y, f2 = c − Aᴴx − νy.
    - ``kind="gpmr"``    [λI A; B μI][x; y] = [b; c] with a SECOND
                         operator B (τ=λ, ν=μ): f2 = c − B·x − μy.

    Returns (x_hi, x_lo, y_hi, y_lo, f1, f2, ‖f1‖_dw, ‖f2‖_dw) with the
    residuals collapsed to working precision for the inner solve.
    """
    x_hi, x_lo = dw_add(x_hi, x_lo, dx)
    y_hi, y_lo = dw_add(y_hi, y_lo, dy)
    if kind == "ln":
        ax_hi, ax_lo = dw_matvec(A, x_hi, x_lo, mode=modeA)
        s, e = two_sum(b, -ax_hi)
        f1_hi, f1_lo = two_sum(s, e - ax_lo)
        f2_hi = jnp.zeros_like(y_hi)
        f2_lo = f2_hi
    elif kind == "adjoint":
        ax_hi, ax_lo = dw_matvec(A, x_hi, x_lo, mode=modeA)
        s, e = two_sum(b, -ax_hi)
        f1_hi, f1_lo = two_sum(s, e - ax_lo)
        ay_hi, ay_lo = dw_matvec(A, y_hi, y_lo, mode=modeA, adjoint=True)
        s2, e2 = two_sum(c, -ay_hi)
        f2_hi, f2_lo = two_sum(s2, e2 - ay_lo)
    else:
        ay_hi, ay_lo = dw_matvec(A, y_hi, y_lo, mode=modeA)
        if kind == "sqd":
            bx_hi, bx_lo = dw_matvec(A, x_hi, x_lo, mode=modeA,
                                     adjoint=True)
        else:  # "gpmr": second block row applies B directly
            bx_hi, bx_lo = dw_matvec(B, x_hi, x_lo, mode=modeB)
        tx_hi, tx_lo = _dw_scale(tau, x_hi, x_lo)
        ny_hi, ny_lo = _dw_scale(nu, y_hi, y_lo)
        s, e = two_sum(b, -tx_hi)
        s, e2 = two_sum(s, -ay_hi)
        f1_hi, f1_lo = two_sum(s, e + e2 - tx_lo - ay_lo)
        s, e = two_sum(c, -bx_hi)
        s, e2 = two_sum(s, -ny_hi)
        f2_hi, f2_lo = two_sum(s, e + e2 - bx_lo - ny_lo)
    return (x_hi, x_lo, y_hi, y_lo, f1_hi + f1_lo, f2_hi + f2_lo,
            dw_norm(f1_hi, f1_lo), dw_norm(f2_hi, f2_lo))


def pair_ir_solve(inner, A, B, b, c, atol, rtol, itmax, timemax, start,
                  *, kind, tau=0.0, nu=0.0, x0=None, y0=None):
    """Double-word refinement driver for two-vector families.

    ``inner(f1, f2, rtol_i, it_left, time_left) -> (dx, dy, niter)``
    solves the family's correction system at working precision (its own
    wrapper, so the fused fast paths apply).  Returns
    (x64, y64, total, code, solved1, solved2) with x/y as host f64
    arrays; ``solved1/solved2`` are the per-block certificates (equal for
    the combined-norm kinds).
    """
    T = real_dtype(b.dtype)
    modeA = ir_mode(A)
    modeB = ir_mode(B) if kind == "gpmr" else modeA
    bN = float(knorm2(b))
    cN = float(knorm2(c))
    if kind == "ln":
        target1, target2 = atol + rtol * bN, float("inf")
    elif kind == "adjoint":
        target1, target2 = atol + rtol * bN, atol + rtol * cN
    else:
        target1 = atol + rtol * float(np.hypot(bN, cN))
        target2 = None  # combined-norm certificate
    inner_rtol = max(float(np.sqrt(np.finfo(T).eps)) * 0.2, 1e-5)
    tau_s = jnp.asarray(tau, T)
    nu_s = jnp.asarray(nu, T)

    nx = b.shape[0] if kind in ("sqd", "gpmr", "adjoint") else A.shape[1]
    ny = c.shape[0] if kind in ("sqd", "gpmr", "adjoint") else A.shape[0]
    zx = jnp.zeros(nx, b.dtype)
    zy = jnp.zeros(ny, b.dtype)
    dx0 = zx if x0 is None else jnp.asarray(x0, b.dtype)
    dy0 = zy if y0 is None else jnp.asarray(y0, b.dtype)
    x_hi, x_lo, y_hi, y_lo, f1, f2, f1n_d, f2n_d = ir_update_pair(
        A, B, b, c, zx, zx, zy, zy, dx0, dy0, tau_s, nu_s,
        modeA=modeA, modeB=modeB, kind=kind)
    f1n, f2n = float(f1n_d), float(f2n_d)

    def err():
        if kind == "ln":
            return f1n / max(target1, np.finfo(T).tiny)
        if kind == "adjoint":
            return max(f1n / max(target1, np.finfo(T).tiny),
                       f2n / max(target2, np.finfo(T).tiny))
        return float(np.hypot(f1n, f2n)) / max(target1, np.finfo(T).tiny)

    total = 0
    code = rt.SOLVED if err() <= 1.0 else rt.RUNNING
    prev = float("inf")
    strikes = 0
    while code == rt.RUNNING:
        if total >= itmax:
            code = rt.TIRED
            break
        time_left = timemax - (time.perf_counter() - start)
        if time_left <= 0:
            code = rt.OVERTIMED
            break
        e = err()
        if not np.isfinite(e):
            code = rt.ILL_COND_MACH
            break
        strikes = strikes + 1 if e >= 0.8 * prev else 0
        if strikes >= 2:
            # refinement stalled: working-precision inner solves can no
            # longer reduce the dw residual at this storage precision
            code = rt.ILL_COND_MACH
            break
        prev = e
        rtol_i = max(inner_rtol, 0.1 / max(e, 1.0))
        # the correction system is linear: normalize the rhs so the inner
        # f32 solve never trips its absolute machine-precision floor
        scale = 1.0 / max(float(np.hypot(f1n, f2n)),
                          float(np.finfo(np.float64).tiny))
        scale_s = jnp.asarray(scale, T)
        dx, dy, niter = inner(scale_s * f1, scale_s * f2, rtol_i,
                              itmax - total, time_left)
        dx = dx / scale_s
        dy = dy / scale_s
        total += max(int(niter), 1)
        x_hi, x_lo, y_hi, y_lo, f1, f2, f1n_d, f2n_d = ir_update_pair(
            A, B, b, c, x_hi, x_lo, y_hi, y_lo, dx, dy, tau_s, nu_s,
            modeA=modeA, modeB=modeB, kind=kind)
        f1n, f2n = float(f1n_d), float(f2n_d)
        if err() <= 1.0:
            code = rt.SOLVED
    x = (np.asarray(x_hi, np.float64) + np.asarray(x_lo, np.float64))
    y = (np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64))
    if kind == "adjoint":
        solved1, solved2 = f1n <= target1, f2n <= target2
    else:
        solved1 = solved2 = rt.is_solved_code(code)
    return x, y, total, code, solved1, solved2


def pair_ir_wrap(method, inner_fn, A, b, c, kwargs, *, kind, B=None,
                 tau=0.0, nu=0.0, reject=None, make_stats=None,
                 x0=None, y0=None, itmax_scale=4):
    """Intercept ``precision="double_word"`` in a two-vector wrapper.

    Pops ``precision`` from ``kwargs``; returns (x, y, stats) when the dw
    path ran, or None (caller proceeds with the plain solve).
    ``inner_fn(A_or_ops, f1, f2, rtol_i, it_left, time_left) ->
    (dx, dy, niter)`` runs the method's own working-precision solve on
    the correction system.  ``make_stats(niter, code, solved1, solved2,
    timer)`` builds the method's stats object (default: SimpleStats with
    the standard status vocabulary).
    """
    from ..operators import as_operator

    precision = kwargs.pop("precision", None)
    flags = {}
    for k, d in (reject or {}).items():
        v = kwargs.get(k, d)
        flags[k] = (v is not None) if d is None else (v != d)
    flags["verbose"] = kwargs.get("verbose", 0)
    if not check_ir_config(method, precision,
                           history=kwargs.get("history", False),
                           callback=kwargs.get("callback"), **flags):
        return None
    start = time.perf_counter()
    A = as_operator(A, need_adjoint=True)
    if B is not None:
        B = as_operator(B)
    b = jnp.asarray(b)
    c = jnp.asarray(c, dtype=b.dtype)
    T = real_dtype(b.dtype)
    atol = rt.default_tol(kwargs.get("atol"), T)
    rtol = rt.default_tol(kwargs.get("rtol"), T)
    m, n = A.shape
    # IR runs several inner passes; budget accordingly
    itmax = rt.resolve_itmax(kwargs.get("itmax", 0), itmax_scale * (m + n))
    timemax = kwargs.get("timemax", float("inf"))

    def inner(f1, f2, rtol_i, it_left, time_left):
        return inner_fn(A if B is None else (A, B), f1, f2, rtol_i,
                        it_left,
                        time_left if np.isfinite(time_left)
                        else float("inf"))

    x, y, total, code, s1, s2 = pair_ir_solve(
        inner, A, B, b, c, atol, rtol, itmax, timemax, start,
        kind=kind, tau=tau, nu=nu, x0=x0, y0=y0)
    timer = time.perf_counter() - start
    if make_stats is not None:
        stats = make_stats(total, code, s1, s2, timer)
    else:
        stats = SimpleStats(
            niter=total,
            solved=rt.is_solved_code(code),
            inconsistent=False,
            residuals=np.zeros(0),
            timer=timer,
            status=rt.decode_status(code),
        )
    return x, y, stats


def adjoint_dw(method, solve_fn, A, b, c, x0, y0, kwargs, primal_pt="xᶜ"):
    """``precision="double_word"`` for the adjoint pair families
    (bilqr/trilqr): dw refinement of both TRUE residuals b − Ax and
    c − Aᴴy, inner corrections via the method's own simultaneous
    primal/dual solve.  Emits the reference's adjoint status vocabulary
    with per-system certificates (AdjointStats)."""
    from ..stats import AdjointStats

    def inner(Aop, f1, f2, rtol_i, it_left, time_left):
        dx, dy, st, _ = solve_fn(Aop, f1, f2, atol=0.0, rtol=rtol_i,
                                 itmax=it_left, timemax=time_left)
        return dx, dy, st.niter

    def make_stats(niter, code, s1, s2, timer):
        if s1 and s2:
            status = (f"Both primal and dual solutions ({primal_pt}, t) "
                      "are good enough given atol and rtol")
        elif s1:
            status = (f"Only the primal solution {primal_pt} is good "
                      "enough given atol and rtol")
        elif s2:
            status = ("Only the dual solution t is good enough given "
                      "atol and rtol")
        else:
            status = rt.decode_status(code)
        return AdjointStats(niter=niter, solved_primal=s1, solved_dual=s2,
                            residuals_primal=np.zeros(0),
                            residuals_dual=np.zeros(0),
                            timer=timer, status=status)

    return pair_ir_wrap(method, inner, A, b, c, kwargs, kind="adjoint",
                        x0=x0, y0=y0, make_stats=make_stats)


def dw_matmat(A, X_hi, X_lo, *, mode):
    """(Y_hi, Y_lo) ≈ A·(X_hi + X_lo) column-wise in compensated
    arithmetic (the multi-RHS analogue of dw_matvec)."""
    cols_hi = []
    cols_lo = []
    for j in range(X_hi.shape[1]):
        h, l = dw_matvec(A, X_hi[:, j], X_lo[:, j], mode=mode)
        cols_hi.append(h)
        cols_lo.append(l)
    return jnp.stack(cols_hi, axis=1), jnp.stack(cols_lo, axis=1)


@functools.partial(jax.jit, static_argnames=("mode",))
def ir_update_block(A, B, X_hi, X_lo, D, *, mode):
    """One dw refinement step for a multi-RHS system AX = B."""
    X_hi, X_lo = dw_add(X_hi, X_lo, D)
    Y_hi, Y_lo = dw_matmat(A, X_hi, X_lo, mode=mode)
    s, e = two_sum(B, -Y_hi)
    R_hi, R_lo = two_sum(s, e - Y_lo)
    # Frobenius dw norm via the flattened compensated dot
    rnorm = dw_norm(R_hi.reshape(-1), R_lo.reshape(-1))
    return X_hi, X_lo, R_hi + R_lo, rnorm


def block_ir_wrap(method, solve_fn, A, B, X0, kwargs, forward=()):
    """Intercept ``precision="double_word"`` in a block (multi-RHS)
    wrapper: dw accumulation of X against the TRUE block residual
    B − AX (Frobenius certificate), inner corrections via the block
    method itself at working precision.  Matches the per-column bar of
    reference test/test_mp.jl applied to the multi-RHS families."""
    from ..operators import as_operator

    precision = kwargs.pop("precision", None)
    flags = {"verbose": kwargs.get("verbose", 0)}
    if not check_ir_config(method, precision,
                           history=kwargs.get("history", False),
                           callback=kwargs.get("callback"), **flags):
        return None
    start = time.perf_counter()
    A = as_operator(A)
    B = jnp.asarray(B)
    T = real_dtype(B.dtype)
    mode = ir_mode(A)
    atol = rt.default_tol(kwargs.get("atol"), T)
    rtol = rt.default_tol(kwargs.get("rtol"), T)
    itmax = rt.resolve_itmax(kwargs.get("itmax", 0),
                             2 * B.shape[0] // max(B.shape[1], 1))
    timemax = kwargs.get("timemax", float("inf"))
    fwd = {k: kwargs[k] for k in forward if k in kwargs}
    bNorm = float(knorm2(B.reshape(-1)))
    target = atol + rtol * bNorm
    inner_rtol = max(float(np.sqrt(np.finfo(T).eps)) * 0.2, 1e-5)

    Z = jnp.zeros_like(B)
    D0 = Z if X0 is None else jnp.asarray(X0, B.dtype)
    X_hi, X_lo, R, rnorm_d = ir_update_block(A, B, Z, Z, D0, mode=mode)
    rnorm = float(rnorm_d)
    total = 0
    code = rt.SOLVED if rnorm <= target else rt.RUNNING
    prev = float("inf")
    strikes = 0
    while code == rt.RUNNING:
        if total >= itmax:
            code = rt.TIRED
            break
        time_left = timemax - (time.perf_counter() - start)
        if time_left <= 0:
            code = rt.OVERTIMED
            break
        if not np.isfinite(rnorm):
            code = rt.ILL_COND_MACH
            break
        strikes = strikes + 1 if rnorm >= 0.8 * prev else 0
        if strikes >= 2:
            code = rt.ILL_COND_MACH
            break
        prev = rnorm
        rtol_i = max(inner_rtol, 0.1 * target / rnorm)
        D, st, _ = solve_fn(A, R, None, atol=0.0, rtol=rtol_i,
                            itmax=itmax - total,
                            timemax=time_left if np.isfinite(time_left)
                            else float("inf"), **fwd)
        total += max(int(st.niter), 1)
        X_hi, X_lo, R, rnorm_d = ir_update_block(A, B, X_hi, X_lo, D,
                                                 mode=mode)
        rnorm = float(rnorm_d)
        if rnorm <= target:
            code = rt.SOLVED
    X = (np.asarray(X_hi, np.float64) + np.asarray(X_lo, np.float64))
    stats = SimpleStats(
        niter=total,
        solved=rt.is_solved_code(code),
        inconsistent=False,
        residuals=np.zeros(0),
        timer=time.perf_counter() - start,
        status=rt.decode_status(code),
    )
    return X, stats
