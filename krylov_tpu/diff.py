"""Differentiable Krylov solves — implicit differentiation on TPU.

A capability the reference does not have: ``diff.solve`` and
``diff.lstsq`` are fully traceable solve functions that compose with
``jax.grad`` / ``jax.vjp`` / ``jax.jvp`` / ``jit`` / ``vmap``, so a
Krylov solve can sit inside a training loop or an outer optimization.

Differentiation is *implicit* (via ``lax.custom_linear_solve``), never
backprop-through-iterations: for ``x = A⁻¹ b`` the reverse pass solves
one adjoint system ``Aᵀ w = x̄`` with the same Krylov method, and the
operator cotangent is assembled from the matvec's own VJP — so a CSR /
DIA / matrix-free operator receives a gradient with exactly its own
sparsity structure, and memory cost is O(n) regardless of iteration
count (no stored iterates).

For least squares ``min ‖Ax − b‖² + λ‖x‖²`` the solution is the fixed
point of the normal equations ``(AᴴA + λI) x = AᴴB``; ``diff.lstsq``
differentiates through that system (the classic Golub–Pereyra two-term
derivative falls out automatically from the product rule on ``AᴴA`` and
``AᴴB``), with CG on the normal operator as the inner solve.

Accuracy contract: ``custom_linear_solve`` assumes the inner solve is
exact, so gradient error is proportional to the solve tolerance — use a
tight ``rtol`` (the √eps default is right) when gradients matter.

No reference analogue (Krylov.jl has no AD rules; ChainRules for it
live out-of-tree) — this is the TPU/JAX-native extension of the same
solver cores, cited per method below.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_pytree_node_class

from . import _runtime as rt
from ._dtypes import real_dtype
from .operators import AbstractLinearOperator, as_operator

__all__ = ["solve", "lstsq", "SYMMETRIC_METHODS", "GENERAL_METHODS"]

#: Methods valid for Hermitian A (transpose solve is the same solve).
SYMMETRIC_METHODS = ("cg", "cr", "minres", "symmlq")
#: Methods valid for general square A (adjoint solve on ``A.H``).
GENERAL_METHODS = ("gmres", "fom", "bicgstab", "cgs", "bilq", "qmr")


#: Rectangular least-squares methods usable via batched_solve (not
#: diff.solve — use diff.lstsq for differentiable least squares).
LS_METHODS = ("lsqr", "lsmr", "cgls")

#: (x, y) methods usable via batched_solve_xy: saddle-point
#: [τI A; Aᴴ νI][x;y]=[b;c] (tricg/trimr) and the adjoint pair
#: Ax=b / Aᴴy=c (bilqr).
XY_METHODS = ("tricg", "trimr", "bilqr")


def _traced_state_xy(method, A, b, c, atol, rtol, itmax,
                     tau=1.0, nu=-1.0):
    """One fully-traced (x, y) solve returning the core state (x, y,
    iter, status + the bilqr convergence flags) — the batched_solve_xy
    engine, driving the same jitted cores as the public wrappers."""
    cap = jnp.int32(itmax)
    common = dict(history=False, hist_len=0, callback=None, verbose=0)
    if method in ("tricg", "trimr"):
        from .solvers.tricg import _tricg_core, _trimr_core
        core = _tricg_core if method == "tricg" else _trimr_core
        return core(A, None, None, b, c, None, None, None, cap, atol,
                    rtol, float(tau), float(nu), ldiv=False, MisI=True,
                    NisI=True, **common)
    from .solvers.bilq import _bilqr_core
    return _bilqr_core(A, b, c, None, None, None, cap, atol, rtol,
                       transfer_to_bicg=True, **common)


class _FusedResult:
    """state-shaped (x, iter, status) view of a fused-kernel solve."""

    def __init__(self, x, it, status):
        self.x = x
        self.iter = it
        self.status = status


def _try_fused(method, A, M, N, b, atol, rtol, itmax, memory, dot2):
    """Route the inner solve to a whole-solve-in-VMEM Pallas kernel.

    Valid inside ``custom_linear_solve``: the inner solve is a black box
    (gradients flow only through the outer matvec), so using the fused
    kernel changes speed, not derivatives.  Gated exactly like the
    public wrappers' fast paths; requires static (Python float)
    tolerances — traced tolerances (batched_solve) keep the general
    core.
    """
    if not (isinstance(atol, float) and isinstance(rtol, float)):
        return None
    if dot2 or N is not None:
        return None
    if not (getattr(A, "use_pallas", False)
            and getattr(A, "_pd", None) is not None):
        return None
    n = b.shape[0]
    if method == "cg":
        from .operators import DiagonalOperator
        from .ops.pallas_fused import cg_dia_fused, cg_dia_fused_supported
        dinv = None
        if M is not None:
            if not isinstance(M, DiagonalOperator):
                return None
            dinv = M.d.astype(b.dtype)  # diff has no ldiv: M applies as-is
        if cg_dia_fused_supported(A.dia.offsets, n, b.dtype,
                                  stencil_dtype=A._pd.dtype):
            x, it, _rn, status, _viol = cg_dia_fused(
                A._pd, A.dia.offsets, b, atol, rtol, itmax, dinv=dinv)
            return _FusedResult(x, it, status)
    elif method == "gmres" and M is None:
        from .ops.pallas_fused import (gmres_dia_fused,
                                       gmres_dia_fused_supported)
        mem = max(1, min(int(memory), itmax))
        if gmres_dia_fused_supported(A.dia.offsets, n, b.dtype, mem,
                                     stencil_dtype=A._pd.dtype,
                                     basis_dtype=None):
            x, it, _rn, status, _inc, _np = gmres_dia_fused(
                A._pd, A.dia.offsets, b, atol, rtol, itmax, mem=mem)
            return _FusedResult(x, it, status)
    return None


def _traced_state(method, A, M, N, b, atol, rtol, itmax, memory,
                  dot2=False, lam=0.0):
    """One fully-traced solve of ``Ax = b`` returning the core state.

    Calls the same jitted ``lax.while_loop`` cores as the public
    wrappers (solvers/<method>.py), with history/callback/verbose off
    and the reference default options.  The state carries ``x``,
    ``iter``, and ``status`` (device int code) on every method.
    """
    fused = _try_fused(method, A, M, N, b, atol, rtol, itmax, memory, dot2)
    if fused is not None:
        return fused
    cap = jnp.int32(itmax)
    T = real_dtype(b.dtype)
    common = dict(history=False, hist_len=0, callback=None, verbose=0)
    if method in ("lsqr", "lsmr"):
        from .solvers.lsqr import _lsqr_core
        from .solvers.lsmr import _lsmr_core
        core = _lsqr_core if method == "lsqr" else _lsmr_core
        sq = jnp.asarray(np.sqrt(jnp.finfo(T).eps), T)
        kw = dict(ldiv=False, window=5, use_radius=False,
                  MisI=M is None, NisI=N is None, **common)
        if method == "lsqr":
            kw["dot2"] = dot2
        return core(A, M, N, b, None, cap, jnp.int32(itmax),
                    lam, sq, sq, atol, rtol, sq, 1.0e8, 0.0, **kw)
    if method == "cgls":
        from .solvers.cgls import _cgls_core
        return _cgls_core(A, M, b, None, cap, atol, rtol, lam, 0.0,
                          ldiv=False, use_radius=False, MisI=M is None,
                          **common)
    if method == "cg":
        from .solvers.cg import _cg_core
        st = _cg_core(A, M, b, None, None, cap, atol, rtol, 0.0,
                      ldiv=False, linesearch=False, use_radius=False,
                      dot2=dot2, **common)
    elif method == "cr":
        from .solvers.cr import _cr_core
        gamma_tol = float(np.sqrt(jnp.finfo(T).eps))
        st = _cr_core(A, M, b, None, None, cap, atol, rtol, 0.0, gamma_tol,
                      ldiv=False, linesearch=False, use_radius=False,
                      MisI=M is None, **common)
    elif method == "minres":
        from .solvers.minres import _minres_core
        st = _minres_core(A, M, b, None, None, cap, atol, rtol,
                          jnp.zeros((), T), 0.0, 0.0,
                          ldiv=False, linesearch=False, window=5,
                          MisI=M is None, **common)
    elif method == "symmlq":
        from .solvers.symmlq import _symmlq_core
        st = _symmlq_core(A, M, b, None, None, cap, jnp.int32(itmax),
                          atol, rtol, jnp.zeros((), T), 0.0, 0.0, 0.0,
                          ldiv=False, transfer_to_cg=True,
                          use_lambda_est=False, MisI=M is None, window=5,
                          **common)
    elif method in ("gmres", "fom"):
        mem = max(1, min(int(memory), itmax))
        from .solvers.fom import _fom_core
        from .solvers.gmres import _gmres_core
        core = _gmres_core if method == "gmres" else _fom_core
        kw = dict(mem=mem, ldiv=False, restart=mem < itmax,
                  reorthogonalization=False,
                  MisI=M is None, NisI=N is None, **common)
        if method == "gmres":
            kw["flexible"] = False
        st = core(A, M, N, b, None, None, cap, jnp.int32(itmax),
                  atol, rtol, **kw)
    elif method in ("bicgstab", "cgs"):
        from .solvers.bicgstab import _bicgstab_core, _cgs_core
        core = _bicgstab_core if method == "bicgstab" else _cgs_core
        st = core(A, M, N, b, b, None, None, cap, atol, rtol,
                  ldiv=False, **common)
    elif method == "bilq":
        from .solvers.bilq import _bilq_core
        st = _bilq_core(A, b, b, None, None, cap, atol, rtol,
                        transfer_to_bicg=True, **common)
    elif method == "qmr":
        from .solvers.bilq import _qmr_core
        st = _qmr_core(A, b, b, None, None, cap, atol, rtol, **common)
    else:  # pragma: no cover - guarded by the public entry points
        raise ValueError(f"unsupported method {method!r}")
    return st


def _traced_x(method, A, M, N, b, atol, rtol, itmax, memory, dot2=False):
    """x of `_traced_state` (the custom_linear_solve inner solve)."""
    return _traced_state(method, A, M, N, b, atol, rtol, itmax, memory,
                         dot2).x


def _swap_adj(op):
    """Preconditioner for the adjoint system (M A N ≈ I ⇒ Nᴴ Aᴴ Mᴴ ≈ I)."""
    return None if op is None else op.H


def _ad_matvec(A):
    """A differentiable matvec closure for ``custom_linear_solve``.

    The differentiated closure must have AD (transpose) rules; Pallas
    kernels do not.  For a Pallas-backed DIA operator the closure uses
    the XLA shift-and-add lowering, and for a HybridOperator the
    segment-sum SpMV over its source CSR (same math, differentiable) —
    the kernels still run the INNER solves, where they are black boxes.
    NB: a HybridOperator built eagerly from concrete values captures its
    CSR data as constants, so gradients w.r.t. the matrix values require
    constructing the operator from traced values inside the
    differentiated function (CSRMatrix/DIAMatrix inputs do this).
    """
    from .operators import DIAOperator, HybridOperator
    if isinstance(A, DIAOperator) and A.use_pallas:
        from .ops.dia import dia_spmv
        data, offsets = A.dia.data, A.dia.offsets
        return lambda v: dia_spmv(data, offsets, v)
    if isinstance(A, HybridOperator) and A._csr is not None:
        from .ops.sparse import spmv
        csr = A._csr
        return lambda v: spmv(csr, v)
    return A.matvec


def _coerce_diff(A, need_adjoint=False):
    """Trace-safe, differentiable operator coercion for diff entry points.

    A raw CSRMatrix goes to the segment-sum CSROperator on EVERY backend
    (the TPU hybrid analysis is host-side — it cannot run on traced
    values under jax.grad — and its Pallas kernels have no AD rules);
    the adjoint, when needed, is built with traced-data-safe structure
    permutation (CSRMatrix.transpose_conj_traced).
    """
    from .operators import CSROperator
    from .ops.sparse import CSRMatrix
    if isinstance(A, CSRMatrix):
        csr_h = A.transpose_conj_traced() if need_adjoint else None
        return CSROperator(A, csr_h)
    return as_operator(A, need_adjoint=need_adjoint)


def solve(A, b, method="cg", *, M=None, N=None, atol=0.0, rtol=None,
          itmax=0, memory=20, dot2=False):
    """Differentiable ``x = A⁻¹ b`` for square systems.

    Traceable under jit/vmap and differentiable w.r.t. both ``b`` and
    the operator's array leaves (dense matrix, CSR/DIA values, or
    anything a matrix-free closure captures).  ``method`` is one of
    ``SYMMETRIC_METHODS`` (Hermitian A) or ``GENERAL_METHODS``.  The
    reverse pass solves the adjoint system with the same method:
    Hermitian methods reuse ``A`` (``Aᵀw = c ⇔ A conj(w) = conj(c)``),
    general methods solve on ``A.H`` with the preconditioners swapped.

    Returns only ``x`` (stats are host-side objects and cannot flow
    through AD); use the regular wrappers when you need stats.
    """
    if method not in SYMMETRIC_METHODS and method not in GENERAL_METHODS:
        raise ValueError(
            f"diff.solve supports {SYMMETRIC_METHODS + GENERAL_METHODS}, "
            f"got {method!r}")
    hermitian = method in SYMMETRIC_METHODS
    if hermitian and N is not None:
        raise ValueError(f"{method} takes no right preconditioner N")
    # General methods solve the adjoint system in reverse mode.
    A = _coerce_diff(A, need_adjoint=not hermitian)
    M = as_operator(M)
    N = as_operator(N)
    b = jnp.asarray(b)
    n = b.shape[0]
    if A.shape is not None and A.shape != (n, n):
        raise ValueError("System must be square and match b")
    T = real_dtype(b.dtype)
    is_complex = jnp.issubdtype(b.dtype, jnp.complexfloating)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, 2 * n)

    matvec = _ad_matvec(A)

    if dot2 and method != "cg":
        raise ValueError("dot2 (compensated inner products) is a CG option")

    def solve_fn(_mv, rhs):
        return _traced_x(method, A, M, N, rhs, atol, rtol, itmax, memory,
                         dot2=dot2)

    if hermitian and not is_complex:
        return lax.custom_linear_solve(matvec, b, solve_fn, symmetric=True)

    if hermitian:
        # Hermitian complex: Aᵀ = conj(A), so Aᵀw = c ⇔ A conj(w) = conj(c).
        def transpose_fn(_mv, rhs):
            w = _traced_x(method, A, M, N, jnp.conj(rhs), atol, rtol,
                          itmax, memory, dot2=dot2)
            return jnp.conj(w)
    else:
        # General: Aᵀw = c ⇔ Aᴴ conj(w) = conj(c); preconditioners swap
        # sides and adjoint.
        AH, MH, NH = A.H, _swap_adj(N), _swap_adj(M)

        def transpose_fn(_mv, rhs):
            w = _traced_x(method, AH, MH, NH, jnp.conj(rhs), atol, rtol,
                          itmax, memory)
            return jnp.conj(w)

    return lax.custom_linear_solve(matvec, b, solve_fn,
                                   transpose_solve=transpose_fn)


@register_pytree_node_class
class _NormalOperator(AbstractLinearOperator):
    """H = AᴴA + λI — the (Hermitian PD for λ>0) normal operator."""

    def __init__(self, base, lam):
        self.base = base
        self.lam = lam
        self.shape = (None if base.shape is None
                      else (base.shape[1], base.shape[1]))
        self.dtype = base.dtype

    def matvec(self, v):
        return self.base.rmatvec(self.base.matvec(v)) + \
            self.lam.astype(v.dtype) * v

    rmatvec = matvec

    @property
    def H(self):
        return self

    def tree_flatten(self):
        return (self.base, self.lam), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def lstsq(A, b, *, lam=0.0, atol=0.0, rtol=None, itmax=0, dot2=False):
    """Differentiable regularized least squares.

    ``x = argmin ‖Ax − b‖² + λ‖x‖²`` as the solution of the normal
    equations ``(AᴴA + λI) x = Aᴴb``, differentiable w.r.t. ``A``'s
    array leaves, ``b``, and ``lam``.  The inner solve is CG on the
    normal operator — mathematically the CGLS iteration (reference
    src/cgls.jl solves the same system); note the κ² conditioning of
    normal equations when choosing ``rtol``/``itmax``.  Requires a
    unique minimizer (λ > 0 or full column rank).
    """
    A = _coerce_diff(A, need_adjoint=True)
    b = jnp.asarray(b)
    if A.shape is None:
        raise ValueError("diff.lstsq needs an operator with a known shape")
    m, n = A.shape
    if b.shape[0] != m:
        raise ValueError("Inconsistent problem size")
    T = real_dtype(b.dtype)
    is_complex = jnp.issubdtype(b.dtype, jnp.complexfloating)
    atol = rt.default_tol(atol, T)
    rtol = rt.default_tol(rtol, T)
    itmax = rt.resolve_itmax(itmax, m + n)
    lam = jnp.asarray(lam, T)
    H = _NormalOperator(A, lam)
    A_mv = _ad_matvec(A)

    def matvec(v):
        # rmatvec is the XLA (differentiable) path on every operator.
        return A.rmatvec(A_mv(v)) + lam.astype(v.dtype) * v

    rhs = A.rmatvec(b)

    def solve_fn(_mv, c):
        return _traced_x("cg", H, None, None, c, atol, rtol, itmax, 0,
                         dot2=dot2)

    if not is_complex:
        return lax.custom_linear_solve(matvec, rhs, solve_fn, symmetric=True)

    def transpose_fn(_mv, c):
        # H Hermitian: Hᵀw = c ⇔ H conj(w) = conj(c).
        return jnp.conj(
            _traced_x("cg", H, None, None, jnp.conj(c), atol, rtol, itmax, 0,
                      dot2=dot2))

    return lax.custom_linear_solve(matvec, rhs, solve_fn,
                                   transpose_solve=transpose_fn)
