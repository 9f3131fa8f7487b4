"""L1 operator protocol.

The reference's operator contract is duck-typed: any object with
``mul!(y, A, x)``, ``size``, ``eltype`` and ``adjoint`` works
(reference: docs/src/matrix_free.md:33-50).  The JAX analogue is an
object with ``matvec(x)``/``rmatvec(x)`` (rmatvec = Aᴴx), ``shape`` and
``dtype``, registered as a pytree so operators flow through jit
boundaries without retracing per matrix value.

Preconditioners follow the same protocol; when a solver is called with
``ldiv=True`` the preconditioner's ``solve(x)`` is used instead of
``matvec`` (reference mulorldiv!: src/krylov_utils.jl:305-307).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .ops.sparse import CSRMatrix, spmv, spmm


class AbstractLinearOperator:
    """Protocol: matvec, rmatvec, shape, dtype; optionally solve/rsolve."""

    shape = None
    dtype = None

    def matvec(self, x):
        raise NotImplementedError

    def rmatvec(self, x):
        """y = Aᴴ x (the reference's A' apply)."""
        raise NotImplementedError

    def solve(self, x):
        """y = A⁻¹ x — preconditioner ldiv-mode apply."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support ldiv-mode application"
        )

    def rsolve(self, x):
        """y = A⁻ᴴ x."""
        raise NotImplementedError

    @property
    def H(self):
        return AdjointOperator(self)

    @property
    def T(self):
        return self.H

    def __matmul__(self, x):
        if getattr(x, "ndim", 1) == 2:
            return self.matmat(x)
        return self.matvec(x)

    def matmat(self, X):
        return jnp.stack([self.matvec(X[:, j]) for j in range(X.shape[1])], axis=1)

    def rmatmat(self, X):
        return jnp.stack([self.rmatvec(X[:, j]) for j in range(X.shape[1])], axis=1)


@register_pytree_node_class
class AdjointOperator(AbstractLinearOperator):
    def __init__(self, base):
        self.base = base
        self.shape = (base.shape[1], base.shape[0])
        self.dtype = base.dtype

    def matvec(self, x):
        return self.base.rmatvec(x)

    def rmatvec(self, x):
        return self.base.matvec(x)

    def matmat(self, X):
        return self.base.rmatmat(X)

    def rmatmat(self, X):
        return self.base.matmat(X)

    def solve(self, x):
        return self.base.rsolve(x)

    @property
    def H(self):
        return self.base

    def tree_flatten(self):
        return (self.base,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@register_pytree_node_class
class IdentityOperator(AbstractLinearOperator):
    def __init__(self, n=None, dtype=None):
        self.shape = (n, n) if n is not None else None
        self.dtype = dtype

    def matvec(self, x):
        return x

    rmatvec = matvec
    solve = matvec
    rsolve = matvec

    def matmat(self, X):
        return X

    rmatmat = matmat

    @property
    def H(self):
        return self

    def tree_flatten(self):
        return (), (self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, dtype = aux
        return cls(shape[0] if shape else None, dtype)


@register_pytree_node_class
class DiagonalOperator(AbstractLinearOperator):
    """diag(d) — the Jacobi preconditioner building block."""

    def __init__(self, d):
        self.d = d
        self.shape = (d.shape[0], d.shape[0])
        self.dtype = d.dtype

    def matvec(self, x):
        return self.d * x

    def rmatvec(self, x):
        return jnp.conj(self.d) * x

    def solve(self, x):
        return x / self.d

    def rsolve(self, x):
        return x / jnp.conj(self.d)

    def matmat(self, X):
        return self.d[:, None] * X

    def rmatmat(self, X):
        return jnp.conj(self.d)[:, None] * X

    def tree_flatten(self):
        return (self.d,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@register_pytree_node_class
class MatrixOperator(AbstractLinearOperator):
    """Dense matrix operator — matvecs hit the MXU directly."""

    def __init__(self, A):
        self.A = A
        self.shape = A.shape
        self.dtype = A.dtype

    # precision=HIGHEST: TPU f32 matmuls otherwise run as bf16 passes,
    # which silently degrades every solver applied to a dense operator.
    def matvec(self, x):
        return jnp.matmul(self.A, x, precision=jax.lax.Precision.HIGHEST)

    def rmatvec(self, x):
        return jnp.matmul(jnp.conj(self.A.T), x,
                          precision=jax.lax.Precision.HIGHEST)

    def matmat(self, X):
        return jnp.matmul(self.A, X, precision=jax.lax.Precision.HIGHEST)

    def rmatmat(self, X):
        return jnp.matmul(jnp.conj(self.A.T), X,
                          precision=jax.lax.Precision.HIGHEST)

    def tree_flatten(self):
        return (self.A,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@register_pytree_node_class
class CSROperator(AbstractLinearOperator):
    """CSR sparse operator; Aᴴ storage built lazily host-side when needed."""

    def __init__(self, csr: CSRMatrix, csr_h: CSRMatrix = None):
        self.csr = csr
        self.csr_h = csr_h
        self.shape = csr.shape
        self.dtype = csr.dtype
        if jax.default_backend() not in ("cpu",):
            import warnings
            warnings.warn(
                "CSR gather SpMV on TPU measured ~1000x slower than the "
                "DIA/BELL Pallas kernels; convert with ops.dia."
                "dia_from_scipy (banded) or ops.pallas_spmv.bell_from_csr "
                "(block-sparse) for production solves.",
                stacklevel=3)

    def with_adjoint(self):
        if self.csr_h is None:
            return CSROperator(self.csr, self.csr.transpose_conj())
        return self

    def matvec(self, x):
        return spmv(self.csr, x)

    def rmatvec(self, x):
        if self.csr_h is None:
            raise ValueError(
                "CSROperator needs adjoint storage: build with .with_adjoint()"
            )
        return spmv(self.csr_h, x)

    def matmat(self, X):
        return spmm(self.csr, X)

    def rmatmat(self, X):
        if self.csr_h is None:
            raise ValueError(
                "CSROperator needs adjoint storage: build with .with_adjoint()"
            )
        return spmm(self.csr_h, X)

    def tree_flatten(self):
        return (self.csr, self.csr_h), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@register_pytree_node_class
class FunctionOperator(AbstractLinearOperator):
    """Matrix-free operator from callables (the matrix-free contract)."""

    def __init__(self, matvec, shape, dtype, rmatvec=None, solve=None, rsolve=None):
        self._matvec = matvec
        self._rmatvec = rmatvec
        self._solve = solve
        self._rsolve = rsolve
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)

    def matvec(self, x):
        return self._matvec(x)

    def rmatvec(self, x):
        if self._rmatvec is None:
            raise ValueError("FunctionOperator built without rmatvec")
        return self._rmatvec(x)

    def solve(self, x):
        if self._solve is None:
            raise NotImplementedError("FunctionOperator built without solve")
        return self._solve(x)

    def rsolve(self, x):
        if self._rsolve is None:
            raise NotImplementedError("FunctionOperator built without rsolve")
        return self._rsolve(x)

    def tree_flatten(self):
        return (), (self._matvec, self._rmatvec, self._solve, self._rsolve,
                    self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mv, rmv, sv, rsv, shape, dtype = aux
        return cls(mv, shape, dtype, rmv, sv, rsv)


@register_pytree_node_class
class DIAOperator(AbstractLinearOperator):
    """Banded (DIA) operator — the TPU-fast path for stencil matrices.

    ``use_pallas=True`` (the default on TPU backends) routes matvecs
    through the single-pass Pallas stencil kernel (ops/pallas_dia.py)
    using output-aligned diagonals computed once at construction; any
    other backend, or ``use_pallas=False``, uses the XLA shift-and-add
    lowering (which is also the sharded/halo-exchange path).
    """

    def __init__(self, dia, use_pallas=None, _pd=None):
        self.dia = dia
        self.shape = dia.shape
        self.dtype = dia.dtype
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = bool(use_pallas)
        if self.use_pallas and _pd is None:
            from .ops.pallas_dia import dia_align
            _pd = dia_align(dia.data, dia.offsets, dia.shape[0])
        self._pd = _pd

    def matvec(self, x):
        if self.use_pallas:
            from .ops.pallas_dia import dia_spmv_pallas
            return dia_spmv_pallas(self._pd, self.dia.offsets, x)
        from .ops.dia import dia_spmv
        return dia_spmv(self.dia.data, self.dia.offsets, x)

    def aligned_adjoint(self):
        """(pd_adj, offsets_adj) for the fused rectangular kernels
        (ops/pallas_fused.dia_align_adjoint); computed once and cached."""
        if getattr(self, "_pd_adj", None) is None:
            from .ops.pallas_fused import dia_align_adjoint
            self._pd_adj = dia_align_adjoint(
                self._pd, self.dia.offsets, self.shape[0])
        return self._pd_adj

    def adjoint_dia(self):
        """(data, offsets) of Aᴴ in DIA layout: conjugate data, negate
        offsets, shift the stored diagonals.  A[i, i+k] = data[d, i+k] ⇒
        Aᴴ[j, j−k] = conj(data[d, j]) stored at position (j − k)."""
        import jax.numpy as _jnp
        n = self.shape[0]
        datas = []
        offs = []
        for d, k in enumerate(self.dia.offsets):
            v = _jnp.conj(self.dia.data[d])
            if k == 0:
                datas.append(v)
            elif k > 0:
                datas.append(_jnp.pad(v[k:], (0, k)))
            else:
                datas.append(_jnp.pad(v[:n + k], (-k, 0)))
            offs.append(-k)
        return _jnp.stack(datas), tuple(offs)

    def rmatvec(self, x):
        from .ops.dia import dia_spmv
        data, offs = self.adjoint_dia()
        return dia_spmv(data, offs, x)

    def matmat(self, X):
        from .ops.dia import dia_spmm
        return dia_spmm(self.dia.data, self.dia.offsets, X)

    def tree_flatten(self):
        return (self.dia, self._pd), self.use_pallas

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], use_pallas=aux, _pd=leaves[1])


@register_pytree_node_class
class BELLOperator(AbstractLinearOperator):
    """Block-ELL operator backed by the Pallas MXU kernel
    (ops/pallas_spmv.py bell_spmv).  For Hermitian systems matvec is
    all the solvers need; build the adjoint storage explicitly with
    ``BELLOperator(bell, bell_h)`` for unsymmetric methods.
    """

    def __init__(self, bell, bell_h=None):
        self.bell = bell
        self.bell_h = bell_h
        self.shape = bell.shape
        self.dtype = bell.dtype

    def matvec(self, x):
        from .ops.pallas_spmv import bell_spmv
        return bell_spmv(self.bell, x)

    def rmatvec(self, x):
        if self.bell_h is None:
            raise ValueError(
                "BELLOperator needs adjoint storage: pass bell_h")
        from .ops.pallas_spmv import bell_spmv
        return bell_spmv(self.bell_h, x)

    def matmat(self, X):
        from .ops.pallas_spmv import bell_spmm
        return bell_spmm(self.bell, X)

    def tree_flatten(self):
        return (self.bell, self.bell_h), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@register_pytree_node_class
class HybridOperator(AbstractLinearOperator):
    """General-sparse operator: DIA + SELL-C-128 decomposition.

    Built from a CSRMatrix by one-time host-side analysis
    (ops/hybrid.hybrid_from_csr): dense diagonals stream through the
    DIA shift-and-add SpMV, the remainder through the lane-gather SELL
    kernel — the TPU counterpart of the reference handing general
    matrices to vendor CSR SpMV (docs/src/gpu.md).  The adjoint is a
    second analyzed decomposition of Aᴴ, built lazily.
    """

    def __init__(self, hyb, hyb_h=None, _csr=None):
        self.hyb = hyb
        self.hyb_h = hyb_h
        self._csr = _csr            # kept for lazy adjoint analysis
        self.shape = hyb.shape
        self.dtype = hyb.dtype

    @classmethod
    def analyze(cls, csr, diag_fill=0.5, max_diags=256):
        from .ops.hybrid import hybrid_from_csr
        return cls(hybrid_from_csr(csr, diag_fill, max_diags), _csr=csr)

    def with_adjoint(self):
        if self.hyb_h is not None:
            return self
        if self._csr is None:
            raise ValueError("HybridOperator needs the source CSRMatrix "
                             "to build adjoint storage")
        from .ops.hybrid import hybrid_from_csr
        return HybridOperator(self.hyb,
                              hybrid_from_csr(self._csr.transpose_conj()),
                              self._csr)

    def matvec(self, x):
        from .ops.hybrid import hybrid_spmv
        return hybrid_spmv(self.hyb, x)

    def rmatvec(self, x):
        if self.hyb_h is None:
            raise ValueError(
                "HybridOperator needs adjoint storage: build with "
                ".with_adjoint()")
        from .ops.hybrid import hybrid_spmv
        return hybrid_spmv(self.hyb_h, x)

    def tree_flatten(self):
        return (self.hyb, self.hyb_h, self._csr), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def as_operator(A, need_adjoint=False):
    """Coerce A (operator | dense array | CSRMatrix) to the operator protocol."""
    if A is None:
        return None
    if isinstance(A, AbstractLinearOperator):
        if need_adjoint and isinstance(A, CSROperator):
            return A.with_adjoint()
        return A
    if isinstance(A, CSRMatrix):
        # On TPU the gather/segment-sum CSR SpMV is ~1000x off the Pallas
        # kernels; analyze the pattern once and route through DIA + SELL.
        # The analysis (O(nnz) host split + SELL packing) is cached on
        # the matrix so repeated solves pay it once; other backends
        # (cpu, gpu) keep the segment-sum CSROperator — the hybrid
        # kernels are Mosaic-TPU-only.
        if jax.default_backend() == "tpu":
            op = getattr(A, "_hybrid_op", None)
            if op is None:
                op = HybridOperator.analyze(A)
                A._hybrid_op = op
            if need_adjoint:
                op = op.with_adjoint()
                A._hybrid_op = op   # adjoint-capable supersedes the plain one
            return op
        op = CSROperator(A)
        return op.with_adjoint() if need_adjoint else op
    from .ops.dia import DIAMatrix
    if isinstance(A, DIAMatrix):
        return DIAOperator(A)
    if isinstance(A, (jnp.ndarray, np.ndarray)) or hasattr(A, "ndim"):
        if A.ndim != 2:
            raise ValueError(f"expected a 2-D array, got ndim={A.ndim}")
        return MatrixOperator(jnp.asarray(A))
    raise TypeError(
        f"cannot interpret {type(A).__name__} as a linear operator; "
        "wrap callables in FunctionOperator(matvec, shape, dtype)"
    )


def precond_apply(M, x, ldiv=False):
    """Apply preconditioner: identity if M is None (reference mulorldiv!)."""
    if M is None or isinstance(M, IdentityOperator):
        return x
    return M.solve(x) if ldiv else M.matvec(x)
