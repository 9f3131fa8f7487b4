"""Matvec-polynomial preconditioners — the TPU answer to IC(0)/ILU(0).

The reference ecosystem reaches for incomplete factorizations (e.g. the
ic0/ilu0 integrations exercised in reference test/gpu/nvidia.jl:36-118);
their triangular solves are inherently sequential and map terribly onto
a systolic/vector machine.  The TPU-idiomatic equivalent is polynomial
preconditioning: M = p(A) ≈ A⁻¹ built from the SAME matvec the solver
already uses — jit-friendly, batched, distribution-transparent (a
sharded operator preconditiones itself), and compatible with every
storage format in ops/ including the Pallas DIA stencil.

``ChebyshevPreconditioner`` applies the degree-d Chebyshev semi-iteration
polynomial for A z = r (optimal ∞-norm polynomial approximation of A⁻¹
on [lmin, lmax]); each application costs d−1 operator matvecs.  For a
Hermitian positive-definite A with spectrum inside [lmin, lmax] the
polynomial is Hermitian positive-definite, so it is a valid centered M
for cg/cr/minres/… (pass ``M=ChebyshevPreconditioner(A)``).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .operators import AbstractLinearOperator, as_operator


def power_bound(A, iters=20, seed=0, inflate=1.05):
    """Upper bound on the spectral radius of ``A`` by power iteration.

    Host-side one-time estimate (``iters`` matvecs under one jit),
    inflated by ``inflate`` so the Chebyshev interval certainly covers
    λmax.  For a Hermitian A this bounds λmax(A).
    """
    A = as_operator(A)
    n = A.shape[0]
    v0 = jnp.asarray(np.random.default_rng(seed).standard_normal(n),
                     A.dtype if A.dtype is not None else jnp.float32)

    @jax.jit
    def run(v):
        def step(i, carry):
            v, lam = carry
            w = A.matvec(v)
            lam = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2).real)
            safe = jnp.where(lam == 0, jnp.ones_like(lam), lam)
            return w / safe.astype(w.dtype), lam

        v = v / jnp.linalg.norm(v).astype(v.dtype)
        _, lam = jax.lax.fori_loop(0, iters, step, (v, jnp.zeros((),
                                   jnp.float32).astype(jnp.abs(v[0]).dtype)))
        return lam

    return float(run(v0)) * float(inflate)


@register_pytree_node_class
class ChebyshevPreconditioner(AbstractLinearOperator):
    """M = p_d(A) ≈ A⁻¹, the degree-``degree`` Chebyshev polynomial on
    [lmin, lmax] (Chebyshev semi-iteration for A z = r started from 0).

    Args:
      A: Hermitian positive-definite operator (any krylov_tpu operator).
      degree: polynomial degree d ≥ 1; one application = d−1 matvecs.
      lmax: upper spectral bound; estimated by :func:`power_bound` when
        omitted (a one-time host-side cost at construction).
      lmin: lower spectral bound; defaults to ``lmax / 30``.  The
        polynomial is positive (hence M SPD) on [lmin, lmax]; if the
        true λmin lies below ``lmin``, shrink it — an interval that
        misses spectrum can make M indefinite.

    The operator is Hermitian by construction (polynomial in a Hermitian
    A): ``rmatvec = matvec``; ``solve`` is the same application, so both
    ``ldiv`` modes behave identically.
    """

    def __init__(self, A, degree=8, lmin=None, lmax=None, _bounds=None):
        self.A = as_operator(A)
        self.degree = int(degree)
        if self.degree < 1:
            raise ValueError("degree must be >= 1")
        if _bounds is not None:          # pytree unflatten path
            self._lmin, self._lmax = _bounds
        else:
            if lmax is None:
                lmax = power_bound(self.A)
            if lmin is None:
                lmin = lmax / 30.0
            self._lmin = jnp.asarray(lmin)
            self._lmax = jnp.asarray(lmax)
        self.shape = self.A.shape
        self.dtype = self.A.dtype

    def tree_flatten(self):
        return ((self.A, self._lmin, self._lmax), self.degree)

    @classmethod
    def tree_unflatten(cls, degree, leaves):
        A, lmin, lmax = leaves
        return cls(A, degree, _bounds=(lmin, lmax))

    def matvec(self, r):
        FC = r.dtype
        T = jnp.finfo(FC).dtype if jnp.dtype(FC).kind == "c" else FC
        theta = ((self._lmax + self._lmin) / 2).astype(T)
        delta = ((self._lmax - self._lmin) / 2).astype(T)
        sigma = theta / delta
        rho0 = 1.0 / sigma
        d = r / theta.astype(FC)
        z = d

        def step(i, carry):
            z, d, rho = carry
            rho_n = 1.0 / (2.0 * sigma - rho)
            d = (rho_n * rho).astype(FC) * d \
                + (2.0 * rho_n / delta).astype(FC) * (r - self.A.matvec(z))
            return (z + d, d, rho_n)

        z, _, _ = jax.lax.fori_loop(0, self.degree - 1, step, (z, d, rho0))
        return z

    def rmatvec(self, r):
        return self.matvec(r)

    def solve(self, r):
        return self.matvec(r)

    def rsolve(self, r):
        return self.matvec(r)
