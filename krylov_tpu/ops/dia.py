"""DIA (diagonal) sparse format — the TPU-native layout for stencil operators.

Banded matrices (finite-difference stencils like the reference's
get_div_grad Poisson operator, test/get_div_grad.jl:8-19) store one dense
vector per nonzero diagonal.  SpMV is then a handful of shifted
multiply-adds: pure VPU work at streaming HBM bandwidth, with no gathers
and no irregular access — the speed-of-light formulation for this matrix
class on TPU (BASELINE.md north star).  Under a sharded `jit`, the shifts
lower to `collective-permute` halo exchanges over ICI automatically.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class DIAMatrix:
    """Square banded matrix: data[d] holds diagonal `offsets[d]`.

    Row convention (scipy.sparse.dia compatible): for offset k ≥ 0,
    ``A[i, i+k] = data[d, i+k]``; for k < 0, ``A[i, i+k] = data[d, i+k]``.
    Equivalently y = Σ_d shift(data[d] * x, -k_d) with entries outside
    [0, n) dropped.
    """

    def __init__(self, data, offsets, shape):
        self.data = data                    # (ndiags, n)
        self.offsets = tuple(int(o) for o in offsets)   # static
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        n = self.shape[0]
        return sum(n - abs(k) for k in self.offsets)

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        offsets, shape = aux
        return cls(leaves[0], offsets, shape)

    def __matmul__(self, x):
        return dia_spmv(self.data, self.offsets, x)

    def todense(self):
        n = self.shape[0]
        A = np.zeros((n, n), dtype=self.data.dtype)
        data = np.asarray(self.data)
        for d, k in enumerate(self.offsets):
            for i in range(max(0, -k), min(n, n - k)):
                A[i, i + k] = data[d, i + k]
        return jnp.asarray(A)


@partial(jax.jit, static_argnames=("offsets",))
def dia_spmv(data, offsets, x):
    """y = A x for a DIA matrix. Shifts compile to cheap slices/pads;
    sharded inputs get ICI halo exchange inserted by XLA."""
    n = x.shape[0]
    y = jnp.zeros_like(x)
    for d, k in enumerate(offsets):
        prod = data[d] * x
        if k == 0:
            y = y + prod
        elif k > 0:
            # y[i] += data[d, i+k] * x[i+k]  for i in [0, n-k)
            y = y + jnp.pad(prod[k:], (0, k))
        else:
            # y[i] += data[d, i+k] * x[i+k]  for i in [-k, n)
            y = y + jnp.pad(prod[:n + k], (-k, 0))
    return y


@partial(jax.jit, static_argnames=("offsets",))
def dia_spmm(data, offsets, X):
    """Y = A X for a block of column vectors."""
    n = X.shape[0]
    Y = jnp.zeros_like(X)
    for d, k in enumerate(offsets):
        prod = data[d][:, None] * X
        if k == 0:
            Y = Y + prod
        elif k > 0:
            Y = Y + jnp.pad(prod[k:], ((0, k), (0, 0)))
        else:
            Y = Y + jnp.pad(prod[:n + k], ((-k, 0), (0, 0)))
    return Y


@partial(jax.jit, static_argnames=("offsets",))
def dia_spmv_dw(data, offsets, x_hi, x_lo):
    """Double-word SpMV: (y_hi, y_lo) ≈ A·(x_hi + x_lo) with compensated
    products and accumulation — the residual kernel of the
    ``precision="double_word"`` iterative-refinement path.  Per-diagonal
    products use Dekker TwoProd on x_hi; the x_lo contribution and all
    product/sum error terms accumulate in the lo word."""
    from .kops import _two_prod_vec, two_sum

    n = x_hi.shape[0]

    def shift(v, k):
        if k == 0:
            return v
        if k > 0:
            return jnp.pad(v[k:], (0, k))
        return jnp.pad(v[:n + k], (-k, 0))

    y_hi = jnp.zeros_like(x_hi)
    y_lo = jnp.zeros_like(x_hi)
    for d, k in enumerate(offsets):
        p, e = _two_prod_vec(data[d], x_hi)
        lo = e + data[d] * x_lo
        p, lo = shift(p, k), shift(lo, k)
        s, e2 = two_sum(y_hi, p)
        y_hi, y_lo = s, y_lo + (e2 + lo)
    return two_sum(y_hi, y_lo)


def dia_from_scipy(A_scipy, dtype=None):
    """Build a DIAMatrix from any scipy.sparse matrix (host-side)."""
    import scipy.sparse as sp
    D = sp.dia_matrix(A_scipy)
    data = np.asarray(D.data)
    if dtype is not None:
        data = data.astype(dtype)
    return DIAMatrix(jnp.asarray(data), tuple(int(o) for o in D.offsets),
                     D.shape)


def convdiff_dia(n1, n2=None, n3=None, pe=0.3, dtype=np.float32):
    """Nonsymmetric 3-D convection-diffusion stencil in DIA form.

    -Δu + β·uₓ on the unit-grid 7-point stencil with central differences:
    diagonal 6, x-neighbors -(1 ± pe) where ``pe`` = β·h/2 is the cell
    Péclet number, y/z neighbors -1.  This is the BASELINE.md
    "GMRES(restart) + BiCGSTAB on nonsymmetric convection-diffusion"
    fixture (reference benchmark configs; cf. test/test_utils.jl's
    nonsymmetric generators).
    """
    n2 = n1 if n2 is None else n2
    n3 = n1 if n3 is None else n3
    n = n1 * n2 * n3
    offs = (-n1 * n2, -n1, -1, 0, 1, n1, n1 * n2)
    data = np.zeros((7, n), dtype=dtype)
    data[3] = 6.0
    idx = np.arange(n)
    ix = idx % n1
    iy = (idx // n1) % n2
    data[4][(ix != 0)] = -(1.0 - pe)      # A[i, i+1] (downwind)
    data[2][(ix != n1 - 1)] = -(1.0 + pe)  # A[i, i-1] (upwind)
    data[5][(iy != 0)] = -1.0
    data[1][(iy != n2 - 1)] = -1.0
    data[6][idx // (n1 * n2) != 0] = -1.0
    data[0][idx // (n1 * n2) != n3 - 1] = -1.0
    return DIAMatrix(jnp.asarray(data), offs, (n, n))


def poisson_dia(n1, n2=None, n3=None, dtype=np.float32):
    """The reference's get_div_grad 3-D Poisson operator in DIA form
    (test/get_div_grad.jl:8-19), built directly from the stencil."""
    n2 = n1 if n2 is None else n2
    n3 = n1 if n3 is None else n3
    n = n1 * n2 * n3
    # A = Div Divᵀ = 7-point stencil: diag 6 (2 per dimension), off-diags -1
    # at offsets ±1 (within x-lines), ±n1 (y), ±n1·n2 (z).
    offs = (-n1 * n2, -n1, -1, 0, 1, n1, n1 * n2)
    data = np.zeros((7, n), dtype=dtype)
    data[3] = 6.0
    idx = np.arange(n)
    ix = idx % n1
    iy = (idx // n1) % n2
    # offset +1 stores A[i, i+1] at data[., i+1]: valid when (i+1) % n1 != 0
    data[4][(ix != 0)] = -1.0                     # column index i+1 has ix!=0
    data[2][(ix != n1 - 1)] = -1.0                # A[i, i-1] at data[., i-1]
    data[5][(iy != 0)] = -1.0
    data[1][(iy != n2 - 1)] = -1.0
    data[6][idx // (n1 * n2) != 0] = -1.0
    data[0][idx // (n1 * n2) != n3 - 1] = -1.0
    return DIAMatrix(jnp.asarray(data), offs, (n, n))
