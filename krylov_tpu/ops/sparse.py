"""Sparse matrix storage + SpMV/SpMM for the solver layer.

The reference has no sparse kernels of its own (it rides Julia's
SparseArrays / vendor GPU sparse libraries through duck typing,
reference: docs/src/gpu.md:5-75).  Here CSR is a first-class pytree and
SpMV is an XLA `segment_sum` contraction by default, with a Pallas TPU
kernel path for HBM-resident matrices (ops/pallas_spmv.py) selected
automatically when profitable.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class CSRMatrix:
    """CSR sparse matrix as a JAX pytree.

    ``rows`` is the COO row index array (sorted, derived from indptr) kept
    alongside indptr: segment-sum SpMV consumes rows; Pallas/partitioned
    kernels consume indptr.
    """

    def __init__(self, data, indices, indptr, rows, shape):
        self.data = data
        self.indices = indices
        self.indptr = indptr
        self.rows = rows
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return self.data.shape[0]

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr, self.rows), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        return cls(*leaves, shape)

    def todense(self):
        m, n = self.shape
        dense = jnp.zeros((m, n), dtype=self.dtype)
        return dense.at[self.rows, self.indices].add(self.data)

    def transpose_conj_traced(self):
        """Aᴴ with traced ``data`` allowed: the structure (rows/indices,
        assumed concrete) is permuted host-side once; the values are
        gathered with jnp so this works under jit/vmap/grad tracing."""
        import jax.numpy as jnp
        m, n = self.shape
        rows = np.asarray(self.rows)
        cols = np.asarray(self.indices)
        order = np.lexsort((rows, cols))
        new_rows = cols[order]
        new_cols = rows[order]
        indptr = np.zeros(n + 1, dtype=np.int32)
        np.add.at(indptr, new_rows + 1, 1)
        indptr = np.cumsum(indptr).astype(np.int32)
        new_data = jnp.conj(jnp.asarray(self.data))[order]
        return CSRMatrix(new_data, new_cols.astype(np.int32), indptr,
                         new_rows.astype(np.int32), (n, m))

    def transpose_conj(self):
        """Aᴴ as a new CSRMatrix (host-side construction)."""
        m, n = self.shape
        rows = np.asarray(self.rows)
        cols = np.asarray(self.indices)
        data = np.conj(np.asarray(self.data))
        order = np.lexsort((rows, cols))
        new_rows = cols[order]
        new_cols = rows[order]
        new_data = data[order]
        indptr = np.zeros(n + 1, dtype=np.int32)
        np.add.at(indptr, new_rows + 1, 1)
        indptr = np.cumsum(indptr).astype(np.int32)
        return CSRMatrix(
            jnp.asarray(new_data),
            jnp.asarray(new_cols.astype(np.int32)),
            jnp.asarray(indptr),
            jnp.asarray(new_rows.astype(np.int32)),
            (n, m),
        )

    def __matmul__(self, x):
        if x.ndim == 1:
            return spmv(self, x)
        return spmm(self, x)


def csr_from_coo(rows, cols, vals, shape, dtype=None):
    """Build a CSRMatrix from COO triplets (host-side; duplicates summed)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    if dtype is not None:
        vals = vals.astype(dtype)
    m, n = shape
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # Sum duplicate entries.
    if len(rows) > 0:
        key = rows.astype(np.int64) * n + cols.astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        if len(uniq) != len(key):
            summed = np.zeros(len(uniq), dtype=vals.dtype)
            np.add.at(summed, inv, vals)
            rows = (uniq // n).astype(rows.dtype)
            cols = (uniq % n).astype(cols.dtype)
            vals = summed
    indptr = np.zeros(m + 1, dtype=np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return CSRMatrix(
        jnp.asarray(vals),
        jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(indptr),
        jnp.asarray(rows.astype(np.int32)),
        (m, n),
    )


def csr_from_dense(A, tol=0.0):
    """Build a CSRMatrix from a dense array (host-side)."""
    A = np.asarray(A)
    m, n = A.shape
    mask = np.abs(A) > tol
    rows, cols = np.nonzero(mask)
    return csr_from_coo(rows, cols, A[rows, cols], (m, n))


@partial(jax.jit, static_argnames=("num_rows",))
def _segment_spmv(data, indices, rows, x, num_rows):
    prods = data * x[indices]
    return jax.ops.segment_sum(
        prods, rows, num_segments=num_rows, indices_are_sorted=True
    )


def spmv(A: CSRMatrix, x):
    """y = A x via gather + sorted segment-sum (XLA path)."""
    return _segment_spmv(A.data, A.indices, A.rows, x, A.shape[0])


def spmm(A: CSRMatrix, X):
    """Y = A X for a block of column vectors (multi-RHS path)."""
    prods = A.data[:, None] * X[A.indices, :]
    return jax.ops.segment_sum(
        prods, A.rows, num_segments=A.shape[0], indices_are_sorted=True
    )
