"""Matrix-structure analysis: route general CSR input to TPU fast paths.

The reference hands general sparse matrices to vendor CSR SpMV
(benchmark/benchmarks.jl:23-33, docs/src/gpu.md); the TPU equivalent of
"just call the vendor kernel" is a one-time host-side *analysis* that
decomposes the pattern into the formats the hardware likes:

* diagonals dense enough to stream (fill >= ``diag_fill``) peel off
  into a DIA part — shift-and-add SpMV at ~roofline HBM bandwidth
  (ops/dia.py, ops/pallas_dia.py),
* everything else goes to the SELL-C-128 remainder — in-register
  lane-gather SpMV (ops/pallas_sell.py).

A banded/stencil matrix (Poisson, convection-diffusion) analyzes to
pure DIA; a scattered matrix to pure SELL; matrices with both structure
and noise split.  ``y = dia part + sell part``, exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .dia import DIAMatrix, dia_spmv
from .sparse import CSRMatrix, csr_from_coo
from .pallas_sell import (SELLBucketed, SELLMatrix, sell_bucketed_from_csr,
                          sell_bucketed_spmv, sell_spmv)


def split_diagonals(csr, diag_fill=0.5, max_diags=256):
    """Partition a square CSRMatrix's nonzeros by diagonal density.

    Returns ``(dia, rem)`` where ``dia`` is a DIAMatrix holding every
    diagonal whose fill ratio (nnz on the diagonal / diagonal length)
    is at least ``diag_fill`` (at most ``max_diags`` of them, densest
    first) and ``rem`` is a CSRMatrix of the remaining nonzeros.
    Either may be None.  Host-side, O(nnz).
    """
    m, n = csr.shape
    rows = np.asarray(csr.rows, np.int64)
    cols = np.asarray(csr.indices, np.int64)
    vals = np.asarray(csr.data)
    if m != n or len(vals) == 0:
        return None, csr

    offs = cols - rows
    uniq, counts = np.unique(offs, return_counts=True)
    lengths = n - np.abs(uniq)
    fill = counts / lengths
    dense = uniq[fill >= diag_fill]
    if len(dense) > max_diags:
        order = np.argsort(-fill[np.isin(uniq, dense)])
        dense = dense[order[:max_diags]]
        dense.sort()
    if len(dense) == 0:
        return None, csr

    on_dia = np.isin(offs, dense)
    data = np.zeros((len(dense), n), vals.dtype)
    d_of = np.searchsorted(dense, offs[on_dia])
    # scipy dia convention: A[i, i+k] lives at data[d, i+k] (= column)
    data[d_of, cols[on_dia]] = vals[on_dia]
    dia = DIAMatrix(jnp.asarray(data), tuple(int(k) for k in dense), (n, n))

    if np.all(on_dia):
        return dia, None
    rem = csr_from_coo(rows[~on_dia], cols[~on_dia], vals[~on_dia], (m, n))
    return dia, rem


@register_pytree_node_class
class HybridMatrix:
    """DIA + SELL decomposition of a sparse matrix (either part optional).

    ``dia_pd`` caches the output-aligned diagonals for the Pallas
    stencil kernel (built at analysis time on accelerator backends).
    """

    def __init__(self, dia, sell, shape, dia_pd=None):
        self.dia = dia
        self.sell = sell
        self.dia_pd = dia_pd
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.dia.dtype if self.dia is not None else self.sell.dtype

    @property
    def nnz(self):
        z = 0
        if self.dia is not None:
            z += self.dia.nnz
        if self.sell is not None:
            z += self.sell.nnz
        return z

    def tree_flatten(self):
        return (self.dia, self.sell, self.dia_pd), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        return cls(leaves[0], leaves[1], shape, leaves[2])

    def __matmul__(self, x):
        return hybrid_spmv(self, x)


def rcm_permute(csr):
    """Reverse-Cuthill-McKee reorder: ``(P A Pᵀ as CSRMatrix, perm)``.

    Clusters a scattered pattern toward the diagonal so the analysis
    finds dense diagonals and the SELL remainder gets high slice/chunk
    locality (small pair count, high fill).  Solve the permuted system
    with ``b[perm]`` and un-permute x with ``x[inv]`` where
    ``inv = np.argsort(perm)`` — the standard one-time preprocessing
    for bandwidth-sensitive sparse kernels.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    m, n = csr.shape
    if m != n:
        raise ValueError("rcm_permute needs a square matrix")
    A = sp.csr_matrix((np.asarray(csr.data), np.asarray(csr.indices),
                       np.asarray(csr.indptr)), shape=csr.shape)
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=False))
    Ap = A[perm][:, perm].tocoo()
    return (csr_from_coo(Ap.row, Ap.col, Ap.data, (n, n)), perm)


def hybrid_from_csr(csr, diag_fill=0.5, max_diags=256):
    """Analyze a CSRMatrix into a HybridMatrix (host-side, one-time).

    If the remainder's SELL packing would be degenerate — more than
    ~64 stored slots per nonzero, the signature of a scattered pattern
    with no slice/chunk locality — the remainder stays in CSR
    (gather/segment-sum path) and ``HybridMatrix.sell`` is that
    CSRMatrix instead; pre-process with :func:`rcm_permute` to give the
    analysis a banded pattern.
    """
    dia, rem = split_diagonals(csr, diag_fill, max_diags)
    sell = None
    if rem is not None:
        sell = sell_bucketed_from_csr(rem)
        slots = (sell.slots if isinstance(sell, SELLBucketed)
                 else sell.data.size)
        pairs = (max((p.data.shape[0] for p in sell.parts), default=0)
                 if isinstance(sell, SELLBucketed) else sell.data.shape[0])
        if slots > 64 * max(rem.nnz, 1) or 2 * pairs + 1 > 240_000:
            # degenerate packing (no slice/chunk locality) or pair list
            # beyond the SMEM scalar-prefetch budget: keep CSR
            sell = rem
    dia_pd = None
    if dia is not None and jax.default_backend() == "tpu":
        from .pallas_dia import dia_align
        dia_pd = dia_align(dia.data, dia.offsets, dia.shape[0])
    return HybridMatrix(dia, sell, csr.shape, dia_pd)


def hybrid_spmv(A: "HybridMatrix", x):
    y = None
    if A.dia is not None:
        if A.dia_pd is not None:
            from .pallas_dia import dia_spmv_pallas
            y = dia_spmv_pallas(A.dia_pd, A.dia.offsets, x)
        else:
            y = dia_spmv(A.dia.data, A.dia.offsets, x)
    if A.sell is not None:
        if isinstance(A.sell, CSRMatrix):
            from .sparse import spmv
            ys = spmv(A.sell, x)
        elif isinstance(A.sell, SELLBucketed):
            ys = sell_bucketed_spmv(A.sell, x)
        else:
            ys = sell_spmv(A.sell, x)
        y = ys if y is None else y + ys
    return y
