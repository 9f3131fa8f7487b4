"""Pallas TPU kernels for sparse matvec (BASELINE north star).

Two TPU-native unstructured-sparsity formats:

* **BELL** (block-ELL): square dense blocks of size ``bs`` (ideally 128
  to feed the MXU), padded to a fixed number of blocks per block-row.
  The Pallas kernel runs one grid step per block-row, scalar-prefetches
  the block-column indices, keeps x resident in VMEM, and accumulates
  ``data[j] @ x[col*bs : col*bs+bs]`` per block — dense MXU work with no
  gathers.  This is the TPU analogue of the reference's vendor BSR
  SpMV (docs/src/gpu.md sparse formats).

* **ELL** (padded rows): scalar-sparse fallback via vectorized
  `jnp.take` + row reduction — XLA's gather path, used when the matrix
  has no block structure.

Both are exact (padding contributes zeros).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# ---------------------------------------------------------------------------
# ELL: padded scalar rows
# ---------------------------------------------------------------------------

@register_pytree_node_class
class ELLMatrix:
    """Padded-row sparse matrix: data/indices of shape (m, K)."""

    def __init__(self, data, indices, shape):
        self.data = data
        self.indices = indices
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.data.dtype

    def tree_flatten(self):
        return (self.data, self.indices), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        return cls(*leaves, shape)

    def __matmul__(self, x):
        return ell_spmv(self.data, self.indices, x)


def ell_from_csr(csr):
    """Convert a CSRMatrix to padded ELL (host-side)."""
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.indices)
    vals = np.asarray(csr.data)
    m, n = csr.shape
    K = int(np.max(np.diff(indptr))) if m else 0
    data = np.zeros((m, max(K, 1)), dtype=vals.dtype)
    idx = np.zeros((m, max(K, 1)), dtype=np.int32)
    for i in range(m):
        s, e = indptr[i], indptr[i + 1]
        data[i, : e - s] = vals[s:e]
        idx[i, : e - s] = cols[s:e]
    return ELLMatrix(jnp.asarray(data), jnp.asarray(idx), (m, n))


@jax.jit
def ell_spmv(data, indices, x):
    return jnp.sum(data * jnp.take(x, indices, axis=0), axis=1)


# ---------------------------------------------------------------------------
# BELL: block-ELL with a Pallas MXU kernel
# ---------------------------------------------------------------------------

@register_pytree_node_class
class BELLMatrix:
    """Block-ELL: data (nbr, mbpr, bs, bs), block col indices (nbr, mbpr)."""

    def __init__(self, data, indices, shape, bs):
        self.data = data
        self.indices = indices
        self.shape = tuple(shape)
        self.bs = int(bs)

    @property
    def dtype(self):
        return self.data.dtype

    def tree_flatten(self):
        return (self.data, self.indices), (self.shape, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, bs = aux
        return cls(*leaves, shape, bs)

    def __matmul__(self, x):
        return bell_spmv(self, x)


def bell_from_dense_blocks(A, bs=128, tol=0.0):
    """Build BELL from a dense matrix by detecting nonzero bs×bs blocks."""
    A = np.asarray(A)
    m, n = A.shape
    mp = -(-m // bs) * bs
    np_ = -(-n // bs) * bs
    Ap = np.zeros((mp, np_), dtype=A.dtype)
    Ap[:m, :n] = A
    nbr, nbc = mp // bs, np_ // bs
    rows = []
    for i in range(nbr):
        blocks = []
        for j in range(nbc):
            blk = Ap[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs]
            if np.any(np.abs(blk) > tol):
                blocks.append((j, blk))
        rows.append(blocks)
    mbpr = max(1, max(len(r) for r in rows))
    data = np.zeros((nbr, mbpr, bs, bs), dtype=A.dtype)
    idx = np.zeros((nbr, mbpr), dtype=np.int32)
    for i, blocks in enumerate(rows):
        for k, (j, blk) in enumerate(blocks):
            data[i, k] = blk
            idx[i, k] = j
    return BELLMatrix(jnp.asarray(data), jnp.asarray(idx), (m, n), bs)


def bell_from_csr(csr, bs=128):
    """Build BELL from a CSRMatrix without densifying (host-side O(nnz)).

    Block occupancy comes from the CSR pattern (indices // bs); only
    occupied bs×bs blocks are materialized.
    """
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.indices)
    vals = np.asarray(csr.data)
    m, n = csr.shape
    nbr = -(-m // bs)
    block_cols = [set() for _ in range(nbr)]
    for i in range(m):
        bi = i // bs
        for p in range(indptr[i], indptr[i + 1]):
            block_cols[bi].add(int(cols[p]) // bs)
    mbpr = max(1, max((len(s) for s in block_cols), default=1))
    data = np.zeros((nbr, mbpr, bs, bs), dtype=vals.dtype)
    idx = np.zeros((nbr, mbpr), dtype=np.int32)
    slot = {}
    for bi, s in enumerate(block_cols):
        for k, bj in enumerate(sorted(s)):
            idx[bi, k] = bj
            slot[(bi, bj)] = k
    for i in range(m):
        bi = i // bs
        for p in range(indptr[i], indptr[i + 1]):
            j = int(cols[p])
            k = slot[(bi, j // bs)]
            data[bi, k, i % bs, j % bs] = vals[p]
    return BELLMatrix(jnp.asarray(data), jnp.asarray(idx), (m, n), bs)


def bell_spmv(A: "BELLMatrix", x, interpret=None):
    """y = A x with the Pallas BELL kernel (interpret-mode on CPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nbr, mbpr, bs, _ = A.data.shape
    # Static shape math only (this function must trace under jit):
    # bell_from_dense_blocks pads to bs multiples, so block column
    # indices never exceed ceil(n/bs)-1.
    ncols_pad = max(-(-A.shape[1] // bs), 1) * bs
    xp = jnp.zeros((ncols_pad,), dtype=x.dtype).at[: A.shape[1]].set(x)

    # accumulate in f32 for low-precision inputs, else in the input dtype
    accdt = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16,
                                       jnp.float32) else x.dtype

    # 2-D grid (block-row, block-slot).  The scalar-prefetched block
    # column indices feed x's BlockSpec index_map, so the pipeline DMAs
    # exactly the x segment each bs×bs block needs — the gather happens
    # in the prologue, not with in-kernel dynamic slices (which Mosaic
    # cannot prove aligned).  x never needs to be fully VMEM-resident.
    # x and y travel as (len, 1) column matrices: a (bs, 1) tile keeps
    # the sublane dim a multiple of 8 and the lane dim equal to the full
    # array dim, which 1-D (bs,) blocks cannot (XLA lays out 1-D f32
    # arrays in 1024-element tiles that clash with 128-element blocks).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, mbpr),
        in_specs=[
            pl.BlockSpec((bs, 1), lambda i, j, idx: (idx[i, j], 0)),
            pl.BlockSpec((1, 1, bs, bs), lambda i, j, idx: (i, j, 0, 0)),
        ],
        # The same output tile is revisited across j, with a VMEM
        # scratch accumulator flushed on the last slot.
        out_specs=pl.BlockSpec((bs, 1), lambda i, j, idx: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bs, 1), accdt)],
    )

    def kernel(idx_ref, x_ref, data_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # precision=HIGHEST: without it the MXU runs f32 matmuls as
        # bf16×bf16 passes (observed max err 0.16 on a 2048² banded
        # f32 SpMV); full-precision f32 keeps SpMV at fp32 accuracy.
        acc_ref[:] += jnp.dot(data_ref[0, 0], x_ref[:],
                              preferred_element_type=accdt,
                              precision=jax.lax.Precision.HIGHEST)

        @pl.when(j == pl.num_programs(1) - 1)
        def _flush():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, 1), x.dtype),
        interpret=interpret,
    )(A.indices, xp.reshape(-1, 1), A.data)
    return out.reshape(-1)[: A.shape[0]]


def bell_spmm(A: "BELLMatrix", X, interpret=None):
    """Y = A X for a block of p right-hand sides — the MXU path.

    Same scalar-prefetch pipeline as ``bell_spmv`` but each bs×bs block
    multiplies a (bs, p) panel: with p ≥ 8 the MXU runs at full-tile
    efficiency (the SpMV case feeds it 1-lane panels).  p is padded to a
    lane multiple; blocks of the multi-RHS solvers (block_gmres /
    block_minres over a BELL operator) route here via ``matmat``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nbr, mbpr, bs, _ = A.data.shape
    n_in, p = X.shape
    pp = max(-(-p // 128), 1) * 128
    ncols_pad = max(-(-A.shape[1] // bs), 1) * bs
    Xp = jnp.zeros((ncols_pad, pp), X.dtype).at[: n_in, :p].set(X)
    accdt = jnp.float32 if X.dtype in (jnp.bfloat16, jnp.float16,
                                       jnp.float32) else X.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, mbpr),
        in_specs=[
            pl.BlockSpec((bs, pp), lambda i, j, idx: (idx[i, j], 0)),
            pl.BlockSpec((1, 1, bs, bs), lambda i, j, idx: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, pp), lambda i, j, idx: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bs, pp), accdt)],
    )

    def kernel(idx_ref, x_ref, data_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(data_ref[0, 0], x_ref[:],
                              preferred_element_type=accdt,
                              precision=jax.lax.Precision.HIGHEST)

        @pl.when(j == pl.num_programs(1) - 1)
        def _flush():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, pp), X.dtype),
        interpret=interpret,
    )(A.indices, Xp, A.data)
    return out[: A.shape[0], :p]
