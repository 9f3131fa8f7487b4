"""SELL-C-128: chunked sliced-ELL — the TPU-native general-sparse SpMV.

The reference's bread-and-butter workload is general (SuiteSparse-style)
sparse matrices (benchmark/benchmarks.jl:23-33); on GPU it leans on
vendor CSR SpMV.  TPUs have no hardware scatter/gather from HBM, but
Mosaic *does* support an in-register lane gather:
``jnp.take_along_axis(src, idx, axis=1)`` with a 128-lane source
(measured on v5e; wide/sublane/flat gathers are rejected).  That fixes
the format:

* rows are grouped in **slices of 1024** (a y tile of (8, 128) f32),
* each slice's nonzeros are grouped by **128-wide column chunk**
  (``col // 128``), giving a flat list of (slice, chunk) *pairs*,
* a pair stores its nonzeros as (Kmax·8, 128) data/index tiles: lane =
  row % 128, sublane group k = the k-th nonzero of that row in this
  chunk, index = column % 128 (lane-local),
* the kernel runs one grid step per pair: DMA the x chunk, broadcast it
  across sublanes, lane-gather by the index tile, FMA with the data
  tile, and accumulate into the slice's y tile in VMEM (flushed when
  the pair list moves to the next slice — pairs are slice-sorted).

Everything is VPU work at streaming bandwidth: cost ≈ 4 ops and
8 bytes per (padded) nonzero, no MXU, no dynamic shapes.  Padding is
bounded by Kmax = max nonzeros any row has in one chunk (≤ 128); for
mesh/PDE matrices Kmax is 2-4.  x travels as a (nchunks, 8, 128)
sublane-replicated array so every block fetch is tile-aligned
(a (1, 128) block is not a legal Mosaic tile).
"""

from functools import partial

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

SLICE = 1024       # rows per slice  -> y tile (8, 128)
CHUNK = 128        # columns per chunk -> one lane-gather source


@register_pytree_node_class
class SELLMatrix:
    """Chunked sliced-ELL matrix (see module docstring).

    data/idx: (P, Kmax*8, 128); slice_of: (P+1,) i32 slice id per pair
    (+ sentinel); chunk_of: (P,) i32 chunk id per pair.
    """

    def __init__(self, data, idx, slice_of, chunk_of, shape, nnz):
        self.data = data
        self.idx = idx
        self.slice_of = slice_of
        self.chunk_of = chunk_of
        self.shape = tuple(shape)
        self.nnz = int(nnz)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def kmax(self):
        return self.data.shape[1] // 8

    @property
    def fill(self):
        """Fraction of stored slots that hold real nonzeros."""
        return self.nnz / max(self.data.size, 1)

    def tree_flatten(self):
        return ((self.data, self.idx, self.slice_of, self.chunk_of),
                (self.shape, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, nnz = aux
        return cls(*leaves, shape, nnz)

    def __matmul__(self, x):
        return sell_spmv(self, x)


def sell_from_csr(csr):
    """Build a SELLMatrix from a CSRMatrix (host-side, vectorized O(nnz))."""
    rows = np.asarray(csr.rows, np.int64)
    cols = np.asarray(csr.indices, np.int64)
    vals = np.asarray(csr.data)
    m, n = csr.shape
    nsl = max(-(-m // SLICE), 1)
    nch = max(-(-n // CHUNK), 1)

    s = rows // SLICE
    c = cols // CHUNK
    key = s * nch + c
    order = np.lexsort((cols, rows, key))
    key_o, row_o, col_o, val_o = key[order], rows[order], cols[order], vals[order]

    # slot k = running count of this row's nonzeros within its pair
    if len(key_o):
        new_grp = np.r_[True, (key_o[1:] != key_o[:-1])
                        | (row_o[1:] != row_o[:-1])]
        starts = np.where(new_grp, np.arange(len(key_o)), 0)
        k = np.arange(len(key_o)) - np.maximum.accumulate(starts)
        kmax = int(k.max()) + 1
    else:
        k = np.zeros(0, np.int64)
        kmax = 1

    uniq = np.unique(key_o)
    # guarantee every slice owns >= 1 pair (untouched y tiles otherwise)
    missing = np.setdiff1d(np.arange(nsl), uniq // nch)
    uniq = np.union1d(uniq, missing * nch)
    P = len(uniq)
    pair_of_nnz = np.searchsorted(uniq, key_o)

    data = np.zeros((P, kmax * 8, CHUNK), vals.dtype)
    idx = np.zeros((P, kmax * 8, CHUNK), np.int32)
    r_loc = row_o % SLICE
    sub = k * 8 + r_loc // CHUNK
    lane = r_loc % CHUNK
    data[pair_of_nnz, sub, lane] = val_o
    idx[pair_of_nnz, sub, lane] = (col_o % CHUNK).astype(np.int32)

    slice_of = np.empty(P + 1, np.int32)
    slice_of[:P] = uniq // nch
    slice_of[P] = slice_of[P - 1] + 1 if P else 0   # sentinel: flush last
    chunk_of = (uniq % nch).astype(np.int32)
    return SELLMatrix(jnp.asarray(data), jnp.asarray(idx),
                      jnp.asarray(slice_of), jnp.asarray(chunk_of),
                      (m, n), len(vals))


@partial(jax.jit, static_argnames=("interpret",))
def sell_spmv(A: "SELLMatrix", x, interpret=None):
    """y = A x with the SELL-C-128 Pallas kernel (interpret-mode on CPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, n = A.shape
    P, K8, _ = A.data.shape
    if 2 * P + 1 > 240_000:
        raise ValueError(
            f"SELL pair count {P} exceeds the SMEM scalar-prefetch budget "
            "(~1 MB); the pattern has no slice/chunk locality — keep CSR "
            "or pre-process with ops.hybrid.rcm_permute")
    nsl = max(-(-m // SLICE), 1)
    nch = max(-(-n // CHUNK), 1)
    xp = jnp.zeros((nch * CHUNK,), x.dtype).at[:n].set(x)
    # sublane-replicated chunks: every x block fetch is a legal tile
    x8 = jnp.broadcast_to(xp.reshape(nch, 1, CHUNK), (nch, 8, CHUNK))

    acc_dt = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16,
                                        jnp.float32) else x.dtype

    def kernel(slice_ref, chunk_ref, x_ref, d_ref, i_ref, o_ref, acc_ref):
        p = pl.program_id(0)
        prev = jnp.where(p == 0, -1, slice_ref[jnp.maximum(p - 1, 0)])

        @pl.when(slice_ref[p] != prev)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xrow = x_ref[0, 0:1, :]                       # (1, 128)
        g = jnp.take_along_axis(jnp.broadcast_to(xrow, (K8, CHUNK)),
                                i_ref[0], axis=1)
        prod = (d_ref[0] * g).astype(acc_dt)
        acc_ref[:] += prod.reshape(K8 // 8, 8, CHUNK).sum(axis=0)

        @pl.when(slice_ref[p + 1] != slice_ref[p])
        def _flush():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 8, CHUNK), lambda p, so, co: (co[p], 0, 0)),
            pl.BlockSpec((1, K8, CHUNK), lambda p, so, co: (p, 0, 0)),
            pl.BlockSpec((1, K8, CHUNK), lambda p, so, co: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, CHUNK), lambda p, so, co: (so[p], 0)),
        scratch_shapes=[pltpu.VMEM((8, CHUNK), acc_dt)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsl * 8, CHUNK), x.dtype),
        interpret=bool(interpret),
    )(A.slice_of, A.chunk_of, x8, A.data, A.idx)
    return out.reshape(-1)[:m]
