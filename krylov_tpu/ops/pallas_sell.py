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
    (+ sentinel); chunk_of: (P,) i32 chunk id per pair.  ``covered``
    records whether every slice owns at least one pair; when False the
    SpMV masks the rows of unvisited (garbage) output tiles to zero.
    """

    def __init__(self, data, idx, slice_of, chunk_of, shape, nnz,
                 covered=True):
        self.data = data
        self.idx = idx
        self.slice_of = slice_of
        self.chunk_of = chunk_of
        self.shape = tuple(shape)
        self.nnz = int(nnz)
        self.covered = bool(covered)

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
                (self.shape, self.nnz, self.covered))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, nnz, covered = aux
        return cls(*leaves, shape, nnz, covered)

    def __matmul__(self, x):
        return sell_spmv(self, x)


def sell_from_csr(csr, cover=True):
    """Build a SELLMatrix from a CSRMatrix (host-side, vectorized O(nnz)).

    ``cover=True`` inserts an all-zero pair for every slice that owns no
    nonzeros so every output tile is written by the kernel; ``cover=False``
    skips the dummies (each costs Kmax·1024 padded slots) and relies on
    the SpMV's output masking instead — the right choice for the deep,
    sparse buckets of :func:`sell_bucketed_from_csr`.
    """
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
    missing = np.setdiff1d(np.arange(nsl), uniq // nch)
    covered = len(missing) == 0
    if cover:
        # guarantee every slice owns >= 1 pair (untouched y tiles otherwise)
        uniq = np.union1d(uniq, missing * nch)
        covered = True
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
                      (m, n), len(vals), covered)


@register_pytree_node_class
class SELLBucketed:
    """Sum of SELLMatrix parts, each packed at its own Kmax (SELL-C-σ).

    A single SELLMatrix pads every (slice, chunk) pair to the GLOBAL
    Kmax, so one deep row poisons the fill of the whole matrix (the
    measured FEM profiles packed at fill 0.09-0.11).  Two classic fixes
    compose here: pairs are partitioned by their own depth into
    cost-optimal Kmax segments (each segment an independent SELLMatrix),
    and rows may be permuted by descending depth class first (σ-sorting)
    so deep rows share slices instead of poisoning one pair each.  y is
    the exact sum of the per-segment SpMVs, un-permuted by one gather
    when sorting was applied (``row_pos`` maps original row -> sorted
    position; None when unsorted).
    """

    def __init__(self, parts, shape, nnz, row_pos=None):
        self.parts = tuple(parts)
        self.shape = tuple(shape)
        self.nnz = int(nnz)
        self.row_pos = row_pos

    @property
    def dtype(self):
        return self.parts[0].dtype

    @property
    def slots(self):
        return sum(p.data.size for p in self.parts)

    @property
    def fill(self):
        return self.nnz / max(self.slots, 1)

    def tree_flatten(self):
        leaves = self.parts
        if self.row_pos is not None:
            leaves = leaves + (self.row_pos,)
        return leaves, (self.shape, self.nnz, len(self.parts))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, nnz, nparts = aux
        row_pos = leaves[nparts] if len(leaves) > nparts else None
        return cls(leaves[:nparts], shape, nnz, row_pos)

    def __matmul__(self, x):
        return sell_bucketed_spmv(self, x)


# v5e-calibrated cost model, in units of one stored slot (≈ 8.2 ps of
# kernel time at the measured 120 Gslots/s streaming rate;
# tools/exp_gather_rate.py):
_PAIR_COST = 27_000    # fixed grid-step cost per pair (~0.22 us)
_GATHER_COST = 870     # one jnp.take element (~7.1 ns; TPU gather is slow)
_PART_COST = 250_000   # per extra kernel: dispatch + the y-sum pass (~2 us)


def _bucket_plan(rows, cols, m, n):
    """Cost-optimal depth segmentation of the (slice, chunk) pairs.

    Sorts the pairs by their own Kmax and splits them into contiguous
    segments minimizing ``Σ count_b · (_PAIR_COST + kmax_b · SLICE)``
    (exact interval DP over the distinct Kmax values — a segment's cost
    is its pair count times its padded tile height plus the per-pair
    grid-step overhead).  Returns ``(cost, slots, lbl_nnz, labels)``
    where ``lbl_nnz`` maps each input nonzero to its segment label.
    Pure host-side analysis, O(nnz log nnz + d²) for d distinct depths.
    """
    nch = max(-(-n // CHUNK), 1)
    key = (rows // SLICE) * nch + cols // CHUNK
    order = np.lexsort((cols, rows, key))
    key_o, row_o = key[order], rows[order]
    new_grp = np.r_[True, (key_o[1:] != key_o[:-1])
                    | (row_o[1:] != row_o[:-1])]
    starts = np.where(new_grp, np.arange(len(key_o)), 0)
    k = np.arange(len(key_o)) - np.maximum.accumulate(starts)

    uniq = np.unique(key_o)
    pair_of = np.searchsorted(uniq, key_o)
    kmax_p = np.zeros(len(uniq), np.int64)
    np.maximum.at(kmax_p, pair_of, k + 1)

    # interval DP over distinct depths: best[j] = min cost covering the
    # first j depth groups with contiguous segments
    depths, counts = np.unique(kmax_p, return_counts=True)
    d = len(depths)
    csum = np.r_[0, np.cumsum(counts)]
    best = np.full(d + 1, np.inf)
    best[0] = 0.0
    cut = np.zeros(d + 1, np.int64)
    for j in range(1, d + 1):
        for i in range(j):
            c = best[i] + _PART_COST + (csum[j] - csum[i]) * (
                _PAIR_COST + int(depths[j - 1]) * SLICE)
            if c < best[j]:
                best[j] = c
                cut[j] = i
    bounds = []
    j = d
    while j > 0:
        bounds.append((cut[j], j))
        j = cut[j]
    bounds.reverse()

    lbl_of_depth = np.zeros(d, np.int64)
    slots = 0
    for lb, (i, j) in enumerate(bounds):
        lbl_of_depth[i:j] = lb
        slots += int(csum[j] - csum[i]) * int(depths[j - 1]) * SLICE
    lbl_p = lbl_of_depth[np.searchsorted(depths, kmax_p)]
    lbl_nnz = np.empty(len(key_o), np.int64)
    lbl_nnz[order] = lbl_p[pair_of]          # back to input nnz order
    return float(best[d]), slots, lbl_nnz, np.arange(len(bounds))


def sell_bucketed_from_csr(csr, sort_rows="auto"):
    """Pack a CSRMatrix into cost-optimal depth-segmented SELL parts.

    Pairs (slice, chunk) are partitioned by their own Kmax into the
    segments that minimize the calibrated kernel-time model (padding
    slots + per-pair grid-step overhead); each segment becomes an
    independent SELLMatrix with no dummy coverage pairs.  With
    ``sort_rows`` (default "auto"), a second plan is costed that first
    permutes rows by descending depth CLASS (ceil log2 of row count,
    stable — σ-sorting that keeps band/chunk locality inside a class) so
    deep rows cluster into a few slices instead of poisoning the Kmax of
    every pair they touch; it is chosen only when its cost including the
    per-SpMV un-permute gather (``m · _GATHER_COST``: TPU gathers run
    ~0.14 G elem/s, 870× a streamed slot) beats the unsorted plan.
    Returns a plain SELLMatrix when one unsorted segment is optimal,
    else a SELLBucketed.
    """
    rows = np.asarray(csr.rows, np.int64)
    cols = np.asarray(csr.indices, np.int64)
    vals = np.asarray(csr.data)
    if len(vals) == 0:
        return sell_from_csr(csr)
    m, n = csr.shape

    cost, slots, lbl_nnz, labels = _bucket_plan(rows, cols, m, n)
    row_pos = None
    if sort_rows:
        counts = np.zeros(m, np.int64)
        np.add.at(counts, rows, 1)
        cls = np.ceil(np.log2(np.maximum(counts, 1) + 1e-9))
        if cls.max() != cls[counts > 0].min():
            order_rows = np.argsort(-cls, kind="stable")
            pos = np.empty(m, np.int64)
            pos[order_rows] = np.arange(m)
            cost_s, slots_s, lbl_s, labels_s = _bucket_plan(
                pos[rows], cols, m, n)
            if cost_s + m * _GATHER_COST < cost:
                slots, lbl_nnz, labels = slots_s, lbl_s, labels_s
                rows = pos[rows]
                row_pos = pos

    if len(labels) == 1 and row_pos is None:
        return sell_from_csr(csr)

    from .sparse import csr_from_coo
    parts = []
    for lb in labels:
        sel = lbl_nnz == lb
        parts.append(sell_from_csr(csr_from_coo(
            rows[sel], cols[sel], vals[sel], (m, n)), cover=False))
    return SELLBucketed(parts, (m, n), csr.nnz,
                        None if row_pos is None else jnp.asarray(row_pos))


def sell_bucketed_spmv(A: "SELLBucketed", x, interpret=None):
    y = None
    for p in A.parts:
        yp = sell_spmv(p, x, interpret=interpret)
        y = yp if y is None else y + yp
    if A.row_pos is not None:
        y = jnp.take(y, A.row_pos, axis=0)   # un-permute σ-sorted rows
    return y


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
    if not A.covered:
        # slices with no pairs were never visited — their tiles are garbage
        own = jnp.zeros((nsl,), bool).at[A.slice_of[:-1]].set(True)
        out = jnp.where(jnp.repeat(own, 8)[:, None], out, 0)
    return out.reshape(-1)[:m]
