"""Single-pass Pallas DIA SpMV — the speed-of-light stencil kernel.

The XLA lowering of `dia_spmv` (ops/dia.py) materializes one padded
intermediate per diagonal, reading/writing each ~8-byte-per-nnz stream
several times (~110 GB/s observed on a v5e for the 7-point Poisson
stencil).  This kernel makes one pass: each grid step produces one row
tile of y from the aligned diagonal block, the current x tile, and two
small halo blocks, so HBM traffic is data once + x·(1 + 2·hb/tr) + y
once (round 5; the original 3-full-tile window read x ~3×, costing a
third of the headline — see _plan_tiles).

Index scheme: vectors are viewed as (rows, 128) lane matrices.  The
halo block height hb covers every diagonal offset (|k| ≤ (hb−1)·128),
which makes each shifted read a *static* row slice of the
(hb + tr + hb)-row x window combined with a lane rotation
(`pltpu.roll`) — no dynamic slices, so Mosaic needs no alignment
proofs.  Diagonals are pre-shifted once (`dia_align`) to be
output-aligned: y[i] = Σ_d pd[d,i]·x[i+k_d] (reference SpMV semantics:
Krylov.jl uses SparseArrays CSC mul!, src/krylov_utils.jl BLAS
trampolines; the DIA formulation is ours).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SUBLANES = 8


def dia_align(data, offsets, n):
    """Output-aligned diagonals: pd[d, i] = data[d, i+k_d] (0 outside).

    One-time O(nnz) device op; cache the result next to the matrix.
    """
    data = jnp.asarray(data)
    pd = []
    for d, k in enumerate(offsets):
        row = data[d]
        if k == 0:
            pd.append(row)
        elif k > 0:
            pd.append(jnp.pad(row[k:], (0, k)))
        else:
            pd.append(jnp.pad(row[: n + k], (-k, 0)))
    return jnp.stack(pd)


def _tile_rows(offsets, n):
    """Rows per tile: cover max |offset|, stay sublane-aligned, and
    grow toward 128 KiB f32 tiles (but never past the vector length) so
    small stencils aren't grid-overhead-bound."""
    m = max((abs(k) for k in offsets), default=1)
    tr = -(-m // LANES)
    tr = max(-(-tr // _SUBLANES) * _SUBLANES, _SUBLANES)
    rows_needed = -(-(-(-n // LANES)) // _SUBLANES) * _SUBLANES
    # larger tiles amortize grid-step overhead (512 measured ~2-7% faster
    # than 256 at 128³ on a v5e; whole-array is marginally best but costs
    # VMEM for the 3-tile x window)
    return max(tr, min(512, rows_needed))


def _plan_tiles(offsets, n, nd, pd_itemsize):
    """(tr, hb): rows per current tile and per halo block.

    Round-5 retuning: the original formulation streamed THREE full
    (tr, LANES) x-tiles per grid step (prev/cur/next), reading x ~3×
    when the stencil halo is only ceil(max|k|/128)+1 rows.  Fetch the
    halo as separate power-of-two blocks (hb | tr, so halo block
    starts are block-aligned for the index maps) and grow the current
    tile toward the VMEM budget — x traffic drops to (1 + 2·hb/tr)·n
    and fewer grid steps amortize the per-step overhead.  Measured
    (S-in-one-jit differencing, v5e): 128³ Poisson f32
    99.8 → 153.2 Gnnz/s, bf16 150.0 → 223.8; 64³ f32 62.2 → 170.6,
    bf16 79.9 → 260.1.  The pd budget is deliberate: at ~10 MB of pd
    per buffered step (tr=2816 f32) the kernel fell off a cliff to
    30 Gnnz/s — keep per-step pd ≤ ~7.5 MB.

    Caveat for y→x CHAINED loops (the bench headline harness): each
    in-jit pallas launch costs ~30 µs of fixed overhead, so a chained
    128³ application floors at ~95 µs/call for old and new plans alike
    (headline stays ~145-152 Gnnz/s); the gains above appear wherever
    the SpMV overlaps other work or is not the serializing op.
    """
    m = max((abs(k) for k in offsets), default=1)
    qmax = -(-m // LANES) + 1          # halo rows incl. the roll spill
    hb = _SUBLANES
    while hb < qmax:
        hb *= 2
    rows_needed = -(-(-(-n // LANES)) // _SUBLANES) * _SUBLANES
    # VMEM: the double-buffered pd block dominates (nd diagonals);
    # ~10 MB of pd per buffered step keeps the full working set well
    # under the v5e's ceiling.
    cap = max(hb, (15 << 19) // max(nd * LANES * pd_itemsize, 1))
    tr = min(4096, cap, max(rows_needed, 1))
    tr = max(hb, (tr // hb) * hb)
    return tr, hb


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_spmv_pallas(pd, offsets, x, interpret=None):
    """y = A x from output-aligned diagonals `pd` (see dia_align)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    nd = pd.shape[0]
    tr, hb = _plan_tiles(offsets, n, nd, jnp.dtype(pd.dtype).itemsize)
    R = tr // hb
    tile = tr * LANES
    npad = -(-n // tile) * tile
    rows = npad // LANES
    ntiles = rows // tr

    # Zero-copy fast path (round 5): when n is an exact tile multiple,
    # x and pd reshape to the lane-matrix layout as free bitcasts and NO
    # padded staging buffer is built — the per-call x copy cost a third
    # of the chained-SpMV rate (bench loops y -> x) once tiles grew.
    # Boundary halo blocks then read CLAMPED in-range rows instead of
    # zeros; that is safe because dia_align already zeroes pd wherever
    # x[i+k] would be out of range, so the garbage rows multiply 0.
    exact = (npad == n)
    if exact:
        xw = x.reshape(rows, LANES)
        pdw = pd.reshape(nd, rows, LANES)
        nb = rows // hb

        def prev_map(t):
            return (jnp.maximum(t * R - 1, 0), 0)

        def cur_map(t):
            return (t, 0)

        def next_map(t):
            return (jnp.minimum((t + 1) * R, nb - 1), 0)
    else:
        xp = jnp.zeros((npad + 2 * tile,), x.dtype).at[tile: tile + n] \
            .set(x)
        xw = xp.reshape(-1, LANES)
        pdp = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd)
        pdw = pdp.reshape(nd, rows, LANES)

        def prev_map(t):
            return ((t + 1) * R - 1, 0)

        def cur_map(t):
            return (t + 1, 0)

        def next_map(t):
            return ((t + 2) * R, 0)

    shifts = []
    for k in offsets:
        q, r = divmod(k, LANES)
        shifts.append((int(q), int(r)))
    shifts = tuple(shifts)

    def kernel(xprev_ref, xcur_ref, xnext_ref, pd_ref, y_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
        xwin = jnp.concatenate(
            [xprev_ref[:], xcur_ref[:], xnext_ref[:]], axis=0)
        acc = jnp.zeros((tr, LANES), jnp.float32 if x.dtype in (
            jnp.bfloat16, jnp.float16, jnp.float32) else x.dtype)
        for d, (q, r) in enumerate(shifts):
            w = pd_ref[d]
            if r == 0:
                sx = xwin[hb + q: hb + q + tr]
            else:
                # roll only the tr+1 rows the output needs, not the
                # whole window (VPU work, not bandwidth).
                seg = xwin[hb + q: hb + q + tr + 1]
                # Mosaic's rotate only handles 32-bit lanes: upcast
                # sub-32-bit inputs in-register (HBM loads stay narrow).
                if seg.dtype.itemsize < 4:
                    seg = seg.astype(acc.dtype)
                rolled = pltpu.roll(seg, LANES - r, 1)
                sx = jnp.where(lane < LANES - r, rolled[:tr], rolled[1:])
            acc = acc + (w.astype(acc.dtype) * sx.astype(acc.dtype))
        y_ref[:] = acc.astype(y_ref.dtype)

    y = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            # current tile + hb-row halo blocks just below/above it;
            # hb | tr keeps the halo block starts aligned to the
            # (hb, LANES) block grid
            pl.BlockSpec((hb, LANES), prev_map),
            pl.BlockSpec((tr, LANES), cur_map),
            pl.BlockSpec((hb, LANES), next_map),
            pl.BlockSpec((nd, tr, LANES), lambda t: (0, t, 0)),
        ],
        out_specs=pl.BlockSpec((tr, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), x.dtype),
        # double-buffered pd + x window + y exceed Mosaic's 16 MB
        # default scoped-vmem limit at the large-tile plan
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * (nd + 3) * tile * 4 + (8 << 20)),
        interpret=interpret,
    )(xw, xw, xw, pdw, )
    return y.reshape(-1)[:n]


def dia_pad_layout(x, offsets, n=None):
    """Lift a vector into the stencil kernel's padded (rows+2·tr, LANES)
    lane-matrix layout (zero halo tiles top and bottom)."""
    if n is None:
        n = x.shape[0]
    tr = _tile_rows(offsets, n)
    tile = tr * LANES
    npad = -(-n // tile) * tile
    xp = jnp.zeros((npad + 2 * tile,), x.dtype).at[tile: tile + n].set(x)
    return xp.reshape(-1, LANES)


def dia_unpad_layout(xw, offsets, n):
    """Inverse of dia_pad_layout."""
    tr = _tile_rows(offsets, n)
    return xw.reshape(-1)[tr * LANES: tr * LANES + n]


@partial(jax.jit, static_argnames=("offsets", "n", "interpret"))
def dia_spmv_padded(pd, offsets, xw, n, interpret=None):
    """y = A x entirely in the padded lane-matrix layout — chainable.

    ``xw`` and the returned ``yw`` share the ``dia_pad_layout`` layout,
    so repeated applications (power iterations, smoothers, solver outer
    loops that keep their iterate padded) skip the pad/unpad passes of
    ``dia_spmv_pallas``.  (Measured on a v5e the two forms run at the
    same rate — XLA fuses the layout transforms into the operand
    pipeline — so this exists for layout control, not throughput.)
    ``pd`` is the output-aligned diagonals (``dia_align``).
    The stencil masks its x window against the interior bounds, so the
    halo tiles of the layout are don't-care values and the output (whose
    halo tiles are never written) chains directly.  This kernel keeps
    all BlockSpec index maps static affine.  (Historical note, scoped:
    an early-round Mosaic miscompiled clamped/dynamic index maps; the
    current toolchain handles the jnp.maximum/minimum-clamped INPUT
    maps of dia_spmv_pallas's zero-copy path — validated bit-exact on
    chip at several exact-multiple sizes — so the constraint no longer
    applies to input specs on this jax version.)
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nd = pd.shape[0]
    tr = _tile_rows(offsets, n)
    tile = tr * LANES
    npad = -(-n // tile) * tile
    rows = npad // LANES
    ntiles = rows // tr

    pdp = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd)
    pdw = pdp.reshape(nd, rows, LANES)

    shifts = []
    for k in offsets:
        q, r = divmod(k, LANES)
        shifts.append((int(q), int(r)))
    shifts = tuple(shifts)
    T = xw.dtype

    def kernel(xprev_ref, xcur_ref, xnext_ref, pd_ref, y_ref):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
        xwin = jnp.concatenate(
            [xprev_ref[:], xcur_ref[:], xnext_ref[:]], axis=0)
        # Mask the window against the interior bounds so the halo tiles
        # of the layout are don't-care (the output's halo tiles are never
        # written, so chained applications would otherwise read garbage).
        wrow = jax.lax.broadcasted_iota(jnp.int32, (3 * tr, LANES), 0)             + (t - 1) * tr
        xwin = jnp.where((wrow >= 0) & (wrow < rows), xwin, 0)
        acc = jnp.zeros((tr, LANES), jnp.float32 if T in (
            jnp.bfloat16, jnp.float16, jnp.float32) else T)
        for d, (q, r) in enumerate(shifts):
            w = pd_ref[d]
            if r == 0:
                sx = xwin[tr + q: 2 * tr + q]
            else:
                seg = xwin[tr + q: 2 * tr + q + 1]
                if seg.dtype.itemsize < 4:
                    seg = seg.astype(acc.dtype)
                rolled = pltpu.roll(seg, np.int32(LANES - r), 1)
                sx = jnp.where(lane < LANES - r, rolled[:tr], rolled[1:])
            acc = acc + (w.astype(acc.dtype) * sx.astype(acc.dtype))
        y_ref[:] = acc.astype(y_ref.dtype)

    yw = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tr, LANES), lambda t: (t, 0)),
            pl.BlockSpec((tr, LANES), lambda t: (t + 1, 0)),
            pl.BlockSpec((tr, LANES), lambda t: (t + 2, 0)),
            pl.BlockSpec((nd, tr, LANES), lambda t: (0, t, 0)),
        ],
        # interior tiles land at padded positions 1..ntiles; halo tiles
        # are never written and never read unmasked.
        out_specs=pl.BlockSpec((tr, LANES), lambda t: (t + 1, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + 2 * tr, LANES), T),
        interpret=interpret,
    )(xw, xw, xw, pdw)
    return yw
