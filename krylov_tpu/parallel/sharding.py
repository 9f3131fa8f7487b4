"""Multi-device distribution (SURVEY.md §2.5).

The reference's distribution contract is duck typing: any vector type
with dot/norm/axpy works in every solver (docs/src/custom_workspaces.md
HaloVector).  The TPU-native equivalent is jax.sharding: place the
operator diagonals and every vector on a device `Mesh` with a row
partition and run the *unchanged* solver — under jit, XLA's SPMD
partitioner turns the k-op reductions into `psum`s over ICI and the DIA
shift operations into `collective-permute` halo exchanges.  Every solver
in the library therefore inherits multi-chip execution from its inputs'
shardings, with zero solver-code changes.

`halo_dia_spmv` additionally provides the explicit `shard_map` +
`ppermute` formulation of the halo exchange for banded operators —
useful when manual overlap control beats the XLA-inserted schedule.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="rows"):
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_vector(x, mesh, axis="rows"):
    """Row-shard a vector over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def shard_dia(dia, mesh, axis="rows"):
    """Shard the diagonals of a DIAMatrix along their length."""
    from ..ops.dia import DIAMatrix
    data = jax.device_put(dia.data, NamedSharding(mesh, P(None, axis)))
    return DIAMatrix(data, dia.offsets, dia.shape)


def sharded_dia_operator(dia, mesh, axis="rows"):
    """DIAOperator with sharded storage: drop-in A for any solver.

    Uses the XLA shift-and-add lowering (not the single-device Pallas
    kernel) so the SPMD partitioner can insert collective-permute halo
    exchanges for the shifts.
    """
    from ..operators import DIAOperator
    return DIAOperator(shard_dia(dia, mesh, axis), use_pallas=False)


def shard_csr_rows(csr, mesh, axis="rows"):
    """Row-partition a CSRMatrix: per-device contiguous row blocks.

    Returns (local_parts, row_starts) where local_parts[i] is the CSR
    block for device i (host-side split; CSR row pointers are
    irregular, so the split happens before device placement).
    """
    import numpy as _np
    indptr = _np.asarray(csr.indptr)
    data = _np.asarray(csr.data)
    indices = _np.asarray(csr.indices)
    m = csr.shape[0]
    nd = mesh.devices.size
    if m % nd:
        raise ValueError(f"rows ({m}) must divide evenly over {nd} devices")
    rows_loc = m // nd
    parts = []
    for d in range(nd):
        lo, hi = d * rows_loc, (d + 1) * rows_loc
        s, e = indptr[lo], indptr[hi]
        parts.append((data[s:e], indices[s:e], indptr[lo:hi + 1] - s))
    return parts, rows_loc


def sharded_csr_matvec(csr, mesh, axis="rows"):
    """Build y = A x for a row-partitioned CSR over the mesh.

    Each device computes its row block with a local segment-sum SpMV.
    Off-block column references are served by a *structural halo*: the
    widest column excursion outside any local row block determines a halo
    width, and only the neighbouring devices' edge values are exchanged
    with `ppermute` (O(halo) traffic over ICI, independent of n).  When
    the sparsity couples rows to columns further than one block away —
    no neighbour exchange can serve it — the matvec falls back to an
    `all_gather` of x (O(n) replicated traffic) and says so in the
    closure's ``halo`` attribute.  Local blocks are padded to a common
    nnz so the shard_map body is shape-uniform.
    """
    parts, rows_loc = shard_csr_rows(csr, mesh, axis)
    nnz_max = max(len(p[0]) for p in parts)
    nd = mesh.devices.size

    # structural halo: furthest column reference outside each row block
    halo = 0
    for d, (_, idx_, _) in enumerate(parts):
        if len(idx_):
            lo, hi = d * rows_loc, (d + 1) * rows_loc
            halo = max(halo, int(max(0, lo - idx_.min())),
                       int(max(0, idx_.max() - (hi - 1))))
    local = halo <= rows_loc and nd > 1
    if nd == 1:
        halo = 0
        local = True

    def pad(p, d):
        data, idx, ptr = p
        k = nnz_max - len(data)
        if local:
            # columns relative to the extended block [lo-halo, hi+halo)
            idx = idx - (d * rows_loc - halo)
        return (np.pad(data, (0, k)),
                np.pad(idx, (0, k)),
                np.concatenate([ptr[:-1], [nnz_max]]))

    padded = [pad(p, d) for d, p in enumerate(parts)]
    data = jnp.asarray(np.stack([p[0] for p in padded]))
    idx = jnp.asarray(np.stack([p[1] for p in padded]))
    ptr = jnp.asarray(np.stack([p[2] for p in padded]))
    sh2 = NamedSharding(mesh, P(axis, None))
    data = jax.device_put(data, sh2)
    idx = jax.device_put(idx, sh2)
    ptr = jax.device_put(ptr, sh2)

    def body(data_blk, idx_blk, ptr_blk, x_blk):
        d, ix, pt = data_blk[0], idx_blk[0], ptr_blk[0]
        if local:
            if halo > 0:
                i = jax.lax.axis_index(axis)
                to_left = [(r, (r - 1) % nd) for r in range(nd)]
                to_right = [(r, (r + 1) % nd) for r in range(nd)]
                from_right = jax.lax.ppermute(x_blk[:halo], axis, to_left)
                from_left = jax.lax.ppermute(x_blk[-halo:], axis, to_right)
                from_right = jnp.where(i == nd - 1, 0, from_right)
                from_left = jnp.where(i == 0, 0, from_left)
                xg = jnp.concatenate([from_left, x_blk, from_right])
            else:
                xg = x_blk
        else:
            xg = jax.lax.all_gather(x_blk, axis).reshape(-1)
        seg = jnp.searchsorted(pt[1:], jnp.arange(d.shape[0]), side="right")
        y = jax.ops.segment_sum(d * xg[ix], seg, num_segments=rows_loc,
                                indices_are_sorted=True)
        return y

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis))

    def matvec(x):
        return fn(data, idx, ptr, x)

    matvec.halo = halo if local else None   # None = all-gather fallback
    return matvec


def halo_dia_spmv(data, offsets, x, mesh, axis="rows"):
    """Explicit shard_map DIA SpMV with ppermute halo exchange.

    Each device holds a contiguous row block.  For band offsets within
    ±halo of the block boundary the neighbouring devices' edge values are
    exchanged with `ppermute` (rides ICI); the local stencil then applies
    without any global gather.  Offsets must satisfy |k| ≤ local block
    size.
    """
    halo = max(abs(k) for k in offsets) if offsets else 0
    n_dev = mesh.devices.size

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis)), out_specs=P(axis),
    )
    def _spmv(data_blk, x_blk):
        nloc = x_blk.shape[0]
        idx = jax.lax.axis_index(axis)
        # prod[d, j] = data[d, j]·x[j] is column-aligned, hence fully
        # local; only its shifted reads cross block boundaries.
        prod = data_blk * x_blk[None, :]
        to_left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        to_right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        # halo received from the right neighbour (their leading columns)
        from_right = jax.lax.ppermute(prod[:, :halo], axis, to_left)
        # halo received from the left neighbour (their trailing columns)
        from_left = jax.lax.ppermute(prod[:, nloc - halo:], axis, to_right)
        # no wrap-around at the global boundary
        from_right = jnp.where(idx == n_dev - 1, 0, from_right)
        from_left = jnp.where(idx == 0, 0, from_left)
        ext = jnp.concatenate([from_left, prod, from_right], axis=1)
        y = jnp.zeros_like(x_blk)
        for d, k in enumerate(offsets):
            y = y + jax.lax.dynamic_slice_in_dim(ext[d], halo + k, nloc)
        return y

    return _spmv(data, x)
