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


def make_mesh(n_devices=None, axis="rows", devices=None):
    """1-D device mesh over the first n_devices (default: all).

    When the default backend has fewer than ``n_devices`` devices, falls
    back to the host CPU devices (``--xla_force_host_platform_device_count``
    meshes) so an n-way mesh request never silently degrades to a
    smaller mesh: under the axon sitecustomize ``jax.devices()`` is the
    single remote TPU chip even with JAX_PLATFORMS=cpu in the
    environment, and ``devs[:8]`` of a 1-element list built a 1-device
    mesh that made every multi-chip consistency check vacuous.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices and devices is None:
            try:
                devs = jax.devices("cpu")
            except RuntimeError:
                pass
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devs)} available (default backend + cpu)")
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
    """Build y = A x for a row-partitioned CSR over the mesh — no
    replication, ever.

    Each device computes its row block with a local segment-sum SpMV over
    x values it owns; remote column references are served by a STATIC
    communication plan built host-side from the sparsity pattern (the
    classic distributed-SpMV design, expressed TPU-natively):

    * for every (src → dst) device pair, the set of x entries src must
      ship to dst is precomputed; pairs with the same ring distance r
      share one `ppermute` round, padded to the round's max count, and
      rounds nobody needs are dropped at trace time,
    * every nonzero's column index is remapped host-side to a position in
      ``[x_block ‖ recv_round₁ ‖ recv_round₂ …]``, so the device does one
      gather + segment-sum with zero dynamic bookkeeping,
    * nonzeros are split into a LOCAL set (columns owned by the device)
      and a REMOTE set: the local segment-sum has no data dependence on
      the `ppermute`s, so XLA can overlap the halo exchange with the bulk
      of the SpMV (SURVEY.md §7.2 "Halo-overlap SpMV").

    Traffic is O(boundary couplings) over ICI — independent of n for
    banded/stencil systems, and proportional to the actual cut for
    general sparsity (the round-2 `all_gather` fallback is gone).

    The closure exposes ``halo`` (max ring distance used; 0 = fully
    local) and ``plan_counts`` (per-round exchange widths).
    """
    parts, rows_loc = shard_csr_rows(csr, mesh, axis)
    nd = mesh.devices.size
    dtype = np.asarray(parts[0][0]).dtype

    # ---- host-side communication plan ------------------------------------
    # needed[dst][src] = sorted global columns dst reads from src's block
    needed = [[np.zeros(0, np.int64)] * nd for _ in range(nd)]
    local_nnz, remote_nnz = [], []          # per device: (data, pos, seg)
    for d, (data_, idx_, ptr_) in enumerate(parts):
        lo, hi = d * rows_loc, (d + 1) * rows_loc
        cols = np.asarray(idx_, np.int64)
        owner = cols // rows_loc
        is_loc = owner == d
        seg = np.searchsorted(np.asarray(ptr_)[1:], np.arange(len(cols)),
                              side="right")
        local_nnz.append((np.asarray(data_)[is_loc], cols[is_loc] - lo,
                          seg[is_loc]))
        rem_cols = cols[~is_loc]
        for s in np.unique(rem_cols // rows_loc):
            needed[d][int(s)] = np.unique(rem_cols[rem_cols // rows_loc == s])
        remote_nnz.append((np.asarray(data_)[~is_loc], rem_cols, seg[~is_loc]))

    # rounds: ring distance r ∈ 1..nd-1, padded to the round's max count
    cnt = [0] * nd
    for r in range(1, nd):
        cnt[r] = max((len(needed[(s + r) % nd][s]) for s in range(nd)),
                     default=0)
    rounds = [r for r in range(1, nd) if cnt[r] > 0]

    # per-device send gathers and the remote-column remap
    base = {}
    off = rows_loc
    for r in rounds:
        base[r] = off
        off += cnt[r]
    send_idx = {r: np.zeros((nd, cnt[r]), np.int32) for r in rounds}
    for r in rounds:
        for s in range(nd):
            dstd = (s + r) % nd
            want = needed[dstd][s]
            send_idx[r][s, :len(want)] = want - s * rows_loc
    rem_arrays = []
    for d in range(nd):
        data_, cols, seg = remote_nnz[d]
        pos = np.zeros(len(cols), np.int64)
        for j, c in enumerate(cols):
            s = int(c // rows_loc)
            r = (d - s) % nd
            pos[j] = base[r] + int(np.searchsorted(needed[d][s], c))
        rem_arrays.append((data_, pos, seg))

    def _stack(triples):
        nmax = max((len(t[0]) for t in triples), default=0)
        nmax = max(nmax, 1)
        D = np.zeros((nd, nmax), dtype)
        Pp = np.zeros((nd, nmax), np.int32)
        Sg = np.zeros((nd, nmax), np.int32)
        for d, (dat, pos, seg) in enumerate(triples):
            D[d, :len(dat)] = dat
            Pp[d, :len(dat)] = pos
            Sg[d, :len(dat)] = seg
        return D, Pp, Sg

    sh2 = NamedSharding(mesh, P(axis, None))

    def put(a):
        return jax.device_put(jnp.asarray(a), sh2)

    lD, lP, lS = (put(a) for a in _stack(local_nnz))
    rD, rP, rS = (put(a) for a in _stack(rem_arrays))
    sidx = {r: put(send_idx[r]) for r in rounds}

    def body(lD, lP, lS, rD, rP, rS, x_blk, *sidx_blks):
        # start the exchange first: the local segment-sum below has no
        # dependence on it, so the collective can run concurrently
        recvs = []
        for r, sb in zip(rounds, sidx_blks):
            buf = x_blk[sb[0]]
            perm = [(s, (s + r) % nd) for s in range(nd)]
            recvs.append(jax.lax.ppermute(buf, axis, perm))
        y = jax.ops.segment_sum(lD[0] * x_blk[lP[0]], lS[0],
                                num_segments=rows_loc)
        if recvs:
            ext = jnp.concatenate([x_blk] + recvs)
            y = y + jax.ops.segment_sum(rD[0] * ext[rP[0]], rS[0],
                                        num_segments=rows_loc)
        return y

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None),) * 6 + (P(axis),)
        + (P(axis, None),) * len(rounds),
        out_specs=P(axis))

    def matvec(x):
        return fn(lD, lP, lS, rD, rP, rS, x, *(sidx[r] for r in rounds))

    matvec.halo = max(rounds) if rounds else 0
    matvec.plan_counts = {r: cnt[r] for r in rounds}
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
        # issue the halo exchange up front ...
        from_right = jax.lax.ppermute(prod[:, :halo], axis, to_left)
        from_left = jax.lax.ppermute(prod[:, nloc - halo:], axis, to_right)
        # no wrap-around at the global boundary
        from_right = jnp.where(idx == n_dev - 1, 0, from_right)
        from_left = jnp.where(idx == 0, 0, from_left)
        # ... then apply the stencil on the LOCAL product only (zero-padded
        # at the block edges): no data dependence on the ppermutes, so XLA
        # overlaps the collective with this bulk compute
        y = jnp.zeros_like(x_blk)
        for d, k in enumerate(offsets):
            if k == 0:
                y = y + prod[d]
            elif k > 0:
                y = y + jnp.pad(prod[d, k:], (0, k))
            else:
                y = y + jnp.pad(prod[d, :nloc + k], (-k, 0))
        # finally fold the received halo contributions into the edge rows
        for d, k in enumerate(offsets):
            if k > 0:
                y = y.at[nloc - k:].add(from_right[d, :k])
            elif k < 0:
                y = y.at[:-k].add(from_left[d, halo + k:])
        return y

    return _spmv(data, x)
