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
    """DIAOperator with sharded storage: drop-in A for any solver."""
    from ..operators import DIAOperator
    return DIAOperator(shard_dia(dia, mesh, axis))


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
