"""Multi-chip CG: shard the DIA operator and vectors over a device mesh
(docs/tpu.md).  Run with real chips, or simulate on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multichip_sharded.py
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_enable_x64", False)
import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt
from krylov_tpu.ops.dia import poisson_dia
from krylov_tpu.parallel import make_mesh, shard_vector, sharded_dia_operator

N = 16
D = poisson_dia(N, N, N, dtype=np.float32)
mesh = make_mesh()                      # every visible device
op = sharded_dia_operator(D, mesh)      # row-partitioned diagonals
b = shard_vector(jnp.ones(N ** 3, jnp.float32), mesh)
x, stats = kt.cg(op, b, rtol=1e-5)
print(f"{len(mesh.devices.flat)} devices:", stats.status, "niter:", stats.niter)
print("x sharding:", x.sharding)
