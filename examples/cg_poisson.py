"""CG on the 3-D Poisson stencil (reference docs/src/examples/cg.md).

The operator is stored in DIA form; on TPU backends the matvec runs the
single-pass Pallas stencil kernel.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt
from krylov_tpu.ops.dia import poisson_dia

N = 32
D = poisson_dia(N, N, N, dtype=np.float32)
b = jnp.ones(N ** 3, jnp.float32)
x, stats = kt.cg(kt.DIAOperator(D), b, rtol=1e-6)
print(stats.status, "in", stats.niter, "iterations")
print("relative residual:", float(jnp.linalg.norm(D @ x - b) / jnp.linalg.norm(b)))
