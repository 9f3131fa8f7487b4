"""Matrix-free operators (reference docs/src/matrix_free.md): solve with
a function instead of a stored matrix.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt

n = 256
dt = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
d = jnp.asarray(np.linspace(1.0, 10.0, n), dt)

def matvec(v):
    # tridiagonal apply without building the matrix
    return d * v - 0.3 * jnp.pad(v[1:], (0, 1)) - 0.3 * jnp.pad(v[:-1], (1, 0))

op = kt.FunctionOperator(matvec, (n, n), dt, rmatvec=matvec)
b = jnp.ones(n, dt)
x, stats = kt.minres(op, b, rtol=1e-6)
print(stats.status, "residual:", float(jnp.linalg.norm(matvec(x) - b)))
