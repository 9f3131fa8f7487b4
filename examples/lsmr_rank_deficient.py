"""LSMR on a rank-deficient least-squares problem (reference
docs/src/examples/lsmr.md): |Aᴴr| decreases monotonically, making LSMR
the safer choice for early termination on ill-posed systems.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")   # undo TPU sitecustomize
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)   # f64 locally; f32 on TPU

import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(7)
m, n, r = 250, 100, 60                 # column-rank-deficient (rank 60)
A = jnp.asarray((rng.standard_normal((m, r)) @
                 rng.standard_normal((r, n))) / np.sqrt(m))
b = jnp.asarray(rng.standard_normal(m))

F64 = jax.config.jax_enable_x64
x, stats = kt.lsmr(A, b, atol=0.0, rtol=0.0,
                   axtol=1e-10 if F64 else 1e-5, history=True)
res = np.asarray(b - A @ x)
arn = float(np.linalg.norm(np.asarray(A).T @ res))
x_pinv = np.linalg.pinv(np.asarray(A)) @ np.asarray(b)
print(f"lsmr: {stats.niter} its, |Aᴴr| = {arn:.2e}, "
      f"|x - x_pinv| = {float(np.linalg.norm(np.asarray(x) - x_pinv)):.2e}")
print(f"status: {stats.status}")
ar_hist = np.asarray(stats.Aresiduals[: stats.niter + 1])
arn0 = float(jnp.linalg.norm(A.conj().T @ b))
assert np.all(np.diff(ar_hist) <= (1e-8 if F64 else 1e-4))  # monotone
assert arn < (1e-6 if F64 else 1e-2) * max(arn0, 1.0)   # relative to |Ab|
