"""Symmetric indefinite / singular systems: SYMMLQ with error bounds,
MINRES-QLP's minimum-norm solution of an inconsistent singular system,
and MINARES (reference docs/src/examples/symmlq.md, minres_qlp.md,
minares.md).
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

rng = np.random.default_rng(0)
n = 200
F64 = jax.config.jax_enable_x64
RTOL = 1e-10 if F64 else 1e-6

# --- SYMMLQ on an indefinite (but nonsingular) symmetric system,
# with the λ-est error upper bounds
Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
eigs = np.r_[np.linspace(1.0, 10.0, n - 20), -np.linspace(1.0, 4.0, 20)]
A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
xstar = jnp.asarray(rng.standard_normal(n))
b = A @ xstar
x, stats = kt.symmlq(A, b, lambda_est=0.9, history=True,
                     atol=0.0, rtol=RTOL)
err = float(jnp.linalg.norm(x - xstar))
print(f"symmlq: {stats.niter} its, |x-x*| = {err:.2e}, "
      f"final err bound = {float(stats.errors[stats.niter]):.2e}")
assert stats.solved

# --- MINRES-QLP: singular + inconsistent -> minimum-norm least-squares
# solution (reference docs/src/examples/minres_qlp.md fixture)
B = jnp.asarray(np.diag([1.0, 2.0, 3.0, 0.0]))
c = jnp.asarray([1.0, 2.0, 3.0, 4.0])
x, stats = kt.minres_qlp(B, c)
rnorm = float(jnp.linalg.norm(c - B @ x))
print(f"minres_qlp: x = {np.asarray(x)}, |r| = {rnorm:.2e}  "
      f"[{stats.status}]")
assert stats.inconsistent
assert np.allclose(np.asarray(x), [1.0, 1.0, 1.0, 0.0],
                   atol=1e-6 if F64 else 1e-4)

# --- MINARES minimizes |A rₖ| directly (best for that singular metric)
x, stats = kt.minares(B, c)
arnorm = float(jnp.linalg.norm(B @ (c - B @ x)))
print(f"minares: {stats.niter} its, |A r| = {arnorm:.2e}")
assert arnorm < (1e-6 if F64 else 1e-4)
