"""Partitioned systems: TriMR on an SQD saddle-point system and USYMLQR
on a rectangular saddle point (reference docs/src/examples/trimr.md,
usymlqr.md).  Both iterate on the 2x2 block system without forming it.
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

rng = np.random.default_rng(5)
m, n = 120, 80
F64 = jax.config.jax_enable_x64
A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(m))
b = jnp.asarray(rng.standard_normal(m))
c = jnp.asarray(rng.standard_normal(n))

# --- TriMR: [ I  A ; Aᴴ -I ] (x, y) = (b, c)  (SQD with τ=1, ν=-1)
x, y, stats = kt.trimr(A, b, c, tau=1.0, nu=-1.0, atol=0.0,
                       rtol=1e-10 if F64 else 1e-6)
r1 = float(jnp.linalg.norm(b - (x + A @ y)))
r2 = float(jnp.linalg.norm(c - (A.conj().T @ x - y)))
print(f"trimr: {stats.niter} its, block residuals = {r1:.2e}, {r2:.2e}")
assert stats.solved and max(r1, r2) < (1e-7 if F64 else 1e-4)

# --- USYMLQR: [ I A ; Aᴴ 0 ] (x, y) = (b, c) via the Saunders-Simon-Yip
# tridiagonalization (LSQR-like x update + LNLQ-like y update);
# the reference example's 5x5 matrix (docs/src/examples/usymlqr.md)
if not F64:
    # the reference's 5x5 usymlqr fixture has entries spanning ~1e2 with
    # poor conditioning: f32 residuals floor near 1e-2 relative -- run
    # this section in f64 (locally) only
    print("usymlqr 5x5 fixture skipped at f32 (f64-grade conditioning)")
    sys.exit(0)
n5 = 5
A5 = jnp.asarray([[2.0 ** (i / j) * j + (-1.0) ** (i - j) * n5 * (i - 1)
                   for j in range(1, n5 + 1)] for i in range(1, n5 + 1)])
b5 = jnp.ones(n5, A5.dtype)
c5 = -3.0 * b5
x, y, stats = kt.usymlqr(A5, b5, c5, atol=0.0,
                         rtol=1e-12 if F64 else 1e-6)
r1 = float(jnp.linalg.norm(b5 - (x + A5 @ y)))
r2 = float(jnp.linalg.norm(c5 - A5.conj().T @ x))
print(f"usymlqr: {stats.niter} its, block residuals = {r1:.2e}, {r2:.2e}")
assert stats.solved and max(r1, r2) < (1e-6 if F64 else 1e-2)
