"""Block GMRES / block MINRES with multiple right-hand sides, including
a BELL (block-ELL) operator whose block-SpMM runs on the MXU
(reference docs/src/examples usage of block_gmres).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt

def resid(A, X, B):
    # measure at true f32: TPU matmuls default to bf16 passes, which
    # floors a naive `B - A @ X` check at ~1e-3
    AX = jnp.matmul(A, X, precision=jax.lax.Precision.HIGHEST)
    return float(jnp.linalg.norm(B - AX) / jnp.linalg.norm(B))

rng = np.random.default_rng(0)
n, p = 200, 4

# SPD dense system, 4 right-hand sides
M = rng.standard_normal((n, n))
A = jnp.asarray(M @ M.T / n + 4 * np.eye(n))   # well conditioned
B = jnp.asarray(rng.standard_normal((n, p)))

X, stats = kt.block_minres(A, B, atol=0.0, rtol=1e-6)
print("block_minres:", stats.status, "in", stats.niter, "iterations")
print("relative residual:", resid(A, X, B))

X, stats = kt.block_gmres(A, B, memory=16, restart=True, atol=0.0,
                          rtol=1e-6)
print("block_gmres :", stats.status, "in", stats.niter, "iterations")
print("relative residual:", resid(A, X, B))
