"""Saddle-point system with block operators (docs/custom_workspaces.md §2).

TPU-native counterpart of the reference's BlockArrays tutorial
(reference docs/src/custom_workspaces.md): the 2x2 block structure is
plain slicing inside FunctionOperators, and the "ideal preconditioner"
P = blkdiag(K, B K⁻¹ Bᵀ) gives P⁻¹A three distinct eigenvalues, so
MINRES converges in at most 3 iterations (Murphy, Golub & Wathen 2000).

    python examples/saddle_point_blocks.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")   # undo TPU sitecustomize
# this example builds FunctionOperators in f64: it is CPU-only (TPU has
# no native f64; run the halo_poisson / tricg examples there instead)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(0)
nK, nB = 10, 2
n = nK + nB

K0 = rng.standard_normal((nK, nK))
K = jnp.asarray(K0 @ K0.T + np.eye(nK))
B = jnp.asarray(rng.standard_normal((nB, nK)))
c = jnp.asarray(rng.standard_normal(nK))
d = jnp.asarray(rng.standard_normal(nB))
b = jnp.concatenate([c, d])


def A_mv(x):
    y, z = x[:nK], x[nK:]
    return jnp.concatenate([K @ y + B.T @ z, B @ y])


A = kt.FunctionOperator(A_mv, shape=(n, n), dtype=jnp.float64,
                        rmatvec=A_mv)

# Ideal preconditioner: P⁻¹ = blkdiag(K⁻¹, (B K⁻¹ Bᵀ)⁻¹).
# The blocks are tiny; invert host-side (TPU XLA has no f64 LU).
BD1 = jnp.asarray(np.linalg.inv(np.asarray(K)))
BD2 = jnp.asarray(np.linalg.inv(np.asarray(B @ BD1 @ B.T)))


def P_mv(x):
    return jnp.concatenate([BD1 @ x[:nK], BD2 @ x[nK:]])


M = kt.FunctionOperator(P_mv, shape=(n, n), dtype=jnp.float64,
                        rmatvec=P_mv)

with jax.default_matmul_precision("highest"):
    x, stats = kt.minres(A, b, M=M, atol=1e-12, rtol=1e-12)
res = float(jnp.linalg.norm(A_mv(x) - b) / jnp.linalg.norm(b))
print(f"ideal P  : {stats.status}  niter={stats.niter}  rel.res={res:.2e}")
assert stats.niter <= 3, stats.niter

# Cheap variant: replace K⁻¹ by diag(K)⁻¹ (still SPD, more iterations).
BD1c = jnp.diag(1.0 / jnp.diag(K))
BD2c = jnp.asarray(np.linalg.inv(np.asarray(B @ BD1c @ B.T)))


def Pc_mv(x):
    return jnp.concatenate([BD1c @ x[:nK], BD2c @ x[nK:]])


Mc = kt.FunctionOperator(Pc_mv, shape=(n, n), dtype=jnp.float64,
                         rmatvec=Pc_mv)
with jax.default_matmul_precision("highest"):
    xc, stats_c = kt.minres(A, b, M=Mc, atol=1e-12, rtol=1e-12)
res_c = float(jnp.linalg.norm(A_mv(xc) - b) / jnp.linalg.norm(b))
print(f"diag(K) P: {stats_c.status}  niter={stats_c.niter}  "
      f"rel.res={res_c:.2e}")
assert stats_c.solved and res_c < 1e-8
