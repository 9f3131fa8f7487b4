"""Transpose-free unsymmetric solvers on a convection-diffusion problem:
BiCGSTAB, CGS, and DQGMRES (reference docs/src/examples/bicgstab.md and
dqgmres.md).  All three avoid Aᴴ products; DQGMRES keeps a fixed-memory
quasi-minimal-residual window instead of restarting.
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
from krylov_tpu.ops.dia import convdiff_dia

T = np.float64 if jax.default_backend() == "cpu" else np.float32
rtol = 1e-8 if T == np.float64 else 1e-5
D = convdiff_dia(16, 16, 16, pe=0.4, dtype=T)    # unsymmetric 3-D stencil
A = kt.DIAOperator(D)
n = D.shape[0]
b = jnp.ones(n, T)
bnorm = float(jnp.linalg.norm(b))

# Jacobi (diagonal) left preconditioner
M = kt.DiagonalOperator(1.0 / D.data[len(D.offsets) // 2])

for name, solve, kwargs in (
    ("bicgstab", kt.bicgstab, {}),
    ("cgs", kt.cgs, {}),
    ("dqgmres", kt.dqgmres, {"memory": 20}),
):
    x, stats = solve(A, b, M=M, atol=0.0, rtol=rtol, **kwargs)
    rel = float(jnp.linalg.norm(b - A.matvec(x))) / bnorm
    print(f"{name:9s} {stats.niter:4d} its  |Ax-b|/|b| = {rel:.2e}  "
          f"[{stats.status}]")
    assert stats.solved and rel < 100 * rtol
