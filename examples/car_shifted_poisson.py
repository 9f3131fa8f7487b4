"""SPD family beyond CG: CAR on a Poisson system, and CG-LANCZOS-SHIFT
solving the whole family (A + σI) x = b in ONE Lanczos pass (reference
docs/src/examples/car.md and cg_lanczos_shift.md).
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
from krylov_tpu.ops.dia import poisson_dia

T = np.float64 if jax.default_backend() == "cpu" else np.float32
rtol = 1e-8 if T == np.float64 else 1e-5
D = poisson_dia(12, 12, 12, dtype=T)
A = kt.DIAOperator(D)
n = D.shape[0]
b = jnp.ones(n, T)
bnorm = float(jnp.linalg.norm(b))

x, stats = kt.car(A, b, atol=0.0, rtol=rtol)
rel = float(jnp.linalg.norm(b - A.matvec(x))) / bnorm
print(f"car: {stats.niter} its, |Ax-b|/|b| = {rel:.2e}")
assert stats.solved and rel < 100 * rtol

shifts = jnp.asarray([0.0, 0.5, 2.0], T)
X, stats = kt.cg_lanczos_shift(A, b, shifts, atol=0.0, rtol=rtol)
for j, s in enumerate(np.asarray(shifts)):
    r = b - A.matvec(X[j]) - s * X[j]
    rel = float(jnp.linalg.norm(r)) / bnorm
    print(f"cg_lanczos_shift σ={s:3.1f}: |r|/|b| = {rel:.2e}")
    assert rel < 100 * rtol
print(f"one Lanczos pass, {stats.niter} iterations for all "
      f"{len(np.asarray(shifts))} shifts")
