"""Minimum-norm solutions of consistent underdetermined systems with
CGNE and CRMR (reference docs/src/examples/cgne.md, crmr.md).  Both work
on A Aᴴ implicitly; the iterates stay in range(Aᴴ), so the converged
solution is the minimum-2-norm one.
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

rng = np.random.default_rng(1)
m, n = 80, 400                        # wide
A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n))
b = A @ jnp.asarray(rng.standard_normal(n))
bnorm = float(jnp.linalg.norm(b))

x_min = np.asarray(A).T @ np.linalg.solve(
    np.asarray(A) @ np.asarray(A).T, np.asarray(b))

# f64 locally, f32 on TPU — scale tolerances to the working dtype
F64 = A.dtype == jnp.float64
RTOL = 1e-10 if F64 else 1e-6
XTOL = 1e-6 if F64 else 5e-4

for name, solve in (("cgne", kt.cgne), ("crmr", kt.crmr)):
    x, stats = solve(A, b, atol=0.0, rtol=RTOL)
    rel = float(jnp.linalg.norm(b - A @ x)) / bnorm
    err = float(np.linalg.norm(np.asarray(x) - x_min))
    print(f"{name}: {stats.niter} its, |Ax-b|/|b| = {rel:.2e}, "
          f"|x - x_min| = {err:.2e}")
    assert stats.solved and err < XTOL
