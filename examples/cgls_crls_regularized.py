"""Regularized least squares min |Ax-b|² + λ|x|² with CGLS and CRLS, and
the whole λ-family at once with CGLS-LANCZOS-SHIFT (reference
docs/src/examples/cgls.md, crls.md, cgls_lanczos_shift.md).
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

rng = np.random.default_rng(3)
m, n = 300, 120
A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(m))
b = jnp.asarray(rng.standard_normal(m))
lam = 0.1
# f64 locally, f32 on TPU — scale tolerances to the working dtype
F64 = A.dtype == jnp.float64
RTOL = 1e-10 if F64 else 1e-6
XTOL = 1e-6 if F64 else 5e-4

An, bn = np.asarray(A), np.asarray(b)
x_ref = np.linalg.solve(An.T @ An + lam * np.eye(n), An.T @ bn)

for name, solve in (("cgls", kt.cgls), ("crls", kt.crls)):
    x, stats = solve(A, b, lam=lam, atol=0.0, rtol=RTOL)
    err = float(np.linalg.norm(np.asarray(x) - x_ref))
    print(f"{name}: {stats.niter} its, |x - x*| = {err:.2e}")
    assert stats.solved and err < XTOL

# every regularization parameter from ONE Golub-Kahan/Lanczos stream
lams = jnp.asarray([0.01, 0.1, 1.0])
X, stats = kt.cgls_lanczos_shift(A, b, lams, atol=0.0, rtol=RTOL)
for j, l in enumerate(np.asarray(lams)):
    xj = np.linalg.solve(An.T @ An + l * np.eye(n), An.T @ bn)
    err = float(np.linalg.norm(np.asarray(X[j]) - xj))
    print(f"cgls_lanczos_shift λ={l:4.2f}: |x - x*| = {err:.2e}")
    assert err < XTOL
