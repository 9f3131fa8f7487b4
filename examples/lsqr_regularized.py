"""Regularized least squares with LSQR (reference docs/src/examples/lsqr.md):
min ‖b − Ax‖² + λ²‖x‖².
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(1)
m, n = 500, 200
A = rng.standard_normal((m, n))
b = rng.standard_normal(m)
lam = 1e-2
x, stats = kt.lsqr(jnp.asarray(A), jnp.asarray(b), lam=lam)
xn = np.asarray(x)
grad = A.T @ (A @ xn - b) + lam ** 2 * xn
print(stats.status)
print("optimality ‖Aᵀr − λ²x‖:", float(np.linalg.norm(grad)))
