"""Restarted GMRES with a Jacobi preconditioner on a convection-diffusion
operator (reference docs/src/examples/dqgmres.md uses the same pattern).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(0)
n = 400
A = 4.0 * np.eye(n) + np.diag(-1.3 * np.ones(n - 1), 1) \
    + np.diag(-0.7 * np.ones(n - 1), -1)
b = rng.standard_normal(n)
M = kt.DiagonalOperator(jnp.asarray(np.diag(A)))     # Jacobi
rtol = 1e-8 if jax.config.jax_enable_x64 else 1e-5
x, stats = kt.gmres(jnp.asarray(A), jnp.asarray(b), M=M, ldiv=True,
                    memory=20, restart=True, rtol=rtol)
print(stats.status, "niter:", stats.niter)
print("residual:", float(np.linalg.norm(A @ np.asarray(x) - b)))
