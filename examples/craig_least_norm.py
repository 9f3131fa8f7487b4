"""Minimum-norm solution of an underdetermined system with CRAIG and
LNLQ (reference docs/src/examples/craig.md): returns the pair (x, y)
with x = Aᴴy.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(0)
m, n = 20, 60                     # wide: infinitely many solutions
A = jnp.asarray(rng.standard_normal((m, n)))
b = A @ jnp.asarray(rng.standard_normal(n))

bnorm = float(jnp.linalg.norm(b))
for method in (kt.craig, kt.craigmr, kt.lnlq):
    x, y, stats = method(A, b, atol=0.0, rtol=1e-6)
    rel = float(jnp.linalg.norm(A @ x - b)) / bnorm
    print(f"{method.__name__:8s} |Ax-b|/|b| = {rel:.2e}  "
          f"|x - A'y| = {float(jnp.linalg.norm(x - A.conj().T @ y)):.2e}  "
          f"({stats.niter} its)")
