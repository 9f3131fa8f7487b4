"""TriCG on a symmetric quasi-definite system [I A; Aᴴ -I]
(reference docs/src/examples/tricg.md).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
import krylov_tpu as kt

rng = np.random.default_rng(2)
m, n = 60, 40
A = rng.standard_normal((m, n))
b = rng.standard_normal(m)
c = rng.standard_normal(n)
x, y, stats = kt.tricg(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                       flip=True)
K = np.block([[-np.eye(m), A], [A.T, np.eye(n)]])
r = np.concatenate([b, c]) - K @ np.concatenate([np.asarray(x), np.asarray(y)])
print(stats.status, "residual:", float(np.linalg.norm(r)))
