"""Solving through the native C ABI from Python (ctypes bridge): the
same libkrylov.so that C and Fortran callers load.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
from krylov_tpu import native

n = 200
A = np.diag(4.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1) \
    + np.diag(-np.ones(n - 1), -1)
b = np.ones(n)

for method in ("cg", "minres_qlp", "gmres"):
    x, info = native.native_solve(method, A, b, atol=1e-10, rtol=1e-10)
    r = np.linalg.norm(b - A @ x)
    print(f"{method:10s} {info['niter']:4d} its  |r| = {r:.2e}  "
          f"[{info['status']}]")

# saddle-point pair through the two-output API
m2, n2 = 30, 20
rng = np.random.default_rng(0)
A2 = rng.standard_normal((m2, n2)) * 0.3
bm = rng.standard_normal(m2)
cn = rng.standard_normal(n2)
x, info = native.native_solve("tricg", A2, bm, c=cn, atol=1e-10, rtol=1e-10)
y = info["y"]
top = bm - (x + A2 @ y)
bot = cn - (A2.T @ x - y)
print(f"tricg      {info['niter']:4d} its  saddle |r| = "
      f"{np.sqrt(np.linalg.norm(top)**2 + np.linalg.norm(bot)**2):.2e}")
