"""2-D Poisson with an if-less halo stencil (docs/custom_workspaces.md §1).

TPU-native counterpart of the reference's HaloVector tutorial
(reference docs/src/custom_workspaces.md): the ghost frame is the
border of an (N+2, N+2) array and the 5-point stencil is four shifted
slices — one fused XLA kernel, no boundary branches, no custom vector
type.  Verifies against the manufactured solution sin(πx)sin(πy).

    python examples/halo_poisson_2d.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import krylov_tpu as kt

N = 200
h = 1.0 / (N + 1)
dtype = jnp.float32


def laplacian(u):
    """-∇² on the interior of a halo-framed field (if-less stencil)."""
    c = u[1:-1, 1:-1]
    return ((4.0 * c - u[:-2, 1:-1] - u[2:, 1:-1]
             - u[1:-1, :-2] - u[1:-1, 2:]) / h ** 2)


def matvec(x):
    u = jnp.zeros((N + 2, N + 2), x.dtype).at[1:-1, 1:-1].set(
        x.reshape(N, N))
    return laplacian(u).reshape(-1)


A = kt.FunctionOperator(matvec, shape=(N * N, N * N), dtype=dtype,
                        rmatvec=matvec)

xs = np.arange(1, N + 1) * h
f = (2 * np.pi ** 2 * np.sin(np.pi * xs)[:, None]
     * np.sin(np.pi * xs)[None, :])
b = jnp.asarray(f.reshape(-1), dtype)

with jax.default_matmul_precision("highest"):
    x, stats = kt.cg(A, b, atol=1e-7, rtol=0.0)

u_star = np.outer(np.sin(np.pi * xs), np.sin(np.pi * xs))
err = float(np.max(np.abs(np.asarray(x, np.float64).reshape(N, N) - u_star)))
print(f"halo stencil : {stats.status}  niter={stats.niter}  "
      f"max|u-u*|={err:.2e} (O(h^2)={h**2:.1e})")
assert stats.solved and err < 20 * h ** 2

# The same problem through the DIA fast path: the 5-point stencil is a
# 5-diagonal matrix (row-major grid → offsets 0, ±1, ±N); on TPU CG
# dispatches to the fused whole-solve Pallas kernel (ops/pallas_fused.py).
from krylov_tpu.ops.dia import DIAMatrix

n = N * N
idx = np.arange(n)
data = np.zeros((5, n), np.float32)
offs = (-N, -1, 0, 1, N)
data[2] = 4.0
data[3][idx % N != 0] = -1.0          # A[i, i+1] stored at column i+1
data[1][idx % N != N - 1] = -1.0      # A[i, i-1] stored at column i-1
data[4][idx // N != 0] = -1.0
data[0][idx // N != N - 1] = -1.0
op = kt.DIAOperator(DIAMatrix(jnp.asarray(data), offs, (n, n)))
xd, stats_d = kt.cg(op, b * h ** 2, atol=1e-7 * h ** 2, rtol=0.0)
err_d = float(np.max(np.abs(
    np.asarray(xd, np.float64).reshape(N, N) - u_star)))
print(f"DIA fast path: {stats_d.status}  niter={stats_d.niter}  "
      f"max|u-u*|={err_d:.2e}")
assert stats_d.solved and err_d < 20 * h ** 2
