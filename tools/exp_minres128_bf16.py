"""Real-TPU: fused MINRES at 128^3 (2M unknowns) with a bf16 stencil.

The f32 stencil working set (117 MB) exceeds the VMEM gate; bf16
diagonals (exact for the Poisson stencil values) bring it to 87 MB.
Validates the solve end-to-end through the public minres() routing and
times it with S-in-one-jit median differencing.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import krylov_tpu as kt
from krylov_tpu.operators import DIAOperator
from krylov_tpu.ops.dia import DIAMatrix, poisson_dia

N = 128
D = poisson_dia(N, N, N, dtype=np.float32)
Dbf = DIAMatrix(D.data.astype(jnp.bfloat16), D.offsets, D.shape)
n = D.shape[0]
b = jnp.ones(n, jnp.float32)

op = DIAOperator(Dbf, use_pallas=True)
t0 = time.time()
x, stats = kt.minres(op, b, atol=0.0, rtol=1e-6)
print("minres bf16-stencil 128^3:", stats.niter, repr(stats.status),
      f"wall={time.time()-t0:.1f}s", flush=True)

op32 = DIAOperator(D, use_pallas=True)   # f32 matvec for the residual
r = b - op32.matvec(x)
relres = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
print(f"true relres (f32 stencil) = {relres:.3e}", flush=True)
assert relres <= 5e-6, relres

from krylov_tpu.ops.pallas_fused import minres_dia_fused
pd = op._pd
eps = float(np.sqrt(np.finfo(np.float32).eps))


def many(S):
    @jax.jit
    def run(pd, b):
        def body(i, acc):
            x, it, rn, st, inc, viol = minres_dia_fused(
                pd, D.offsets, b + 0.0 * acc[0], 0.0, 1e-6, eps, 1e-8,
                0.0, 2 * n)
            return (x, acc[1] + it)
        x, tot = jax.lax.fori_loop(0, S, body, (b, jnp.int32(0)))
        return jnp.sum(x) + tot
    return run


def med(fn, *a, reps=5):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


t1, t8 = med(many(1), pd, b), med(many(8), pd, b)
per_solve = (t8 - t1) / 7
print(f"t1={t1*1e3:.1f}ms t8={t8*1e3:.1f}ms per_solve={per_solve*1e3:.2f}ms "
      f"per_iter={per_solve/max(stats.niter,1)*1e6:.2f}us niter={stats.niter}",
      flush=True)
print("OK", flush=True)
