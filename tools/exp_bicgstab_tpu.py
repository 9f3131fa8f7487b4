"""One-shot real-TPU validation of the fused BiCGSTAB kernel.

Compares the fused whole-solve kernel against the general while_loop core
on a 48^3 convection-diffusion stencil (f32), checking niter/status parity
and the true residual; then times the fused kernel with S-in-one-jit
median differencing (CLAUDE.md round-2 lesson).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import krylov_tpu as kt
from krylov_tpu.operators import DIAOperator
from krylov_tpu.ops.dia import convdiff_dia

N = 48
D = convdiff_dia(N, N, N, dtype=np.float32)
n = D.shape[0]
b = jnp.asarray(np.random.default_rng(3).standard_normal(n), jnp.float32)

op_fast = DIAOperator(D, use_pallas=True)
op_ref = DIAOperator(D, use_pallas=False)

t0 = time.time()
x, stats = kt.bicgstab(op_fast, b, atol=0.0, rtol=1e-6)
print("fused:", stats.niter, repr(stats.status), f"wall={time.time()-t0:.1f}s",
      flush=True)

t0 = time.time()
xr, stats_ref = kt.bicgstab(op_ref, b, atol=0.0, rtol=1e-6)
print("general:", stats_ref.niter, repr(stats_ref.status),
      f"wall={time.time()-t0:.1f}s", flush=True)

# true residual at HIGHEST precision
r = b - op_ref.matvec(x)
relres = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
diff = float(jnp.max(jnp.abs(x - xr)) / (jnp.max(jnp.abs(xr)) + 1))
print(f"relres={relres:.3e} maxdiff={diff:.3e}", flush=True)
assert relres <= 2e-6, relres

# --- device timing: S solves inside one jit, median differencing ---
from krylov_tpu.ops.pallas_fused import bicgstab_dia_fused

pd = op_fast._pd
offsets = D.offsets


def many(S):
    @jax.jit
    def run(b):
        def body(i, acc):
            x, niter, rn, st = bicgstab_dia_fused(
                pd, offsets, b + 0.0 * acc[0], 0.0, 1e-6, 10 * n)
            return (x, acc[1] + niter)
        x, tot = jax.lax.fori_loop(0, S, body, (b, jnp.int32(0)))
        return jnp.sum(x) + tot
    return run


def med_time(fn, reps=5):
    float(fn(b))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(b))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


f1, f64 = many(1), many(64)
t1, t64 = med_time(f1), med_time(f64)
per_solve = (t64 - t1) / 63
niter = stats.niter
print(f"t1={t1*1e3:.2f}ms t64={t64*1e3:.2f}ms "
      f"per_solve={per_solve*1e3:.3f}ms per_iter={per_solve/max(niter,1)*1e6:.2f}us "
      f"niter={niter}", flush=True)
print("OK", flush=True)
