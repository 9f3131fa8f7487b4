#!/usr/bin/env python
"""Where does CG's 63 ms go?  Breaks the round-1 bench measurement into
tunnel RTT, jit dispatch, while_loop time, and epilogue fetches."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from krylov_tpu.ops.dia import poisson_dia
from krylov_tpu.operators import DIAOperator
from krylov_tpu import cg

dev = jax.devices()[0]
print("device:", dev)
dtype = np.float32
N = 64
n = N ** 3
D = poisson_dia(N, N, N, dtype=dtype)
op = DIAOperator(D)
b = jnp.ones(n, dtype=dtype)

# 1. bare roundtrip: tiny jitted computation + scalar fetch
@jax.jit
def noop(x):
    return x + 1.0

s = jnp.float32(0.0)
float(noop(s))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    float(noop(s))
    ts.append(time.perf_counter() - t0)
print(f"scalar roundtrip: min {min(ts)*1e3:.2f} ms  all {[f'{t*1e3:.1f}' for t in ts]}")

# 2. device_get of a 1 MB vector
x1 = jnp.ones(n, dtype)
np.asarray(x1)
t0 = time.perf_counter()
np.asarray(x1)
print(f"1MB device_get: {(time.perf_counter()-t0)*1e3:.2f} ms")

# 3. fixed-iteration CG loop (no epilogue): pure while_loop cost
from functools import partial

@partial(jax.jit, static_argnames=("iters",))
def cg_fixed(pd, offsets_dummy, b, iters):
    from krylov_tpu.ops.pallas_dia import dia_spmv_pallas
    def mv(v):
        return dia_spmv_pallas(pd, D.offsets, v)
    x = jnp.zeros_like(b)
    r = b
    p = b
    gamma = jnp.vdot(r, r).real
    def body(_, carry):
        x, r, p, gamma = carry
        Ap = mv(p)
        alpha = gamma / jnp.vdot(p, Ap).real
        x = x + alpha * p
        r = r - alpha * Ap
        g2 = jnp.vdot(r, r).real
        beta = g2 / gamma
        p = r + beta * p
        return x, r, p, g2
    x, r, p, gamma = jax.lax.fori_loop(0, iters, body, (x, r, p, gamma))
    return jnp.sum(x), gamma

pd = op._pd
for iters in (0, 1, 149):
    out = cg_fixed(pd, None, b, iters)
    float(out[0])
    t0 = time.perf_counter()
    out = cg_fixed(pd, None, b, iters)
    float(out[0])
    dt = time.perf_counter() - t0
    print(f"fori CG  iters={iters:4d}: {dt*1e3:8.2f} ms")

# 4. the real library while_loop core timing, isolating epilogue
t0 = time.perf_counter()
x, stats = cg(op, b, atol=0.0, rtol=1e-6)
t1 = time.perf_counter()
float(jnp.sum(x))
t2 = time.perf_counter()
print(f"library cg() call: {(t1-t0)*1e3:.2f} ms  (+ final sum fetch {(t2-t1)*1e3:.2f} ms)  niter={stats.niter}")

# warm second solve
b2 = jnp.full(n, 1.01, dtype=dtype)
t0 = time.perf_counter()
x, stats = cg(op, b2, atol=0.0, rtol=1e-6)
t1 = time.perf_counter()
float(jnp.sum(x))
t2 = time.perf_counter()
print(f"library cg() warm:  {(t1-t0)*1e3:.2f} ms  (+ final sum fetch {(t2-t1)*1e3:.2f} ms)  niter={stats.niter}")

# 5. while_loop with status check (the library core) but no host_state
from krylov_tpu.solvers.cg import _cg_core
import krylov_tpu._runtime as rt

t0 = time.perf_counter()
state = _cg_core(op, None, b2, None, None, jnp.int32(2 * n), 0.0, 1e-6, 0.0,
                 ldiv=False, linesearch=False, history=False, hist_len=0,
                 callback=None, verbose=0, use_radius=False)
float(jnp.sum(state.x))
t1 = time.perf_counter()
print(f"_cg_core alone + sum fetch: {(t1-t0)*1e3:.2f} ms")
