"""Calibrate TPU cost-model constants for the SELL packing planner.

Measures: (1) jnp.take gather rate (random permutation + random small
index sets), (2) scatter-add rate, (3) SELL kernel per-pair overhead
(kmax 1 vs 8 vs 32 at equal pair count).  All operands are passed as
jit ARGUMENTS — closed-over arrays embed as HLO constants and blow the
remote-compile tunnel's request limit (HTTP 413).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

REPS = 5
K = 128


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def rate(label, build, args, nelem):
    g1, gK = build(1), build(K)
    float(g1(*args)); float(gK(*args))
    t1 = statistics.median(timed(lambda: float(g1(*args)))
                           for _ in range(REPS))
    tK = statistics.median(timed(lambda: float(gK(*args)))
                           for _ in range(REPS))
    per = (tK - t1) / (K - 1)
    print(f"{label}: {per * 1e6:.1f} us -> {nelem / per / 1e9:.3f} G/s",
          flush=True)
    return per


n = 1 << 20
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
perm = jnp.asarray(rng.permutation(n).astype(np.int32))


def mk_perm(s):
    @jax.jit
    def f(x, perm):
        def body(_, v):
            return jnp.take(v, perm, axis=0) * 0.999
        return jnp.sum(jax.lax.fori_loop(0, s, body, x))
    return f


rate(f"perm gather n={n}", mk_perm, (x, perm), n)

h, km = 4096, 128
cols = jnp.asarray(rng.integers(0, n, (h, km)).astype(np.int32))
vals = jnp.asarray(rng.standard_normal((h, km)).astype(np.float32))
rows = jnp.asarray(np.sort(rng.choice(n, h, replace=False))
                   .astype(np.int32))


def mk_deep(s):
    @jax.jit
    def f(x, rows, cols, vals):
        def body(_, v):
            contrib = jnp.sum(vals * jnp.take(v, cols, axis=0), axis=1)
            return v.at[rows].add(contrib * 1e-6)
        return jnp.sum(jax.lax.fori_loop(0, s, body, x))
    return f


rate(f"deep rows h={h} km={km} ({h * km} slots)", mk_deep,
     (x, rows, cols, vals), h * km)

# contiguous-window variant: cols = start + arange
starts = jnp.asarray(rng.integers(0, n - 600, h).astype(np.int32))
wvals = jnp.asarray(rng.standard_normal((h, 600)).astype(np.float32))


def mk_win(s):
    @jax.jit
    def f(x, rows, starts, wvals):
        wcols = starts[:, None] + jnp.arange(600, dtype=jnp.int32)[None, :]
        def body(_, v):
            contrib = jnp.sum(wvals * jnp.take(v, wcols, axis=0), axis=1)
            return v.at[rows].add(contrib * 1e-6)
        return jnp.sum(jax.lax.fori_loop(0, s, body, x))
    return f


rate(f"deep windowed h={h} W=600 ({h * 600} slots)", mk_win,
     (x, rows, starts, wvals), h * 600)

# SELL per-pair overhead: same pair count (1024), kmax 1 vs 8 vs 32
import scipy.sparse as sp
from krylov_tpu.ops.sparse import csr_from_coo
from krylov_tpu.ops.pallas_sell import sell_from_csr, sell_spmv


def mk_sell(s):
    @jax.jit
    def f(S, v):
        def body(_, u):
            return sell_spmv(S, u) * 0.01
        return jnp.sum(jax.lax.fori_loop(0, s, body, v))
    return f


for km_t in (1, 8, 32):
    m2 = 1 << 17
    rr = np.arange(m2, dtype=np.int64)
    start = (rr % 8) * 128
    r = np.repeat(rr, km_t)
    c = np.repeat(start, km_t) + np.tile(np.arange(km_t), m2)
    A = sp.coo_matrix((np.ones(r.size, np.float32), (r, c)),
                      shape=(m2, m2)).tocsr()
    A.sum_duplicates()
    coo = sp.coo_matrix(A)
    S = sell_from_csr(csr_from_coo(coo.row, coo.col, coo.data,
                                   A.shape, dtype=np.float32))
    pairs = S.data.shape[0]
    v = jnp.ones(m2, jnp.float32)
    per = rate(f"sell km={S.kmax} pairs={pairs} slots={S.data.size}",
               mk_sell, (S, v), S.data.size)
    print(f"   per-pair {per / pairs * 1e6:.3f} us", flush=True)
print("OK", flush=True)
