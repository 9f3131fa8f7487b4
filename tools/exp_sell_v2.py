"""Real-TPU A/B: single-Kmax SELL vs bucketed/peeled SELL across profiles.

Times y = A x with S-in-one-jit median differencing (CLAUDE.md gotchas).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from krylov_tpu.ops.sparse import csr_from_coo
from krylov_tpu.ops.pallas_sell import (sell_from_csr,
                                        sell_bucketed_from_csr,
                                        sell_spmv, sell_bucketed_spmv,
                                        SELLBucketed)

REPS = 5
K = 256


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def spmv_time(fn, A_, x):
    def loop(s):
        @jax.jit
        def g(A__, v):
            def body(_, u):
                return fn(A__, u) * (1.0 / 8.0)
            return jnp.sum(jax.lax.fori_loop(0, s, body, v))
        return g
    g1, gK = loop(1), loop(K)
    float(g1(A_, x)); float(gK(A_, x))
    t1s, tKs = [], []
    for _ in range(REPS):
        t1s.append(timed(lambda: float(g1(A_, x))))
        tKs.append(timed(lambda: float(gK(A_, x))))
    return (statistics.median(tKs) - statistics.median(t1s)) / (K - 1)


def profile(name, A):
    coo = sp.coo_matrix(A)
    csr = csr_from_coo(coo.row, coo.col,
                       coo.data.astype(np.float32), A.shape,
                       dtype=np.float32)
    S1 = sell_from_csr(csr)
    SB = sell_bucketed_from_csr(csr)
    x = jnp.ones(A.shape[1], jnp.float32)
    t1 = spmv_time(sell_spmv, S1, x)
    g1 = A.nnz / t1 / 1e9
    if isinstance(SB, SELLBucketed):
        t2 = spmv_time(sell_bucketed_spmv, SB, x)
        g2 = A.nnz / t2 / 1e9
        y1 = np.asarray(sell_spmv(S1, x))
        y2 = np.asarray(sell_bucketed_spmv(SB, x))
        err = float(np.max(np.abs(y1 - y2)) / (np.max(np.abs(y1)) + 1))
        print(f"{name}: single {g1:.2f} Gnnz/s | bucketed {g2:.2f} Gnnz/s "
              f"(x{g2 / g1:.2f}) slots {S1.data.size}->{SB.slots} "
              f"parts={len(SB.parts)} "
              f"sorted={SB.row_pos is not None} agree={err:.2e}",
              flush=True)
    else:
        print(f"{name}: single {g1:.2f} Gnnz/s (bucketing not chosen)",
              flush=True)


rng = np.random.default_rng(0)
n, w = 1 << 17, 300

deg = np.full(n, 7)
deg[n - 1 - rng.choice(8192, 1200, replace=False)] = 120   # clustered
r = np.repeat(np.arange(n, dtype=np.int64), deg)
c = np.clip(r + rng.integers(-w, w + 1, size=r.size), 0, n - 1)
A = sp.coo_matrix((rng.standard_normal(r.size), (r, c)),
                  shape=(n, n)).tocsr()
A.sum_duplicates()
profile("band+heavy", A)

deg = np.minimum(2 + rng.zipf(1.6, size=n), 200)
r = np.repeat(np.arange(n, dtype=np.int64), deg)
c = np.clip(r + rng.integers(-w, w + 1, size=r.size), 0, n - 1)
A = sp.coo_matrix((rng.standard_normal(r.size), (r, c)),
                  shape=(n, n)).tocsr()
A.sum_duplicates()
profile("zipf band ", A)

r = np.repeat(np.arange(n, dtype=np.int64), 12)
c = np.clip(r + rng.integers(-w, w + 1, size=r.size), 0, n - 1)
A = sp.coo_matrix((rng.standard_normal(r.size), (r, c)),
                  shape=(n, n)).tocsr()
A.sum_duplicates()
profile("fem 12    ", A)
print("OK", flush=True)
