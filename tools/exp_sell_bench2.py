"""SELL/hybrid throughput on representative sparsity profiles (real TPU).

Profiles:
  fem   — FEM-like: ~24 nnz/row clustered in a ±600 band (RCM-ordered
          unstructured mesh signature) — SELL's target workload.
  scat  — scattered wide band (±16384, 7/row): worst case, low fill.
  hyb   — conv-diff 7-pt stencil given as CSR, routed through the
          hybrid analysis (should recover the pure-DIA fast path).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from krylov_tpu.ops.sparse import csr_from_coo
from krylov_tpu.ops.pallas_sell import sell_from_csr, sell_spmv
from krylov_tpu.ops.hybrid import hybrid_from_csr, hybrid_spmv
from krylov_tpu.ops.dia import convdiff_dia


def banded_random(n, deg, half_w, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rows + rng.integers(-half_w, half_w + 1, size=rows.size)
    np.clip(cols, 0, n - 1, out=cols)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    return csr_from_coo(rows, cols, vals, (n, n), dtype=np.float32)


def time_fn(f, *args, iters_inner=64, reps=5):
    def loop(K):
        @jax.jit
        def g(*a):
            def body(_, v):
                return f(*a[:-1], v) * (1.0 / 8.0)
            return jnp.sum(jax.lax.fori_loop(0, K, body, a[-1]))
        return g
    g1, gK = loop(1), loop(iters_inner)
    float(g1(*args)); float(gK(*args))
    t1s, tKs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(g1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(gK(*args)); tKs.append(time.perf_counter() - t0)
    return (np.median(tKs) - np.median(t1s)) / (iters_inner - 1)


def run_sell(tag, csr):
    t0 = time.perf_counter()
    S = sell_from_csr(csr)
    print(f"{tag}: n={csr.shape[0]} nnz={S.nnz} P={S.data.shape[0]} "
          f"kmax={S.kmax} fill={S.fill:.3f} build={time.perf_counter()-t0:.1f}s",
          flush=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(csr.shape[1]),
                    jnp.float32)
    t = time_fn(lambda S_, v: sell_spmv(S_, v), S, x)
    print(f"{tag}: {t*1e6:.1f} us/matvec  {S.nnz/t/1e9:.2f} Gnnz/s  "
          f"({S.data.size/t/1e9:.1f} Gslot/s)", flush=True)


def main():
    n = 1 << 21
    run_sell("fem", banded_random(n, 24, 600))
    run_sell("scat", banded_random(n, 7, 16384))

    # hybrid on conv-diff CSR
    N = 128
    D = convdiff_dia(N, N, N, dtype=np.float32)
    nn = N ** 3
    dd = np.asarray(D.data)
    rows, cols, vals = [], [], []
    for di, k in enumerate(D.offsets):
        i = np.arange(max(0, -k), nn - max(0, k))
        j = i + k
        keep = dd[di, j] != 0
        rows.append(i[keep]); cols.append(j[keep]); vals.append(dd[di, j][keep])
    csr = csr_from_coo(np.concatenate(rows), np.concatenate(cols),
                       np.concatenate(vals), (nn, nn), dtype=np.float32)
    H = hybrid_from_csr(csr)
    hnnz = H.nnz
    print(f"hyb: dia_diags={len(H.dia.offsets) if H.dia else 0} "
          f"sell={'none' if H.sell is None else type(H.sell).__name__}",
          flush=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(nn), jnp.float32)
    t = time_fn(lambda H_, v: hybrid_spmv(H_, v), H, x)
    print(f"hyb: {t*1e6:.1f} us/matvec  {hnnz/t/1e9:.2f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
