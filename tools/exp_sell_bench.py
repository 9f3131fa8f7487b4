"""On-TPU throughput of the SELL-C-128 SpMV at conv-diff 128^3 scale.

Timing per CLAUDE.md: loop K matvecs inside ONE jit, difference against
K=1, fetch a scalar to force completion.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from krylov_tpu.ops.dia import convdiff_dia
from krylov_tpu.ops.sparse import csr_from_coo
from krylov_tpu.ops.pallas_sell import sell_from_csr, sell_spmv


def dia_to_csr(D):
    n = D.shape[0]
    dd = np.asarray(D.data)
    rows, cols, vals = [], [], []
    for di, k in enumerate(D.offsets):
        i = np.arange(max(0, -k), n - max(0, k))
        j = i + k
        keep = dd[di, j] != 0
        rows.append(i[keep]); cols.append(j[keep]); vals.append(dd[di, j][keep])
    return csr_from_coo(np.concatenate(rows), np.concatenate(cols),
                        np.concatenate(vals), (n, n), dtype=np.float32)


def main(N=128):
    n = N ** 3
    D = convdiff_dia(N, N, N, dtype=np.float32)
    t0 = time.perf_counter()
    csr = dia_to_csr(D)
    t1 = time.perf_counter()
    S = sell_from_csr(csr)
    t2 = time.perf_counter()
    nnz = S.nnz
    print(f"n={n} nnz={nnz} P={S.data.shape[0]} kmax={S.kmax} "
          f"fill={S.fill:.3f} build_csr={t1-t0:.1f}s build_sell={t2-t1:.1f}s")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    def loop(K):
        @jax.jit
        def f(S, x):
            def body(_, v):
                return sell_spmv(S, v) * (1.0 / 8.0)
            return jnp.sum(jax.lax.fori_loop(0, K, body, x))
        return f

    f1, fK = loop(1), loop(64)
    float(f1(S, x)); float(fK(S, x))          # compile + warm
    reps = 5
    ts1, tsK = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(S, x)); ts1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK(S, x)); tsK.append(time.perf_counter() - t0)
    t_iter = (np.median(tsK) - np.median(ts1)) / 63
    print(f"SELL spmv: {t_iter*1e6:.1f} us/matvec  "
          f"{nnz/t_iter/1e9:.1f} Gnnz/s  "
          f"(stored slots {S.data.size/t_iter/1e9:.1f} Gslot/s)")

    # correctness on-chip
    from krylov_tpu.ops.dia import dia_spmv
    y = sell_spmv(S, x)
    yref = dia_spmv(D.data, D.offsets, x)
    print("maxerr vs DIA:", float(jnp.max(jnp.abs(y - yref))))


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
