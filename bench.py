#!/usr/bin/env python
"""Benchmark harness (BASELINE.md configs) — prints ONE JSON line.

Headline metric: SpMV throughput (nnz/s/chip) on the reference's
get_div_grad 3-D Poisson operator (BASELINE.json config #1), measured on
the default JAX device (the real TPU chip under the driver).  CG
time-to-tolerance on the same system is folded into the JSON as extra
fields; `vs_baseline` is the speedup over a scipy CSR SpMV on the host
CPU for the same matrix (the reference's CPU BLAS execution model).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from krylov_tpu.ops.dia import poisson_dia, dia_spmv
    from krylov_tpu.ops.pallas_dia import dia_align, dia_spmv_pallas
    from krylov_tpu.operators import DIAOperator
    from krylov_tpu import cg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64

    N = 64
    n = N ** 3
    D = poisson_dia(N, N, N, dtype=dtype)
    nnz = D.nnz
    b = jnp.ones(n, dtype=dtype)

    # --- SpMV throughput: the single-pass Pallas stencil kernel
    # (ops/pallas_dia.py), K matvecs inside one jit.  K = 2000 amortizes
    # the ~25 ms fixed dispatch latency of the remote tunnel to <3%.
    # The result is reduced to a scalar and fetched: through the remote
    # tunnel block_until_ready alone does not guarantee completion.
    import sys

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    log(f"bench: device={dev} dtype={np.dtype(dtype)} n={n}")
    K = 2000 if on_tpu else 20
    pd = dia_align(D.data, D.offsets, n)

    @jax.jit
    def spmv_loop(pd_, x):
        def body(_, v):
            return dia_spmv_pallas(pd_, D.offsets, v) * (1.0 / 6.0)
        v = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(v)

    log("bench: compiling spmv loop...")
    float(spmv_loop(pd, b))              # compile + warm
    log("bench: spmv compiled")
    best = float("inf")
    for trial in range(3):
        xin = jnp.full(n, 1.0 + 0.01 * trial, dtype=dtype)
        t0 = time.perf_counter()
        float(spmv_loop(pd, xin))
        best = min(best, (time.perf_counter() - t0) / K)
    spmv_t = best
    nnz_per_s = nnz / spmv_t

    # --- bf16 storage variant (f32 accumulate inside the kernel) ---
    bf16_nnz_per_s = None
    if on_tpu:
        pd16 = pd.astype(jnp.bfloat16)

        @jax.jit
        def spmv_loop16(pd_, x):
            def body(_, v):
                y = dia_spmv_pallas(pd_, D.offsets, v)
                return (y * jnp.asarray(1.0 / 6.0, y.dtype)).astype(x.dtype)
            v = jax.lax.fori_loop(0, K, body, x)
            return jnp.sum(v.astype(jnp.float32))

        log("bench: compiling bf16 spmv loop...")
        b16 = b.astype(jnp.bfloat16)
        float(spmv_loop16(pd16, b16))
        best16 = float("inf")
        for trial in range(3):
            xin = jnp.full(n, 1.0 + 0.01 * trial, jnp.bfloat16)
            t0 = time.perf_counter()
            float(spmv_loop16(pd16, xin))
            best16 = min(best16, (time.perf_counter() - t0) / K)
        bf16_nnz_per_s = nnz / best16

    # --- larger-problem flagship number (128^3, ~60% of HBM peak) ---
    big_nnz_per_s = None
    if on_tpu:
        N2 = 128
        n2 = N2 ** 3
        D2 = poisson_dia(N2, N2, N2, dtype=dtype)
        pd2 = dia_align(D2.data, D2.offsets, n2)
        K2 = 1000

        @jax.jit
        def spmv_loop_big(pd_, x):
            def body(_, v):
                return dia_spmv_pallas(pd_, D2.offsets, v) * (1.0 / 6.0)
            return jnp.sum(jax.lax.fori_loop(0, K2, body, x))

        log("bench: compiling 128^3 spmv loop...")
        xb = jnp.ones(n2, dtype)
        float(spmv_loop_big(pd2, xb))
        bestb = float("inf")
        for trial in range(2):
            xin = jnp.full(n2, 1.0 + 0.01 * trial, dtype)
            t0 = time.perf_counter()
            float(spmv_loop_big(pd2, xin))
            bestb = min(bestb, (time.perf_counter() - t0) / K2)
        big_nnz_per_s = D2.nnz / bestb

    # --- CG time-to-tolerance (rtol=1e-6 fp32 / 1e-8 fp64) ---
    rtol = 1e-6 if on_tpu else 1e-8
    op = DIAOperator(D)
    log("bench: compiling cg...")
    x, stats = cg(op, b, atol=0.0, rtol=rtol)        # compile + converge
    float(jnp.sum(x))                                # warm the fetch path too
    log("bench: cg compiled")
    b2 = jnp.full(n, 1.01, dtype=dtype)
    t0 = time.perf_counter()
    x, stats = cg(op, b2, atol=0.0, rtol=rtol)
    float(jnp.sum(x))                                # force completion
    cg_t = time.perf_counter() - t0

    # --- host scipy CSR baseline for the same SpMV ---
    import scipy.sparse as sp
    data_np = np.asarray(D.data)
    diags = sp.dia_matrix((data_np, np.asarray(D.offsets)), shape=(n, n))
    A_csr = diags.tocsr()
    xb = np.ones(n, dtype=dtype)
    A_csr @ xb
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        A_csr @ xb
    cpu_t = (time.perf_counter() - t0) / reps
    cpu_nnz_per_s = nnz / cpu_t

    out = {
        "metric": "spmv_nnz_per_s_chip",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / cpu_nnz_per_s, 3),
        "detail": {
            "problem": f"get_div_grad({N},{N},{N}) DIA",
            "device": str(dev),
            "dtype": str(np.dtype(dtype)),
            "cg_time_to_rtol_s": round(cg_t, 5),
            "cg_niter": stats.niter,
            "cg_rtol": rtol,
            "cpu_scipy_gnnz_per_s": round(cpu_nnz_per_s / 1e9, 4),
            "spmv_bf16_gnnz_per_s": (round(bf16_nnz_per_s / 1e9, 4)
                                     if bf16_nnz_per_s else None),
            "spmv_128cubed_gnnz_per_s": (round(big_nnz_per_s / 1e9, 4)
                                         if big_nnz_per_s else None),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
