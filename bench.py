#!/usr/bin/env python
"""Benchmark harness (BASELINE.md configs) — prints ONE JSON line.

Headline metric: SpMV throughput (nnz/s/chip) for the reference's
get_div_grad 3-D Poisson operator at the flagship 128³ size, measured
with the single-pass Pallas DIA stencil kernel on the default JAX device
(the real TPU chip under the driver).  The detail block carries the 64³
numbers, the bf16-storage variant, the BELL (block-ELL) MXU kernel, and
the CG numbers:

* ``cg_time_to_rtol_s`` — one library `cg()` call, wall clock.  Through
  the driver's remote-TPU tunnel a single host↔device round trip costs
  ~28 ms, which dominates this number (round-1 profiling: the round-1
  figure of 63 ms was two round trips, not loop time).
* ``cg_device_ms_per_solve`` / ``cg_us_per_iter`` — true device
  execution time of the whole-solve-in-VMEM fused kernel, measured by
  running S back-to-back solves inside ONE jitted computation and
  differencing against S=1 (amortizes dispatch and the tunnel RTT).

Measurement notes (CLAUDE.md): through the tunnel `block_until_ready`
does not guarantee completion — every timing fetches a scalar; matvecs
loop inside one jit so dispatch latency amortizes; the per-matvec scale
factor is folded into the diagonals (A/12, spectral radius < 1) so the
timed loop body is exactly one SpMV.
"""

import json
import sys
import time
from functools import partial

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from krylov_tpu.ops.dia import poisson_dia
    from krylov_tpu.ops.pallas_dia import dia_align, dia_spmv_pallas
    from krylov_tpu.ops.pallas_fused import cg_dia_fused
    from krylov_tpu.operators import DIAOperator
    from krylov_tpu import cg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    log(f"bench: device={dev} dtype={np.dtype(dtype)}")

    def spmv_gnnz(N, data_dtype=None, K=None):
        """Single-call Pallas DIA SpMV throughput at size N³."""
        n = N ** 3
        D = poisson_dia(N, N, N, dtype=dtype)
        data = jnp.asarray(np.asarray(D.data) / 12.0)  # ρ(A/12) < 1
        if data_dtype is not None:
            data = data.astype(data_dtype)
        pd = dia_align(data, D.offsets, n)
        b = jnp.ones(n, dtype)
        if K is None:
            K = (2000 if N <= 64 else 800) if on_tpu else 20

        @jax.jit
        def loop(pd_, x):
            def body(_, v):
                y = dia_spmv_pallas(pd_, D.offsets, v)
                return y.astype(x.dtype)
            return jnp.sum(jax.lax.fori_loop(0, K, body, x)
                           .astype(jnp.float32))

        float(loop(pd, b))
        best = float("inf")
        for t in range(3):
            xin = jnp.full(n, 1.0 + 0.01 * t, dtype)
            t0 = time.perf_counter()
            float(loop(pd, xin))
            best = min(best, (time.perf_counter() - t0) / K)
        return D.nnz / best / 1e9

    log("bench: spmv 128^3...")
    N_big = 128 if on_tpu else 32
    spmv_big = spmv_gnnz(N_big)
    log(f"bench: spmv {N_big}^3 = {spmv_big:.1f} Gnnz/s")
    log("bench: spmv 64^3...")
    N_small = 64 if on_tpu else 16
    spmv_small = spmv_gnnz(N_small)
    log(f"bench: spmv {N_small}^3 = {spmv_small:.1f} Gnnz/s")
    spmv_bf16 = None
    if on_tpu:
        log("bench: spmv 64^3 bf16 storage...")
        spmv_bf16 = spmv_gnnz(N_small, data_dtype=jnp.bfloat16)

    # --- CG time-to-tolerance: one library call (includes one tunnel RTT)
    rtol = 1e-6 if on_tpu else 1e-8
    N = N_small
    n = N ** 3
    D = poisson_dia(N, N, N, dtype=dtype)
    op = DIAOperator(D)
    b = jnp.ones(n, dtype)
    log("bench: cg (library call)...")
    x, stats = cg(op, b, atol=0.0, rtol=rtol)       # compile + converge
    best_cg = float("inf")
    for t in range(3):
        b2 = jnp.full(n, 1.0 + 0.01 * t, dtype)
        t0 = time.perf_counter()
        x, stats = cg(op, b2, atol=0.0, rtol=rtol)
        best_cg = min(best_cg, time.perf_counter() - t0)
    cg_niter = stats.niter

    # --- CG device time: S solves in one jitted computation, differenced
    cg_dev_ms = cg_us_iter = None
    cg128_dev_ms = cg128_niter = None
    minres_dev_ms = None
    if on_tpu:
        pd = op._pd

        def multi_factory(Dm, nm):
            @partial(jax.jit, static_argnames=("S",))
            def multi(pd_, B, S):
                def body(i, acc):
                    tot, chk = acc
                    xx, it, rn, st, vi = cg_dia_fused(
                        pd_, Dm.offsets, B[i], 0.0, rtol, 2 * nm)
                    return tot + it, chk + jnp.sum(xx)
                return jax.lax.fori_loop(0, S, body,
                                         (jnp.int32(0), jnp.float32(0)))
            return multi

        def device_time(Dm, pdm, nm, S):
            multi = multi_factory(Dm, nm)
            out = {}
            for s_ in (1, S):
                B = jnp.stack([jnp.full(nm, 1.0 + 0.001 * i, dtype)
                               for i in range(s_)])
                it, chk = multi(pdm, B, s_)
                int(it), float(chk)                  # warm
                best = float("inf")
                for _ in range(3):                   # tunnel RTT jitters
                    t0 = time.perf_counter()
                    it, chk = multi(pdm, B, s_)
                    tot = int(it)
                    float(chk)
                    best = min(best, time.perf_counter() - t0)
                out[s_] = (best, tot)
            (t1, i1), (tS, iS) = out[1], out[S]
            per_iter = (tS - t1) / max(iS - i1, 1)
            if per_iter <= 0:                        # noise floor: bound by tS/S
                per_iter = tS / max(iS, 1)
            iters_per_solve = iS / S
            return per_iter * iters_per_solve, per_iter, int(iters_per_solve)

        log("bench: cg fused device time 64^3...")
        per_solve, per_iter, _ = device_time(D, pd, n, 16)
        cg_dev_ms = per_solve * 1e3
        cg_us_iter = per_iter * 1e6
        log(f"bench: cg 64^3 device {cg_dev_ms:.3f} ms/solve "
            f"({cg_us_iter:.2f} us/iter)")

        log("bench: cg fused device time 128^3...")
        D2 = poisson_dia(128, 128, 128, dtype=dtype)
        pd2 = dia_align(D2.data, D2.offsets, 128 ** 3)
        per_solve2, _, niter2 = device_time(D2, pd2, 128 ** 3, 4)
        cg128_dev_ms = per_solve2 * 1e3
        cg128_niter = niter2
        log(f"bench: cg 128^3 device {cg128_dev_ms:.2f} ms/solve")

        # fused MINRES device time (same S-differencing harness)
        log("bench: minres fused device time 64^3...")
        from krylov_tpu.ops.pallas_fused import minres_dia_fused

        @partial(jax.jit, static_argnames=("S",))
        def multi_mr(pd_, B, S):
            def body(i, acc):
                tot, chk = acc
                xx, it, rn, st, inc = minres_dia_fused(
                    pd_, D.offsets, B[i], 0.0, rtol,
                    float(np.sqrt(np.finfo(dtype).eps)), 1e-8, 0.0, 2 * n)
                return tot + it, chk + jnp.sum(xx)
            return jax.lax.fori_loop(0, S, body,
                                     (jnp.int32(0), jnp.float32(0)))

        mr_out = {}
        for s_ in (1, 16):
            B = jnp.stack([jnp.full(n, 1.0 + 0.001 * i, dtype)
                           for i in range(s_)])
            it, chk = multi_mr(pd, B, s_)
            int(it), float(chk)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                it, chk = multi_mr(pd, B, s_)
                tot = int(it)
                float(chk)
                best = min(best, time.perf_counter() - t0)
            mr_out[s_] = (best, tot)
        (t1, i1), (tS, iS) = mr_out[1], mr_out[16]
        mr_per_iter = (tS - t1) / max(iS - i1, 1)
        if mr_per_iter <= 0:
            mr_per_iter = tS / max(iS, 1)
        minres_dev_ms = mr_per_iter * (iS / 16) * 1e3
        log(f"bench: minres 64^3 device {minres_dev_ms:.3f} ms/solve")

    # --- BELL (block-ELL) MXU kernel on a block-tridiagonal matrix
    bell_gnnz = None
    if on_tpu:
        log("bench: bell...")
        from krylov_tpu.ops.pallas_spmv import BELLMatrix, bell_spmv
        bs = 128
        nb = 96                                  # 12288 unknowns
        nB = nb * bs
        rng = np.random.default_rng(0)
        blocks_per_row = 3
        data = jnp.asarray(
            rng.standard_normal((nb, blocks_per_row, bs, bs)) / bs, dtype)
        idx = np.zeros((nb, blocks_per_row), np.int32)
        for i in range(nb):
            cols = [max(0, i - 1), i, min(nb - 1, i + 1)]
            idx[i] = cols
        A_bell = BELLMatrix(data, jnp.asarray(idx), (nB, nB), bs)
        xb = jnp.ones(nB, dtype)
        Kb = 400

        @jax.jit
        def bell_loop(d_, x):
            A_ = BELLMatrix(d_, A_bell.indices, (nB, nB), bs)
            def body(_, v):
                return bell_spmv(A_, v) * (1.0 / 3.0)
            return jnp.sum(jax.lax.fori_loop(0, Kb, body, x))

        float(bell_loop(data, xb))
        t0 = time.perf_counter()
        float(bell_loop(data, xb))
        bell_t = (time.perf_counter() - t0) / Kb
        bell_nnz = nb * blocks_per_row * bs * bs
        bell_gnnz = bell_nnz / bell_t / 1e9
        log(f"bench: bell = {bell_gnnz:.1f} Gnnz/s")

    # --- host scipy CSR baseline for the flagship SpMV
    import scipy.sparse as sp
    Db = poisson_dia(N_big, N_big, N_big, dtype=dtype)
    diags = sp.dia_matrix((np.asarray(Db.data), np.asarray(Db.offsets)),
                          shape=(N_big ** 3, N_big ** 3))
    A_csr = diags.tocsr()
    xb = np.ones(N_big ** 3, dtype=dtype)
    A_csr @ xb
    t0 = time.perf_counter()
    for _ in range(5):
        A_csr @ xb
    cpu_nnz_per_s = Db.nnz / ((time.perf_counter() - t0) / 5)

    out = {
        "metric": "spmv_nnz_per_s_chip",
        "value": round(spmv_big, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(spmv_big * 1e9 / cpu_nnz_per_s, 3),
        "detail": {
            "problem": f"get_div_grad({N_big}^3) DIA, Pallas stencil",
            "device": str(dev),
            "dtype": str(np.dtype(dtype)),
            "spmv_64cubed_gnnz_per_s": round(spmv_small, 4),
            "spmv_bf16_64cubed_gnnz_per_s": (round(spmv_bf16, 4)
                                             if spmv_bf16 else None),
            "bell_blocktridiag_gnnz_per_s": (round(bell_gnnz, 4)
                                             if bell_gnnz else None),
            "cg_time_to_rtol_s": round(best_cg, 5),
            "cg_niter": cg_niter,
            "cg_rtol": rtol,
            "cg_note": ("single library call; ~28 ms of this is one "
                        "host-device round trip through the remote tunnel"),
            "cg_device_ms_per_solve_64cubed": (round(cg_dev_ms, 4)
                                               if cg_dev_ms else None),
            "cg_us_per_iter_64cubed": (round(cg_us_iter, 3)
                                       if cg_us_iter else None),
            "cg_device_ms_per_solve_128cubed": (round(cg128_dev_ms, 3)
                                                if cg128_dev_ms else None),
            "cg_niter_128cubed": cg128_niter,
            "minres_device_ms_per_solve_64cubed": (
                round(minres_dev_ms, 4) if minres_dev_ms else None),
            "cpu_scipy_gnnz_per_s": round(cpu_nnz_per_s / 1e9, 4),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
