#!/usr/bin/env python
"""Benchmark harness — prints ONE compact JSON line (final stdout line,
kept under ~1800 chars so the driver's 2000-char tail capture parses it);
the full per-config detail is written to BENCH_DETAIL.json and stderr.

Headline metric: SpMV throughput (Gnnz/s/chip) for the reference's
get_div_grad 3-D Poisson operator at 128³ (Pallas DIA stencil kernel).
The detail block carries device times for all five BASELINE configs:

1. CG on SPD 3-D Poisson          — fused whole-solve-in-VMEM kernel, 64³+128³
2. GMRES(20,restart) + BiCGSTAB   — 3-D convection-diffusion, Jacobi M
3. LSQR / LSMR, λ>0               — tall dense least-squares (gen_lsq-class)
4. TriCG / TriMR / GPMR           — saddle-point / SQD partitioned systems
5. Block-GMRES + CG-LANCZOS-SHIFT — multi-RHS and multi-shift families

Device-time method (CLAUDE.md measurement gotchas): the remote-TPU tunnel
costs ~28 ms per host↔device round trip and `block_until_ready` does not
guarantee completion, so every timing fetches scalars and every config is
measured by running S back-to-back solves inside ONE jitted computation
(`lax.fori_loop` over a traceable solver core — benchmarks/adapters.py)
and differencing the MEDIAN-of-R timings at S vs 1.  S is auto-scaled so
the S−1 extra solves dominate tunnel jitter (target ≥ 80 ms of spread).
If the difference still lands at/below zero the config records only a
`fallback_upper_bound_ms` — never a headline number (round-2 lesson:
a noise-floored fallback once overstated fused-CG time by ~7×).
"""

import json
import statistics
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
    from krylov_tpu.ops.dia import poisson_dia, convdiff_dia, DIAMatrix
    from krylov_tpu.ops.pallas_dia import dia_align, dia_spmv_pallas
    from krylov_tpu.operators import (DIAOperator, DiagonalOperator,
                                      MatrixOperator)
    from krylov_tpu import cg
    sys.path.insert(0, "/root/repo")
    from benchmarks import adapters

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    log(f"bench: device={dev} dtype={np.dtype(dtype)}")

    REPS = 5

    def fetch2(pair):
        it, chk = jax.device_get(pair)
        return int(it), float(chk)

    # --- tunnel round-trip estimate (subtracted only for S auto-scaling,
    # never folded into reported numbers)
    @jax.jit
    def _noop(x):
        return x + 1.0

    z = jnp.zeros((), jnp.float32)
    float(_noop(z))
    rtt = statistics.median(
        _timed(lambda: float(_noop(z))) for _ in range(REPS))
    log(f"bench: tunnel rtt ~{rtt * 1e3:.1f} ms")

    def measure(label, made, itmax_note=None, target_spread=0.08, s_cap=256):
        """Median-of-REPS S-differenced device time for one config."""
        solve, ops, rhs = made

        @jax.jit
        def multi(ops, rhs, s):
            def body(i, acc):
                tot, chk = acc
                def scale(v):
                    return v * (1 + 0.001 * i).astype(v.dtype)
                it, c = solve(ops, jax.tree_util.tree_map(scale, rhs))
                return tot + it, chk + c
            return jax.lax.fori_loop(
                0, s, body, (jnp.int32(0), jnp.float32(0)))

        t_compile0 = time.perf_counter()
        i1, _ = fetch2(multi(ops, rhs, 1))
        compile_s = time.perf_counter() - t_compile0
        t1 = statistics.median(
            _timed(lambda: fetch2(multi(ops, rhs, 1))) for _ in range(REPS))
        est = max(t1 - rtt, 2e-4)
        S = int(max(4, min(s_cap, round(target_spread / est) + 1)))
        while True:
            res = fetch2(multi(ops, rhs, S))
            iS = res[0]
            tS = statistics.median(
                _timed(lambda: fetch2(multi(ops, rhs, S))) for _ in range(REPS))
            spread = tS - t1
            # t1 - rtt overestimates per-solve time (dispatch overhead
            # beyond the rtt), so small configs can land an S whose spread
            # sits in tunnel jitter; escalate S until the spread clears it.
            if spread > 0.5 * target_spread or S >= s_cap:
                break
            S = int(min(s_cap, S * 8))
        out = {"niter": i1, "S": S, "spread_ms": round(spread * 1e3, 3),
               "t1_ms": round(t1 * 1e3, 3), "compile_s": round(compile_s, 1)}
        if itmax_note:
            out.update(itmax_note)
        if spread > 0 and iS > i1:
            out["device_ms_per_solve"] = round(spread / (S - 1) * 1e3, 4)
            out["device_us_per_iter"] = round(spread / (iS - i1) * 1e6, 3)
        else:
            out["fallback_upper_bound_ms"] = round(tS / S * 1e3, 4)
        log(f"bench: {label}: niter={i1} S={S} "
            f"per_solve={out.get('device_ms_per_solve')} ms "
            f"per_iter={out.get('device_us_per_iter')} us")
        return out

    # ------------------------------------------------------------------
    # SpMV throughput (headline)
    # ------------------------------------------------------------------
    def spmv_gnnz(N, data_dtype=None, K=None):
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

    log("bench: spmv...")
    N_big = 128 if on_tpu else 32
    N_small = 64 if on_tpu else 16
    spmv_big = spmv_gnnz(N_big)
    log(f"bench: spmv {N_big}^3 = {spmv_big:.1f} Gnnz/s")
    spmv_small = spmv_gnnz(N_small)
    spmv_bf16 = spmv_gnnz(N_small, data_dtype=jnp.bfloat16) if on_tpu else None

    rtol = 1e-6 if on_tpu else 1e-8
    configs = {}

    # ------------------------------------------------------------------
    # 1. CG on SPD 3-D Poisson — fused kernel 64³ + 128³, + library call
    # ------------------------------------------------------------------
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
        float(jnp.sum(x))
        best_cg = min(best_cg, time.perf_counter() - t0)
    cg_niter = stats.niter

    cg64 = cg128 = mr64 = None
    if on_tpu:
        pd = op._pd
        cg64 = measure("cg_fused_64", adapters.make_cg_fused(
            pd, D.offsets, b, rtol, 2 * n))
        D2 = poisson_dia(128, 128, 128, dtype=dtype)
        pd2 = dia_align(D2.data, D2.offsets, 128 ** 3)
        b2 = jnp.ones(128 ** 3, dtype)
        cg128 = measure("cg_fused_128", adapters.make_cg_fused(
            pd2, D2.offsets, b2, rtol, 2 * 128 ** 3), s_cap=64)
        eps = float(np.sqrt(np.finfo(dtype).eps))
        mr64 = measure("minres_fused_64", adapters.make_minres_fused(
            pd, D.offsets, b, rtol, 2 * n, eps))
    # fp64-grade solve from f32 storage: double-word iterative refinement
    # (inner solves ride the fused kernel; outer loop is host-driven, so
    # wall-clock includes ~8-10 tunnel RTTs)
    dw = None
    if on_tpu:
        log("bench: cg double_word...")
        rng_dw = np.random.default_rng(7)
        bdw = jnp.asarray(rng_dw.standard_normal(n).astype(dtype))
        xdw, stdw = cg(op, bdw, atol=0.0, rtol=1.5e-8,
                       precision="double_word")
        t0 = time.perf_counter()
        xdw, stdw = cg(op, bdw, atol=0.0, rtol=1.5e-8,
                       precision="double_word")
        dw_wall = time.perf_counter() - t0
        import scipy.sparse as _sp
        A64 = _sp.dia_matrix(
            (np.asarray(D.data, np.float64), np.asarray(D.offsets)),
            shape=(n, n)).tocsr()
        rres = np.asarray(bdw, np.float64) - A64 @ xdw
        dw = {"niter": stdw.niter, "wallclock_s": round(dw_wall, 4),
              "rtol": 1.5e-8,
              "true_relres_f64": float(np.linalg.norm(rres)
                                       / np.linalg.norm(np.asarray(bdw))),
              "solved": stdw.solved}
        log(f"bench: cg dw niter={stdw.niter} true_relres="
            f"{dw['true_relres_f64']:.2e} wall={dw_wall:.3f}s")

    cheby = None
    if on_tpu:
        # Chebyshev-polynomial preconditioned fused CG (in-kernel matvecs)
        lmax_ch, deg_ch = 12.2, 8
        cheby = dict(
            {"degree": deg_ch, "lmin": round(lmax_ch / 120, 4),
             "lmax": lmax_ch},
            **measure("cg_cheby_fused", adapters.make_cg_cheby_fused(
                op._pd, D.offsets, b, rtol, 2 * n, lmax_ch / 120, lmax_ch,
                deg_ch), s_cap=64))

    configs["cg_poisson"] = {
        "n": n, "wallclock_library_call_s": round(best_cg, 5),
        "niter": cg_niter, "rtol": rtol,
        "note": "~28 ms of the wall-clock is one tunnel round trip",
        "fused_64cubed": cg64, "fused_128cubed": cg128,
        "cheby_fused_64cubed": cheby,
        "minres_fused_64cubed": mr64,
        "double_word_64cubed": dw,
    }

    # ------------------------------------------------------------------
    # 2. GMRES(20) + BiCGSTAB on convection-diffusion, Jacobi M
    # ------------------------------------------------------------------
    Ncd = 48 if on_tpu else 12
    Dcd = convdiff_dia(Ncd, Ncd, Ncd, pe=0.3, dtype=dtype)
    ncd = Dcd.shape[0]
    Acd = DIAOperator(Dcd)
    Mcd = DiagonalOperator(jnp.full(ncd, 1.0 / 6.0, dtype))
    bcd = jnp.ones(ncd, dtype)
    log("bench: convdiff gmres/bicgstab...")
    configs["convdiff_gmres20"] = dict(
        {"n": ncd, "rtol": rtol, "mem": 20},
        **measure("gmres", adapters.make_gmres(Acd, Mcd, bcd, rtol, 600,
                                               mem=20), s_cap=64))
    configs["convdiff_bicgstab"] = dict(
        {"n": ncd, "rtol": rtol},
        **measure("bicgstab", adapters.make_bicgstab(Acd, Mcd, bcd, rtol,
                                                     600), s_cap=64))
    # The general-sparse user path: the SAME problem handed over as CSR,
    # routed through the one-time hybrid analysis (DIA peel + SELL
    # remainder) and the general (non-fused) GMRES core.
    if on_tpu:
        from krylov_tpu import as_operator
        from krylov_tpu.ops.sparse import csr_from_coo
        ddc = np.asarray(Dcd.data)
        hr, hc, hv = [], [], []
        for di, k in enumerate(Dcd.offsets):
            i = np.arange(max(0, -k), ncd - max(0, k))
            j = i + k
            keep = ddc[di, j] != 0
            hr.append(i[keep]); hc.append(j[keep]); hv.append(ddc[di, j][keep])
        csr_cd = csr_from_coo(np.concatenate(hr), np.concatenate(hc),
                              np.concatenate(hv), (ncd, ncd), dtype=dtype)
        Ahyb = as_operator(csr_cd)
        configs["convdiff_gmres20_csr_hybrid"] = dict(
            {"n": ncd, "rtol": rtol, "mem": 20, "nnz": int(csr_cd.nnz)},
            **measure("gmres_csr_hybrid",
                      adapters.make_gmres(Ahyb, Mcd, bcd, rtol, 600,
                                          mem=20), s_cap=64))
    if on_tpu:
        pdcd = DIAOperator(Dcd)._pd
        configs["convdiff_gmres20_fused"] = dict(
            {"n": ncd, "rtol": rtol, "mem": 20},
            **measure("gmres_fused", adapters.make_gmres_fused(
                pdcd, Dcd.offsets, bcd, rtol, 600, mem=20), s_cap=64))
        configs["convdiff_bicgstab_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("bicgstab_fused", adapters.make_bicgstab_fused(
                pdcd, Dcd.offsets, bcd, rtol, 600), s_cap=64))

    # ------------------------------------------------------------------
    # 3. LSQR / LSMR on tall dense least squares, λ = 1
    # ------------------------------------------------------------------
    mls, nls = (4096, 2048) if on_tpu else (120, 60)
    rng = np.random.default_rng(0)
    # column scaling spreads the singular values (κ ~ 10²) so the Golub-
    # Kahan methods do real work instead of converging in a handful of steps
    col_scale = np.logspace(-2, 0, nls)
    Als = MatrixOperator(jnp.asarray(
        (rng.standard_normal((mls, nls)) * col_scale).astype(dtype)
        / np.sqrt(mls)))
    bls = jnp.asarray(rng.standard_normal(mls).astype(dtype))
    log("bench: lsqr/lsmr...")
    configs["lsqr_reg"] = dict(
        {"shape": [mls, nls], "lam": 0.1},
        **measure("lsqr", adapters.make_lsqr(Als, bls, rtol, 400, lam=0.1)))
    configs["lsmr_reg"] = dict(
        {"shape": [mls, nls], "lam": 0.1},
        **measure("lsmr", adapters.make_lsmr(Als, bls, rtol, 400, lam=0.1)))
    if on_tpu:
        # fused LSQR on the conv-diff stencil (square DIA, unsymmetric)
        op_lf = DIAOperator(Dcd)
        pd_lf = op_lf._pd
        pda_lf, offs_adj = op_lf.aligned_adjoint()
        configs["convdiff_lsqr_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("lsqr_fused", adapters.make_lsqr_fused(
                pd_lf, pda_lf, Dcd.offsets, offs_adj, bcd, rtol, 1200),
                s_cap=64))
        configs["convdiff_lsmr_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("lsmr_fused", adapters.make_lsmr_fused(
                pd_lf, pda_lf, Dcd.offsets, offs_adj, bcd, rtol, 1200),
                s_cap=64))

    # ------------------------------------------------------------------
    # 4. TriCG / TriMR / GPMR on SQD saddle-point systems
    # ------------------------------------------------------------------
    nsp = 1024 if on_tpu else 48
    Asp_ = jnp.asarray(
        rng.standard_normal((nsp, nsp)).astype(dtype) / np.sqrt(nsp))
    Asp = MatrixOperator(Asp_)
    AspT = MatrixOperator(Asp_.T)
    bsp = jnp.ones(nsp, dtype)
    csp = -jnp.ones(nsp, dtype)
    log("bench: saddle tricg/trimr/gpmr...")
    configs["saddle_tricg"] = dict(
        {"n": 2 * nsp},
        **measure("tricg", adapters.make_tricg(Asp, bsp, csp, rtol, 500)))
    configs["saddle_trimr"] = dict(
        {"n": 2 * nsp},
        **measure("trimr", adapters.make_trimr(Asp, bsp, csp, rtol, 500)))
    configs["saddle_gpmr"] = dict(
        {"n": 2 * nsp, "mem": 20},
        **measure("gpmr", adapters.make_gpmr(Asp, AspT, bsp, csp, rtol, 500,
                                             mem=20), s_cap=64))
    if on_tpu:
        # fused saddle kernels on the Poisson stencil (48³ per block)
        Dtri = poisson_dia(48, 48, 48, dtype=dtype)
        op_tri = DIAOperator(Dtri, use_pallas=True)
        pda_tri, offs_adj_tri = op_tri.aligned_adjoint()
        ntri = Dtri.shape[0]
        btri = jnp.asarray(rng.standard_normal(ntri).astype(dtype))
        ctri = jnp.asarray(rng.standard_normal(ntri).astype(dtype))
        for v in ("tricg", "trimr"):
            configs[f"saddle_{v}_fused"] = dict(
                {"n": 2 * ntri},
                **measure(f"{v}_fused", adapters.make_tri_fused(
                    v, op_tri._pd, pda_tri, Dtri.offsets, offs_adj_tri,
                    btri, ctri, rtol, 2 * ntri), s_cap=64))
        configs["saddle_gpmr_fused"] = dict(
            {"n": 2 * ntri, "mem": 48},
            **measure("gpmr_fused", adapters.make_gpmr_fused(
                op_tri._pd, pda_tri, Dtri.offsets, offs_adj_tri,
                btri, ctri, rtol, 48, mem=48), s_cap=16))

    # ------------------------------------------------------------------
    # 5. Block-GMRES (multi-RHS) + CG-LANCZOS-SHIFT (multi-shift)
    # ------------------------------------------------------------------
    Nbg = 32 if on_tpu else 8
    Dbg = poisson_dia(Nbg, Nbg, Nbg, dtype=dtype)
    # shift the stencil by +0.5 so restarted GMRES converges briskly
    Dbg = DIAMatrix(Dbg.data.at[3].add(0.5), Dbg.offsets, Dbg.shape)
    Abg = DIAOperator(Dbg)
    nbg = Dbg.shape[0]
    p = 4
    # full-rank random block (a rank-deficient rhs block — e.g. scaled
    # copies of one vector — is a degenerate multi-RHS benchmark: the
    # block space collapses to a single Krylov direction)
    Bbg = jnp.asarray(rng.standard_normal((nbg, p)).astype(dtype))
    log("bench: block_gmres / cg_lanczos_shift...")
    configs["block_gmres_shifted_poisson"] = dict(
        {"n": nbg, "p": p, "mem": 32, "shift": 0.5},
        **measure("block_gmres", adapters.make_block_gmres(
            Abg, Bbg, rtol, 1000, mem=32), s_cap=64))
    if on_tpu:
        configs["block_gmres_fused"] = dict(
            {"n": nbg, "p": p, "mem": 32, "shift": 0.5},
            **measure("block_gmres_fused", adapters.make_block_gmres_fused(
                Abg._pd, Dbg.offsets, Bbg, rtol, 1000, mem=32, p=p),
                s_cap=64))
        configs["block_minres_fused"] = dict(
            {"n": nbg, "p": p, "shift": 0.5},
            **measure("block_minres_fused",
                      adapters.make_block_minres_fused(
                          Abg._pd, Dbg.offsets, Bbg, rtol, 1000, p=p),
                      s_cap=64))
    shifts = jnp.asarray([0.5, 1.0, 2.0], dtype)
    configs["cg_lanczos_shift_poisson"] = dict(
        {"n": n, "nshifts": 3},
        **measure("cg_lanczos_shift", adapters.make_cg_lanczos_shift(
            op, b, shifts, rtol, 500)))
    if on_tpu:
        configs["cg_lanczos_shift_fused"] = dict(
            {"n": n, "nshifts": 3},
            **measure("cg_lanczos_shift_fused",
                      adapters.make_cg_lanczos_shift_fused(
                          op._pd, D.offsets, b, shifts, rtol, 500),
                      s_cap=64))

    # ------------------------------------------------------------------
    # Batched small-systems solves (kt.batched_solve story): 256 dense
    # SPD systems of n=256, one compiled program.
    # ------------------------------------------------------------------
    if on_tpu:
        log("bench: batched cg...")
        rng_b = np.random.default_rng(0)
        nb_b, n_b = 256, 256
        Qb = rng_b.standard_normal((nb_b, n_b, n_b)).astype(dtype)
        As_b = jnp.asarray(Qb @ np.transpose(Qb, (0, 2, 1)) / n_b
                           + 2.0 * np.eye(n_b, dtype=dtype))
        Bs_b = jnp.asarray(
            rng_b.standard_normal((nb_b, n_b)).astype(dtype))
        bat = measure("batched_cg", adapters.make_batched_cg(
            As_b, Bs_b, 1e-5, 3 * n_b), s_cap=64)
        bat["nb"] = nb_b
        bat["n"] = n_b
        # derive only from a real differenced time, never the
        # noise-floor fallback (it omits device_ms_per_solve)
        bat["us_per_system"] = round(
            bat["device_ms_per_solve"] / nb_b * 1e3, 3) \
            if "device_ms_per_solve" in bat else None
        configs["batched_cg_256x256"] = bat

    # ------------------------------------------------------------------
    # BELL (block-ELL) MXU kernel
    # ------------------------------------------------------------------
    bell_gnnz = None
    if on_tpu:
        log("bench: bell...")
        from krylov_tpu.ops.pallas_spmv import BELLMatrix, bell_spmv
        bs = 128
        nb = 96
        nB = nb * bs
        blocks_per_row = 3
        data = jnp.asarray(
            rng.standard_normal((nb, blocks_per_row, bs, bs)) / bs, dtype)
        idx = np.zeros((nb, blocks_per_row), np.int32)
        for i in range(nb):
            idx[i] = [max(0, i - 1), i, min(nb - 1, i + 1)]
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
        bell_gnnz = nb * blocks_per_row * bs * bs / bell_t / 1e9
        log(f"bench: bell = {bell_gnnz:.1f} Gnnz/s")

    # ------------------------------------------------------------------
    # General-sparse path: hybrid analysis of CSR input + SELL remainder
    # ------------------------------------------------------------------
    hyb_gnnz = sell_gnnz = None
    if on_tpu:
        from krylov_tpu.ops.sparse import csr_from_coo
        from krylov_tpu.ops.hybrid import hybrid_from_csr, hybrid_spmv
        from krylov_tpu.ops.pallas_sell import sell_from_csr, sell_spmv

        def spmv_time(fn, A_, x, K=256):
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
                t1s.append(_timed(lambda: float(g1(A_, x))))
                tKs.append(_timed(lambda: float(gK(A_, x))))
            return ((statistics.median(tKs) - statistics.median(t1s))
                    / (K - 1))

        log("bench: hybrid conv-diff CSR...")
        Dh = convdiff_dia(128, 128, 128, dtype=np.float32)
        nh = Dh.shape[0]
        ddh = np.asarray(Dh.data)
        hr, hc, hv = [], [], []
        for di, k in enumerate(Dh.offsets):
            i = np.arange(max(0, -k), nh - max(0, k))
            j = i + k
            keep = ddh[di, j] != 0
            hr.append(i[keep]); hc.append(j[keep]); hv.append(ddh[di, j][keep])
        csr_h = csr_from_coo(np.concatenate(hr), np.concatenate(hc),
                             np.concatenate(hv), (nh, nh), dtype=np.float32)
        H = hybrid_from_csr(csr_h)
        t_h = spmv_time(hybrid_spmv, H, jnp.ones(nh, jnp.float32))
        hyb_gnnz = H.nnz / t_h / 1e9
        log(f"bench: hybrid convdiff 128^3 CSR = {hyb_gnnz:.1f} Gnnz/s")

        log("bench: sell fem-like...")
        from krylov_tpu.ops.pallas_sell import (sell_bucketed_from_csr,
                                                sell_bucketed_spmv,
                                                SELLBucketed)
        nf, degf, wf = 1 << 17, 12, 300
        rngf = np.random.default_rng(0)
        fr = np.repeat(np.arange(nf, dtype=np.int64), degf)
        fc = np.clip(fr + rngf.integers(-wf, wf + 1, size=fr.size), 0, nf - 1)
        Sf = sell_bucketed_from_csr(csr_from_coo(
            fr, fc, rngf.standard_normal(fr.size).astype(np.float32),
            (nf, nf), dtype=np.float32))
        fn_s = (sell_bucketed_spmv if isinstance(Sf, SELLBucketed)
                else sell_spmv)
        t_s = spmv_time(fn_s, Sf, jnp.ones(nf, jnp.float32))
        sell_gnnz = Sf.nnz / t_s / 1e9
        log(f"bench: sell fem = {sell_gnnz:.1f} Gnnz/s (fill {Sf.fill:.2f})")

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
            "harness": {
                "method": ("S-solves-in-one-jit differencing, "
                           f"median of {REPS}"),
                "tunnel_rtt_ms": round(rtt * 1e3, 2),
            },
            "spmv_64cubed_gnnz_per_s": round(spmv_small, 4),
            "spmv_bf16_64cubed_gnnz_per_s": (round(spmv_bf16, 4)
                                             if spmv_bf16 else None),
            "bell_blocktridiag_gnnz_per_s": (round(bell_gnnz, 4)
                                             if bell_gnnz else None),
            "hybrid_convdiff128_csr_gnnz_per_s": (round(hyb_gnnz, 4)
                                                  if hyb_gnnz else None),
            "sell_fem_gnnz_per_s": (round(sell_gnnz, 4)
                                    if sell_gnnz else None),
            "cpu_scipy_gnnz_per_s": round(cpu_nnz_per_s / 1e9, 4),
            "baseline_configs": configs,
        },
    }
    # legacy flat fields (round-1/2 continuity)
    d = out["detail"]
    if cg64 and "device_ms_per_solve" in cg64:
        d["cg_device_ms_per_solve_64cubed"] = cg64["device_ms_per_solve"]
        d["cg_us_per_iter_64cubed"] = cg64["device_us_per_iter"]
    if cg128 and "device_ms_per_solve" in cg128:
        d["cg_device_ms_per_solve_128cubed"] = cg128["device_ms_per_solve"]
    if mr64 and "device_ms_per_solve" in mr64:
        d["minres_device_ms_per_solve_64cubed"] = mr64["device_ms_per_solve"]

    # Full detail goes to a FILE (committable) and to stderr — NEVER to the
    # tail of stdout.  The driver captures only the last ~2000 chars of
    # stdout and json-parses them; round 3's single fat line outgrew that
    # window and the whole artifact recorded `parsed: null`.  The one
    # stdout line below is a compact headline guaranteed to fit.
    import os
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=1)
    log("bench: full detail -> " + detail_path)
    log(json.dumps(out))

    compact_cfgs = {}
    for name, c in configs.items():
        if not isinstance(c, dict):
            continue
        v = c.get("device_us_per_iter")
        if v is None:
            # nested configs (cg_poisson) carry sub-measurements
            for sub in c.values():
                if isinstance(sub, dict) and "device_us_per_iter" in sub:
                    v = sub["device_us_per_iter"]
                    break
        if v is None:
            fb = c.get("fallback_upper_bound_ms")
            v = f"<={fb}ms/solve" if fb is not None else None
        compact_cfgs[name] = v
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out["vs_baseline"],
        "detail": {
            "spmv_gnnz_per_s": {
                f"poisson_{N_big}cubed": round(spmv_big, 2),
                f"poisson_{N_small}cubed": round(spmv_small, 2),
                "hybrid_convdiff128_csr": (round(hyb_gnnz, 2)
                                           if hyb_gnnz else None),
                "bell": round(bell_gnnz, 2) if bell_gnnz else None,
                "sell_fem": round(sell_gnnz, 2) if sell_gnnz else None,
            },
            "device_us_per_iter": compact_cfgs,
            "full_detail_file": "BENCH_DETAIL.json",
        },
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1800 and compact_cfgs:
        # drop non-BASELINE extras first, never the five headline configs
        keep_first = ("cg_poisson", "convdiff_gmres20", "convdiff_bicgstab",
                      "lsqr_reg", "lsmr_reg", "saddle_tricg", "saddle_trimr",
                      "saddle_gpmr", "block_gmres_shifted_poisson",
                      "cg_lanczos_shift_poisson")
        droppable = [k for k in compact_cfgs if k not in keep_first]
        if not droppable:
            break
        compact_cfgs.pop(droppable[-1])
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
