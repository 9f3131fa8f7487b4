#!/usr/bin/env python
"""Benchmark harness — prints ONE compact JSON line (final stdout line,
kept under ~1800 chars so the driver's 2000-char tail capture parses it);
the full per-config detail is written to BENCH_DETAIL.json and stderr.

Survivability contract (round-4 lesson: the driver killed the run at its
own timeout and the artifact recorded rc=124/parsed:null):

* a HARD TIME BUDGET (``BENCH_BUDGET_S`` env, default 1500 s) is checked
  before every stage; stages that don't fit are skipped with a note;
* stages run HEADLINE-FIRST (SpMV + the five BASELINE configs before any
  fused variant or extra), so an early exit still covers BASELINE.md;
* the compact stdout line is re-printed after EVERY stage and once more
  from a ``finally:`` — plus SIGTERM/SIGINT handlers print-and-exit — so
  even an external kill leaves a parseable line in the stdout tail.

Headline metric: SpMV throughput (Gnnz/s/chip) for the reference's
get_div_grad 3-D Poisson operator at 128³ (Pallas DIA stencil kernel,
bf16 diagonal storage / f32 accumulate — CG niter parity vs f32 storage
is asserted in-run; both storage numbers are reported).

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
import os
import signal
import statistics
import sys
import time

import numpy as np

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T_START = time.monotonic()


def remaining():
    return BUDGET_S - (time.monotonic() - T_START)


def log(msg):
    print(f"[{time.monotonic() - T_START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


class BenchKilled(Exception):
    pass


class StageSkip(Exception):
    """Raised by a stage whose prerequisite stage was skipped/failed."""


class Emitter:
    """Holds the running result state; re-emits artifact + compact line."""

    def __init__(self):
        self.headline = {"metric": "spmv_nnz_per_s_chip", "value": None,
                         "unit": "Gnnz/s", "vs_baseline": None}
        self.spmv = {}
        self.configs = {}
        self.detail_extra = {}
        self.skipped = []
        self._last_line = None

    def compact(self):
        compact_cfgs = {}
        for name, c in self.configs.items():
            if not isinstance(c, dict):
                continue
            v = c.get("device_us_per_iter")
            if v is None:
                for sub in c.values():
                    if isinstance(sub, dict) and "device_us_per_iter" in sub:
                        v = sub["device_us_per_iter"]
                        break
            if v is None:
                fb = c.get("fallback_upper_bound_ms")
                v = f"<={fb}ms/solve" if fb is not None else None
            compact_cfgs[name] = v
        compact = {
            "metric": self.headline["metric"],
            "value": self.headline["value"],
            "unit": self.headline["unit"],
            "vs_baseline": self.headline["vs_baseline"],
            "detail": {
                "spmv_gnnz_per_s": {k: (round(v, 2) if v else v)
                                    for k, v in self.spmv.items()},
                "device_us_per_iter": compact_cfgs,
                "elapsed_s": round(time.monotonic() - T_START, 1),
                "skipped": self.skipped or None,
                "full_detail_file": "BENCH_DETAIL.json",
            },
        }
        line = json.dumps(compact, separators=(",", ":"))
        keep_first = ("cg_poisson", "convdiff_gmres20", "convdiff_bicgstab",
                      "lsqr_reg", "lsmr_reg", "saddle_tricg", "saddle_trimr",
                      "saddle_gpmr", "block_gmres_shifted_poisson",
                      "cg_lanczos_shift_poisson")
        while len(line) > 1800 and compact_cfgs:
            droppable = [k for k in compact_cfgs if k not in keep_first]
            if not droppable:
                break
            compact_cfgs.pop(droppable[-1])
            line = json.dumps(compact, separators=(",", ":"))
        return line

    def emit(self, final=False):
        out = dict(self.headline)
        out["detail"] = dict(self.detail_extra)
        out["detail"]["spmv_gnnz_per_s"] = self.spmv
        out["detail"]["baseline_configs"] = self.configs
        out["detail"]["skipped_stages"] = self.skipped
        out["detail"]["elapsed_s"] = round(time.monotonic() - T_START, 1)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAIL.json")
        try:
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
        except Exception:
            pass
        self._last_line = self.compact()
        # Full-line stdout reprint after every stage: whatever kills the
        # process later, the tail holds a complete parseable line.
        print(self._last_line, flush=True)


EM = Emitter()


def _die(signum, frame):
    # external kill (driver timeout sends TERM): make the compact line the
    # very last stdout output and stop immediately.
    try:
        print(EM._last_line or EM.compact(), flush=True)
    finally:
        os._exit(0)


signal.signal(signal.SIGTERM, _die)
signal.signal(signal.SIGINT, _die)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


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
    log(f"bench: device={dev} dtype={np.dtype(dtype)} "
        f"budget={BUDGET_S:.0f}s")

    REPS = 5

    def fetch2(pair):
        it, chk = jax.device_get(pair)
        return int(it), float(chk)

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
    # host scipy CSR baseline (cheap, host-only — needed by the headline)
    # ------------------------------------------------------------------
    import scipy.sparse as sp
    N_big = 128 if on_tpu else 32
    N_small = 64 if on_tpu else 16
    Db = poisson_dia(N_big, N_big, N_big, dtype=dtype)
    A_csr = sp.dia_matrix((np.asarray(Db.data), np.asarray(Db.offsets)),
                          shape=(N_big ** 3, N_big ** 3)).tocsr()
    xb_h = np.ones(N_big ** 3, dtype=dtype)
    A_csr @ xb_h
    t0 = time.perf_counter()
    for _ in range(5):
        A_csr @ xb_h
    cpu_nnz_per_s = Db.nnz / ((time.perf_counter() - t0) / 5)
    EM.detail_extra.update({
        "problem": f"get_div_grad({N_big}^3) DIA, Pallas stencil, "
                   f"bf16 storage / f32 accumulate",
        "device": str(dev), "dtype": str(np.dtype(dtype)),
        "harness": {"method": ("S-solves-in-one-jit differencing, "
                               f"median of {REPS}"),
                    "tunnel_rtt_ms": round(rtt * 1e3, 2),
                    "budget_s": BUDGET_S},
        "cpu_scipy_gnnz_per_s": round(cpu_nnz_per_s / 1e9, 4),
    })

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

        def make_loop(k):
            @jax.jit
            def loop(pd_, x):
                def body(_, v):
                    y = dia_spmv_pallas(pd_, D.offsets, v)
                    return y.astype(x.dtype)
                return jnp.sum(jax.lax.fori_loop(0, k, body, x)
                               .astype(jnp.float32))
            return loop

        # Difference two chain lengths so the fixed per-dispatch cost
        # (~28 ms tunnel RTT) drops out — dividing the raw wall time by
        # K instead adds RTT/K of phantom per-application cost (35 µs
        # at K=800, which understated the 128³ headline by ~35%); the
        # solver configs' S-in-one-jit harness already differences.
        Kq = K // 4                    # may be 0: an empty chain is a
        loopK, loopQ = make_loop(K), make_loop(Kq)  # valid intercept leg
        float(loopK(pd, b))
        float(loopQ(pd, b))
        bestK = bestQ = float("inf")
        for t in range(3):
            xin = jnp.full(n, 1.0 + 0.01 * t, dtype)
            t0 = time.perf_counter()
            float(loopK(pd, xin))
            bestK = min(bestK, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(loopQ(pd, xin))
            bestQ = min(bestQ, time.perf_counter() - t0)
        per = (bestK - bestQ) / (K - Kq)
        if per <= 0:
            # timing noise swamped the spread (short chains / noisy
            # host): report the raw upper bound honestly, never an
            # absurd clamped throughput
            log(f"bench: spmv N={N} slope non-positive, "
                "falling back to raw/K upper bound")
            per = bestK / K
        return D.nnz / per / 1e9

    rtol = 1e-6 if on_tpu else 1e-8
    configs = EM.configs

    def dia_to_csr(Dm, dtype_):
        from krylov_tpu.ops.sparse import csr_from_coo
        nn = Dm.shape[0]
        dd = np.asarray(Dm.data)
        hr, hc, hv = [], [], []
        for di, k in enumerate(Dm.offsets):
            i = np.arange(max(0, -k), nn - max(0, k))
            j = i + k
            keep = dd[di, j] != 0
            hr.append(i[keep]); hc.append(j[keep]); hv.append(dd[di, j][keep])
        return csr_from_coo(np.concatenate(hr), np.concatenate(hc),
                            np.concatenate(hv), (nn, nn), dtype=dtype_)

    # Each stage below is (name, min_seconds_needed, thunk).  Stages run in
    # priority order; a stage that doesn't fit the remaining budget is
    # skipped and recorded.  EM.emit() after every stage keeps the artifact
    # and the stdout tail parseable at all times.

    def stage_spmv_headline():
        spmv_big = spmv_gnnz(N_big)
        log(f"bench: spmv {N_big}^3 f32 = {spmv_big:.1f} Gnnz/s")
        EM.spmv[f"poisson_{N_big}cubed_f32"] = spmv_big
        if on_tpu:
            spmv_big_bf16 = spmv_gnnz(N_big, data_dtype=jnp.bfloat16)
            log(f"bench: spmv {N_big}^3 bf16 = {spmv_big_bf16:.1f} Gnnz/s")
            EM.spmv[f"poisson_{N_big}cubed_bf16"] = spmv_big_bf16
            head = spmv_big_bf16
        else:
            head = spmv_big
        EM.headline["value"] = round(head, 4)
        EM.headline["vs_baseline"] = round(head * 1e9 / cpu_nnz_per_s, 3)

    def stage_spmv_small():
        EM.spmv[f"poisson_{N_small}cubed_f32"] = spmv_gnnz(N_small)
        if on_tpu:
            EM.spmv[f"poisson_{N_small}cubed_bf16"] = spmv_gnnz(
                N_small, data_dtype=jnp.bfloat16)

    # --- BASELINE config 1: CG on SPD 3-D Poisson -----------------------
    N = N_small
    n = N ** 3
    D = poisson_dia(N, N, N, dtype=dtype)
    op = DIAOperator(D)
    b = jnp.ones(n, dtype)

    def stage_cg_library():
        x, stats = cg(op, b, atol=0.0, rtol=rtol)   # compile + converge
        best_cg = float("inf")
        for t in range(3):
            b2 = jnp.full(n, 1.0 + 0.01 * t, dtype)
            t0 = time.perf_counter()
            x, stats = cg(op, b2, atol=0.0, rtol=rtol)
            float(jnp.sum(x))
            best_cg = min(best_cg, time.perf_counter() - t0)
        configs["cg_poisson"] = {
            "n": n, "wallclock_library_call_s": round(best_cg, 5),
            "niter": stats.niter, "rtol": rtol,
            "note": "~28 ms of the wall-clock is one tunnel round trip",
        }

    def stage_cg_fused():
        if "cg_poisson" not in configs:
            raise StageSkip("cg_library did not run")
        configs["cg_poisson"]["fused_64cubed"] = measure(
            "cg_fused_64",
            adapters.make_cg_fused(op._pd, D.offsets, b, rtol, 2 * n))
        # bf16-storage parity check on the driver fixture (VERDICT r4 #8):
        # same stencil, diagonals stored bf16, f32 iteration arithmetic.
        pd16 = dia_align(D.data.astype(jnp.bfloat16), D.offsets, n)
        c16 = measure("cg_fused_64_bf16store", adapters.make_cg_fused(
            pd16, D.offsets, b, rtol, 2 * n))
        f32_niter = configs["cg_poisson"]["fused_64cubed"]["niter"]
        parity = bool(abs(c16["niter"] - f32_niter) <= 2)
        c16["niter_parity_vs_f32"] = parity
        configs["cg_poisson"]["fused_64cubed_bf16_storage"] = c16
        if not parity and on_tpu:
            # the advertised guard on the bf16 headline: demote to f32
            f32v = EM.spmv.get(f"poisson_{N_big}cubed_f32")
            if f32v:
                EM.headline["value"] = round(f32v, 4)
                EM.headline["vs_baseline"] = round(
                    f32v * 1e9 / cpu_nnz_per_s, 3)
                EM.detail_extra["headline_note"] = (
                    "bf16 storage failed CG niter parity; headline "
                    "demoted to f32 storage")
                log("bench: bf16 parity FAILED -> headline demoted to f32")

    def stage_gmres_bicgstab():
        Ncd = 48 if on_tpu else 12
        Dcd = convdiff_dia(Ncd, Ncd, Ncd, pe=0.3, dtype=dtype)
        ncd = Dcd.shape[0]
        Acd = DIAOperator(Dcd)
        Mcd = DiagonalOperator(jnp.full(ncd, 1.0 / 6.0, dtype))
        bcd = jnp.ones(ncd, dtype)
        configs["convdiff_gmres20"] = dict(
            {"n": ncd, "rtol": rtol, "mem": 20},
            **measure("gmres", adapters.make_gmres(Acd, Mcd, bcd, rtol, 600,
                                                   mem=20), s_cap=64))
        configs["convdiff_bicgstab"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("bicgstab", adapters.make_bicgstab(Acd, Mcd, bcd,
                                                         rtol, 600),
                      s_cap=64))
        stage_gmres_bicgstab.env = (Ncd, Dcd, ncd, Acd, Mcd, bcd)

    def stage_lsqr_lsmr():
        mls, nls = (4096, 2048) if on_tpu else (120, 60)
        rng = np.random.default_rng(0)
        # column scaling spreads the singular values (κ ~ 10²) so the
        # Golub-Kahan methods do real work
        col_scale = np.logspace(-2, 0, nls)
        Als = MatrixOperator(jnp.asarray(
            (rng.standard_normal((mls, nls)) * col_scale).astype(dtype)
            / np.sqrt(mls)))
        bls = jnp.asarray(rng.standard_normal(mls).astype(dtype))
        configs["lsqr_reg"] = dict(
            {"shape": [mls, nls], "lam": 0.1},
            **measure("lsqr", adapters.make_lsqr(Als, bls, rtol, 400,
                                                 lam=0.1)))
        configs["lsmr_reg"] = dict(
            {"shape": [mls, nls], "lam": 0.1},
            **measure("lsmr", adapters.make_lsmr(Als, bls, rtol, 400,
                                                 lam=0.1)))

    def stage_saddle():
        nsp = 1024 if on_tpu else 48
        rng = np.random.default_rng(0)
        Asp_ = jnp.asarray(
            rng.standard_normal((nsp, nsp)).astype(dtype) / np.sqrt(nsp))
        Asp = MatrixOperator(Asp_)
        AspT = MatrixOperator(Asp_.T)
        bsp = jnp.ones(nsp, dtype)
        csp = -jnp.ones(nsp, dtype)
        configs["saddle_tricg"] = dict(
            {"n": 2 * nsp},
            **measure("tricg", adapters.make_tricg(Asp, bsp, csp, rtol,
                                                   500)))
        configs["saddle_trimr"] = dict(
            {"n": 2 * nsp},
            **measure("trimr", adapters.make_trimr(Asp, bsp, csp, rtol,
                                                   500)))
        configs["saddle_gpmr"] = dict(
            {"n": 2 * nsp, "mem": 20},
            **measure("gpmr", adapters.make_gpmr(Asp, AspT, bsp, csp, rtol,
                                                 500, mem=20), s_cap=64))

    def stage_block_shift():
        rng = np.random.default_rng(0)
        Nbg = 32 if on_tpu else 8
        Dbg = poisson_dia(Nbg, Nbg, Nbg, dtype=dtype)
        # shift the stencil by +0.5 so restarted GMRES converges briskly
        Dbg = DIAMatrix(Dbg.data.at[3].add(0.5), Dbg.offsets, Dbg.shape)
        Abg = DIAOperator(Dbg)
        nbg = Dbg.shape[0]
        p = 4
        # full-rank random block (a rank-deficient rhs block is a
        # degenerate multi-RHS benchmark)
        Bbg = jnp.asarray(rng.standard_normal((nbg, p)).astype(dtype))
        configs["block_gmres_shifted_poisson"] = dict(
            {"n": nbg, "p": p, "mem": 32, "shift": 0.5},
            **measure("block_gmres", adapters.make_block_gmres(
                Abg, Bbg, rtol, 1000, mem=32), s_cap=64))
        shifts = jnp.asarray([0.5, 1.0, 2.0], dtype)
        configs["cg_lanczos_shift_poisson"] = dict(
            {"n": n, "nshifts": 3},
            **measure("cg_lanczos_shift", adapters.make_cg_lanczos_shift(
                op, b, shifts, rtol, 500)))
        stage_block_shift.env = (Abg, Dbg, Bbg, nbg, p, shifts)

    # ---- fused variants (after every BASELINE config has a number) ----

    def stage_cg_fused_128():
        if "cg_poisson" not in configs:
            raise StageSkip("cg_library did not run")
        D2 = poisson_dia(128, 128, 128, dtype=dtype)
        pd2 = dia_align(D2.data, D2.offsets, 128 ** 3)
        b2 = jnp.ones(128 ** 3, dtype)
        configs["cg_poisson"]["fused_128cubed"] = measure(
            "cg_fused_128", adapters.make_cg_fused(
                pd2, D2.offsets, b2, rtol, 2 * 128 ** 3), s_cap=64)

    def stage_minres_fused():
        if "cg_poisson" not in configs:
            raise StageSkip("cg_library did not run")
        eps = float(np.sqrt(np.finfo(dtype).eps))
        configs["cg_poisson"]["minres_fused_64cubed"] = measure(
            "minres_fused_64", adapters.make_minres_fused(
                op._pd, D.offsets, b, rtol, 2 * n, eps))

    def stage_convdiff_fused():
        if not hasattr(stage_gmres_bicgstab, "env"):
            raise StageSkip("gmres_bicgstab did not run")
        Ncd, Dcd, ncd, Acd, Mcd, bcd = stage_gmres_bicgstab.env
        pdcd = DIAOperator(Dcd)._pd
        configs["convdiff_gmres20_fused"] = dict(
            {"n": ncd, "rtol": rtol, "mem": 20},
            **measure("gmres_fused", adapters.make_gmres_fused(
                pdcd, Dcd.offsets, bcd, rtol, 600, mem=20), s_cap=64))
        configs["convdiff_bicgstab_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("bicgstab_fused", adapters.make_bicgstab_fused(
                pdcd, Dcd.offsets, bcd, rtol, 600), s_cap=64))

    def stage_lsqr_fused():
        if not hasattr(stage_gmres_bicgstab, "env"):
            raise StageSkip("gmres_bicgstab did not run")
        Ncd, Dcd, ncd, Acd, Mcd, bcd = stage_gmres_bicgstab.env
        op_lf = DIAOperator(Dcd)
        pda_lf, offs_adj = op_lf.aligned_adjoint()
        configs["convdiff_lsqr_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("lsqr_fused", adapters.make_lsqr_fused(
                op_lf._pd, pda_lf, Dcd.offsets, offs_adj, bcd, rtol, 1200),
                s_cap=64))
        configs["convdiff_lsmr_fused"] = dict(
            {"n": ncd, "rtol": rtol},
            **measure("lsmr_fused", adapters.make_lsmr_fused(
                op_lf._pd, pda_lf, Dcd.offsets, offs_adj, bcd, rtol, 1200),
                s_cap=64))

    def stage_saddle_fused():
        rng = np.random.default_rng(0)
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

    def stage_block_fused():
        if not hasattr(stage_block_shift, "env"):
            raise StageSkip("block_shift did not run")
        Abg, Dbg, Bbg, nbg, p, shifts = stage_block_shift.env
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
        configs["cg_lanczos_shift_fused"] = dict(
            {"n": n, "nshifts": 3},
            **measure("cg_lanczos_shift_fused",
                      adapters.make_cg_lanczos_shift_fused(
                          op._pd, D.offsets, b, shifts, rtol, 500),
                      s_cap=64))

    # ---- extras (nice-to-have; first to be skipped under deadline) ----

    def stage_gmres_csr_hybrid():
        if not hasattr(stage_gmres_bicgstab, "env"):
            raise StageSkip("gmres_bicgstab did not run")
        # The general-sparse user path: the SAME conv-diff problem handed
        # over as CSR, routed through the one-time hybrid analysis (DIA
        # peel + SELL remainder) and the general (non-fused) GMRES core.
        from krylov_tpu import as_operator
        from krylov_tpu.ops.sparse import csr_from_coo
        Ncd, Dcd, ncd, Acd, Mcd, bcd = stage_gmres_bicgstab.env
        csr_cd = dia_to_csr(Dcd, dtype)
        Ahyb = as_operator(csr_cd)
        configs["convdiff_gmres20_csr_hybrid"] = dict(
            {"n": ncd, "rtol": rtol, "mem": 20, "nnz": int(csr_cd.nnz)},
            **measure("gmres_csr_hybrid",
                      adapters.make_gmres(Ahyb, Mcd, bcd, rtol, 600,
                                          mem=20), s_cap=64))

    def stage_double_word():
        if "cg_poisson" not in configs:
            raise StageSkip("cg_library did not run")
        # fp64-grade solve from f32 storage (CG only in the bench — the
        # full per-method matrix lives in tests/test_precision.py)
        rng_dw = np.random.default_rng(7)
        bdw = jnp.asarray(rng_dw.standard_normal(n).astype(dtype))
        xdw, stdw = cg(op, bdw, atol=0.0, rtol=1.5e-8,
                       precision="double_word")
        t0 = time.perf_counter()
        xdw, stdw = cg(op, bdw, atol=0.0, rtol=1.5e-8,
                       precision="double_word")
        dw_wall = time.perf_counter() - t0
        A64 = sp.dia_matrix(
            (np.asarray(D.data, np.float64), np.asarray(D.offsets)),
            shape=(n, n)).tocsr()
        rres = np.asarray(bdw, np.float64) - A64 @ np.asarray(xdw,
                                                              np.float64)
        configs["cg_poisson"]["double_word_64cubed"] = {
            "niter": stdw.niter, "wallclock_s": round(dw_wall, 4),
            "rtol": 1.5e-8,
            "true_relres_f64": float(np.linalg.norm(rres)
                                     / np.linalg.norm(np.asarray(bdw))),
            "solved": stdw.solved}
        log(f"bench: cg dw niter={stdw.niter} wall={dw_wall:.3f}s")

    def stage_cheby():
        if "cg_poisson" not in configs:
            raise StageSkip("cg_library did not run")
        # Chebyshev-polynomial preconditioned fused CG (in-kernel matvecs)
        lmax_ch, deg_ch = 12.2, 8
        configs["cg_poisson"]["cheby_fused_64cubed"] = dict(
            {"degree": deg_ch, "lmin": round(lmax_ch / 120, 4),
             "lmax": lmax_ch},
            **measure("cg_cheby_fused", adapters.make_cg_cheby_fused(
                op._pd, D.offsets, b, rtol, 2 * n, lmax_ch / 120, lmax_ch,
                deg_ch), s_cap=64))

    def stage_batched():
        # Batched small-systems solves: 256 dense SPD systems of n=256,
        # one compiled program.
        rng_b = np.random.default_rng(0)
        nb_b, n_b = 256, 256
        Qb = rng_b.standard_normal((nb_b, n_b, n_b)).astype(dtype)
        As_b = jnp.asarray(Qb @ np.transpose(Qb, (0, 2, 1)) / n_b
                           + 2.0 * np.eye(n_b, dtype=dtype))
        Bs_b = jnp.asarray(rng_b.standard_normal((nb_b, n_b)).astype(dtype))
        bat = measure("batched_cg", adapters.make_batched_cg(
            As_b, Bs_b, 1e-5, 3 * n_b), s_cap=64)
        bat["nb"] = nb_b
        bat["n"] = n_b
        # derive only from a real differenced time, never the noise floor
        bat["us_per_system"] = round(
            bat["device_ms_per_solve"] / nb_b * 1e3, 3) \
            if "device_ms_per_solve" in bat else None
        configs["batched_cg_256x256"] = bat

    def _spmv_time(fn, A_, x, K=256):
        import jax
        import jax.numpy as jnp

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
        return ((statistics.median(tKs) - statistics.median(t1s)) / (K - 1))

    def stage_sell():
        from krylov_tpu.ops.sparse import csr_from_coo
        from krylov_tpu.ops.pallas_sell import (sell_bucketed_from_csr,
                                                sell_bucketed_spmv,
                                                sell_spmv, SELLBucketed)
        nf, degf, wf = 1 << 17, 12, 300
        rngf = np.random.default_rng(0)
        fr = np.repeat(np.arange(nf, dtype=np.int64), degf)
        fc = np.clip(fr + rngf.integers(-wf, wf + 1, size=fr.size), 0,
                     nf - 1)
        Sf = sell_bucketed_from_csr(csr_from_coo(
            fr, fc, rngf.standard_normal(fr.size).astype(np.float32),
            (nf, nf), dtype=np.float32))
        fn_s = (sell_bucketed_spmv if isinstance(Sf, SELLBucketed)
                else sell_spmv)
        t_s = _spmv_time(fn_s, Sf, jnp.ones(nf, jnp.float32))
        EM.spmv["sell_fem"] = Sf.nnz / t_s / 1e9
        log(f"bench: sell fem = {EM.spmv['sell_fem']:.1f} Gnnz/s "
            f"(fill {Sf.fill:.2f})")

    def stage_formats():
        from krylov_tpu.ops.pallas_spmv import BELLMatrix, bell_spmv
        from krylov_tpu.ops.sparse import csr_from_coo
        from krylov_tpu.ops.hybrid import hybrid_from_csr, hybrid_spmv
        rng = np.random.default_rng(0)
        bs, nb, blocks_per_row = 128, 96, 3
        nB = nb * bs
        data = jnp.asarray(
            rng.standard_normal((nb, blocks_per_row, bs, bs)) / bs, dtype)
        idx = np.zeros((nb, blocks_per_row), np.int32)
        for i in range(nb):
            idx[i] = [max(0, i - 1), i, min(nb - 1, i + 1)]
        A_bell = BELLMatrix(data, jnp.asarray(idx), (nB, nB), bs)
        t_b = _spmv_time(lambda A_, v: bell_spmv(A_, v) * (1.0 / 3.0),
                         A_bell, jnp.ones(nB, dtype), K=400)
        EM.spmv["bell_blocktridiag"] = nb * blocks_per_row * bs * bs \
            / t_b / 1e9
        log(f"bench: bell = {EM.spmv['bell_blocktridiag']:.1f} Gnnz/s")

        Dh = convdiff_dia(128, 128, 128, dtype=np.float32)
        nh = Dh.shape[0]
        csr_h = dia_to_csr(Dh, np.float32)
        H = hybrid_from_csr(csr_h)
        t_h = _spmv_time(hybrid_spmv, H, jnp.ones(nh, jnp.float32))
        EM.spmv["hybrid_convdiff128_csr"] = H.nnz / t_h / 1e9
        log(f"bench: hybrid = {EM.spmv['hybrid_convdiff128_csr']:.1f}")

    stages = [
        # (name, tpu_only, min seconds of budget it needs to start)
        ("spmv_headline", False, 60, stage_spmv_headline),
        ("cg_library", False, 60, stage_cg_library),
        ("cg_fused", True, 90, stage_cg_fused),
        ("gmres_bicgstab", False, 120, stage_gmres_bicgstab),
        ("lsqr_lsmr", False, 120, stage_lsqr_lsmr),
        ("saddle", False, 150, stage_saddle),
        ("block_shift", False, 120, stage_block_shift),
        ("spmv_small", False, 45, stage_spmv_small),
        ("cg_fused_128", True, 90, stage_cg_fused_128),
        ("minres_fused", True, 60, stage_minres_fused),
        ("convdiff_fused", True, 120, stage_convdiff_fused),
        ("lsqr_fused", True, 120, stage_lsqr_fused),
        ("saddle_fused", True, 150, stage_saddle_fused),
        ("block_fused", True, 150, stage_block_fused),
        ("gmres_csr_hybrid", True, 90, stage_gmres_csr_hybrid),
        ("double_word", True, 120, stage_double_word),
        ("cheby", True, 60, stage_cheby),
        ("batched", True, 90, stage_batched),
        ("formats", True, 150, stage_formats),
        # SELL packing + compile measured at ~950 s on-chip; gate on a
        # wide margin so it can't start and then overrun the budget
        ("sell", True, 1000, stage_sell),
    ]

    try:
        for name, tpu_only, need_s, fn in stages:
            if tpu_only and not on_tpu:
                continue
            if remaining() < need_s:
                log(f"bench: SKIP {name} (needs ~{need_s}s, "
                    f"{remaining():.0f}s left)")
                EM.skipped.append(name)
                continue
            log(f"bench: stage {name} ({remaining():.0f}s left)...")
            try:
                fn()
            except StageSkip as e:
                log(f"bench: SKIP {name} (dependency: {e})")
                EM.skipped.append(f"{name}:dep")
            except Exception as e:  # a stage must never kill the artifact
                log(f"bench: stage {name} FAILED: {type(e).__name__}: {e}")
                EM.skipped.append(f"{name}:error")
            EM.emit()
    finally:
        EM.emit(final=True)
        try:
            # keep the user-facing results page in lockstep with the
            # artifact; never allowed to break the bench contract
            import subprocess
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "gen_bench_doc.py")],
                check=False, capture_output=True, timeout=60)
        except Exception:
            pass
        log("bench: done, total %.1fs" % (time.monotonic() - T_START))


if __name__ == "__main__":
    main()
