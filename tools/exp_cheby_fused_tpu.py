"""Real-TPU validation + timing of the fused Chebyshev-preconditioned CG.

Checks niter/status parity of cg(M=ChebyshevPreconditioner) routed to
the in-kernel-polynomial fused kernel vs the general while_loop core,
true residuals at HIGHEST precision, and device time per solve by
S-in-one-jit median differencing (CLAUDE.md measurement rules), against
the unpreconditioned fused CG on the same problem.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import krylov_tpu as kt
from krylov_tpu import ChebyshevPreconditioner
from krylov_tpu.operators import DIAOperator
from krylov_tpu.ops.dia import poisson_dia
from krylov_tpu.ops.pallas_fused import cg_cheby_dia_fused, cg_dia_fused

N = 64
DP = poisson_dia(N, N, N, dtype=np.float32)
n = DP.shape[0]
b = jnp.asarray(np.random.default_rng(7).standard_normal(n), jnp.float32)
opF = DIAOperator(DP, use_pallas=True)
opR = DIAOperator(DP, use_pallas=False)

DEG = 8
LMAX = 12.2   # Poisson stencil upper bound (≤ 12 + margin)
LMIN = LMAX / 30.0

MF = ChebyshevPreconditioner(opF, degree=DEG, lmin=LMIN, lmax=LMAX)
MR = ChebyshevPreconditioner(opR, degree=DEG, lmin=LMIN, lmax=LMAX)

t0 = time.time()
xf, stf = kt.cg(opF, b, M=MF, atol=0.0, rtol=1e-6)
print(f"fused cheby:   niter={stf.niter} {stf.status!r} "
      f"(wall {time.time()-t0:.1f}s)", flush=True)
t0 = time.time()
xr, str_ = kt.cg(opR, b, M=MR, atol=0.0, rtol=1e-6)
print(f"general cheby: niter={str_.niter} {str_.status!r} "
      f"(wall {time.time()-t0:.1f}s)", flush=True)
x0, st0 = kt.cg(opF, b, atol=0.0, rtol=1e-6)
print(f"fused plain:   niter={st0.niter}", flush=True)

with jax.default_matmul_precision("highest"):
    for lbl, x in (("fused", xf), ("general", xr)):
        r = float(jnp.linalg.norm(b - opR.matvec(x))
                  / jnp.linalg.norm(b))
        print(f"true relres {lbl}: {r:.3e}", flush=True)
assert stf.status == str_.status
assert abs(stf.niter - str_.niter) <= 1


def med_time(fn, arg, reps=5):
    float(fn(arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_call(call, niter, label, S=64):
    def many(S):
        @jax.jit
        def run(bv):
            def body(i, acc):
                out = call(bv + 0.0 * acc[0])
                return (out[0].reshape(-1)[:n], acc[1] + out[1])
            x, tot = jax.lax.fori_loop(0, S, body, (bv, jnp.int32(0)))
            return jnp.sum(x) + tot
        return run

    t1, tS = med_time(many(1), b), med_time(many(S), b)
    per_solve = (tS - t1) / (S - 1)
    print(f"{label}: t1={t1*1e3:.2f}ms tS={tS*1e3:.2f}ms "
          f"per_solve={per_solve*1e3:.3f}ms "
          f"per_iter={per_solve/max(niter,1)*1e6:.2f}us niter={niter}",
          flush=True)
    return per_solve


lmin_d = jnp.asarray(LMIN, jnp.float32)
lmax_d = jnp.asarray(LMAX, jnp.float32)
itmax = jnp.asarray(2 * n, jnp.int32)

pc = time_call(
    lambda bv: cg_cheby_dia_fused(opF._pd, opF.dia.offsets, bv, 0.0, 1e-6,
                                  itmax, lmin_d, lmax_d, DEG),
    int(stf.niter), "fused cheby CG 64^3")
pp = time_call(
    lambda bv: cg_dia_fused(opF._pd, opF.dia.offsets, bv, 0.0, 1e-6, itmax),
    int(st0.niter), "fused plain CG 64^3")
print(f"end-to-end speedup from preconditioning: {pp/pc:.2f}x", flush=True)
