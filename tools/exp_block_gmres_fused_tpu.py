"""Real-TPU validation + timing of the fused block-GMRES kernel.

Mirrors bench.py's BASELINE config 5 fixture (32³ Poisson + 0.5 shift,
p = 4 full-rank random block, mem = 32 → the full 128-column SMEM
triangle) plus a restart-exercising tighter-tolerance variant:
niter/status parity vs the general block core, true block residuals,
and device time by S-in-one-jit median differencing.  Also drives the
rank-deficient-block honesty path (rank-1 B) on the real chip.
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
from krylov_tpu.operators import DIAOperator
from krylov_tpu.ops.dia import poisson_dia, DIAMatrix
from krylov_tpu.ops.pallas_fused import block_gmres_dia_fused

N = 32
D = poisson_dia(N, N, N, dtype=np.float32)
D = DIAMatrix(D.data.at[3].add(0.5), D.offsets, D.shape)
n = D.shape[0]
p = 4
B = jnp.asarray(
    np.random.default_rng(0).standard_normal((n, p)), jnp.float32)
opF = DIAOperator(D, use_pallas=True)
opR = DIAOperator(D, use_pallas=False)

for mem, rtol in ((32, 1e-6), (16, 1e-8)):
    t0 = time.time()
    Xf, stf = kt.block_gmres(opF, B, memory=mem, restart=True, atol=0.0,
                             rtol=rtol)
    wf = time.time() - t0
    t0 = time.time()
    Xr, sr = kt.block_gmres(opR, B, memory=mem, restart=True, atol=0.0,
                            rtol=rtol)
    wr = time.time() - t0
    with jax.default_matmul_precision("highest"):
        rf = float(jnp.linalg.norm(B - opR.matmat(Xf))
                   / jnp.linalg.norm(B))
        rr = float(jnp.linalg.norm(B - opR.matmat(Xr))
                   / jnp.linalg.norm(B))
    print(f"mem={mem} rtol={rtol:.0e}: fused niter={stf.niter} "
          f"{stf.status!r} relres={rf:.2e} (wall {wf:.1f}s) | general "
          f"niter={sr.niter} relres={rr:.2e} (wall {wr:.1f}s)", flush=True)
    assert stf.status == sr.status
    assert abs(stf.niter - sr.niter) <= 2


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
        def run(Bv):
            def body(i, acc):
                out = call(Bv + 0.0 * acc[0])
                return (out[0], acc[1] + out[1])
            X, tot = jax.lax.fori_loop(0, S, body, (Bv, jnp.int32(0)))
            return jnp.sum(X) + tot
        return run

    t1, tS = med_time(many(1), B), med_time(many(S), B)
    per_solve = (tS - t1) / (S - 1)
    print(f"{label}: t1={t1*1e3:.2f}ms tS={tS*1e3:.2f}ms "
          f"per_solve={per_solve*1e3:.3f}ms "
          f"per_iter={per_solve/max(niter,1)*1e6:.2f}us niter={niter}",
          flush=True)


Xf, stf = kt.block_gmres(opF, B, memory=32, restart=True, atol=0.0,
                         rtol=1e-6)
itmax = 2 * (n // p)
time_call(
    lambda Bv: block_gmres_dia_fused(opF._pd, opF.dia.offsets, Bv, 0.0,
                                     1e-6, itmax, mem=32, p=p),
    int(stf.niter), "fused block_gmres 32^3 p4 mem32", S=64)

# Rank-deficient honesty on the real chip: a rank-1 block must not be
# reported converged at iteration 1 (stranded-pivot mass accounting).
B1 = jnp.stack([jnp.full(n, 1.0 + 0.2 * j, jnp.float32)
                for j in range(p)], axis=1)
Xk, it, rn, stt, inc, npp = block_gmres_dia_fused(
    opF._pd, opF.dia.offsets, B1, 0.0, 1e-6, itmax, mem=32, p=p)
with jax.default_matmul_precision("highest"):
    r1 = float(jnp.linalg.norm(B1 - opR.matmat(Xk)) / jnp.linalg.norm(B1))
print(f"rank-1 kernel: niter={int(it)} status={int(stt)} true={r1:.2e}",
      flush=True)
# the stop is on the Frobenius-norm estimate; per-column relres can sit
# a small factor above rtol
assert int(it) > 1 and r1 <= 1e-5, (int(it), r1)
X1, st1 = kt.block_gmres(opF, B1, memory=32, restart=True, atol=0.0,
                         rtol=1e-6)
print(f"rank-1 public routes to general: niter={st1.niter} "
      f"{st1.status!r}", flush=True)
