"""Real-TPU validation + timing of the fused block-MINRES kernel.

32³ Poisson (SPD) and a −1.5-shifted indefinite variant, p = 4
full-rank random block: niter/status parity vs the general O(1) block
core, true block residuals at HIGHEST precision, device time by
S-in-one-jit median differencing.
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
from krylov_tpu.ops.pallas_fused import block_minres_dia_fused

N = 32
p = 4
D = poisson_dia(N, N, N, dtype=np.float32)
n = D.shape[0]
B = jnp.asarray(np.random.default_rng(0).standard_normal((n, p)),
                jnp.float32)

for shift, label in ((0.0, "spd"), (-1.5, "indefinite")):
    Ds = D if shift == 0 else DIAMatrix(D.data.at[3].add(shift), D.offsets,
                                        D.shape)
    opF = DIAOperator(Ds, use_pallas=True)
    opR = DIAOperator(Ds, use_pallas=False)
    t0 = time.time()
    Xf, stf = kt.block_minres(opF, B, atol=0.0, rtol=1e-6)
    wf = time.time() - t0
    Xr, sr = kt.block_minres(opR, B, atol=0.0, rtol=1e-6)
    with jax.default_matmul_precision("highest"):
        rf = float(jnp.linalg.norm(B - opR.matmat(Xf))
                   / jnp.linalg.norm(B))
    print(f"{label}: fused niter={stf.niter} {stf.status!r} "
          f"true={rf:.2e} (wall {wf:.1f}s) | general niter={sr.niter}",
          flush=True)
    assert stf.status == sr.status
    # f32 ulp drift accumulates over thousands of indefinite iterations
    # (2613 vs 2628 measured); both cores hit the same residual floor.
    assert abs(stf.niter - sr.niter) <= max(3, 0.02 * sr.niter)


def med_time(fn, arg, reps=5):
    float(fn(arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


opF = DIAOperator(D, use_pallas=True)
Xf, stf = kt.block_minres(opF, B, atol=0.0, rtol=1e-6)
itmax = 2 * (n // p)


def many(S):
    @jax.jit
    def run(Bv):
        def body(i, acc):
            out = block_minres_dia_fused(
                opF._pd, opF.dia.offsets, Bv + 0.0 * acc[0], 0.0, 1e-6,
                itmax, p=p)
            return (out[0], acc[1] + out[1])
        X, tot = jax.lax.fori_loop(0, S, body, (Bv, jnp.int32(0)))
        return jnp.sum(X) + tot
    return run


t1, tS = med_time(many(1), B), med_time(many(64), B)
per_solve = (tS - t1) / 63
print(f"fused block_minres 32^3 p4: t1={t1*1e3:.2f}ms tS={tS*1e3:.2f}ms "
      f"per_solve={per_solve*1e3:.3f}ms "
      f"per_iter={per_solve/max(int(stf.niter),1)*1e6:.2f}us "
      f"niter={int(stf.niter)}", flush=True)
