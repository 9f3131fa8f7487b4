"""Real-TPU timing of the vector GMRES general path (chunk study).

Bench BASELINE config 2 fixture (48³ convection-diffusion, Jacobi-ish
left preconditioner, mem = 20).  Round-5 NEGATIVE result, kept so the
experiment is not repeated: the chunked active-rows CGS2 that wins on
the block core (solvers/block.py) does NOT transfer to the vector core
at this depth —

  full-basis (committed)             46.05 µs/iter
  2-D chunks of 5 rows               74.64 µs/iter  (sublane-misaligned
                                     slices force a relayout copy per
                                     chunk)
  3-D (⌈mem/8⌉, 8, n) chunked basis  48.12 µs/iter  (tile-aligned, but
                                     at mem=20 the 1-3 chunk
                                     quantization + fori overhead eats
                                     the halved traffic)

The vector basis at mem=20 is only 8.8 MB — chunking pays off when the
active fraction is small relative to per-trip overhead (the 17 MB
block basis at mem=32, p=4), not here.  This script now just times the
committed full-basis path for regression tracking.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from krylov_tpu.operators import DIAOperator, DiagonalOperator  # noqa
from krylov_tpu.ops.dia import convdiff_dia  # noqa: E402
from benchmarks import adapters  # noqa: E402

N = 48
D = convdiff_dia(N, N, N, pe=0.3, dtype=np.float32)
n = D.shape[0]
A = DIAOperator(D)
M = DiagonalOperator(jnp.full(n, 1.0 / 6.0, jnp.float32))
b = jnp.ones(n, jnp.float32)

solve, ops, rhs = adapters.make_gmres(A, M, b, 1e-6, 600, mem=20)


def med_time(fn, reps=5):
    float(fn(rhs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(rhs))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def many(S):
    @jax.jit
    def run(bv):
        def body(i, acc):
            it, chk = solve(ops, bv + 0.0 * acc)
            return chk + 0.0 * acc + jnp.asarray(it, chk.dtype)
        return jax.lax.fori_loop(0, S, body, jnp.zeros((), jnp.float32))
    return run


it, chk = jax.jit(lambda bv: solve(ops, bv))(rhs)
niter = int(it)
print(f"niter={niter} (BENCH_DETAIL recorded 186)", flush=True)

S = 14
t1 = med_time(many(1))
tS = med_time(many(S))
per_solve = (tS - t1) / (S - 1)
print(f"t1={t1*1e3:.2f}ms tS={tS*1e3:.2f}ms "
      f"per_solve={per_solve*1e3:.3f}ms "
      f"per_iter={per_solve/max(niter,1)*1e6:.2f}us "
      f"(pre-change BENCH_DETAIL: 46.05 us/iter)", flush=True)
