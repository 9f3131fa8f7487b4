"""Real-TPU timing of the chunked-CGS2 block-GMRES general path.

Bench BASELINE config 5 fixture (32³ Poisson + 0.5 shift, p = 4,
mem = 32): the round-5 chunked orthogonalization reads only the ACTIVE
8-block chunks of the basis per CGS pass (dynamically bounded
fori_loop) instead of the whole (mem+1, n, p) array four times per
iteration.  Compares device time per block-iteration against the
committed BENCH_DETAIL figure (156.3 µs/block-iter pre-change) and
asserts solution/niter parity with the recorded run.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import krylov_tpu as kt  # noqa: E402
from krylov_tpu.operators import DIAOperator  # noqa: E402
from krylov_tpu.ops.dia import poisson_dia, DIAMatrix  # noqa: E402
from benchmarks import adapters  # noqa: E402

N = 32
rng = np.random.default_rng(0)
D = poisson_dia(N, N, N, dtype=np.float32)
D = DIAMatrix(D.data.at[3].add(0.5), D.offsets, D.shape)
n = D.shape[0]
p = 4
B = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))
op = DIAOperator(D, use_pallas=True)

X, st = kt.block_gmres(op, B, memory=32, restart=True, atol=0.0,
                       rtol=1e-6)
with jax.default_matmul_precision("highest"):
    rel = float(jnp.linalg.norm(B - op.matmat(X)) / jnp.linalg.norm(B))
print(f"general chunked: niter={st.niter} {st.status!r} relres={rel:.2e}",
      flush=True)
assert st.solved and rel <= 2e-6, (st.status, rel)

solve, ops, rhs = adapters.make_block_gmres(op, B, 1e-6, 1000, mem=32)


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
    def run(Bv):
        def body(i, acc):
            it, chk = solve(ops, Bv + 0.0 * acc)
            return chk + 0.0 * acc + jnp.asarray(it, chk.dtype)
        return jax.lax.fori_loop(0, S, body, jnp.zeros((), jnp.float32))
    return run


S = 64
t1 = med_time(many(1))
tS = med_time(many(S))
per_solve = (tS - t1) / (S - 1)
niter = int(st.niter)
print(f"t1={t1*1e3:.2f}ms tS={tS*1e3:.2f}ms "
      f"per_solve={per_solve*1e3:.3f}ms "
      f"per_iter={per_solve/max(niter,1)*1e6:.2f}us niter={niter} "
      f"(pre-change BENCH_DETAIL: 156.3 us/block-iter)", flush=True)
