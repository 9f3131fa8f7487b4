"""Real-TPU study: compressed-basis (bf16) GENERAL-core GMRES.

Round-5 NEGATIVE result, kept so the experiment is not repeated.  A
prototype stored the general core's Krylov panel in bf16 (claims gated
on the pass-boundary TRUE residual) hoping to halve the CGS2 traffic
that floors the general path.  Measured on the bench BASELINE config 2
fixture (48³ convection-diffusion, Jacobi-ish M, mem = 20, rtol 1e-6):

  f32 panel   niter=186  43.3 µs/iter
  bf16 panel  niter=600 (itmax: bf16-basis floor sits right AT this
              tolerance on this fixture)  50.5 µs/iter

SLOWER, not faster: XLA materializes f32 copies of the bf16 panel for
the mixed-precision projection matmuls instead of fusing the widening
convert into the dot, so HBM reads do not shrink — and restarted
passes from bf16 directions stall near 1e-5/1e-6 here.  The prototype
was reverted; basis_dtype remains a fused-path feature (where the
panel lives in VMEM and compression genuinely doubles the admissible
problem size).  This script still runs the f32 general core for
regression tracking (the basis_dtype=... run now raises).
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
from krylov_tpu.solvers.gmres import _gmres_core  # noqa: E402
from benchmarks.adapters import _hi, _chk  # noqa: E402

N = 48
D = convdiff_dia(N, N, N, pe=0.3, dtype=np.float32)
n = D.shape[0]
A = DIAOperator(D)
M = DiagonalOperator(jnp.full(n, 1.0 / 6.0, jnp.float32))
b = jnp.ones(n, jnp.float32)


def make(bd):
    def solve(rhs):
        with _hi():
            st = _gmres_core(
                A, M, None, rhs, None, None, jnp.int32(600),
                jnp.int32(600), 0.0, 1e-6,
                mem=20, ldiv=False, restart=True, flexible=False,
                basis_dtype=bd,
                reorthogonalization=False, history=False, hist_len=0,
                callback=None, verbose=0, MisI=False, NisI=True)
        return st.iter, _chk(st.x), st.x
    return solve


def med_time(fn, reps=5):
    float(fn(b))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(b))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for label, bd in (("f32 ", None),):
    solve = make(bd)

    it, chk, x = jax.jit(lambda r: solve(r))(b)
    niter = int(it)
    with jax.default_matmul_precision("highest"):
        rel = float(jnp.linalg.norm(b - (A.matvec(x) / 6.0) * 6.0
                                    ) / jnp.linalg.norm(b))
        relM = float(jnp.linalg.norm(b - A.matvec(x))
                     / jnp.linalg.norm(b))

    def many(S, solve=solve):
        @jax.jit
        def run(rhs):
            def body(i, acc):
                it_, chk_, _ = solve(rhs + 0.0 * acc)
                return chk_ + 0.0 * acc + jnp.asarray(it_, chk_.dtype)
            return jax.lax.fori_loop(0, S, body,
                                     jnp.zeros((), jnp.float32))
        return run

    S = 14
    t1 = med_time(many(1))
    tS = med_time(many(S))
    per_solve = (tS - t1) / (S - 1)
    print(f"{label}: niter={niter} true_relres={relM:.2e} "
          f"per_solve={per_solve*1e3:.3f}ms "
          f"per_iter={per_solve/max(niter,1)*1e6:.2f}us", flush=True)
