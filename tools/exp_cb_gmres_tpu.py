"""Real-TPU validation of compressed-basis (bf16) fused GMRES.

1. 48³ convection-diffusion, GMRES(20): niter/true-residual vs the f32
   basis and device time by S-in-one-jit differencing.
2. 96³ convection-diffusion, GMRES(20): admitted into the fused path
   ONLY by the bf16 basis (f32 panel exceeds the VMEM gate) — checks
   the gate arithmetic, convergence, and device time at 884k unknowns.
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
from krylov_tpu.ops.dia import convdiff_dia
from krylov_tpu.ops.pallas_fused import (gmres_dia_fused,
                                         gmres_dia_fused_supported)


def med_time(fn, arg, reps=5):
    float(fn(arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_call(call, pd_op, b, n, niter, label, S=64):
    # pd is a jit ARGUMENT (CLAUDE.md: closed-over arrays embed as HLO
    # constants and can trip the remote-compile tunnel's size limit)
    def many(S):
        @jax.jit
        def run(pd_, bv):
            def body(i, acc):
                out = call(pd_, bv + 0.0 * acc[0])
                return (out[0].reshape(-1)[:n], acc[1] + out[1])
            x, tot = jax.lax.fori_loop(0, S, body, (bv, jnp.int32(0)))
            return jnp.sum(x) + tot
        return lambda bv: run(pd_op, bv)

    t1, tS = med_time(many(1), b), med_time(many(S), b)
    per_solve = (tS - t1) / (S - 1)
    print(f"{label}: per_solve={per_solve*1e3:.3f}ms "
          f"per_iter={per_solve/max(niter,1)*1e6:.2f}us niter={niter}",
          flush=True)


# ---- 48³: parity + timing -------------------------------------------------
N = 48
D = convdiff_dia(N, N, N, pe=0.3, dtype=np.float32)
n = D.shape[0]
b = jnp.ones(n, jnp.float32)
opF = DIAOperator(D, use_pallas=True)
opR = DIAOperator(D, use_pallas=False)

x32, st32 = kt.gmres(opF, b, memory=20, restart=True, atol=0.0, rtol=1e-6)
xbf, stbf = kt.gmres(opF, b, memory=20, restart=True, atol=0.0, rtol=1e-6,
                     basis_dtype=jnp.bfloat16)
with jax.default_matmul_precision("highest"):
    r32 = float(jnp.linalg.norm(b - opR.matvec(x32)) / jnp.linalg.norm(b))
    rbf = float(jnp.linalg.norm(b - opR.matvec(xbf)) / jnp.linalg.norm(b))
print(f"48^3 f32 basis : niter={st32.niter} {st32.status!r} true={r32:.2e}",
      flush=True)
print(f"48^3 bf16 basis: niter={stbf.niter} {stbf.status!r} true={rbf:.2e}",
      flush=True)
assert stbf.solved and rbf <= 5 * r32 + 1e-5

itmax = 2 * n
time_call(lambda pd_, bv: gmres_dia_fused(pd_, opF.dia.offsets, bv, 0.0,
                                          1e-6, itmax, mem=20),
          opF._pd, b, n, int(st32.niter), "48^3 fused GMRES(20) f32 basis")
time_call(lambda pd_, bv: gmres_dia_fused(pd_, opF.dia.offsets, bv, 0.0,
                                          1e-6, itmax, mem=20,
                                          basis_dtype=jnp.bfloat16),
          opF._pd, b, n, int(stbf.niter), "48^3 fused GMRES(20) bf16 basis")

# ---- 96³: only the compressed basis fits the VMEM gate --------------------
N2 = 96
D2 = convdiff_dia(N2, N2, N2, pe=0.3, dtype=np.float32)
n2 = D2.shape[0]
b2 = jnp.ones(n2, jnp.float32)
op2 = DIAOperator(D2, use_pallas=True)
g32 = gmres_dia_fused_supported(D2.offsets, n2, jnp.float32, 20,
                                stencil_dtype=op2._pd.dtype)
gbf = gmres_dia_fused_supported(D2.offsets, n2, jnp.float32, 20,
                                stencil_dtype=op2._pd.dtype,
                                basis_dtype=jnp.bfloat16)
print(f"96^3 gate: f32 basis supported={g32}, bf16 basis supported={gbf}",
      flush=True)
assert not g32 and gbf

t0 = time.time()
x2, st2 = kt.gmres(op2, b2, memory=20, restart=True, atol=0.0, rtol=1e-6,
                   basis_dtype=jnp.bfloat16)
with jax.default_matmul_precision("highest"):
    r2 = float(jnp.linalg.norm(b2 - op2.matvec(x2)) / jnp.linalg.norm(b2))
print(f"96^3 bf16 basis: niter={st2.niter} {st2.status!r} true={r2:.2e} "
      f"(wall {time.time()-t0:.1f}s, n={n2})", flush=True)
time_call(lambda pd_, bv: gmres_dia_fused(pd_, op2.dia.offsets, bv, 0.0,
                                          1e-6, 2 * n2, mem=20,
                                          basis_dtype=jnp.bfloat16),
          op2._pd, b2, n2, int(st2.niter), "96^3 fused GMRES(20) bf16 basis",
          S=8)
