import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import krylov_tpu as kt
from krylov_tpu.ops.dia import convdiff_dia, poisson_dia, dia_spmv
from krylov_tpu.operators import DIAOperator

N = 48
D = convdiff_dia(N, N, N, pe=0.3, dtype=np.float32)
A = DIAOperator(D)
n = N**3
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
t0 = time.perf_counter()
x, st = kt.gmres(A, b, atol=0.0, rtol=1.5e-8, memory=20, precision="double_word")
t1 = time.perf_counter()
Dp64 = np.asarray(D.data, np.float64)
import krylov_tpu.ops.dia as dm
r = np.asarray(b, np.float64) - np.asarray(dia_spmv(jnp.asarray(Dp64), D.offsets, jnp.asarray(x)))
rel = np.linalg.norm(r)/np.linalg.norm(np.asarray(b, np.float64))
print("gmres dw: niter", st.niter, "status", st.status, "true relres", f"{rel:.3e}", "wall", f"{t1-t0:.2f}s")

# minres dw on shifted poisson
P = poisson_dia(N, N, N, dtype=np.float32)
k0 = list(P.offsets).index(0)
pd = np.asarray(P.data).copy(); pd[k0] -= 2.0
from krylov_tpu.ops.dia import DIAMatrix
S = DIAMatrix(jnp.asarray(pd), P.offsets, P.shape)
t0 = time.perf_counter()
x2, st2 = kt.minres(DIAOperator(S), b, atol=0.0, rtol=1.5e-8, precision="double_word")
t1 = time.perf_counter()
r2 = np.asarray(b, np.float64) - np.asarray(dia_spmv(jnp.asarray(np.asarray(S.data, np.float64)), S.offsets, jnp.asarray(x2)))
rel2 = np.linalg.norm(r2)/np.linalg.norm(np.asarray(b, np.float64))
print("minres dw: niter", st2.niter, "status", st2.status, "true relres", f"{rel2:.3e}", "wall", f"{t1-t0:.2f}s")
