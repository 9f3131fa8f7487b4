"""Root-cause the bilqr fused-vs-general niter divergence (VERDICT r3 #3).

Runs bilqr through both cores on the FUSED_VALIDATION fixture and checks
the TRUE residuals of both returned (x, y) pairs in f64 on the host, plus
a small-n CPU comparison of the general core at f32 vs f64 to separate
"precision sensitivity" from "semantics divergence".
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
from krylov_tpu.ops.dia import poisson_dia
import scipy.sparse as sp

N = 48
DP = poisson_dia(N, N, N, dtype=np.float32)
n = DP.shape[0]
rng = np.random.default_rng(7)
b = jnp.asarray(rng.standard_normal(n), jnp.float32)
c = jnp.asarray(np.random.default_rng(11).standard_normal(n), jnp.float32)

A64 = sp.dia_matrix((np.asarray(DP.data, np.float64),
                     np.asarray(DP.offsets)), shape=(n, n)).tocsr()
b64 = np.asarray(b, np.float64)
c64 = np.asarray(c, np.float64)
bn, cn = np.linalg.norm(b64), np.linalg.norm(c64)

opP = DIAOperator(DP, use_pallas=True)
opPr = DIAOperator(DP, use_pallas=False)

for label, op in (("fused", opP), ("general", opPr)):
    t0 = time.time()
    x, y, st = kt.bilqr(op, b, c, atol=0.0, rtol=1e-6)
    wall = time.time() - t0
    x64 = np.asarray(x, np.float64)
    y64 = np.asarray(y, np.float64)
    rp = np.linalg.norm(b64 - A64 @ x64) / bn
    rd = np.linalg.norm(c64 - A64.T @ y64) / cn
    print(f"bilqr[{label:7s}] niter={st.niter:5d} primal_relres={rp:.3e} "
          f"dual_relres={rd:.3e} status={st.status!r} wall={wall:.2f}s",
          flush=True)

# small-problem general-core precision sensitivity (CPU-friendly size)
N2 = 16
DP2 = poisson_dia(N2, N2, N2, dtype=np.float32)
n2 = DP2.shape[0]
b2 = jnp.asarray(np.random.default_rng(7).standard_normal(n2), jnp.float32)
c2 = jnp.asarray(np.random.default_rng(11).standard_normal(n2), jnp.float32)
op2 = DIAOperator(DP2, use_pallas=False)
x, y, st = kt.bilqr(op2, b2, c2, atol=0.0, rtol=1e-6)
print(f"bilqr[general] 16^3 f32 niter={st.niter} status={st.status!r}",
      flush=True)
op2p = DIAOperator(poisson_dia(N2, N2, N2, dtype=np.float32),
                   use_pallas=True)
x, y, st = kt.bilqr(op2p, b2, c2, atol=0.0, rtol=1e-6)
print(f"bilqr[fused  ] 16^3 f32 niter={st.niter} status={st.status!r}",
      flush=True)
