"""One-shot real-TPU validation of the batch-2 fused kernels.

Covers the five kernels added after the last on-chip run:
CG-LANCZOS-SHIFT, CGS, CGLS, CRLS, CGNE/CRMR.  For each, checks
niter/status parity of the fused whole-solve kernel against the general
while_loop core and the true residual at HIGHEST precision, then times
the fused kernel with S-in-one-jit median differencing (CLAUDE.md
round-2 lesson: the tunnel costs ~28 ms/RTT and does not pipeline).
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
from krylov_tpu.ops.dia import poisson_dia, convdiff_dia

N = 48
DP = poisson_dia(N, N, N, dtype=np.float32)
DC = convdiff_dia(N, N, N, dtype=np.float32)
n = DP.shape[0]
rng = np.random.default_rng(7)
b = jnp.asarray(rng.standard_normal(n), jnp.float32)

opP_fast, opP_ref = DIAOperator(DP, use_pallas=True), DIAOperator(DP, use_pallas=False)
opC_fast, opC_ref = DIAOperator(DC, use_pallas=True), DIAOperator(DC, use_pallas=False)


def med_time(fn, arg, reps=5):
    float(fn(arg))  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_fused(call, niter, label):
    """S-in-one-jit median differencing over the raw fused kernel call."""
    def many(S):
        @jax.jit
        def run(bv):
            def body(i, acc):
                out = call(bv + 0.0 * acc[0])
                return (out[0].reshape(-1)[:n], acc[1] + out[1])
            x, tot = jax.lax.fori_loop(0, S, body, (bv, jnp.int32(0)))
            return jnp.sum(x) + tot
        return run

    t1, t64 = med_time(many(1), b), med_time(many(64), b)
    per_solve = (t64 - t1) / 63
    print(f"{label}: t1={t1*1e3:.2f}ms t64={t64*1e3:.2f}ms "
          f"per_solve={per_solve*1e3:.3f}ms "
          f"per_iter={per_solve/max(niter,1)*1e6:.2f}us niter={niter}",
          flush=True)


def parity(name, fn, op_fast, op_ref, rhs, **kw):
    t0 = time.time()
    x, st = fn(op_fast, rhs, **kw)
    t1 = time.time()
    xr, str_ = fn(op_ref, rhs, **kw)
    print(f"{name}: fused niter={st.niter} {st.status!r} "
          f"(wall {t1-t0:.1f}s) | general niter={str_.niter} "
          f"{str_.status!r} (wall {time.time()-t1:.1f}s)", flush=True)
    assert st.status == str_.status, (st.status, str_.status)
    assert abs(st.niter - str_.niter) <= 2, (st.niter, str_.niter)
    return x, st


# ---- CG-LANCZOS-SHIFT on Poisson, 4 shifts --------------------------------
shifts = jnp.asarray([0.0, 0.5, 2.0, 8.0], jnp.float32)
X, st = parity("cg_lanczos_shift", kt.cg_lanczos_shift, opP_fast, opP_ref,
               b, shifts=shifts, atol=0.0, rtol=1e-6)
bn = float(jnp.linalg.norm(b))
for i, sig in enumerate(np.asarray(shifts)):
    r = b - (opP_ref.matvec(X[i]) + sig * X[i])
    rr = float(jnp.linalg.norm(r)) / bn
    print(f"  shift {sig}: relres={rr:.3e}", flush=True)
    assert rr <= 3e-6, rr

from krylov_tpu.ops.pallas_fused import cg_lanczos_shift_dia_fused
pd = opP_fast._pd
time_fused(lambda bv: cg_lanczos_shift_dia_fused(
    pd, DP.offsets, bv, shifts, 4, 0.0, 1e-6, 2 * n), st.niter,
    "cg_lanczos_shift(4) timing")

# ---- CGS on convection-diffusion ------------------------------------------
x, st = parity("cgs", kt.cgs, opC_fast, opC_ref, b, atol=0.0, rtol=1e-6)
rr = float(jnp.linalg.norm(b - opC_ref.matvec(x))) / bn
print(f"  cgs relres={rr:.3e}", flush=True)
assert rr <= 5e-5, rr   # CGS squares the residual polynomial; loose check

from krylov_tpu.ops.pallas_fused import cgs_dia_fused
pdc = opC_fast._pd
time_fused(lambda bv: cgs_dia_fused(pdc, DC.offsets, bv, 0.0, 1e-6, 10 * n),
           st.niter, "cgs timing")

# ---- LS / LN family on convection-diffusion (square, unsymmetric) ---------
from krylov_tpu.ops.pallas_fused import cgls_dia_fused, cgne_crmr_dia_fused
pd_adj, offs_adj = opC_fast.aligned_adjoint()

x, st = parity("cgls", kt.cgls, opC_fast, opC_ref, b, lam=0.1, rtol=1e-6)
time_fused(lambda bv: cgls_dia_fused(
    pdc, pd_adj, DC.offsets, offs_adj, bv, 0.1, 0.0, 1e-6, 10 * n),
    st.niter, "cgls timing")

parity("crls", kt.crls, opC_fast, opC_ref, b, lam=0.1, rtol=1e-6)

x, st = parity("cgne", kt.cgne, opC_fast, opC_ref, b, rtol=1e-6)
rr = float(jnp.linalg.norm(b - opC_ref.matvec(x))) / bn
print(f"  cgne relres={rr:.3e}", flush=True)
assert rr <= 5e-6, rr
time_fused(lambda bv: cgne_crmr_dia_fused(
    pdc, pd_adj, DC.offsets, offs_adj, bv, 0.0, 0.0, 1e-6, 10 * n),
    st.niter, "cgne timing")

parity("crmr", kt.crmr, opC_fast, opC_ref, b, rtol=1e-6)

print("OK", flush=True)
