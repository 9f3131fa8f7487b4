"""One-shot real-TPU parity sweep over EVERY fused whole-solve kernel.

Drives each method through its public wrapper twice — once routed to
the fused kernel (pallas DIA operator) and once through the general
while_loop core — and records iteration counts and statuses into
FUSED_VALIDATION.json.  True residuals and per-method device times are
checked/measured by the per-method scripts (S-in-one-jit differencing;
see the other tools/exp_*_tpu.py scripts and docs/fused.md).

Fixtures: 48³ Poisson (SPD / normal, n = 110 592) for the Hermitian,
two-sided, saddle, and adjoint families; 48³ convection-diffusion for
the nonsymmetric and Golub-Kahan families.  f32 on the chip.  48³
matches the per-method validation scripts so the persistent compile
cache is reused through the remote tunnel.
"""
import json
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
from krylov_tpu.ops.dia import poisson_dia, convdiff_dia, DIAMatrix

N = 48
DP = poisson_dia(N, N, N, dtype=np.float32)
DC = convdiff_dia(N, N, N, dtype=np.float32)
n = DP.shape[0]
rng = np.random.default_rng(7)
b = jnp.asarray(rng.standard_normal(n), jnp.float32)
c = jnp.asarray(np.random.default_rng(11).standard_normal(n), jnp.float32)

opP = DIAOperator(DP, use_pallas=True)
opPr = DIAOperator(DP, use_pallas=False)
opC = DIAOperator(DC, use_pallas=True)
opCr = DIAOperator(DC, use_pallas=False)
pd_adjP, offs_adjP = opP.aligned_adjoint()
DPT = DIAMatrix(pd_adjP, offs_adjP, DP.shape)
opPT = DIAOperator(DPT, use_pallas=True)
opPTr = DIAOperator(DPT, use_pallas=False)

shifts = jnp.asarray([0.0, 0.5, 2.0], jnp.float32)

# (name, callable(fast_ops), callable(ref_ops), n_outputs)
CASES = [
    ("cg", lambda f: kt.cg(opP if f else opPr, b, atol=0.0, rtol=1e-6)),
    ("cr", lambda f: kt.cr(opP if f else opPr, b, atol=0.0, rtol=1e-6)),
    ("car", lambda f: kt.car(opP if f else opPr, b, atol=0.0, rtol=1e-6)),
    ("cg_lanczos", lambda f: kt.cg_lanczos(opP if f else opPr, b,
                                           atol=0.0, rtol=1e-6)),
    ("cg_lanczos_shift", lambda f: kt.cg_lanczos_shift(
        opP if f else opPr, b, shifts, atol=0.0, rtol=1e-6)),
    ("symmlq", lambda f: kt.symmlq(opP if f else opPr, b,
                                   atol=0.0, rtol=1e-6)),
    ("minres", lambda f: kt.minres(opP if f else opPr, b,
                                   atol=0.0, rtol=1e-6)),
    ("minres_qlp", lambda f: kt.minres_qlp(opP if f else opPr, b,
                                           atol=0.0, rtol=1e-6)),
    ("minares", lambda f: kt.minares(opP if f else opPr, b,
                                     atol=0.0, rtol=1e-6)),
    ("cgs", lambda f: kt.cgs(opC if f else opCr, b, atol=0.0, rtol=1e-6)),
    ("bicgstab", lambda f: kt.bicgstab(opC if f else opCr, b,
                                       atol=0.0, rtol=1e-6)),
    ("bilq", lambda f: kt.bilq(opP if f else opPr, b,
                               atol=0.0, rtol=1e-6)),
    ("qmr", lambda f: kt.qmr(opP if f else opPr, b, atol=0.0, rtol=1e-6)),
    ("gmres", lambda f: kt.gmres(opC if f else opCr, b, memory=20,
                                 restart=True, atol=0.0, rtol=1e-6)),
    ("fgmres", lambda f: kt.fgmres(opC if f else opCr, b, memory=20,
                                   restart=True, atol=0.0, rtol=1e-6)),
    ("fom", lambda f: kt.fom(opC if f else opCr, b, memory=20,
                             restart=True, atol=0.0, rtol=1e-6)),
    ("diom", lambda f: kt.diom(opC if f else opCr, b, memory=20,
                               atol=0.0, rtol=1e-6)),
    ("dqgmres", lambda f: kt.dqgmres(opC if f else opCr, b, memory=20,
                                     atol=0.0, rtol=1e-6)),
    ("lsqr", lambda f: kt.lsqr(opC if f else opCr, b, rtol=1e-6)),
    ("lsmr", lambda f: kt.lsmr(opC if f else opCr, b, rtol=1e-6)),
    ("lslq", lambda f: kt.lslq(opC if f else opCr, b, rtol=1e-6)),
    ("cgls", lambda f: kt.cgls(opC if f else opCr, b, lam=0.1,
                               rtol=1e-6)),
    ("crls", lambda f: kt.crls(opC if f else opCr, b, lam=0.1,
                               rtol=1e-6)),
    ("cgls_lanczos_shift", lambda f: kt.cgls_lanczos_shift(
        opC if f else opCr, b, jnp.asarray([0.1, 1.0], jnp.float32),
        atol=0.0, rtol=1e-6)),
    ("cgne", lambda f: kt.cgne(opC if f else opCr, b, rtol=1e-6)),
    ("crmr", lambda f: kt.crmr(opC if f else opCr, b, rtol=1e-6)),
    ("craig", lambda f: kt.craig(opC if f else opCr, b, rtol=1e-6)),
    ("craigmr", lambda f: kt.craigmr(opC if f else opCr, b, rtol=1e-6)),
    ("lnlq", lambda f: kt.lnlq(opC if f else opCr, b, rtol=1e-6)),
    ("usymlq", lambda f: kt.usymlq(opP if f else opPr, b, c,
                                   atol=0.0, rtol=1e-6)),
    ("usymqr", lambda f: kt.usymqr(opP if f else opPr, b, c,
                                   atol=0.0, rtol=1e-6)),
    ("usymlqr", lambda f: kt.usymlqr(opP if f else opPr, b, c,
                                     atol=0.0, rtol=1e-6)),
    ("bilqr", lambda f: kt.bilqr(opP if f else opPr, b, c,
                                 atol=0.0, rtol=1e-6)),
    ("trilqr", lambda f: kt.trilqr(opP if f else opPr, b, c,
                                   atol=0.0, rtol=1e-6)),
    ("tricg", lambda f: kt.tricg(opP if f else opPr, b, c,
                                 atol=0.0, rtol=1e-6)),
    ("trimr", lambda f: kt.trimr(opP if f else opPr, b, c,
                                 atol=0.0, rtol=1e-6)),
    ("gpmr", lambda f: kt.gpmr(opP if f else opPr, opPT if f else opPTr,
                               b, c, lam=1.0, mu=-1.0, memory=48,
                               itmax=48, atol=0.0, rtol=1e-6)),
]

results = {}
for name, call in CASES:
    t0 = time.time()
    out_f = call(True)
    t_f = time.time() - t0
    out_r = call(False)
    st_f, st_r = out_f[-1], out_r[-1]
    ok = st_f.status == st_r.status
    results[name] = {
        "niter_fused": int(st_f.niter),
        "niter_general": int(st_r.niter),
        "status_fused": st_f.status,
        "status_match": bool(ok),
        "wall_first_fused_s": round(t_f, 2),
    }
    print(f"{name:20s} fused {st_f.niter:6d} | general {st_r.niter:6d} "
          f"| status_match={ok}", flush=True)

n_exact = sum(1 for r in results.values()
              if r["niter_fused"] == r["niter_general"])
n_match = sum(1 for r in results.values() if r["status_match"])
summary = {
    "methods": len(results),
    "niter_exact": n_exact,
    "status_match": n_match,
    "fixture": "48^3 poisson/convdiff f32, rtol 1e-6",
}
print(json.dumps(summary), flush=True)
with open("/root/repo/FUSED_VALIDATION.json", "w") as fh:
    json.dump({"summary": summary, "methods": results}, fh, indent=1)
print("wrote FUSED_VALIDATION.json", flush=True)
