#!/usr/bin/env python
"""Regenerate tests/reference_niter.json — the iteration-count parity table.

The table records, for every method in the basket, the Float64 iteration
count on deterministic shared fixtures at fp64 tolerances.  These are the
"Krylov.jl semantics" anchors (the recurrences match the reference's, and
per-method correctness suites assert the reference's residual tolerances;
BASELINE.md correctness bar).  tests/test_niter_parity.py fails if any
method's convergence speed regresses against this table.

Run from the repo root:  python tools/gen_niter_table.py
"""

import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    import krylov_tpu as kt
    import fixtures as fx
    from krylov_tpu.operators import DIAOperator, MatrixOperator
    from krylov_tpu.ops.dia import poisson_dia

    table = {"_meta": {
        "dtype": "float64",
        "note": ("Float64 niters on deterministic fixtures; the parity "
                 "test allows ±max(2, 10%) drift.  Regenerate with "
                 "tools/gen_niter_table.py after an intentional "
                 "algorithmic change."),
    }}

    # 1. the full basket on drive_method's deterministic small fixtures at
    #    the default √eps(F64) tolerances
    basket = {}
    for method in fx.ALL_METHODS:
        rr, stats, _ = fx.drive_method(method, np.float64)
        basket[method] = {"niter": stats.niter, "status": stats.status,
                          "relres": float(f"{rr:.3e}")}
        print(f"{method:22s} {stats.niter:4d}  {stats.status}")
    table["small_fixtures"] = basket

    # 2. flagship SPD fixture: get_div_grad(16) at rtol 1e-8
    #    (reference benchmark/benchmarks.jl:14-21 problem class)
    D = poisson_dia(16, 16, 16, dtype=np.float64)
    A = DIAOperator(D)
    b = jnp.ones(D.shape[0])
    div_grad = {}
    for method in ("cg", "cr", "car", "cg_lanczos", "minres", "symmlq",
                   "minres_qlp", "minares"):
        x, stats = kt.krylov_solve(method, A, b, atol=0.0, rtol=1e-8)
        div_grad[method] = {"niter": stats.niter, "status": stats.status}
        print(f"div_grad16 {method:12s} {stats.niter:4d}")
    table["div_grad16"] = div_grad

    # 3. the reference's own gen_lsq LS problem (test/gen_lsq.jl lstp dims)
    bls, Als, _, _, _, _, _ = fx.gen_lsq(25, 10, ndupl=1, npower=1)
    gl = {}
    for method in ("lsqr", "lsmr", "cgls", "crls", "lslq"):
        x, stats = kt.krylov_solve(
            method, MatrixOperator(jnp.asarray(Als)), jnp.asarray(bls),
            lam=0.1)                      # default √eps(F64) tolerances
        gl[method] = {"niter": stats.niter, "status": stats.status}
        print(f"gen_lsq {method:12s} {stats.niter:4d}")
    table["gen_lsq_25x10_lam0.1"] = gl

    out = ROOT / "tests" / "reference_niter.json"
    out.write_text(json.dumps(table, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
