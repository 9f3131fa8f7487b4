"""Storage + no-retrace contracts for every METHOD_TABLE entry.

The reference CI-enforces closed-form per-solver byte budgets and zero
allocation on in-place re-solves (test/test_allocations.jl:36-58,
docs/src/storage.md:50-80).  The JAX analogues:

* storage: the solver state pytree's large leaves (size ≥ n) stay within
  a closed-form element budget — ported from storage.md where the state
  maps one-to-one (budgets cited per entry), with the structural
  differences noted (e.g. CG carries 3 n-vectors because z is aliased
  when M = I; LNLQ carries one extra m-vector for the CRAIG transfer).
* no-retrace: a second solve with identical static configuration hits
  the jit cache — nothing is traced or compiled again (the reference's
  "0 allocations on re-solve").
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fixtures as fx
import krylov_tpu as kt
from krylov_tpu.workspaces import _resolve

N_, M_ = 10, 14
MEM = 5
NSH = 2   # shifts in the *_shift fixtures
P_ = 2    # block rhs count

# element budgets for the big leaves (size ≥ n) of each solver state.
# references: docs/src/storage.md:50-80 budgets in coefficient counts.
BUDGETS = {
    # SPD family                       reference budget
    "cg": lambda n, m: 4 * n,                    # 4n
    "cr": lambda n, m: 5 * n,                    # 5n
    "car": lambda n, m: 7 * n,                   # 7n
    "cg_lanczos": lambda n, m: 5 * n,            # 5n
    "cg_lanczos_shift": lambda n, m: 3 * n + 2 * n * NSH + 5 * NSH,
    # Hermitian indefinite
    "symmlq": lambda n, m: 6 * n,                # 5n (+1: kept CG-transfer vec)
    "minres": lambda n, m: 6 * n,                # 6n
    "minres_qlp": lambda n, m: 6 * n,            # 6n
    "minares": lambda n, m: 8 * n,               # 8n
    # non-Hermitian square
    "cgs": lambda n, m: 6 * n,                   # 6n
    "bicgstab": lambda n, m: 6 * n,              # 6n
    "bilq": lambda n, m: 8 * n,                  # 8n
    "qmr": lambda n, m: 9 * n,                   # 9n
    "usymlq": lambda n, m: 5 * n + 3 * m,        # 5n+3m
    "usymqr": lambda n, m: 6 * n + 3 * m,
    # ring methods (memory=MEM pinned below)
    "fom": lambda n, m: (MEM + 3) * n + (MEM + 2) ** 2,
    "gmres": lambda n, m: (MEM + 3) * n + (MEM + 2) ** 2,
    "fgmres": lambda n, m: (2 * MEM + 3) * n + (MEM + 2) ** 2,
    "diom": lambda n, m: (2 * MEM + 1) * n + 4 * MEM,
    "dqgmres": lambda n, m: (2 * MEM + 2) * n + 4 * MEM,
    # least squares
    "lsqr": lambda n, m: 4 * n + 3 * m,
    "lsmr": lambda n, m: 5 * n + 3 * m,
    "lslq": lambda n, m: 4 * n + 3 * m,
    "cgls": lambda n, m: 3 * n + 2 * m,          # 3n+2m
    "cgls_lanczos_shift": lambda n, m: (3 + NSH) * n + 2 * m + 5 * NSH,
    "crls": lambda n, m: 4 * n + 3 * m,
    # least norm
    "cgne": lambda n, m: 3 * n + 2 * m,          # 3n+2m
    "crmr": lambda n, m: 3 * n + 2 * m,          # 3n+2m
    "lnlq": lambda n, m: 4 * n + 4 * m,          # 3n+4m (+n: CRAIG transfer)
    "craig": lambda n, m: 4 * n + 4 * m,         # 3n+4m (+n)
    "craigmr": lambda n, m: 5 * n + 5 * m,       # 4n+5m (+n)
    # adjoint / two-output
    "bilqr": lambda n, m: 10 * n,
    "trilqr": lambda n, m: 5 * n + 5 * m,
    "usymlqr": lambda n, m: 5 * n + 6 * m,
    "tricg": lambda n, m: 6 * n + 6 * m,
    "trimr": lambda n, m: 8 * n + 8 * m,
    # long recurrence partitioned (mem = itmax pinned below)
    "gpmr": lambda n, m: (12 + 1) * (n + m) + (2 * 12 + 2) ** 2 + 8 * 12,
    # block (p = P_)
    "block_minres": lambda n, m: 7 * n * P_ + 12 * P_ * P_,
    # block basis + TWO ((mem+1)p)² factors: the transformed Hessenberg
    # R and the accumulated orthogonal factor Qacc of the progressive
    # block QR (round-5 deviation from the reference's stored-reflector
    # scheme, src/block_gmres.jl:145-148 — same asymptotic class,
    # removes the per-iteration dense re-QR from the general path)
    "block_gmres": lambda n, m: (MEM + 2) * n * P_
    + 2 * ((MEM + 1) * P_) ** 2 + (MEM + 1) * P_ * P_,
}

EXTRA_KW = {
    "fom": {"memory": MEM, "restart": True},
    "gmres": {"memory": MEM, "restart": True},
    "fgmres": {"memory": MEM, "restart": True},
    "diom": {"memory": MEM},
    "dqgmres": {"memory": MEM},
    "gpmr": {"itmax": 12},
    "block_gmres": {"memory": MEM, "restart": True},
}


def _drive_with_state(method, **kw):
    """drive_method + capture of the solver state pytree."""
    solver = _resolve(method)
    captured = {}

    def wrap(*a, **k):
        out = solver(*a, **k)
        captured["state"] = out[-1]
        return out[:-1]

    direct = ("cg_lanczos_shift", "cgls_lanczos_shift", "bilqr", "trilqr",
              "usymlqr", "tricg", "trimr", "gpmr", "block_minres",
              "block_gmres")
    orig_solve = kt.krylov_solve
    saved = {}
    try:
        if method in direct:
            saved[method] = getattr(kt, method)
            setattr(kt, method, wrap)
        else:
            def solve_router(meth, *a, **k):
                return wrap(*a, **k)
            kt.krylov_solve = solve_router
        rr, stats, extras = fx.drive_method(method, jnp.float64, n=N_, m=M_,
                                            **kw)
    finally:
        kt.krylov_solve = orig_solve
        for nm, f in saved.items():
            setattr(kt, nm, f)
    return rr, stats, captured.get("state")


@pytest.mark.parametrize("method", fx.ALL_METHODS)
def test_storage_budget(method):
    kw = EXTRA_KW.get(method, {})
    rr, stats, state = _drive_with_state(method, **kw)
    assert state is not None, method
    big = sum(l.size for l in jax.tree_util.tree_leaves(state)
              if getattr(l, "size", 0) >= N_)
    budget = BUDGETS[method](N_, M_)
    assert big <= budget, (method, big, budget)


@pytest.mark.parametrize("method", fx.ALL_METHODS)
def test_no_retrace_on_resolve(method, caplog):
    kw = EXTRA_KW.get(method, {})
    fx.drive_method(method, jnp.float64, n=N_, m=M_, **kw)  # compile
    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING):
            fx.drive_method(method, jnp.float64, n=N_, m=M_, **kw)
    finally:
        jax.config.update("jax_log_compiles", False)
    compiles = [r for r in caplog.records
                if "compiling" in r.getMessage().lower()]
    assert not compiles, (method, [r.getMessage() for r in compiles][:3])
