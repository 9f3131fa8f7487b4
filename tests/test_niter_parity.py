"""Iteration-count parity harness (BASELINE.md correctness bar: "matches
Krylov.jl convergence — iteration counts, residual tolerances").

tests/reference_niter.json records the Float64 iteration count of every
method on deterministic shared fixtures (regenerate with
tools/gen_niter_table.py after an intentional algorithmic change).  This
suite re-runs the identical configurations and fails if any method
converges slower (regression) or suddenly faster (changed stopping
semantics) than the recorded anchor, beyond ±max(2, 10%).

Hard absolute anchors derived from the reference's own assertions are
pinned separately (e.g. CG on the div-grad Poisson operator — the
reference solves its GPU test suites in tens of iterations on this
matrix class, test/gpu/nvidia.jl:57-59; src recurrences identical).
"""

import json
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

import krylov_tpu as kt
import fixtures as fx
from krylov_tpu.operators import DIAOperator, MatrixOperator
from krylov_tpu.ops.dia import poisson_dia

TABLE = json.loads(
    (pathlib.Path(__file__).parent / "reference_niter.json").read_text())


def _slack(ref):
    return max(2, int(round(0.10 * ref)))


@pytest.mark.parametrize("method", sorted(TABLE["small_fixtures"]))
def test_small_fixture_parity(method):
    ref = TABLE["small_fixtures"][method]
    rr, stats, _ = fx.drive_method(method, np.float64)
    assert stats.status == ref["status"], (stats.status, ref["status"])
    assert abs(stats.niter - ref["niter"]) <= _slack(ref["niter"]), \
        (stats.niter, ref["niter"])


@pytest.mark.parametrize("method", sorted(TABLE["div_grad16"]))
def test_div_grad_parity(method):
    D = poisson_dia(16, 16, 16, dtype=np.float64)
    b = jnp.ones(D.shape[0])
    ref = TABLE["div_grad16"][method]
    x, stats = kt.krylov_solve(method, DIAOperator(D), b, atol=0.0,
                               rtol=1e-8)
    assert stats.status == ref["status"]
    assert abs(stats.niter - ref["niter"]) <= _slack(ref["niter"])


@pytest.mark.parametrize("method", sorted(TABLE["gen_lsq_25x10_lam0.1"]))
def test_gen_lsq_parity(method):
    bls, Als, _, _, _, _, _ = fx.gen_lsq(25, 10, ndupl=1, npower=1)
    ref = TABLE["gen_lsq_25x10_lam0.1"][method]
    x, stats = kt.krylov_solve(
        method, MatrixOperator(jnp.asarray(Als)), jnp.asarray(bls), lam=0.1)
    assert stats.status == ref["status"]
    assert abs(stats.niter - ref["niter"]) <= _slack(ref["niter"])


# ---------------------------------------------------------------------------
# absolute anchors (theory/reference-derived ceilings, not self-pins)
# ---------------------------------------------------------------------------

def test_cg_divgrad_absolute_ceiling():
    """√κ(div_grad(16)) ≈ 20 ⇒ CG must converge to 1e-8 within ~2·√κ
    iterations; recorded Float64 run is 39.  A run needing > 60 signals a
    broken recurrence even if the table were regenerated blindly."""
    D = poisson_dia(16, 16, 16, dtype=np.float64)
    b = jnp.ones(D.shape[0])
    x, stats = kt.cg(DIAOperator(D), b, atol=0.0, rtol=1e-8)
    assert stats.solved and stats.niter <= 60


def test_lsqr_genlsq_finite_termination():
    """gen_lsq has 10 distinct singular values ⇒ Golub-Kahan methods must
    terminate in ≤ ncol + 2 iterations (LSQR paper property)."""
    bls, Als, _, _, _, _, _ = fx.gen_lsq(25, 10, ndupl=1, npower=1)
    for method in ("lsqr", "lsmr"):
        x, stats = kt.krylov_solve(
            method, MatrixOperator(jnp.asarray(Als)), jnp.asarray(bls),
            lam=0.1)
        assert stats.niter <= 12


def test_jacobi_preconditioned_cg_iteration_drop():
    """The reference pins preconditioned CG to ≤ 19 iterations with IC(0)
    (test/gpu/nvidia.jl:57-59).  IC(0) is a factorization, not a solver
    capability; the library-level contract this anchors is "an effective M
    strictly reduces CG iterations on an ill-scaled SPD system" — pinned
    here with the Jacobi M on a badly row-scaled Poisson variant."""
    D = poisson_dia(12, 12, 12, dtype=np.float64)
    n = D.shape[0]
    s = jnp.asarray(np.logspace(0, 3, n))        # scaling κ multiplier 1e3
    data = D.data * s[None, :]                   # columns scaled
    # symmetrize: S A S with S = diag(√s) — keep SPD
    import scipy.sparse as sp
    A = sp.dia_matrix((np.asarray(D.data), np.asarray(D.offsets)),
                      shape=(n, n)).tocsr()
    S = sp.diags(np.sqrt(np.logspace(0, 3, n)))
    Ascaled = (S @ A @ S).todia()
    from krylov_tpu.ops.dia import DIAMatrix
    Ds = DIAMatrix(jnp.asarray(Ascaled.data),
                   tuple(int(o) for o in Ascaled.offsets), (n, n))
    b = jnp.ones(n)
    x1, st1 = kt.cg(DIAOperator(Ds), b, atol=0.0, rtol=1e-8, itmax=5000)
    from krylov_tpu.operators import DiagonalOperator
    M = DiagonalOperator(1.0 / jnp.asarray(Ascaled.diagonal()))
    x2, st2 = kt.cg(DIAOperator(Ds), b, M=M, atol=0.0, rtol=1e-8,
                    itmax=5000)
    assert st2.solved
    assert st2.niter < 0.5 * st1.niter
