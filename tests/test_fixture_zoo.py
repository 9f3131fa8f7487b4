"""Implementation-independent fixture-zoo parity sweep (VERDICT r3 #5).

Systematic port of the reference's per-solver expectations on its shared
fixture zoo (/root/reference/test/test_utils.jl:18-429, exercised across
test_<method>.jl) — anchors that do NOT depend on the self-generated
reference_niter.json table:

* zero_rhs          → status "x is a zero-residual solution", x == 0,
                      niter == 0 (e.g. test_cg.jl:38-41)
* singular_consistent → converges, not inconsistent (test_cg.jl:99-104);
                      min-norm solution for MINRES-QLP (its contract)
* square/symmetric/under/over_inconsistent → stats.inconsistent with the
                      normal-equations residual small
                      (test_gmres.jl:48-53, test_crmr.jl:27-59)
* almost_singular   → solved with ‖r‖ ≤ tol·‖A‖·‖x‖-grade residuals
                      (test_minres_qlp.jl:32-37, test_gmres.jl:40-45)
* breakdown triggers → exact breakdown status strings
                      ("Breakdown bᴴc = 0", test_bicgstab.jl:86-88,
                      test_bilq.jl:94-96, test_qmr.jl:86-88)
* under/over_consistent → LS optimality + minimum-norm checks against the
                      dense lstsq oracle (test/check_min_norm.jl:1-14)

FC sweeps (Float64, ComplexF64) mirror the reference's dtype loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import krylov_tpu as kt
import fixtures as fx

FCS = (np.float64, np.complex128)
TOL = 1e-6


def _mk(A, FC):
    return jnp.asarray(np.asarray(A), dtype=FC)


def _solve(method, A, b, FC, **kw):
    out = kt.krylov_solve(method, _mk(A, FC), _mk(b, FC), **kw)
    return out[0], out[-1]


def _relres(A, b, x):
    A = np.asarray(A, np.complex128)
    b = np.asarray(b, np.complex128)
    x = np.asarray(x, np.complex128)
    return np.linalg.norm(b - A @ x) / max(np.linalg.norm(b), 1e-300)


def _aresid(A, b, x):
    A = np.asarray(A, np.complex128)
    b = np.asarray(b, np.complex128)
    r = b - A @ np.asarray(x, np.complex128)
    return (np.linalg.norm(A.conj().T @ r)
            / max(np.linalg.norm(A.conj().T @ b), 1e-300))


# ---------------------------------------------------------------------------
# zero rhs: every square method returns the zero-residual solution at once
# ---------------------------------------------------------------------------

ZERO_RHS_METHODS = (
    "cg", "cr", "car", "cg_lanczos", "symmlq", "minres", "minres_qlp",
    "minares", "cgs", "bicgstab", "bilq", "qmr", "diom", "fom", "dqgmres",
    "gmres", "fgmres", "lsqr", "lsmr", "cgls", "crls", "cgne", "crmr",
)


@pytest.mark.parametrize("method", ZERO_RHS_METHODS)
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_zero_rhs(method, FC):
    A, b = fx.zero_rhs(FC=FC)
    x, stats = _solve(method, A, b, FC)
    assert np.linalg.norm(np.asarray(x)) == 0
    assert stats.status == "x is a zero-residual solution"
    # reference parity: minres reports niter = 1 on the zero-rhs exit
    # (src/minres.jl:219-222); every other method reports 0
    assert stats.niter == (1 if method == "minres" else 0)


@pytest.mark.parametrize("method", ("craig", "craigmr", "lnlq"))
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_zero_rhs_xy(method, FC):
    A, b = fx.zero_rhs(FC=FC)
    out = kt.krylov_solve(method, _mk(A, FC), _mk(b, FC))
    x, stats = out[0], out[-1]
    assert np.linalg.norm(np.asarray(x)) == 0
    assert stats.status == "x is a zero-residual solution"


# ---------------------------------------------------------------------------
# singular consistent: short-recurrence Hermitian methods converge cleanly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method",
                         ("cg", "cr", "minres", "symmlq", "minres_qlp"))
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_singular_consistent(method, FC):
    A, b = fx.singular_consistent(FC=FC)
    x, stats = _solve(method, A, b, FC)
    assert _relres(A, b, x) <= TOL
    # the reference asserts !inconsistent for CG only (test_cg.jl:104);
    # minres-family semantics set inconsistent = !zero_resid
    # (src/minres.jl:481) even on consistent singular systems
    if method in ("cg", "cr"):
        assert not stats.inconsistent


def test_minres_qlp_singular_min_norm():
    """MINRES-QLP's contract: the MINIMUM-NORM solution of a singular
    consistent system (reference src/minres_qlp.jl docstring)."""
    A, b = fx.singular_consistent(FC=np.float64)
    x, stats = _solve("minres_qlp", A, b, np.float64)
    assert _relres(A, b, x) <= TOL
    assert fx.check_min_norm(A, b, x, atol=1e-5)


# ---------------------------------------------------------------------------
# inconsistent systems: the inconsistency flag + LS optimality
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ("gmres", "fgmres"))
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_square_inconsistent_arnoldi(method, FC):
    A, b = fx.square_inconsistent(FC=FC)
    x, stats = _solve(method, A, b, FC)
    assert stats.inconsistent
    assert _aresid(A, b, x) <= TOL


@pytest.mark.parametrize("method", ("minres", "minres_qlp", "minares"))
def test_symmetric_inconsistent(method):
    """test_minres_qlp.jl:54-59 (flag + Aresid) / test_minares.jl:54-58
    (Aresid only — the reference's own flag assertion is commented out);
    minres sets inconsistent = !zero_resid (src/minres.jl:481) without an
    Aresid guarantee."""
    A, b = fx.symmetric_inconsistent()
    x, stats = _solve(method, A, b, np.float64)
    if method != "minares":
        assert stats.inconsistent
    if method != "minres":
        assert _aresid(A, b, x) <= 1e-5


@pytest.mark.parametrize("method", ("cgne", "crmr", "craigmr"))
@pytest.mark.parametrize("fixture", ("under_inconsistent",
                                     "over_inconsistent",
                                     "square_inconsistent"))
def test_ln_inconsistent(method, fixture):
    """test_crmr.jl:27-59 / test_craigmr.jl:30-34: the LN family flags
    inconsistency with the normal-equations residual driven to tol."""
    A, b = getattr(fx, fixture)(FC=np.float64)
    out = kt.krylov_solve(method, _mk(A, np.float64), _mk(b, np.float64))
    x, stats = out[0], out[-1]
    assert stats.inconsistent or "condition number" in stats.status
    if method != "cgne":
        # the reference asserts Aresiduals[end] ≤ tol for crmr/craigmr
        # only; CGNE detects inconsistency without driving ‖Aᴴr‖
        assert _aresid(A, b, x) <= 1e-4


def test_craig_under_inconsistent():
    """test_craig.jl:27-31: inconsistent or conlim exit."""
    A, b = fx.under_inconsistent(FC=np.float64)
    out = kt.krylov_solve("craig", _mk(A, np.float64), _mk(b, np.float64))
    stats = out[-1]
    assert stats.inconsistent or "condition number" in stats.status


@pytest.mark.parametrize("method", ("lsqr", "lsmr", "cgls", "crls"))
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_ls_over_inconsistent(method, FC):
    """Overdetermined inconsistent: found an LS solution — normal
    equations satisfied (test_lsqr.jl / test_lsmr.jl patterns)."""
    A, b = fx.over_inconsistent(FC=FC)
    x, stats = _solve(method, A, b, FC)
    assert _aresid(A, b, x) <= 1e-5


# ---------------------------------------------------------------------------
# almost singular (div_grad − 5I): solved with ‖A‖-scaled residual grades
# ---------------------------------------------------------------------------

def _almost_singular_scipy():
    import scipy.sparse as sp
    return fx.get_div_grad(16, 16, 16) - 5 * sp.eye(16 ** 3, format="csr")


@pytest.mark.parametrize("method", ("minres_qlp", "minares"))
def test_almost_singular_symmetric(method):
    A, b = fx.almost_singular(FC=np.float64)     # A is a kt CSRMatrix
    out = kt.krylov_solve(method, A, jnp.asarray(b),
                          itmax=8 * b.shape[0])
    x, stats = np.asarray(out[0]), out[-1]
    As = _almost_singular_scipy()
    r = np.asarray(b) - As @ x
    anorm = 12.0 + 5.0   # ‖div_grad‖ ≤ 12 (stencil bound) + shift
    assert stats.solved
    assert np.linalg.norm(r) <= 1e-4 * anorm * np.linalg.norm(x)


def test_almost_singular_gmres():
    """test_gmres.jl:40-45: resid ≤ 100·tol with full-memory GMRES."""
    A, b = fx.almost_singular(FC=np.float64)
    out = kt.krylov_solve("gmres", A, jnp.asarray(b), memory=200,
                          rtol=1e-8, atol=0.0)
    x, stats = np.asarray(out[0]), out[-1]
    assert stats.solved
    As = _almost_singular_scipy()
    assert np.linalg.norm(np.asarray(b) - As @ x) \
        <= 1e-6 * np.linalg.norm(np.asarray(b))


# ---------------------------------------------------------------------------
# breakdown triggers: exact reference status strings
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ("cgs", "bicgstab", "bilq", "qmr"))
@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_bc_breakdown_status(method, FC):
    A, b, c = fx.bc_breakdown(FC=FC)
    out = kt.krylov_solve(method, _mk(A, FC), _mk(b, FC), c=_mk(c, FC))
    assert out[-1].status == "Breakdown bᴴc = 0"


@pytest.mark.parametrize("FC", FCS, ids=("f64", "c128"))
def test_unsymmetric_breakdown_converges(FC):
    """test_bilq.jl:53-58: the bi-Lanczos breakdown trigger still yields a
    converged solution (the process terminates AT the solution)."""
    A, b, c = fx.unsymmetric_breakdown(FC=FC)
    x, stats = _solve("bilq", A, b, FC, c=_mk(c, FC))
    assert _relres(A, b, x) <= TOL


def test_bilqr_bc_breakdown():
    A, b, c = fx.bc_breakdown(FC=np.float64)
    x, y, stats = kt.bilqr(_mk(A, np.float64), _mk(b, np.float64),
                           _mk(c, np.float64))
    assert "Breakdown" in stats.status


# ---------------------------------------------------------------------------
# minimum-norm solutions vs the dense lstsq oracle (check_min_norm.jl)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ("cgne", "crmr", "craig", "craigmr",
                                    "lnlq"))
@pytest.mark.parametrize("fixture", ("under_consistent",
                                     "square_consistent"))
def test_ln_minimum_norm(method, fixture):
    """LN methods return the MINIMUM-NORM solution of consistent systems
    (test_crmr.jl:20-39 `norm(xI - xmin) ≤ cond(A)·tol·‖xmin‖`)."""
    A, b = getattr(fx, fixture)(FC=np.float64)
    out = kt.krylov_solve(method, _mk(A, np.float64), _mk(b, np.float64),
                          rtol=1e-10)
    x = np.asarray(out[0])
    assert _relres(A, b, x) <= 1e-6
    assert fx.check_min_norm(A, b, x, atol=1e-5)


@pytest.mark.parametrize("method", ("lsqr", "lsmr", "cgls", "crls"))
def test_ls_over_consistent_exact(method):
    """Overdetermined consistent: the LS solution IS the exact solution."""
    A, b = fx.over_consistent(FC=np.float64)
    x, stats = _solve(method, A, b, np.float64, rtol=1e-10)
    assert _relres(A, b, x) <= 1e-6
