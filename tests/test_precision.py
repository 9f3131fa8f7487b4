"""fp64-grade solves from f32 storage (SURVEY.md §7.2 "fp64 on TPU").

Covers the two precision policies wired into the solver cores:

* ``precision="compensated"`` — Ogita-Rump-Oishi Dot2 reductions
  (ops/kops.py kdotr2/knorm2) replace the working-precision dots inside
  the CG and LSQR cores.
* ``precision="double_word"`` — iterative refinement (solvers/_refine.py):
  plain-f32 inner solves + double-word (hi, lo) accumulation of x and the
  residual with a compensated SpMV, reaching TRUE residuals at fp64
  tolerances (reference bar: test/test_mp.jl:31-33 — convergence to
  √eps(T)).  Wired into CG (SPD), MINRES (symmetric indefinite), and
  GMRES (general square; GMRES-IR per Carson & Higham 2018).

The reference-niter anchors are the Float64 runs of the same fixtures.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import krylov_tpu as kt
from krylov_tpu.ops.dia import poisson_dia, dia_spmv, dia_spmv_dw
from krylov_tpu.ops.kops import kdotr2, knorm2, two_sum, dw_add, dw_norm
from krylov_tpu.operators import DIAOperator, MatrixOperator

import fixtures as fx

RTOL64 = 1.5e-8        # √eps(Float64), the reference's fp64 tolerance


# ---------------------------------------------------------------------------
# kernel-level accuracy
# ---------------------------------------------------------------------------

def test_kdotr2_cancellation():
    """Dot2 recovers a dot whose f32 evaluation loses every digit."""
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal(4096)
    y64 = rng.standard_normal(4096)
    # make the true dot tiny versus Σ|x·y| (condition number ~1e7)
    y64 -= x64 * (x64 @ y64) / (x64 @ x64) * (1 - 1e-7)
    x32, y32 = x64.astype(np.float32), y64.astype(np.float32)
    exact = np.dot(x32.astype(np.float64), y32.astype(np.float64))
    plain = float(jnp.sum(jnp.asarray(x32) * jnp.asarray(y32)))
    comp = float(kdotr2(jnp.asarray(x32), jnp.asarray(y32)))
    assert abs(comp - exact) <= 1e-6 * abs(exact) + 1e-12
    assert abs(comp - exact) < abs(plain - exact)


def test_dia_spmv_dw_matches_f64():
    D32 = poisson_dia(8, 8, 8, dtype=np.float32)
    D64 = poisson_dia(8, 8, 8, dtype=np.float64)
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(512)
    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    y_hi, y_lo = dia_spmv_dw(D32.data, D32.offsets,
                             jnp.asarray(x_hi), jnp.asarray(x_lo))
    y = np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64)
    y_ref = np.asarray(dia_spmv(D64.data, D64.offsets, jnp.asarray(x64)))
    assert np.linalg.norm(y - y_ref) <= 1e-12 * np.linalg.norm(y_ref)


def test_dw_add_and_norm():
    rng = np.random.default_rng(2)
    a64 = rng.standard_normal(257)
    hi = jnp.asarray(a64.astype(np.float32))
    lo = jnp.asarray((a64 - np.asarray(hi, np.float64)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(257).astype(np.float32) * 1e-5)
    nhi, nlo = dw_add(hi, lo, d)
    got = np.asarray(nhi, np.float64) + np.asarray(nlo, np.float64)
    want = a64 + np.asarray(d, np.float64)
    assert np.max(np.abs(got - want)) <= 1e-12 * np.max(np.abs(want))
    assert abs(float(dw_norm(hi, lo)) - np.linalg.norm(a64)) \
        <= 1e-6 * np.linalg.norm(a64)


# ---------------------------------------------------------------------------
# CG double-word iterative refinement
# ---------------------------------------------------------------------------

def _dw_cg_case(N, niter_slack):
    D32 = poisson_dia(N, N, N, dtype=np.float32)
    D64 = poisson_dia(N, N, N, dtype=np.float64)
    n = N ** 3
    rng = np.random.default_rng(0)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b64 = jnp.asarray(np.asarray(b32, np.float64))   # the problem solved

    x_ref, st_ref = kt.cg(DIAOperator(D64), b64, atol=0.0, rtol=RTOL64)
    assert st_ref.solved

    x, st = kt.cg(DIAOperator(D32), b32, atol=0.0, rtol=RTOL64,
                  precision="double_word")
    assert st.solved and st.status == "solution good enough given atol and rtol"
    assert x.dtype == np.float64
    r = np.asarray(b64) - np.asarray(
        dia_spmv(D64.data, D64.offsets, jnp.asarray(x)))
    relres = np.linalg.norm(r) / np.linalg.norm(np.asarray(b64))
    # TRUE residual at the fp64 tolerance, from f32 storage
    assert relres <= 2.0 * RTOL64
    # iteration parity with the reference's Float64 run
    assert st.niter <= niter_slack * st_ref.niter
    return st.niter, st_ref.niter


def test_cg_double_word_divgrad():
    _dw_cg_case(16, niter_slack=1.45)


def test_cg_double_word_divgrad32():
    _dw_cg_case(32, niter_slack=1.45)


def test_cg_double_word_dense_operator():
    """Generic (non-DIA) operators take the split-matvec path; still far
    below the plain-f32 true-residual floor."""
    A64, b64 = fx.symmetric_definite(64, FC=np.float64)
    A64d = np.asarray(A64.todense() if hasattr(A64, "todense") else A64)
    A32 = MatrixOperator(jnp.asarray(A64d, jnp.float32))
    b32 = jnp.asarray(np.asarray(b64), jnp.float32)
    x, st = kt.cg(A32, b32, atol=0.0, rtol=1e-7, precision="double_word")
    assert st.solved
    r = np.asarray(b32, np.float64) - A64d.astype(np.float64) @ np.asarray(x)
    assert np.linalg.norm(r) <= 5e-7 * np.linalg.norm(np.asarray(b32))


def test_cg_double_word_warm_start():
    D32 = poisson_dia(8, 8, 8, dtype=np.float32)
    n = 512
    b = jnp.ones(n, jnp.float32)
    x0, _ = kt.cg(DIAOperator(D32), b, atol=0.0, rtol=1e-3)
    x, st = kt.cg(DIAOperator(D32), b, jnp.asarray(x0), atol=0.0,
                  rtol=RTOL64, precision="double_word")
    assert st.solved
    D64 = poisson_dia(8, 8, 8, dtype=np.float64)
    r = np.ones(n) - np.asarray(dia_spmv(D64.data, D64.offsets,
                                         jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2 * RTOL64 * np.sqrt(n)


def test_cg_double_word_rejects_unsupported():
    D = poisson_dia(4, 4, 4, dtype=np.float32)
    b = jnp.ones(64, jnp.float32)
    with pytest.raises(ValueError):
        kt.cg(DIAOperator(D), b, precision="double_word", history=True)
    with pytest.raises(ValueError):
        kt.cg(DIAOperator(D), b, precision="nope")


# ---------------------------------------------------------------------------
# MINRES / GMRES double-word iterative refinement (shared solvers/_refine.py
# driver; GMRES-IR per Carson & Higham 2018)
# ---------------------------------------------------------------------------

def _shifted_poisson(N, shift, dtype):
    """Symmetric indefinite A = Poisson − shift·I in DIA form."""
    D = poisson_dia(N, N, N, dtype=dtype)
    k0 = list(D.offsets).index(0)
    data = np.asarray(D.data).copy()
    data[k0] -= shift
    from krylov_tpu.ops.dia import DIAMatrix
    return DIAMatrix(jnp.asarray(data), D.offsets, D.shape)


def test_minres_double_word_indefinite():
    """fp64-tolerance TRUE residual from f32 storage on a symmetric
    indefinite system, with iteration parity vs the Float64 run."""
    shift = 4.0
    D32 = _shifted_poisson(12, shift, np.float32)
    D64 = _shifted_poisson(12, shift, np.float64)
    n = 12 ** 3
    rng = np.random.default_rng(3)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b64 = jnp.asarray(np.asarray(b32, np.float64))

    x_ref, st_ref = kt.minres(DIAOperator(D64), b64, atol=0.0, rtol=RTOL64)
    assert st_ref.solved

    x, st = kt.minres(DIAOperator(D32), b32, atol=0.0, rtol=RTOL64,
                      precision="double_word")
    assert st.solved
    assert x.dtype == np.float64
    r = np.asarray(b64) - np.asarray(
        dia_spmv(D64.data, D64.offsets, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.linalg.norm(np.asarray(b64))
    # IR pays one inner solve per outer digit batch; on an indefinite
    # near-singular spectrum the f32 inner solves plateau earlier, so the
    # inflation vs one f64 solve is ~#outer-passes (3 here), not ~1.4 as
    # in the SPD CG case.
    assert st.niter <= 3.5 * st_ref.niter


def _promote_dia(D32):
    """The f32 stencil viewed exactly in f64 — the system IR certifies.

    convdiff entries (±1.2, ±0.8, ...) are not exactly representable in
    f32, so the residual bar must be measured against the STORED operator,
    not an independent f64 rebuild (which differs at the 1-ulp level and
    shows up scaled by ‖x‖ — above fp64 tolerances)."""
    from krylov_tpu.ops.dia import DIAMatrix
    return DIAMatrix(jnp.asarray(np.asarray(D32.data, np.float64)),
                     D32.offsets, D32.shape)


def test_gmres_double_word_convdiff():
    """GMRES-IR: fp64-tolerance TRUE residual from f32 storage on the
    nonsymmetric convection-diffusion fixture."""
    from krylov_tpu.ops.dia import convdiff_dia
    D32 = convdiff_dia(10, 10, 10, pe=0.3, dtype=np.float32)
    D64 = convdiff_dia(10, 10, 10, pe=0.3, dtype=np.float64)
    n = 10 ** 3
    rng = np.random.default_rng(4)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b64 = jnp.asarray(np.asarray(b32, np.float64))

    x_ref, st_ref = kt.gmres(DIAOperator(D64), b64, atol=0.0, rtol=RTOL64,
                             memory=40)
    assert st_ref.solved

    x, st = kt.gmres(DIAOperator(D32), b32, atol=0.0, rtol=RTOL64,
                     memory=40, precision="double_word")
    assert st.solved
    assert x.dtype == np.float64
    Dp = _promote_dia(D32)
    r = np.asarray(b64) - np.asarray(
        dia_spmv(Dp.data, Dp.offsets, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.linalg.norm(np.asarray(b64))
    assert st.niter <= 1.6 * st_ref.niter


def test_gmres_double_word_restarted_inner():
    """Inner GMRES(m) restarts compose with the outer dw refinement."""
    from krylov_tpu.ops.dia import convdiff_dia
    D32 = convdiff_dia(8, 8, 8, pe=0.2, dtype=np.float32)
    b = jnp.ones(512, jnp.float32)
    x, st = kt.gmres(DIAOperator(D32), b, atol=0.0, rtol=RTOL64,
                     memory=15, restart=True, precision="double_word")
    assert st.solved
    Dp = _promote_dia(D32)
    r = np.ones(512) - np.asarray(
        dia_spmv(Dp.data, Dp.offsets, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.sqrt(512.0)


def test_minres_gmres_double_word_rejects_unsupported():
    D = poisson_dia(4, 4, 4, dtype=np.float32)
    b = jnp.ones(64, jnp.float32)
    with pytest.raises(ValueError):
        kt.minres(DIAOperator(D), b, precision="double_word", history=True)
    with pytest.raises(ValueError):
        kt.minres(DIAOperator(D), b, precision="double_word", lam=0.5)
    with pytest.raises(ValueError):
        kt.gmres(DIAOperator(D), b, precision="double_word",
                 callback=lambda s: False)
    with pytest.raises(ValueError):
        kt.minres(DIAOperator(D), b, precision="compensated")
    with pytest.raises(ValueError):
        kt.gmres(DIAOperator(D), b, precision="nope")


# ---------------------------------------------------------------------------
# compensated dots in the cores
# ---------------------------------------------------------------------------

def test_cg_compensated_matches_plain():
    D = poisson_dia(12, 12, 12, dtype=np.float32)
    b = jnp.ones(12 ** 3, jnp.float32)
    x1, st1 = kt.cg(DIAOperator(D), b, atol=0.0, rtol=1e-6)
    x2, st2 = kt.cg(DIAOperator(D), b, atol=0.0, rtol=1e-6,
                    precision="compensated")
    assert st2.solved
    assert abs(st2.niter - st1.niter) <= max(2, 0.05 * st1.niter)


def test_cg_compensated_complex():
    A, b = fx.symmetric_definite(24, FC=np.complex64)
    x, st = kt.cg(A, b, atol=0.0, rtol=1e-5, precision="compensated")
    assert st.solved


def test_lsqr_compensated_f64_criterion():
    """f32 LSQR with Dot2 reaches the reference's fp64 stopping criterion
    (axtol=√eps(F64)) with the same status as the Float64 run and bounded
    iteration inflation (the residual f32 error lives in the u/v vector
    recurrences, which stay working-precision)."""
    b, A, _, _, _, _, _ = fx.gen_lsq(400, 200, ndupl=4, npower=2)
    lam, tol = 0.02, RTOL64
    kw = dict(lam=lam, axtol=tol, btol=tol, etol=tol, atol=0.0, rtol=0.0,
              itmax=2000)
    x_ref, st_ref = kt.lsqr(MatrixOperator(jnp.asarray(A)),
                            jnp.asarray(b), **kw)
    A32 = MatrixOperator(jnp.asarray(A, jnp.float32))
    b32 = jnp.asarray(b, jnp.float32)
    x, st = kt.lsqr(A32, b32, precision="compensated", **kw)
    assert st.status == st_ref.status
    assert st.niter <= 1.6 * st_ref.niter
    err = np.linalg.norm(np.asarray(x, np.float64) - np.asarray(x_ref))
    assert err <= 1e-4 * np.linalg.norm(np.asarray(x_ref))


# ---------------------------------------------------------------------------
# Round-4 basket widening (VERDICT r3 #2): precision="double_word" across
# the symmetric, nonsymmetric, and Golub-Kahan LS families — ≥10 methods
# reaching 2×√eps(Float64) TRUE residuals from f32 device storage.
# ---------------------------------------------------------------------------

def _shifted(N, shift, builder, dtype):
    from krylov_tpu.ops.dia import DIAMatrix
    D = builder(N, N, N, dtype=dtype)
    k0 = list(D.offsets).index(0)
    data = np.asarray(D.data).copy()
    data[k0] += shift
    return DIAMatrix(jnp.asarray(data), D.offsets, D.shape)


SQUARE_DW_METHODS = ("cg", "cr", "car", "cg_lanczos", "minres",
                     "minres_qlp", "symmlq", "minares", "gmres",
                     "bicgstab", "qmr")
SYM_DW = SQUARE_DW_METHODS[:8]


@pytest.mark.parametrize("method", SQUARE_DW_METHODS)
def test_double_word_square_basket(method):
    """Every wired square method certifies a TRUE residual at the fp64
    tolerance from f32 storage (reference bar test/test_mp.jl:31-33)."""
    from krylov_tpu.ops.dia import poisson_dia as pb, convdiff_dia as cb
    N = 10
    if method in SYM_DW:
        D32 = _shifted(N, +1.0, pb, np.float32)
    else:
        D32 = _shifted(N, +0.5, cb, np.float32)
    n = N ** 3
    rng = np.random.default_rng(7)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, st = getattr(kt, method)(DIAOperator(D32), b32, atol=0.0,
                                rtol=RTOL64, precision="double_word")
    assert st.solved, (method, st.status)
    assert x.dtype == np.float64
    Dp = _promote_dia(D32)
    r = np.asarray(b32, np.float64) - np.asarray(
        dia_spmv(Dp.data, Dp.offsets, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.linalg.norm(
        np.asarray(b32, np.float64)), method


@pytest.mark.parametrize("method,lam", [
    ("lsqr", 0.0), ("lsqr", 0.3), ("lsmr", 0.0), ("lsmr", 0.3),
    ("cgls", 0.0), ("cgls", 0.3), ("lslq", 0.0), ("lslq", 0.3),
])
def test_double_word_ls_basket(method, lam):
    """Carson-Higham augmented-system LS refinement: the dw
    normal-equations residual Aᴴ(b−Ax) − reg·x certifies fp64-grade LS
    optimality from f32 storage (reg = λ² for lsqr/lsmr, λ for cgls)."""
    rng = np.random.default_rng(0)
    m, n = 120, 60
    A = (rng.standard_normal((m, n)) * np.logspace(-1.5, 0, n)) \
        .astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    x, st = getattr(kt, method)(MatrixOperator(jnp.asarray(A)),
                                jnp.asarray(b), lam=lam, atol=0.0,
                                rtol=RTOL64, precision="double_word")
    assert st.solved, (method, lam, st.status)
    assert st.status == "found approximate minimum least-squares solution"
    A64, b64 = A.astype(np.float64), b.astype(np.float64)
    reg = lam * lam if method in ("lsqr", "lsmr", "lslq") else lam
    g = A64.T @ (b64 - A64 @ x) - reg * x
    assert np.linalg.norm(g) <= 2.0 * RTOL64 * np.linalg.norm(A64.T @ b64)
    # solution accuracy against the dense normal-equations oracle
    xs = np.linalg.solve(A64.T @ A64 + reg * np.eye(n), A64.T @ b64)
    assert np.linalg.norm(x - xs) <= 1e-5 * np.linalg.norm(xs)


def test_double_word_ls_dia_square():
    """LS dw refinement on a square DIA operator rides the compensated
    DIA SpMV for both residual blocks."""
    from krylov_tpu.ops.dia import convdiff_dia as cb
    D32 = _shifted(8, +0.5, cb, np.float32)
    b = jnp.asarray(np.random.default_rng(5)
                    .standard_normal(512).astype(np.float32))
    x, st = kt.lsqr(DIAOperator(D32), b, atol=0.0, rtol=RTOL64,
                    precision="double_word")
    assert st.solved
    Dp = _promote_dia(D32)
    r = np.asarray(b, np.float64) - np.asarray(
        dia_spmv(Dp.data, Dp.offsets, jnp.asarray(x)))
    # consistent square system: direct residual at the dw tolerance
    assert np.linalg.norm(r) <= 4.0 * RTOL64 * np.linalg.norm(np.asarray(b))


def test_double_word_guards_and_gating():
    """Non-default options are rejected, never silently swallowed
    (ADVICE r3); unsupported operator types raise with guidance."""
    D = poisson_dia(4, 4, 4, dtype=np.float32)
    b = jnp.ones(64, jnp.float32)
    with pytest.raises(ValueError, match="conlim"):
        kt.minres(DIAOperator(D), b, precision="double_word", conlim=1e2)
    with pytest.raises(ValueError, match="window"):
        kt.minres(DIAOperator(D), b, precision="double_word", window=7)
    with pytest.raises(ValueError, match="radius"):
        kt.cr(DIAOperator(D), b, precision="double_word", radius=1.0)
    with pytest.raises(ValueError, match="lam"):
        kt.minres_qlp(DIAOperator(D), b, precision="double_word", lam=0.5)
    with pytest.raises(ValueError, match="sqd"):
        kt.lsqr(DIAOperator(D), b, precision="double_word", sqd=True)
    with pytest.raises(ValueError, match="c"):
        kt.qmr(DIAOperator(D), b, precision="double_word", c=b)
    from krylov_tpu.operators import FunctionOperator
    Afn = FunctionOperator(lambda v: v, (64, 64), jnp.float32,
                           rmatvec=lambda v: v)
    with pytest.raises(ValueError, match="compensated arithmetic"):
        kt.cg(Afn, b, precision="double_word")


def test_gemv_dw_matches_f64():
    """Compensated dense GEMV (the ADVICE r3 medium fix) reproduces the
    f64 product of the f32-stored matrix to dw accuracy."""
    from krylov_tpu.solvers._refine import gemv_dw
    rng = np.random.default_rng(9)
    A = rng.standard_normal((33, 17)).astype(np.float32)
    x64 = rng.standard_normal(17)
    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    y_hi, y_lo = gemv_dw(jnp.asarray(A), jnp.asarray(x_hi),
                         jnp.asarray(x_lo))
    got = np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64)
    want = A.astype(np.float64) @ x64
    assert np.linalg.norm(got - want) <= 1e-13 * np.linalg.norm(want)
    # adjoint path
    yh2, yl2 = gemv_dw(jnp.asarray(A), jnp.asarray(x_hi[:17]),
                       jnp.asarray(x_lo[:17]))
    za = rng.standard_normal(33)
    z_hi = za.astype(np.float32)
    z_lo = (za - z_hi.astype(np.float64)).astype(np.float32)
    gh, gl = gemv_dw(jnp.asarray(A), jnp.asarray(z_hi), jnp.asarray(z_lo),
                     adjoint=True)
    got2 = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)
    want2 = A.astype(np.float64).T @ za
    assert np.linalg.norm(got2 - want2) <= 1e-13 * np.linalg.norm(want2)


# ---------------------------------------------------------------------------
# Round-5 basket widening (VERDICT r4 #3): precision="double_word" for the
# least-norm (x, y) duals, saddle/SQD pairs, adjoint pairs, and the
# remaining square methods — ≥30 methods total reaching ~2×√eps(Float64)
# TRUE residuals from f32 storage (reference bar test/test_mp.jl:31-60).
# ---------------------------------------------------------------------------

def _well_conditioned(m, n, seed=0, lo=0.5, hi=1.5):
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    V, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    sv = np.linspace(lo, hi, min(m, n))
    return ((U * sv) @ V.T).astype(np.float32)


LN_DW_METHODS = ("craig", "craigmr", "lnlq", "cgne", "crmr")


@pytest.mark.parametrize("method", LN_DW_METHODS)
def test_double_word_ln_basket(method):
    """Least-norm family: dw refinement certifies the TRUE residual
    b − Ax at the fp64 tolerance AND preserves the min-norm property
    (x stays in range(Aᴴ)); y-returning methods keep x ≈ Aᴴy."""
    rng = np.random.default_rng(3)
    m, n = 40, 60                       # underdetermined
    A32 = _well_conditioned(m, n, seed=3)
    b32 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    out = getattr(kt, method)(MatrixOperator(jnp.asarray(A32)), b32,
                              atol=0.0, rtol=RTOL64,
                              precision="double_word")
    x, st = out[0], out[-1]
    assert st.solved, (method, st.status)
    assert x.dtype == np.float64
    A64 = A32.astype(np.float64)
    b64 = np.asarray(b32, np.float64)
    assert np.linalg.norm(b64 - A64 @ x) <= 2.0 * RTOL64 * np.linalg.norm(b64)
    xs = np.linalg.pinv(A64) @ b64       # min-norm oracle
    assert np.linalg.norm(x - xs) <= 1e-5 * np.linalg.norm(xs), method
    if len(out) == 3:                    # (x, y, stats): dual consistency
        y = out[1]
        assert np.linalg.norm(x - A64.T @ y) <= \
            1e-5 * np.linalg.norm(x), method


@pytest.mark.parametrize("method,kw,tau,nu", [
    ("tricg", {}, 1.0, -1.0),
    ("tricg", {"spd": True}, 1.0, 1.0),
    ("trimr", {}, 1.0, -1.0),
    ("trimr", {"sp": True}, 1.0, 0.0),
])
def test_double_word_saddle_basket(method, kw, tau, nu):
    """SQD pair family: dw refinement of both block residuals
    (b − τx − Ay, c − Aᴴx − νy) at the fp64 combined tolerance."""
    rng = np.random.default_rng(5)
    m, n = 60, 40                        # tall: the ν=0 system nonsingular
    # spd preset needs ‖A‖ < 1 so [I A; Aᴴ I] stays definite
    hi = 0.8 if kw.get("spd") else 1.5
    A32 = _well_conditioned(m, n, seed=5, lo=0.3, hi=hi)
    b32 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    c32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, y, st = getattr(kt, method)(MatrixOperator(jnp.asarray(A32)),
                                   b32, c32, atol=0.0, rtol=RTOL64,
                                   precision="double_word", **kw)
    assert st.solved, (method, kw, st.status)
    A64 = A32.astype(np.float64)
    b64 = np.asarray(b32, np.float64)
    c64 = np.asarray(c32, np.float64)
    f1 = b64 - tau * x - A64 @ y
    f2 = c64 - A64.T @ x - nu * y
    rn = np.hypot(np.linalg.norm(f1), np.linalg.norm(f2))
    assert rn <= 2.0 * RTOL64 * np.hypot(np.linalg.norm(b64),
                                         np.linalg.norm(c64)), (method, kw)


def test_double_word_usymlqr():
    """USYMLQR's [I A; Aᴴ 0] saddle pair at the fp64 tolerance."""
    # rhs seeds decorrelated from A's pre-QR draws: sharing the stream
    # makes b a near-member of range(A) and triggers a serious SSY
    # breakdown (observed: plain TriMR-sp stalls at 2.5e-4 on the
    # correlated fixture, converges in 33 iterations otherwise)
    rng = np.random.default_rng(106)
    m, n = 60, 40
    A32 = _well_conditioned(m, n, seed=6)
    b32 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    c32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, y, st = kt.usymlqr(MatrixOperator(jnp.asarray(A32)), b32, c32,
                          atol=0.0, rtol=RTOL64, precision="double_word")
    assert st.solved, st.status
    A64 = A32.astype(np.float64)
    f1 = np.asarray(b32, np.float64) - x - A64 @ y
    f2 = np.asarray(c32, np.float64) - A64.T @ x
    rn = np.hypot(np.linalg.norm(f1), np.linalg.norm(f2))
    assert rn <= 2.0 * RTOL64 * np.hypot(
        np.linalg.norm(np.asarray(b32)), np.linalg.norm(np.asarray(c32)))


def test_double_word_gpmr():
    """GPMR's [λI A; B μI] partitioned pair (B = Aᴴ here) at the fp64
    combined tolerance; B gets its own compensated matvec."""
    rng = np.random.default_rng(7)
    m, n = 48, 48
    A32 = _well_conditioned(m, n, seed=7)
    B32 = A32.T.copy()
    b32 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    c32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, y, st = kt.gpmr(MatrixOperator(jnp.asarray(A32)),
                       MatrixOperator(jnp.asarray(B32)), b32, c32,
                       atol=0.0, rtol=RTOL64, precision="double_word")
    assert st.solved, st.status
    A64, B64 = A32.astype(np.float64), B32.astype(np.float64)
    f1 = np.asarray(b32, np.float64) - x - A64 @ y
    f2 = np.asarray(c32, np.float64) - B64 @ x - y
    rn = np.hypot(np.linalg.norm(f1), np.linalg.norm(f2))
    assert rn <= 2.0 * RTOL64 * np.hypot(
        np.linalg.norm(np.asarray(b32)), np.linalg.norm(np.asarray(c32)))


@pytest.mark.parametrize("method", ["bilqr", "trilqr"])
def test_double_word_adjoint_basket(method):
    """Adjoint pair family: BOTH TRUE residuals (b − Ax, c − Aᴴy) at the
    fp64 tolerance, with per-system certificates in AdjointStats."""
    rng = np.random.default_rng(8)
    n = 50
    R = rng.standard_normal((n, n)).astype(np.float32)
    A32 = (np.eye(n, dtype=np.float32) + 0.3 * R / np.sqrt(n))
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    c32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, y, st = getattr(kt, method)(MatrixOperator(jnp.asarray(A32)),
                                   b32, c32, atol=0.0, rtol=RTOL64,
                                   precision="double_word")
    assert st.solved_primal and st.solved_dual, (method, st.status)
    assert "Both primal and dual solutions" in st.status
    A64 = A32.astype(np.float64)
    b64 = np.asarray(b32, np.float64)
    c64 = np.asarray(c32, np.float64)
    assert np.linalg.norm(b64 - A64 @ x) <= 2.0 * RTOL64 * np.linalg.norm(b64)
    assert np.linalg.norm(c64 - A64.T @ y) <= \
        2.0 * RTOL64 * np.linalg.norm(c64)


SQUARE_DW_R5 = ("bilq", "cgs", "fom", "diom", "dqgmres", "fgmres",
                "usymlq", "usymqr")


@pytest.mark.parametrize("method", SQUARE_DW_R5)
def test_double_word_square_basket_r5(method):
    """Remaining square methods: dw TRUE-residual certificate on the
    shifted convection-diffusion stencil (general nonsymmetric)."""
    from krylov_tpu.ops.dia import convdiff_dia as cb
    N = 10
    D32 = _shifted(N, +0.5, cb, np.float32)
    n = N ** 3
    rng = np.random.default_rng(9)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    args = (DIAOperator(D32), b32)
    if method.startswith("usym"):
        c32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        args = (DIAOperator(D32), b32, c32)
    x, st = getattr(kt, method)(*args, atol=0.0, rtol=RTOL64,
                                precision="double_word")
    assert st.solved, (method, st.status)
    assert x.dtype == np.float64
    Dp = _promote_dia(D32)
    r = np.asarray(b32, np.float64) - np.asarray(
        dia_spmv(Dp.data, Dp.offsets, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.linalg.norm(
        np.asarray(b32, np.float64)), method


def test_double_word_pair_guards():
    """Non-default options the pair certificates cannot honor raise."""
    A32 = _well_conditioned(24, 16, seed=1)
    A = MatrixOperator(jnp.asarray(A32))
    b = jnp.ones(24, jnp.float32)
    c = jnp.ones(16, jnp.float32)
    with pytest.raises(ValueError, match="lam"):
        kt.craig(A, b, lam=0.5, precision="double_word")
    with pytest.raises(ValueError, match="sqd"):
        kt.lnlq(A, b, sqd=True, precision="double_word")
    from krylov_tpu.operators import DiagonalOperator
    with pytest.raises(ValueError, match="M"):
        kt.tricg(A, b, c, M=DiagonalOperator(jnp.ones(24, jnp.float32)),
                 precision="double_word")
    Asq = MatrixOperator(jnp.asarray(_well_conditioned(16, 16, seed=2)))
    with pytest.raises(ValueError, match="history"):
        kt.bilqr(Asq, c, c, history=True, precision="double_word")


@pytest.mark.parametrize("method", ["block_gmres", "block_minres"])
def test_double_word_block_basket(method):
    """Multi-RHS families: dw refinement certifies the TRUE Frobenius
    block residual B − AX at the fp64 tolerance from f32 storage —
    closes the last family of the reference's Float64 bar
    (test/test_mp.jl:31-60) left at working precision in round 4."""
    rng = np.random.default_rng(11)
    n, p = 60, 3
    R = rng.standard_normal((n, n)).astype(np.float32)
    A32 = np.eye(n, dtype=np.float32) + 0.3 * R / np.sqrt(n)
    if method == "block_minres":                   # Hermitian fixture
        A32 = (A32 @ A32.T + np.eye(n, dtype=np.float32))
    B32 = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))
    X, st = getattr(kt, method)(MatrixOperator(jnp.asarray(A32)), B32,
                                atol=0.0, rtol=RTOL64,
                                precision="double_word")
    assert st.solved, (method, st.status)
    assert X.dtype == np.float64
    A64 = A32.astype(np.float64)
    B64 = np.asarray(B32, np.float64)
    rn = np.linalg.norm(B64 - A64 @ X)
    assert rn <= 4.0 * RTOL64 * np.linalg.norm(B64), method


def test_double_word_via_generic_interface():
    """krylov_solve must route precision= to the public wrappers — the
    registry's private _solve entries would silently swallow it in
    **_ig and return a plain f32 solve (regression: round-5 review)."""
    rng = np.random.default_rng(12)
    A32 = rng.standard_normal((40, 60)).astype(np.float32)
    b32 = rng.standard_normal(40).astype(np.float32)
    out = kt.krylov_solve("craig", A32, b32, atol=0.0, rtol=RTOL64,
                          precision="double_word")
    x, st = out[0], out[-1]
    assert st.solved
    r = np.asarray(b32, np.float64) - A32.astype(np.float64) @ x
    assert np.linalg.norm(r) <= 2.0 * RTOL64 * np.linalg.norm(b32)
