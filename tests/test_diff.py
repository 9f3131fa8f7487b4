"""Differentiable solves (krylov_tpu.diff) — implicit-diff correctness.

No reference analogue (Krylov.jl ships no AD rules); correctness is
pinned against dense linear algebra: values vs ``np.linalg.solve`` /
normal equations, gradients vs autodiff through ``jnp.linalg.solve``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import krylov_tpu as kt
from krylov_tpu import diff


def _spd(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T / n + 2.0 * np.eye(n)
    return A.astype(dtype)


def _nonsym(n, seed=1, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) / np.sqrt(n) + 3.0 * np.eye(n)
    return A.astype(dtype)


def _herm(n, seed=2):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = Q @ Q.conj().T / n + 2.0 * np.eye(n)
    return A.astype(np.complex128)


N = 40


class TestSolveValues:
    @pytest.mark.parametrize("method", diff.SYMMETRIC_METHODS)
    def test_symmetric(self, method):
        A = _spd(N)
        b = np.random.default_rng(3).standard_normal(N)
        x = diff.solve(A, b, method=method, rtol=1e-10)
        assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-7)

    @pytest.mark.parametrize("method", diff.GENERAL_METHODS)
    def test_general(self, method):
        A = _nonsym(N)
        b = np.random.default_rng(4).standard_normal(N)
        x = diff.solve(A, b, method=method, rtol=1e-10, memory=N)
        assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-7)

    def test_rejects_unknown_method_and_bad_N(self):
        A = _spd(N)
        b = np.zeros(N)
        with pytest.raises(ValueError, match="supports"):
            diff.solve(A, b, method="lsqr")
        with pytest.raises(ValueError, match="right preconditioner"):
            diff.solve(A, b, method="cg", N=kt.IdentityOperator(N))


class TestGradients:
    @pytest.mark.parametrize("method", ["cg", "minres", "gmres", "bicgstab",
                                        "qmr"])
    def test_grad_matches_dense(self, method):
        A = jnp.asarray(_spd(N) if method in diff.SYMMETRIC_METHODS
                        else _nonsym(N))
        b = jnp.asarray(np.random.default_rng(5).standard_normal(N))
        w = jnp.asarray(np.random.default_rng(6).standard_normal(N))

        def f(Am, bv):
            x = diff.solve(Am, bv, method=method, rtol=1e-12, memory=N)
            return jnp.sum(w * x) + jnp.sum(x ** 2)

        def fref(Am, bv):
            x = jnp.linalg.solve(Am, bv)
            return jnp.sum(w * x) + jnp.sum(x ** 2)

        gA, gb = jax.grad(f, argnums=(0, 1))(A, b)
        rA, rb = jax.grad(fref, argnums=(0, 1))(A, b)
        assert np.allclose(np.asarray(gA), np.asarray(rA), atol=1e-6)
        assert np.allclose(np.asarray(gb), np.asarray(rb), atol=1e-6)

    def test_grad_unchanged_by_preconditioner(self):
        A = jnp.asarray(_spd(N))
        b = jnp.asarray(np.random.default_rng(7).standard_normal(N))
        M = kt.DiagonalOperator(1.0 / jnp.diag(A))

        def f(bv):
            return jnp.sum(diff.solve(A, bv, method="cg", M=M,
                                      rtol=1e-12) ** 2)

        def f0(bv):
            return jnp.sum(diff.solve(A, bv, method="cg", rtol=1e-12) ** 2)

        assert np.allclose(np.asarray(jax.grad(f)(b)),
                           np.asarray(jax.grad(f0)(b)), atol=1e-7)

    def test_jvp_forward_mode(self):
        A = jnp.asarray(_spd(N))
        b = jnp.asarray(np.random.default_rng(8).standard_normal(N))
        db = jnp.asarray(np.random.default_rng(9).standard_normal(N))
        x, dx = jax.jvp(lambda bv: diff.solve(A, bv, rtol=1e-12), (b,), (db,))
        # dx = A⁻¹ db
        assert np.allclose(np.asarray(dx), np.linalg.solve(A, db), atol=1e-7)

    def test_csr_gradient_has_sparsity_structure(self):
        # The operator cotangent flows through the SpMV's own VJP, so a
        # CSR operator receives a gradient on exactly its nnz values.
        rng = np.random.default_rng(10)
        n = 32
        Ad = np.asarray(_spd(n))
        mask = (np.abs(Ad) > 0.15) | np.eye(n, dtype=bool)
        Ad = Ad * mask
        Ad = Ad + np.diag(np.full(n, 2.0))  # keep SPD after masking
        rows, cols = np.nonzero(Ad)  # row-major order == CSR data order
        vals = jnp.asarray(Ad[rows, cols])
        b = jnp.asarray(rng.standard_normal(n))
        from krylov_tpu.ops.sparse import CSRMatrix
        tmpl = kt.csr_from_coo(rows, cols, np.asarray(vals), (n, n))

        def f(v):
            Acsr = CSRMatrix(v, tmpl.indices, tmpl.indptr, tmpl.rows,
                             tmpl.shape)
            return jnp.sum(diff.solve(Acsr, b, method="cg", rtol=1e-12) ** 2)

        gv = jax.grad(f)(vals)
        dense = jnp.asarray(Ad)
        gd = jax.grad(
            lambda Am: jnp.sum(jnp.linalg.solve(Am, b) ** 2))(dense)
        assert np.allclose(np.asarray(gv), np.asarray(gd)[rows, cols],
                           atol=1e-6)


class TestTracedCSRAdjoint:
    def test_gmres_gradient_through_csr_values(self):
        # General methods need Aᵀ solves in reverse mode; with a
        # CSRMatrix built from TRACED values inside the differentiated
        # function, the adjoint structure must be built trace-safely
        # (CSRMatrix.transpose_conj_traced).
        rng = np.random.default_rng(41)
        n = 24
        Ad = rng.standard_normal((n, n)) / np.sqrt(n) + 3.0 * np.eye(n)
        mask = (np.abs(Ad) > 0.25) | np.eye(n, dtype=bool)
        Ad = Ad * mask
        rows, cols = np.nonzero(Ad)
        from krylov_tpu.ops.sparse import CSRMatrix
        tmpl = kt.csr_from_coo(rows, cols, Ad[rows, cols], (n, n))
        vals = jnp.asarray(Ad[rows, cols])
        b = jnp.asarray(rng.standard_normal(n))

        def f(v):
            A = CSRMatrix(v, tmpl.indices, tmpl.indptr, tmpl.rows,
                          tmpl.shape)
            return jnp.sum(diff.solve(A, b, method="gmres", rtol=1e-12,
                                      memory=n) ** 2)

        gv = jax.grad(f)(vals)
        dense = jnp.asarray(Ad)
        gd = jax.grad(
            lambda Am: jnp.sum(jnp.linalg.solve(Am, b) ** 2))(dense)
        assert np.allclose(np.asarray(gv), np.asarray(gd)[rows, cols],
                           atol=1e-6)


class TestComposition:
    def test_jit_vmap_over_rhs(self):
        A = jnp.asarray(_spd(N))
        B = jnp.asarray(np.random.default_rng(11).standard_normal((5, N)))
        xs = jax.jit(jax.vmap(lambda bv: diff.solve(A, bv, rtol=1e-12)))(B)
        ref = np.linalg.solve(np.asarray(A), np.asarray(B).T).T
        assert np.allclose(np.asarray(xs), ref, atol=1e-7)

    def test_grad_through_vmap(self):
        A = jnp.asarray(_spd(16))
        B = jnp.asarray(np.random.default_rng(12).standard_normal((3, 16)))

        def loss(Am):
            xs = jax.vmap(lambda bv: diff.solve(Am, bv, rtol=1e-12))(B)
            return jnp.sum(xs ** 2)

        def loss_ref(Am):
            return jnp.sum(jnp.linalg.solve(Am, B.T).T ** 2)

        assert np.allclose(np.asarray(jax.grad(loss)(A)),
                           np.asarray(jax.grad(loss_ref)(A)), atol=1e-6)


class TestBatchedOperators:
    def test_vmap_over_operator_leaves(self):
        # A batch of operators: vmap over the dense leaf compiles to one
        # batched program (the TPU replacement for a host loop).
        rng = np.random.default_rng(20)
        nb, n = 4, 12
        As = jnp.asarray(np.stack([_spd(n, seed=i) for i in range(nb)]))
        Bs = jnp.asarray(rng.standard_normal((nb, n)))
        xs = jax.jit(jax.vmap(lambda Am, bv: diff.solve(Am, bv,
                                                        rtol=1e-12)))(As, Bs)
        for i in range(nb):
            ref = np.linalg.solve(np.asarray(As[i]), np.asarray(Bs[i]))
            assert np.allclose(np.asarray(xs[i]), ref, atol=1e-7)

    def test_grad_through_batched_operators(self):
        nb, n = 3, 10
        As = jnp.asarray(np.stack([_spd(n, seed=10 + i) for i in range(nb)]))
        Bs = jnp.asarray(np.random.default_rng(21).standard_normal((nb, n)))

        def loss(As_):
            xs = jax.vmap(lambda Am, bv: diff.solve(Am, bv,
                                                    rtol=1e-12))(As_, Bs)
            return jnp.sum(xs ** 2)

        def loss_ref(As_):
            xs = jax.vmap(jnp.linalg.solve)(As_, Bs)
            return jnp.sum(xs ** 2)

        assert np.allclose(np.asarray(jax.grad(loss)(As)),
                           np.asarray(jax.grad(loss_ref)(As)), atol=1e-6)


class TestDot2:
    def test_dot2_grad_f32(self):
        # Compensated inner products: f32 diff-solve gradients reach the
        # dense-f64 gradient within f32-storage error.
        A64 = _spd(24, seed=30)
        b64 = np.random.default_rng(31).standard_normal(24)
        A = jnp.asarray(A64.astype(np.float32))
        b = jnp.asarray(b64.astype(np.float32))

        def f(Am, bv):
            return jnp.sum(diff.solve(Am, bv, method="cg", rtol=1e-7,
                                      dot2=True) ** 2)

        gA, gb = jax.grad(f, argnums=(0, 1))(A, b)
        x64 = np.linalg.solve(A64, b64)
        g64 = np.linalg.solve(A64, 2 * x64)     # b̄ = A⁻ᵀ ∂f/∂x
        rel = np.linalg.norm(np.asarray(gb, np.float64) - g64) / \
            np.linalg.norm(g64)
        assert rel < 1e-4
        assert np.isfinite(np.asarray(gA)).all()

    def test_dot2_rejected_off_cg(self):
        A = _spd(8)
        with pytest.raises(ValueError, match="dot2"):
            diff.solve(A, np.ones(8), method="gmres", dot2=True)


class TestComplex:
    def test_hermitian_cg_value_and_vjp(self):
        A = jnp.asarray(_herm(24))
        b = jnp.asarray(np.random.default_rng(13).standard_normal(24)
                        + 1j * np.random.default_rng(14).standard_normal(24))
        x = diff.solve(A, b, method="cg", rtol=1e-12)
        assert np.allclose(np.asarray(x),
                           np.linalg.solve(np.asarray(A), np.asarray(b)),
                           atol=1e-7)

        def f(bv):
            x = diff.solve(A, bv, method="cg", rtol=1e-12)
            return jnp.real(jnp.vdot(x, x))

        def fref(bv):
            x = jnp.linalg.solve(A, bv)
            return jnp.real(jnp.vdot(x, x))

        g = jax.grad(f)(b)
        r = jax.grad(fref)(b)
        assert np.allclose(np.asarray(g), np.asarray(r), atol=1e-7)

    def test_general_complex_gmres_vjp(self):
        rng = np.random.default_rng(15)
        A = jnp.asarray((rng.standard_normal((20, 20))
                         + 1j * rng.standard_normal((20, 20))) / 5.0
                        + 3.0 * np.eye(20))
        b = jnp.asarray(rng.standard_normal(20) + 1j * rng.standard_normal(20))

        def f(Am, bv):
            x = diff.solve(Am, bv, method="gmres", rtol=1e-12, memory=20)
            return jnp.real(jnp.vdot(x, x))

        def fref(Am, bv):
            x = jnp.linalg.solve(Am, bv)
            return jnp.real(jnp.vdot(x, x))

        gA, gb = jax.grad(f, argnums=(0, 1))(A, b)
        rA, rb = jax.grad(fref, argnums=(0, 1))(A, b)
        assert np.allclose(np.asarray(gA), np.asarray(rA), atol=1e-6)
        assert np.allclose(np.asarray(gb), np.asarray(rb), atol=1e-6)


class TestFusedRouting:
    def test_cg_fused_inner_solve_gradient(self):
        # A DIA stencil with use_pallas routes diff.solve's inner solve
        # through the fused whole-solve kernel (interpret mode on CPU);
        # gradients are unchanged — they flow through the outer matvec.
        from krylov_tpu.ops.dia import poisson_dia, DIAMatrix
        from krylov_tpu.operators import DIAOperator
        from krylov_tpu import diff as d

        D = poisson_dia(6, 6, 6, dtype=np.float32)
        n = D.shape[0]
        b = jnp.asarray(
            np.random.default_rng(40).standard_normal(n).astype(np.float32))

        # pin that the fused gate actually fires for this configuration
        A_f = DIAOperator(D, use_pallas=True)
        got = d._try_fused("cg", A_f, None, None, b, 0.0, 1e-6,
                           2 * n, 20, False)
        assert got is not None

        def f(data, bv, use_pallas):
            Dm = DIAMatrix(data, D.offsets, D.shape)
            A = DIAOperator(Dm, use_pallas=use_pallas)
            return jnp.sum(d.solve(A, bv, method="cg", rtol=1e-6) ** 2)

        gf_d, gf_b = jax.grad(f, argnums=(0, 1))(D.data, b, True)
        gg_d, gg_b = jax.grad(f, argnums=(0, 1))(D.data, b, False)
        assert np.allclose(np.asarray(gf_b), np.asarray(gg_b),
                           rtol=1e-3, atol=1e-4)
        assert np.allclose(np.asarray(gf_d), np.asarray(gg_d),
                           rtol=1e-3, atol=1e-4)


class TestLstsq:
    def test_value_and_grads(self):
        rng = np.random.default_rng(16)
        m, n = 60, 25
        A = jnp.asarray(rng.standard_normal((m, n)))
        b = jnp.asarray(rng.standard_normal(m))
        lam = 0.3

        def xref(Am, bv, la):
            H = Am.T @ Am + la * jnp.eye(n)
            return jnp.linalg.solve(H, Am.T @ bv)

        x = diff.lstsq(A, b, lam=lam, rtol=1e-13)
        assert np.allclose(np.asarray(x), np.asarray(xref(A, b, lam)),
                           atol=1e-7)

        def f(Am, bv, la):
            return jnp.sum(diff.lstsq(Am, bv, lam=la, rtol=1e-13) ** 2)

        def fref(Am, bv, la):
            return jnp.sum(xref(Am, bv, la) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(A, b, lam)
        r = jax.grad(fref, argnums=(0, 1, 2))(A, b, lam)
        for gi, ri in zip(g, r):
            assert np.allclose(np.asarray(gi), np.asarray(ri), atol=1e-5)

    def test_shape_checks(self):
        rng = np.random.default_rng(17)
        A = jnp.asarray(rng.standard_normal((30, 10)))
        with pytest.raises(ValueError, match="Inconsistent"):
            diff.lstsq(A, jnp.zeros(10))
