"""SELL-C-128 and hybrid DIA+SELL analysis path.

Covers the VERDICT-r2 item 5 surface: a general-sparse SpMV that does
not fall back to gather/segment-sum, and the one-time CSR analysis that
routes dense diagonals to DIA and the rest to SELL.  (CPU runs the
Pallas kernel in interpret mode; a real-TPU run is in bench/tools.)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

import krylov_tpu as kt
from krylov_tpu.ops.sparse import csr_from_coo, csr_from_dense
from krylov_tpu.ops.pallas_sell import sell_from_csr, sell_spmv, SLICE
from krylov_tpu.ops.hybrid import (hybrid_from_csr, hybrid_spmv,
                                   split_diagonals)


def _csr(A):
    coo = sp.coo_matrix(A)
    return csr_from_coo(coo.row, coo.col, coo.data, A.shape)


class TestSELL:
    @pytest.mark.parametrize("m,n,density", [
        (2048, 2048, 0.003), (1000, 3000, 0.01), (3000, 1000, 0.01),
        (500, 500, 0.02), (SLICE, SLICE, 0.001),
    ])
    def test_matches_scipy(self, m, n, density):
        A = sp.random(m, n, density=density, random_state=7, format="csr",
                      dtype=np.float64)
        S = sell_from_csr(_csr(A))
        x = np.random.default_rng(0).standard_normal(n)
        y = sell_spmv(S, jnp.asarray(x))
        assert np.allclose(np.asarray(y), A @ x, atol=1e-10)

    def test_empty_rows_and_slices(self):
        A = np.zeros((2500, 2500))
        A[0, 0] = 1.0
        A[2400, 77] = 2.5
        S = sell_from_csr(csr_from_dense(jnp.asarray(A)))
        x = np.arange(2500.0)
        y = sell_spmv(S, jnp.asarray(x))
        assert np.allclose(np.asarray(y), A @ x)

    def test_duplicate_heavy_row(self):
        # one row with many nonzeros inside a single chunk drives kmax
        A = np.zeros((256, 256))
        A[3, :100] = np.arange(1.0, 101.0)
        A += np.eye(256)
        S = sell_from_csr(csr_from_dense(jnp.asarray(A)))
        assert S.kmax >= 100
        x = np.random.default_rng(1).standard_normal(256)
        y = sell_spmv(S, jnp.asarray(x))
        assert np.allclose(np.asarray(y), A @ x, atol=1e-10)

    def test_jit_and_pytree(self):
        A = sp.random(512, 512, density=0.01, random_state=3) + sp.eye(512)
        S = sell_from_csr(_csr(A.tocsr()))
        x = jnp.asarray(np.random.default_rng(2).standard_normal(512))

        @jax.jit
        def f(S, x):
            return sell_spmv(S, x)

        assert np.allclose(np.asarray(f(S, x)), A @ np.asarray(x), atol=1e-10)


class TestSplitDiagonals:
    def test_stencil_is_pure_dia(self):
        n = 512
        T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n, n)).tocsr()
        dia, rem = split_diagonals(_csr(T))
        assert rem is None
        assert set(dia.offsets) == {-1, 0, 1}
        x = np.random.default_rng(0).standard_normal(n)
        assert np.allclose(np.asarray(dia @ jnp.asarray(x)), T @ x)

    def test_random_is_pure_sell(self):
        A = sp.random(600, 600, density=0.005, random_state=5).tocsr()
        A.setdiag(0)            # make sure no diagonal is dense
        A.eliminate_zeros()
        dia, rem = split_diagonals(_csr(A))
        assert dia is None and rem is not None

    def test_mixed_splits_exactly(self):
        n = 1024
        A = sp.diags([1.5, 4.0, 1.5], [-2, 0, 2], (n, n)).tolil()
        rng = np.random.default_rng(9)
        for _ in range(300):
            A[rng.integers(n), rng.integers(n)] = rng.standard_normal()
        A = A.tocsr()
        dia, rem = split_diagonals(_csr(A))
        assert dia is not None and rem is not None
        assert set(dia.offsets) == {-2, 0, 2}
        x = rng.standard_normal(n)
        y = np.asarray(dia @ jnp.asarray(x)) + np.asarray(
            kt.sell_spmv(sell_from_csr(rem), jnp.asarray(x)))
        assert np.allclose(y, A @ x, atol=1e-10)

    def test_rectangular_goes_to_rem(self):
        A = sp.random(100, 300, density=0.05, random_state=2).tocsr()
        dia, rem = split_diagonals(_csr(A))
        assert dia is None and rem is not None


class TestRCMAndFallback:
    def test_rcm_reduces_bandwidth(self):
        from krylov_tpu.ops.hybrid import rcm_permute
        n = 400
        rng = np.random.default_rng(21)
        perm0 = rng.permutation(n)
        T = sp.diags([1.0, 4.0, 1.0], [-1, 0, 1], (n, n)).tocsr()
        scrambled = T[perm0][:, perm0].tocsr()     # hidden band
        csr, perm = rcm_permute(_csr(scrambled))
        rows, cols = np.asarray(csr.rows), np.asarray(csr.indices)
        assert np.max(np.abs(rows - cols)) <= 2    # band recovered
        # P A Pᵀ relation holds
        x = rng.standard_normal(n)
        y = np.asarray(kt.sell_spmv(sell_from_csr(csr), jnp.asarray(x)))
        assert np.allclose(y, (scrambled.toarray()[perm][:, perm]) @ x)

    def test_degenerate_pattern_keeps_csr(self):
        # one nonzero per far-apart (slice, chunk) pair → SELL would
        # store >64 slots per nnz; the analysis must keep CSR instead
        n = 1 << 15
        rng = np.random.default_rng(5)
        rows = rng.choice(n, 30, replace=False)
        cols = rng.choice(n, 30, replace=False)
        A = sp.coo_matrix((np.ones(30), (rows, cols)), shape=(n, n)).tocsr()
        H = hybrid_from_csr(_csr(A))
        from krylov_tpu.ops.sparse import CSRMatrix
        assert isinstance(H.sell, CSRMatrix)
        x = rng.standard_normal(n)
        assert np.allclose(np.asarray(hybrid_spmv(H, jnp.asarray(x))), A @ x)


class TestHybridOperator:
    def test_hybrid_matvec_matches(self):
        n = 1500
        A = (sp.diags([1.0, -4.0, 1.0], [-1, 0, 1], (n, n))
             + sp.random(n, n, density=0.002, random_state=11)).tocsr()
        H = hybrid_from_csr(_csr(A))
        x = np.random.default_rng(3).standard_normal(n)
        assert np.allclose(np.asarray(hybrid_spmv(H, jnp.asarray(x))),
                           A @ x, atol=1e-10)

    def test_solver_through_hybrid_operator(self):
        n = 900
        R = sp.random(n, n, density=0.003, random_state=13)
        A = (sp.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (n, n))
             + R + R.T).tocsr()          # SPD-ish, diagonally dominant
        op = kt.HybridOperator.analyze(_csr(A))
        b = jnp.ones(n, jnp.float64)
        x, stats = kt.cg(op, b, atol=0.0, rtol=1e-10)
        assert stats.solved
        assert np.linalg.norm(A @ np.asarray(x) - 1.0) <= 1e-7

    def test_adjoint_for_unsymmetric(self):
        n = 800
        A = (sp.diags([0.3, 3.0, -0.7], [-1, 0, 1], (n, n))
             + sp.random(n, n, density=0.002, random_state=17)).tocsr()
        op = kt.HybridOperator.analyze(_csr(A)).with_adjoint()
        x = np.random.default_rng(4).standard_normal(n)
        assert np.allclose(np.asarray(op.rmatvec(jnp.asarray(x))),
                           A.T @ x, atol=1e-10)
        b = jnp.ones(n, jnp.float64)
        xs, stats = kt.bicgstab(op, b, atol=0.0, rtol=1e-10)
        assert stats.solved
        assert np.linalg.norm(A @ np.asarray(xs) - 1.0) <= 1e-6


class TestSELLBucketed:
    """Depth-bucketed packing: per-bucket Kmax instead of a global one."""

    def _skewed(self, n=1 << 14, w=300, seed=0, nheavy=150, hdeg=120):
        """Uniform band + a clustered heavy-row block (constraint rows at
        the end of a FEM system: a global Kmax poisons every slice for
        the sake of the last one)."""
        rng = np.random.default_rng(seed)
        deg = np.full(n, 7)
        heavy = n - 1 - rng.choice(2048, nheavy, replace=False)
        deg[heavy] = hdeg
        r = np.repeat(np.arange(n, dtype=np.int64), deg)
        c = np.clip(r + rng.integers(-w, w + 1, size=r.size), 0, n - 1)
        v = rng.standard_normal(r.size)
        A = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
        A.sum_duplicates()
        return A

    def test_matches_scipy_and_improves_fill(self):
        from krylov_tpu.ops.pallas_sell import (SELLBucketed,
                                                sell_bucketed_from_csr)
        A = self._skewed()
        S1 = sell_from_csr(_csr(A))
        SB = sell_bucketed_from_csr(_csr(A))
        assert isinstance(SB, SELLBucketed)
        assert SB.nnz == S1.nnz == A.nnz
        assert SB.slots < 0.6 * S1.data.size      # padding materially cut
        x = np.random.default_rng(1).standard_normal(A.shape[1])
        y = SB @ jnp.asarray(x)
        assert np.allclose(np.asarray(y), A @ x, atol=1e-10)

    def test_fat_tailed_band_never_regresses(self):
        # zipf degrees on a band: irreducibly deep — the plan chooser must
        # not pick a packing worse than the single global-Kmax one
        from krylov_tpu.ops.pallas_sell import sell_bucketed_from_csr
        rng = np.random.default_rng(0)
        n, w = 1 << 13, 300
        deg = np.minimum(2 + rng.zipf(1.6, size=n), 200)
        r = np.repeat(np.arange(n, dtype=np.int64), deg)
        c = np.clip(r + rng.integers(-w, w + 1, size=r.size), 0, n - 1)
        A = sp.coo_matrix((rng.standard_normal(r.size), (r, c)),
                          shape=(n, n)).tocsr()
        A.sum_duplicates()
        S1 = sell_from_csr(_csr(A))
        SB = sell_bucketed_from_csr(_csr(A))
        slots = SB.slots if hasattr(SB, "slots") else SB.data.size
        assert slots <= S1.data.size
        x = np.random.default_rng(1).standard_normal(n)
        assert np.allclose(np.asarray(SB @ jnp.asarray(x)), A @ x,
                           atol=1e-10)

    def test_heavy_row_isolated(self):
        # one 100-deep row must not poison the padding of the whole matrix
        from krylov_tpu.ops.pallas_sell import (SELLBucketed,
                                                sell_bucketed_from_csr)
        A = sp.eye(8192, format="lil")
        A[3, :100] = np.arange(1.0, 101.0)
        A = A.tocsr()
        S1 = sell_from_csr(_csr(A))
        SB = sell_bucketed_from_csr(_csr(A))
        assert isinstance(SB, SELLBucketed)
        assert SB.slots < 0.05 * S1.data.size     # 101-deep Kmax contained
        x = np.random.default_rng(2).standard_normal(8192)
        assert np.allclose(np.asarray(SB @ jnp.asarray(x)), A @ x,
                           atol=1e-10)

    def test_uniform_pattern_stays_single(self):
        from krylov_tpu.ops.pallas_sell import sell_bucketed_from_csr
        n = 2048
        T = sp.diags([1.0, 4.0, 1.0], [-1, 0, 1], (n, n)).tocsr()
        S = sell_bucketed_from_csr(_csr(T))
        assert not hasattr(S, "parts")            # plain SELLMatrix

    def test_hybrid_routes_bucketed_and_jits(self):
        from krylov_tpu.ops.pallas_sell import SELLBucketed
        A = self._skewed(n=1 << 13, seed=4)
        A.setdiag(0)
        A.eliminate_zeros()
        H = hybrid_from_csr(_csr(A))
        assert isinstance(H.sell, SELLBucketed)
        x = jnp.asarray(np.random.default_rng(5).standard_normal(A.shape[1]))

        @jax.jit
        def f(H_, v):
            return hybrid_spmv(H_, v)

        assert np.allclose(np.asarray(f(H, x)), A @ np.asarray(x),
                           atol=1e-10)
