"""ELL / BELL (Pallas) sparse kernels — correctness on the CPU interpreter."""

import numpy as np
import jax.numpy as jnp
import pytest

from krylov_tpu.ops.pallas_spmv import (
    ell_from_csr, ell_spmv, bell_from_dense_blocks, bell_spmv, ELLMatrix,
)
from krylov_tpu.ops.sparse import csr_from_dense
import fixtures as fx


class TestELL:
    def test_matches_dense(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((30, 25))
        A[np.abs(A) < 1.2] = 0.0
        ell = ell_from_csr(csr_from_dense(A))
        x = rng.standard_normal(25)
        y = np.asarray(ell_spmv(ell.data, ell.indices, x))
        assert np.allclose(y, A @ x)

    def test_laplacian(self):
        A = fx.get_div_grad(6, 6, 6)
        from krylov_tpu.ops.sparse import csr_from_coo
        Ac = A.tocoo()
        csr = csr_from_coo(Ac.row, Ac.col, Ac.data, Ac.shape)
        ell = ell_from_csr(csr)
        x = np.random.default_rng(1).standard_normal(216)
        y = np.asarray(ell @ x)
        assert np.allclose(y, A @ x)


class TestBELL:
    def test_block_structure(self):
        rng = np.random.default_rng(2)
        n = 64
        A = np.zeros((n, n))
        for i in range(0, n, 8):
            A[i:i + 8, i:i + 8] = rng.standard_normal((8, 8))
        A[0:8, 32:40] = rng.standard_normal((8, 8))
        A[56:64, 0:8] = rng.standard_normal((8, 8))
        B = bell_from_dense_blocks(A, bs=8)
        x = rng.standard_normal(n)
        y = np.asarray(bell_spmv(B, x))
        assert np.allclose(y, A @ x, atol=1e-10)

    def test_nonsquare_padding(self):
        rng = np.random.default_rng(3)
        A = np.zeros((20, 12))
        A[0:8, 0:8] = rng.standard_normal((8, 8))
        A[8:16, 4:12] = rng.standard_normal((8, 8))
        B = bell_from_dense_blocks(A, bs=8)
        x = rng.standard_normal(12)
        y = np.asarray(bell_spmv(B, x))
        assert np.allclose(y, A @ x, atol=1e-10)

    def test_in_solver(self):
        # BELL as the operator inside CG via FunctionOperator.
        from krylov_tpu.operators import FunctionOperator
        from krylov_tpu import cg
        rng = np.random.default_rng(4)
        n = 32
        A = np.zeros((n, n))
        for i in range(0, n, 8):
            A[i:i + 8, i:i + 8] = np.eye(8) * 4 + rng.standard_normal((8, 8)) * 0.1
        A = (A + A.T) / 2 + 4 * np.eye(n)
        B = bell_from_dense_blocks(A, bs=8)
        op = FunctionOperator(lambda v: bell_spmv(B, v), (n, n), B.dtype)
        b = A @ np.ones(n)
        x, stats = cg(op, b)
        assert stats.solved
        assert np.allclose(np.asarray(x), np.ones(n), atol=1e-6)


class TestPallasDia:
    # single-pass DIA stencil kernel (ops/pallas_dia.py) vs XLA lowering
    def test_matches_dia_spmv(self):
        from krylov_tpu.ops.dia import poisson_dia, dia_spmv
        from krylov_tpu.ops.pallas_dia import dia_align, dia_spmv_pallas
        # (32,32,32)=32768 is an exact tile multiple and exercises the
        # round-5 ZERO-COPY path (clamped boundary halo blocks — safe
        # because dia_align zeroes out-of-range pd); the other shapes
        # take the padded-staging path
        for dims in ((8, 8, 8), (5, 7, 3), (16, 4, 2), (32, 32, 32)):
            D = poisson_dia(*dims, dtype=np.float64)
            n = dims[0] * dims[1] * dims[2]
            x = jnp.asarray(np.random.default_rng(0).standard_normal(n))
            got = dia_spmv_pallas(dia_align(D.data, D.offsets, n),
                                  D.offsets, x)
            want = dia_spmv(D.data, D.offsets, x)
            assert np.array_equal(np.asarray(got), np.asarray(want)), dims

    def test_operator_pallas_path_cg(self):
        from krylov_tpu.ops.dia import poisson_dia
        from krylov_tpu.operators import DIAOperator
        from krylov_tpu import cg
        D = poisson_dia(8, 8, 8, dtype=np.float64)
        b = jnp.ones(512)
        op = DIAOperator(D, use_pallas=True)   # interpret mode on CPU
        x, stats = cg(op, b, rtol=1e-10)
        assert stats.solved
        r = np.asarray(op.matvec(x)) - 1.0
        assert np.linalg.norm(r) <= 1e-7

    def test_default_backend_selection(self):
        from krylov_tpu.ops.dia import poisson_dia
        from krylov_tpu.operators import DIAOperator
        D = poisson_dia(4, 4, 4, dtype=np.float64)
        assert DIAOperator(D).use_pallas is False  # tests run on cpu


class TestBellOperator:
    def test_cg_through_bell_operator(self):
        import krylov_tpu as kt
        from krylov_tpu.ops.pallas_spmv import bell_from_dense_blocks
        rng = np.random.default_rng(0)
        n = 64
        Ad = rng.standard_normal((n, n))
        S = Ad @ Ad.T + n * np.eye(n)
        op = kt.BELLOperator(bell_from_dense_blocks(jnp.asarray(S), bs=8))
        x, stats = kt.cg(op, jnp.ones(n), rtol=1e-10)
        assert stats.solved
        assert np.linalg.norm(S @ np.asarray(x) - 1) <= 1e-6

    def test_rmatvec_requires_adjoint_storage(self):
        import krylov_tpu as kt
        from krylov_tpu.ops.pallas_spmv import bell_from_dense_blocks
        bell = bell_from_dense_blocks(jnp.eye(16), bs=8)
        with pytest.raises(ValueError, match="adjoint storage"):
            kt.BELLOperator(bell).rmatvec(jnp.ones(16))


class TestBellFromCsr:
    def test_matches_dense_builder(self):
        from krylov_tpu.ops.sparse import csr_from_dense
        from krylov_tpu.ops.pallas_spmv import (
            bell_from_csr, bell_from_dense_blocks, bell_spmv)
        rng = np.random.default_rng(2)
        S = np.where(rng.random((48, 48)) < 0.2,
                     rng.standard_normal((48, 48)), 0.0)
        csr = csr_from_dense(jnp.asarray(S))
        b1 = bell_from_csr(csr, bs=8)
        v = jnp.asarray(rng.standard_normal(48))
        y1 = bell_spmv(b1, v, interpret=True)
        assert np.allclose(np.asarray(y1), S @ np.asarray(v), atol=1e-12)
        # occupied-block count never exceeds the dense builder's
        b2 = bell_from_dense_blocks(jnp.asarray(S), bs=8)
        assert b1.data.shape[1] <= b2.data.shape[1]


class TestBellSpmm:
    def _bell(self, dtype=np.float32):
        from krylov_tpu.ops.pallas_spmv import BELLMatrix
        rng = np.random.default_rng(5)
        bs, nb, mbpr = 128, 4, 2
        data = rng.standard_normal((nb, mbpr, bs, bs)).astype(dtype) / bs
        idx = np.array([[0, 1], [0, 1], [2, 3], [2, 3]], np.int32)
        n = nb * bs
        A = BELLMatrix(jnp.asarray(data), jnp.asarray(idx), (n, n), bs)
        dense = np.zeros((n, n), dtype)
        for i in range(nb):
            for k in range(mbpr):
                j = idx[i, k]
                dense[i*bs:(i+1)*bs, j*bs:(j+1)*bs] += data[i, k]
        return A, dense

    @pytest.mark.parametrize("p", [1, 4, 8, 130])
    def test_matches_dense(self, p):
        from krylov_tpu.ops.pallas_spmv import bell_spmm
        A, dense = self._bell()
        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.standard_normal((dense.shape[1], p)), np.float32)
        Y = bell_spmm(A, X, interpret=True)
        Yref = dense @ np.asarray(X)
        assert np.max(np.abs(np.asarray(Y) - Yref)) < 1e-4

    def test_block_gmres_over_bell_operator(self):
        import krylov_tpu as kt
        from krylov_tpu.operators import BELLOperator
        from krylov_tpu.ops.pallas_spmv import BELLMatrix
        rng = np.random.default_rng(9)
        bs, nb = 128, 3
        n = nb * bs
        # SPD block-tridiagonal
        diag_blocks = []
        for i in range(nb):
            M = rng.standard_normal((bs, bs)) / bs
            diag_blocks.append(M @ M.T + 2 * np.eye(bs))
        off = rng.standard_normal((bs, bs)) / (4 * bs)
        data = np.zeros((nb, 3, bs, bs), np.float64)
        idx = np.zeros((nb, 3), np.int32)
        for i in range(nb):
            cols = [max(0, i - 1), i, min(nb - 1, i + 1)]
            idx[i] = cols
            for k, j in enumerate(cols):
                if j == i:
                    data[i, k] += diag_blocks[i]
                elif j == i - 1:
                    data[i, k] += off
                elif j == i + 1:
                    data[i, k] += off.T
        A = BELLOperator(BELLMatrix(jnp.asarray(data), jnp.asarray(idx),
                                    (n, n), bs))
        B = jnp.asarray(rng.standard_normal((n, 2)))
        X, stats = kt.block_gmres(A, B, atol=0.0, rtol=1e-10, memory=30)
        assert stats.solved
        R = np.asarray(B) - np.asarray(A.matmat(X))
        assert np.linalg.norm(R) <= 1e-8 * np.linalg.norm(np.asarray(B))


class TestDiaPaddedLayout:
    """Chainable padded-layout SpMV (dia_spmv_padded)."""

    def test_matches_and_chains(self):
        from krylov_tpu.ops.dia import poisson_dia, dia_spmv
        from krylov_tpu.ops.pallas_dia import (
            dia_align, dia_pad_layout, dia_unpad_layout, dia_spmv_padded)
        N = 12
        n = N ** 3
        D = poisson_dia(N, N, N, dtype=np.float32)
        pd = dia_align(D.data, D.offsets, n)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(n), np.float32)
        xw = dia_pad_layout(x, D.offsets)
        yw = dia_spmv_padded(pd, D.offsets, xw, n, interpret=True)
        y1 = dia_unpad_layout(yw, D.offsets, n)
        ref1 = dia_spmv(D.data, D.offsets, x)
        assert float(jnp.max(jnp.abs(y1 - ref1))) < 1e-4
        # chaining without re-padding preserves the halo invariant
        y2w = dia_spmv_padded(pd, D.offsets, yw, n, interpret=True)
        y2 = dia_unpad_layout(y2w, D.offsets, n)
        ref2 = dia_spmv(D.data, D.offsets, ref1)
        assert float(jnp.max(jnp.abs(y2 - ref2))) < 1e-3

    def test_roundtrip(self):
        from krylov_tpu.ops.dia import poisson_dia
        from krylov_tpu.ops.pallas_dia import dia_pad_layout, dia_unpad_layout
        D = poisson_dia(8, 8, 8, dtype=np.float64)
        x = jnp.arange(512, dtype=jnp.float64)
        xw = dia_pad_layout(x, D.offsets)
        assert float(jnp.max(jnp.abs(
            dia_unpad_layout(xw, D.offsets, 512) - x))) == 0.0
