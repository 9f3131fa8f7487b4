"""AOT solver export (krylov_tpu.aot) — serialize/rehydrate round trips.

No reference analogue (the closest is the juliac-compiled C library,
mirrored by native/); correctness is pinned against the live wrappers.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import krylov_tpu as kt
from krylov_tpu.aot import decode_status
from krylov_tpu.operators import MatrixOperator


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    return (Q @ Q.T / n + 2.0 * np.eye(n)).astype(np.float64)


class TestExportRoundtrip:
    def test_cg_dense_roundtrip(self, tmp_path):
        n = 32
        A = _spd(n)
        b = np.random.default_rng(1).standard_normal(n)
        blob = kt.export_solver("cg", MatrixOperator, jnp.asarray(A),
                                jnp.asarray(b), atol=0.0, rtol=1e-10)
        assert isinstance(blob, (bytes, bytearray))
        # ship through disk
        p = tmp_path / "cg_solver.bin"
        p.write_bytes(blob)
        solve = kt.load_solver(p.read_bytes())
        x, niter, code = solve(jnp.asarray(A), jnp.asarray(b))
        xs, st = kt.cg(A, b, atol=0.0, rtol=1e-10)
        assert int(niter) == st.niter
        assert decode_status(code, int(niter), 2 * n) == st.status
        assert np.allclose(np.asarray(x), np.asarray(xs), atol=1e-12)
        # a DIFFERENT rhs through the same artifact, no retrace
        b2 = np.random.default_rng(2).standard_normal(n)
        x2, niter2, _ = solve(jnp.asarray(A), jnp.asarray(b2))
        r = np.linalg.norm(b2 - A @ np.asarray(x2)) / np.linalg.norm(b2)
        assert r <= 1e-8

    def test_gmres_dia_roundtrip(self):
        import sys
        sys.path.insert(0, "tests")
        from krylov_tpu.ops.dia import DIAMatrix, convdiff_dia
        from krylov_tpu.operators import DIAOperator

        D = convdiff_dia(6, 6, 6, pe=0.3, dtype=np.float64)
        n = D.shape[0]
        b = np.ones(n)

        def make_op(data):
            return DIAOperator(DIAMatrix(data, D.offsets, D.shape),
                               use_pallas=False)

        blob = kt.export_solver("gmres", make_op, D.data, jnp.asarray(b),
                                rtol=1e-10, memory=20)
        solve = kt.load_solver(blob)
        x, niter, code = solve(D.data, jnp.asarray(b))
        xs, st = kt.gmres(DIAOperator(D, use_pallas=False), b,
                          memory=20, restart=True, rtol=1e-10)
        assert int(niter) == st.niter
        assert np.allclose(np.asarray(x), np.asarray(xs), atol=1e-12)

    def test_lsqr_roundtrip(self):
        rng = np.random.default_rng(3)
        m, n = 48, 20
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        blob = kt.export_solver("lsqr", MatrixOperator, jnp.asarray(A),
                                jnp.asarray(b), lam=0.2)
        solve = kt.load_solver(blob)
        x, niter, code = solve(jnp.asarray(A), jnp.asarray(b))
        xs, st = kt.lsqr(A, b, lam=0.2)
        assert int(niter) == st.niter
        assert np.allclose(np.asarray(x), np.asarray(xs), atol=1e-12)
        assert decode_status(code, int(niter), m + n) == st.status

    def test_rejects_unknown_method(self):
        with pytest.raises(ValueError, match="supports"):
            kt.export_solver("craig", MatrixOperator,
                             jnp.zeros((4, 4)), jnp.zeros(4))


def test_export_solver_xy_tricg_roundtrip():
    """(x, y) export: the artifact solves the saddle system bit-identically
    to the live library (VERDICT r3 #8)."""
    rng = np.random.default_rng(0)
    n = 24
    A = (rng.standard_normal((n, n)) / np.sqrt(n) * 0.4).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    blob = kt.export_solver_xy("tricg", MatrixOperator, jnp.asarray(A),
                               jnp.asarray(b), jnp.asarray(c), rtol=1e-5)
    solve = kt.load_solver(blob)
    x, y, it, code = solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    x2, y2, st2 = kt.tricg(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                           jnp.asarray(c), rtol=1e-5)
    assert int(it) == st2.niter
    assert float(jnp.max(jnp.abs(x - x2))) == 0.0
    assert float(jnp.max(jnp.abs(y - y2))) == 0.0
    from krylov_tpu.aot import decode_status
    assert decode_status(code, int(it), 2 * n) == st2.status


def test_export_solver_xy_bilqr():
    rng = np.random.default_rng(1)
    n = 24
    A = (rng.standard_normal((n, n)) / np.sqrt(n) * 0.4
         + 2.0 * np.eye(n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    blob = kt.export_solver_xy("bilqr", MatrixOperator, jnp.asarray(A),
                               jnp.asarray(b), jnp.asarray(c), rtol=1e-5)
    x, y, it, code = kt.load_solver(blob)(jnp.asarray(A), jnp.asarray(b),
                                          jnp.asarray(c))
    rp = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    rd = np.linalg.norm(c - A.T @ np.asarray(y)) / np.linalg.norm(c)
    assert max(rp, rd) <= 5e-4
