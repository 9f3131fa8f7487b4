"""Batched solves (krylov_tpu.batched_solve) — one program, many systems.

No reference analogue (the reference loops small systems on the host);
correctness pinned against per-item dense solves and the scalar
wrappers' stats.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import krylov_tpu as kt
from krylov_tpu.operators import MatrixOperator


def _spd_batch(nb, n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((nb, n, n))
    return (Q @ np.transpose(Q, (0, 2, 1)) / n
            + 2.0 * np.eye(n)).astype(np.float64)


def _nonsym_batch(nb, n, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((nb, n, n)) / np.sqrt(n)
            + 3.0 * np.eye(n)).astype(np.float64)


class TestBatchedSolve:
    @pytest.mark.parametrize("method", ["cg", "minres"])
    def test_dense_spd_batch(self, method):
        nb, n = 6, 24
        As = _spd_batch(nb, n)
        Bs = np.random.default_rng(2).standard_normal((nb, n))
        X, stats = kt.batched_solve(method, As, Bs, rtol=1e-10)
        assert X.shape == (nb, n)
        assert stats.solved.all()
        assert len(stats.status) == nb
        if method == "cg":
            assert all(s == "solution good enough given atol and rtol"
                       for s in stats.status)
        for i in range(nb):
            ref = np.linalg.solve(As[i], Bs[i])
            assert np.allclose(np.asarray(X[i]), ref, atol=1e-7)

    @pytest.mark.parametrize("method", ["gmres", "bicgstab", "qmr"])
    def test_dense_general_batch(self, method):
        nb, n = 4, 20
        As = _nonsym_batch(nb, n)
        Bs = np.random.default_rng(3).standard_normal((nb, n))
        X, stats = kt.batched_solve(method, As, Bs, rtol=1e-10, memory=n)
        assert stats.solved.all()
        for i in range(nb):
            ref = np.linalg.solve(As[i], Bs[i])
            assert np.allclose(np.asarray(X[i]), ref, atol=1e-6)

    def test_niter_matches_scalar_wrapper(self):
        nb, n = 3, 30
        As = _spd_batch(nb, n, seed=5)
        Bs = np.random.default_rng(6).standard_normal((nb, n))
        X, stats = kt.batched_solve("cg", As, Bs, atol=0.0, rtol=1e-8)
        for i in range(nb):
            _, st = kt.cg(As[i], Bs[i], atol=0.0, rtol=1e-8)
            assert stats.niter[i] == st.niter

    def test_make_operator_structured_batch(self):
        # A batch of CSR matrices sharing one sparsity pattern: only the
        # values carry the batch axis.
        from krylov_tpu.ops.sparse import CSRMatrix
        nb, n = 4, 16
        base = _spd_batch(1, n, seed=7)[0]
        mask = (np.abs(base) > 0.2) | np.eye(n, dtype=bool)
        rows, cols = np.nonzero(base * mask)
        rng = np.random.default_rng(8)
        tmpl = kt.csr_from_coo(rows, cols, np.ones(len(rows)), (n, n))
        vals = np.stack([
            np.asarray((base * mask))[rows, cols] + 0.05 * i
            for i in range(nb)])
        # keep each item SPD by construction (scaled diagonal bump)
        Bs = rng.standard_normal((nb, n))

        def make_op(v):
            return CSRMatrix(v, tmpl.indices, tmpl.indptr, tmpl.rows,
                             tmpl.shape)

        X, stats = kt.batched_solve("gmres", jnp.asarray(vals), Bs,
                                    make_operator=make_op, rtol=1e-10,
                                    memory=n)
        assert stats.solved.all()
        for i in range(nb):
            Ad = np.zeros((n, n))
            Ad[rows, cols] = vals[i]
            ref = np.linalg.solve(Ad, Bs[i])
            assert np.allclose(np.asarray(X[i]), ref, atol=1e-6)

    def test_tired_status(self):
        nb, n = 2, 24
        As = _spd_batch(nb, n, seed=9)
        Bs = np.random.default_rng(10).standard_normal((nb, n))
        X, stats = kt.batched_solve("cg", As, Bs, atol=0.0, rtol=1e-14,
                                    itmax=2)
        assert not stats.solved.any()
        assert all(s == "maximum number of iterations exceeded"
                   for s in stats.status)
        assert (stats.niter == 2).all()

    @pytest.mark.parametrize("method", ["lsqr", "lsmr", "cgls"])
    def test_least_squares_batch(self, method):
        # Per-item parity with the scalar wrapper (lsqr/lsmr stop on the
        # √eps backward-error tests, so the normal-equations solution is
        # only matched to backward-error accuracy — the contract is the
        # scalar wrapper, not np.linalg).
        rng = np.random.default_rng(11)
        nb, m, n = 5, 40, 16
        As = rng.standard_normal((nb, m, n))
        Bs = rng.standard_normal((nb, m))
        lam = 0.3
        X, stats = kt.batched_solve(method, As, Bs, lam=lam,
                                    rtol=1e-12 if method == "cgls" else None)
        assert X.shape == (nb, n)
        assert stats.solved.all()
        scalar = getattr(kt, method)
        for i in range(nb):
            kw = dict(lam=lam)
            if method == "cgls":
                kw["rtol"] = 1e-12
            xs, st = scalar(As[i], Bs[i], **kw)
            assert np.allclose(np.asarray(X[i]), np.asarray(xs), atol=1e-10)
            # and both agree with the normal equations to method accuracy
            H = As[i].T @ As[i] + lam * np.eye(n)
            ref = np.linalg.solve(H, As[i].T @ Bs[i])
            assert np.allclose(np.asarray(X[i]), ref, atol=1e-2)

    def test_ls_niter_matches_scalar_wrapper(self):
        rng = np.random.default_rng(12)
        nb, m, n = 3, 30, 12
        As = rng.standard_normal((nb, m, n))
        Bs = rng.standard_normal((nb, m))
        X, stats = kt.batched_solve("lsqr", As, Bs, lam=0.1)
        for i in range(nb):
            _, st = kt.lsqr(As[i], Bs[i], lam=0.1)
            assert stats.niter[i] == st.niter
            assert stats.status[i] == st.status

    def test_rejects(self):
        with pytest.raises(ValueError, match="supports"):
            kt.batched_solve("craig", np.zeros((2, 3, 3)), np.zeros((2, 3)))
        with pytest.raises(ValueError, match="shape"):
            kt.batched_solve("lsqr", np.zeros((2, 7)), np.zeros((2, 3)),
                             make_operator=lambda v: v)
        with pytest.raises(ValueError, match="nb, n"):
            kt.batched_solve("cg", np.zeros((2, 3, 3)), np.zeros(3))
        with pytest.raises(ValueError, match="dense A"):
            kt.batched_solve("cg", np.zeros((2, 4, 3)), np.zeros((2, 3)))


# ---------------------------------------------------------------------------
# round-4 widening: batched (x, y) solves — saddle (tricg/trimr) and
# adjoint-pair (bilqr) families (VERDICT r3 #8)
# ---------------------------------------------------------------------------

def _xy_fixture(nb=6, n=32, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((nb, n, n)) / np.sqrt(n) * 0.5) \
        .astype(np.float32)
    B = rng.standard_normal((nb, n)).astype(np.float32)
    C = rng.standard_normal((nb, n)).astype(np.float32)
    return A, B, C


@pytest.mark.parametrize("method", ("tricg", "trimr"))
def test_batched_xy_saddle(method):
    A, B, C = _xy_fixture()
    X, Y, stats = kt.batched_solve_xy(method, jnp.asarray(A),
                                      jnp.asarray(B), jnp.asarray(C),
                                      rtol=1e-5)
    assert stats.solved.all()
    for i in range(A.shape[0]):
        top = B[i] - (np.asarray(X[i]) + A[i] @ np.asarray(Y[i]))
        bot = C[i] - (A[i].T @ np.asarray(X[i]) - np.asarray(Y[i]))
        rr = np.hypot(np.linalg.norm(top), np.linalg.norm(bot)) \
            / np.linalg.norm(B[i])
        assert rr <= 5e-4, (method, i, rr)
        # item-wise parity with the scalar wrapper
        xi, yi, sti = getattr(kt, method)(
            MatrixOperator(jnp.asarray(A[i])), jnp.asarray(B[i]),
            jnp.asarray(C[i]), rtol=1e-5)
        assert int(stats.niter[i]) == sti.niter
        assert stats.status[i] == sti.status


def test_batched_xy_bilqr():
    A, B, C = _xy_fixture()
    A = A + 2.0 * np.eye(A.shape[1], dtype=np.float32)
    X, Y, stats = kt.batched_solve_xy("bilqr", jnp.asarray(A),
                                      jnp.asarray(B), jnp.asarray(C),
                                      rtol=1e-5)
    assert stats.solved.all()
    for i in range(A.shape[0]):
        rp = np.linalg.norm(B[i] - A[i] @ np.asarray(X[i])) \
            / np.linalg.norm(B[i])
        rd = np.linalg.norm(C[i] - A[i].T @ np.asarray(Y[i])) \
            / np.linalg.norm(C[i])
        assert max(rp, rd) <= 2e-3   # f32 recurrence-vs-true gap
        xi, yi, sti = kt.bilqr(MatrixOperator(jnp.asarray(A[i])),
                               jnp.asarray(B[i]), jnp.asarray(C[i]),
                               rtol=1e-5)
        assert stats.status[i] == sti.status


def test_batched_xy_validation():
    A, B, C = _xy_fixture(nb=2, n=8)
    with pytest.raises(ValueError, match="supports"):
        kt.batched_solve_xy("cg", jnp.asarray(A), jnp.asarray(B),
                            jnp.asarray(C))
    with pytest.raises(ValueError, match="square"):
        kt.batched_solve_xy("bilqr", jnp.asarray(A[:, :, :4]),
                            jnp.asarray(B), jnp.asarray(C[:, :4]))
