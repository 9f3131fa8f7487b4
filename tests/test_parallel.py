"""Multi-device distribution tests on the 8-device virtual CPU mesh
(SURVEY.md §2.5: row partition + halo exchange + psum dots)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krylov_tpu.ops.dia import poisson_dia, dia_spmv
from krylov_tpu.parallel import (
    make_mesh, shard_vector, shard_dia, sharded_dia_operator, halo_dia_spmv,
)
from krylov_tpu import cg, minres, gmres


@pytest.fixture(scope="module")
def mesh():
    # adapts to the CI mesh-shape matrix (1/4/8 virtual devices); the
    # fixtures divide evenly over any power-of-two device count ≤ 8.
    nd = min(len(jax.devices()), 8)
    return make_mesh(nd)


class TestShardedSpmv:
    def test_auto_sharded_matches(self, mesh):
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        x = np.random.default_rng(0).standard_normal(N ** 3)
        y_ref = np.asarray(dia_spmv(D.data, D.offsets, jnp.asarray(x)))
        Ds = shard_dia(D, mesh)
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(dia_spmv(Ds.data, Ds.offsets, xs))
        assert np.allclose(y, y_ref)

    def test_halo_shard_map_matches(self, mesh):
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        x = np.random.default_rng(1).standard_normal(N ** 3)
        y_ref = np.asarray(dia_spmv(D.data, D.offsets, jnp.asarray(x)))
        Ds = shard_dia(D, mesh)
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(halo_dia_spmv(Ds.data, Ds.offsets, xs, mesh))
        assert np.allclose(y, y_ref)


class TestShardedSolvers:
    def test_cg_sharded(self, mesh):
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        b = jnp.ones(N ** 3, dtype=jnp.float64)
        op = sharded_dia_operator(D, mesh)
        bs = shard_vector(b, mesh)
        x, stats = cg(op, bs, atol=0.0, rtol=1e-10)
        assert stats.solved
        r = np.asarray(b) - np.asarray(dia_spmv(D.data, D.offsets, x))
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-9
        # solution matches the single-device solve
        x_ref, _ = cg(D, b, atol=0.0, rtol=1e-10)
        assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-10)

    def test_minres_sharded(self, mesh):
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        b = jnp.ones(N ** 3, dtype=jnp.float64)
        op = sharded_dia_operator(D, mesh)
        bs = shard_vector(b, mesh)
        x, stats = minres(op, bs)
        assert stats.solved

    def test_gmres_sharded(self, mesh):
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        b = jnp.ones(N ** 3, dtype=jnp.float64)
        op = sharded_dia_operator(D, mesh)
        bs = shard_vector(b, mesh)
        x, stats = gmres(op, bs, memory=30, restart=True)
        assert stats.solved


class TestShardedCSR:
    # SURVEY §2.5 row-partitioned CSR: local segment-sum SpMV plus a
    # static ppermute ring plan for remote columns (no replication).
    def test_sharded_csr_matvec_matches_dense(self):
        import scipy.sparse as sp
        from krylov_tpu.parallel.sharding import (
            make_mesh, shard_vector, sharded_csr_matvec)
        from krylov_tpu.ops.sparse import csr_from_dense
        rng = np.random.default_rng(0)
        n = 64
        Ad = (sp.random(n, n, density=0.15, random_state=1)
              + sp.eye(n)).toarray()
        csr = csr_from_dense(jnp.asarray(Ad))
        mesh = make_mesh(8)
        mv = sharded_csr_matvec(csr, mesh)
        x = shard_vector(jnp.asarray(rng.standard_normal(n)), mesh)
        y = jax.jit(mv)(x)
        assert np.allclose(np.asarray(y), Ad @ np.asarray(x), atol=1e-12)
        assert "rows" in str(y.sharding)

    def test_sharded_csr_cg(self):
        import scipy.sparse as sp
        from krylov_tpu.parallel.sharding import (
            make_mesh, shard_vector, sharded_csr_matvec)
        from krylov_tpu.ops.sparse import csr_from_dense
        from krylov_tpu.operators import FunctionOperator
        from krylov_tpu import cg
        rng = np.random.default_rng(1)
        n = 64
        Ad = rng.standard_normal((n, n))
        S = Ad @ Ad.T + n * np.eye(n)
        mesh = make_mesh(8)
        mv = sharded_csr_matvec(csr_from_dense(jnp.asarray(S)), mesh)
        op = FunctionOperator(mv, (n, n), jnp.float64)
        b = shard_vector(jnp.ones(n), mesh)
        x, stats = cg(op, b, rtol=1e-10)
        assert stats.solved
        assert np.linalg.norm(S @ np.asarray(x) - 1) <= 1e-6

    def test_plan_is_minimal_for_stencil(self):
        # A tridiagonal system couples only adjacent blocks: the comm
        # plan must use ring distances {1, nd-1} (left+right neighbours)
        # and ship exactly one x entry per round — never replicate x.
        from krylov_tpu.parallel.sharding import make_mesh, sharded_csr_matvec
        from krylov_tpu.ops.sparse import csr_from_dense
        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 devices for a non-trivial ring")
        nd = min(len(jax.devices()), 8)
        n = 8 * nd
        T = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))
        mesh = make_mesh(nd)
        mv = sharded_csr_matvec(csr_from_dense(jnp.asarray(T)), mesh)
        assert set(mv.plan_counts) == {1, nd - 1}
        assert all(c == 1 for c in mv.plan_counts.values())
        x = jnp.arange(n, dtype=jnp.float64)
        assert np.allclose(np.asarray(jax.jit(mv)(x)), T @ np.asarray(x))

    def test_plan_general_sparsity_no_fallback(self):
        # Long-range coupling (column block far from the row block) used
        # to trigger an all_gather fallback; the static plan must serve
        # it with targeted rounds whose widths match the actual cut.
        from krylov_tpu.parallel.sharding import make_mesh, sharded_csr_matvec
        from krylov_tpu.ops.sparse import csr_from_dense
        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 devices")
        nd = min(len(jax.devices()), 8)
        n = 8 * nd
        A = np.eye(n)
        A[0, n - 3] = 2.0          # device 0 reads from the last device
        A[n - 1, 5] = 3.0          # last device reads from device 0
        mesh = make_mesh(nd)
        mv = sharded_csr_matvec(csr_from_dense(jnp.asarray(A)), mesh)
        assert mv.halo is not None          # no replication fallback
        assert sum(mv.plan_counts.values()) == 2   # exactly the cut
        x = jnp.arange(1.0, n + 1.0)
        assert np.allclose(np.asarray(jax.jit(mv)(x)), A @ np.asarray(x))

    def test_uneven_rows_raise(self):
        from krylov_tpu.parallel.sharding import make_mesh, sharded_csr_matvec
        from krylov_tpu.ops.sparse import csr_from_dense
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh to have uneven rows")
        nd = min(len(jax.devices()), 8)
        A = jnp.eye(nd + 1)   # rows cannot divide evenly over nd devices
        with pytest.raises(ValueError, match="divide evenly"):
            sharded_csr_matvec(csr_from_dense(A), make_mesh(nd))


class TestShardingPreserved:
    def test_solution_keeps_row_sharding(self):
        # host_state must not round-trip vectors through the host: the
        # returned x keeps the input row sharding end-to-end.
        from krylov_tpu.ops.dia import poisson_dia
        from krylov_tpu.parallel import (
            make_mesh, shard_vector, sharded_dia_operator)
        import krylov_tpu as kt
        D = poisson_dia(16, 16, 16, dtype=np.float64)
        mesh = make_mesh(8)
        op = sharded_dia_operator(D, mesh)
        b = shard_vector(jnp.ones(16 ** 3), mesh)
        x, stats = kt.cg(op, b, rtol=1e-8)
        assert stats.solved
        assert "rows" in str(x.sharding)


class TestPipelinedCg:
    """Ghysels-Vanroose communication-hiding CG (parallel/pipelined.py)."""

    def test_matches_cg(self, mesh):
        from krylov_tpu import pipelined_cg
        N = 8
        D = poisson_dia(N, N, N, dtype=np.float64)
        b = jnp.ones(N ** 3, dtype=jnp.float64)
        x_ref, st_ref = cg(D, b, atol=0.0, rtol=1e-10)
        x, st = pipelined_cg(D, b, atol=0.0, rtol=1e-10)
        assert st.solved
        # residual-recurrence drift allows a small niter spread
        assert abs(st.niter - st_ref.niter) <= max(3, 0.2 * st_ref.niter)
        r = np.asarray(b) - np.asarray(dia_spmv(D.data, D.offsets, x))
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-8

    def test_sharded_and_preconditioned(self, mesh):
        from krylov_tpu import pipelined_cg
        from krylov_tpu.operators import DiagonalOperator
        N = 8
        n = N ** 3
        D = poisson_dia(N, N, N, dtype=np.float64)
        op = sharded_dia_operator(D, mesh)
        b = shard_vector(jnp.ones(n, dtype=jnp.float64), mesh)
        M = DiagonalOperator(shard_vector(jnp.full(n, 1.0 / 6.0), mesh))
        x, st = pipelined_cg(op, b, M=M, atol=0.0, rtol=1e-10)
        assert st.solved
        r = np.asarray(jnp.ones(n)) - np.asarray(
            dia_spmv(D.data, D.offsets, x))
        assert np.linalg.norm(r) / np.sqrt(n) <= 1e-8

    def test_one_reduction_round_per_iteration(self, mesh):
        """The point of PIPECG: the partitioned HLO has ~half the
        all-reduce rounds of standard CG (3 independent dots fuse into
        one round; CG's 2 dots are dependent)."""
        if len(jax.devices()) < 2:
            pytest.skip("collectives only appear on a real multi-device mesh")
        from krylov_tpu.parallel.pipelined import _pipecg_core
        from krylov_tpu.solvers.cg import _cg_core
        N = 8
        n = N ** 3
        D = poisson_dia(N, N, N, dtype=np.float64)
        op = sharded_dia_operator(D, mesh)
        b = shard_vector(jnp.ones(n, dtype=jnp.float64), mesh)

        n_pipe = _pipecg_core.lower(
            op, None, b, None, None, jnp.int32(10), 0.0, 1e-10,
            MisI=True).compile().as_text().count("all-reduce")
        n_cg = _cg_core.lower(
            op, None, b, None, None, jnp.int32(10), 0.0, 1e-10, 0.0,
            ldiv=False, linesearch=False, history=False, hist_len=0,
            callback=None, verbose=0, use_radius=False,
            dot2=False).compile().as_text().count("all-reduce")
        # measured on the 8-device CPU mesh: 8 vs 27 mentions — the
        # pipelined body fuses its three independent dots into one
        # reduction round where CG pays two dependent rounds
        assert n_pipe >= 1
        assert 2 * n_pipe <= n_cg


class TestShardedBatch:
    def test_batched_solve_over_mesh(self, mesh):
        # Data-parallel batches: shard the leading batch axis over the
        # mesh; the vmapped program partitions with no communication and
        # the solution keeps the batch sharding.
        from jax.sharding import NamedSharding, PartitionSpec as P
        import krylov_tpu as kt

        nd = mesh.devices.size
        rng = np.random.default_rng(0)
        nb, n = 2 * nd, 20
        Q = rng.standard_normal((nb, n, n))
        As = jnp.asarray(Q @ np.transpose(Q, (0, 2, 1)) / n + 2 * np.eye(n))
        Bs = jnp.asarray(rng.standard_normal((nb, n)))
        axis = mesh.axis_names[0]
        As_s = jax.device_put(As, NamedSharding(mesh, P(axis)))
        Bs_s = jax.device_put(Bs, NamedSharding(mesh, P(axis)))
        X, stats = kt.batched_solve("cg", As_s, Bs_s, rtol=1e-10)
        assert stats.solved.all()
        assert X.sharding.spec == P(axis)
        for i in range(nb):
            ref = np.linalg.solve(np.asarray(As[i]), np.asarray(Bs[i]))
            assert np.allclose(np.asarray(X[i]), ref, atol=1e-7)


class TestMakeMesh:
    def test_never_silently_shrinks(self):
        """An n-way mesh request either yields n devices or raises —
        round-5 fix: under the axon sitecustomize jax.devices() is one
        remote chip even with JAX_PLATFORMS=cpu set, and devs[:n] of a
        1-element list built a 1-device mesh that made every multi-chip
        consistency check vacuous."""
        nd = min(len(jax.devices()), 8)
        m = make_mesh(nd)
        assert m.devices.size == nd
        with pytest.raises(ValueError, match="requested but only"):
            make_mesh(10_000)

    def test_explicit_devices(self):
        devs = jax.devices()[:2]
        m = make_mesh(2, devices=devs)
        assert list(m.devices.flat) == list(devs)
        with pytest.raises(ValueError):
            make_mesh(4, devices=devs)
