#!/usr/bin/env python
"""Experiment: general-path GMRES per-iteration cost breakdown on TPU.

BENCH_r03 shows the general `_gmres_core` at ~236 µs/iter on the 48³
convection-diffusion fixture (n=110592, mem=20) while the fused kernel
does 8 µs — this isolates which host-level formulation choices cost
what.  Two suspects:

  1. `_orthogonalize` materializes a masked copy of the (mem, n) basis
     panel (`Vm = where(mask, V, 0)`) every iteration — ~2 extra HBM
     passes; masking the (mem,) coefficient vector instead is
     numerically identical (stale rows hit 0 coefficients).
  2. `_apply_prev_rotations` / `_back_substitute` run `lax.fori_loop`s
     of tiny sequential scalar updates — on TPU each trip is a real
     sequential step; unrolling (mem is static and small) lets XLA fuse
     the whole chain into one kernel.

Method: S-solves-in-one-jit median differencing (bench.py harness),
variants applied by monkeypatching module globals + jax.clear_caches().
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from krylov_tpu.ops.dia import convdiff_dia
    from krylov_tpu.operators import DIAOperator, DiagonalOperator
    from krylov_tpu.solvers import gmres as gm
    from benchmarks import adapters

    dtype = np.float32
    N = 48
    D = convdiff_dia(N, N, N, pe=0.3, dtype=dtype)
    n = D.shape[0]
    A = DIAOperator(D)
    M = DiagonalOperator(jnp.full(n, 1.0 / 6.0, dtype))
    b = jnp.ones(n, dtype)
    rtol = 1e-6

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    def fetch2(pair):
        it, chk = jax.device_get(pair)
        return int(it), float(chk)

    def measure(label, S=16, reps=5):
        solve, ops, rhs = adapters.make_gmres(A, M, b, rtol, 600, mem=20)

        @jax.jit
        def multi(ops, rhs, s):
            def body(i, acc):
                tot, chk = acc
                def scale(v):
                    return v * (1 + 0.001 * i).astype(v.dtype)
                it, c = solve(ops, jax.tree_util.tree_map(scale, rhs))
                return tot + it, chk + c
            return jax.lax.fori_loop(0, s, body, (jnp.int32(0),
                                                  jnp.float32(0)))

        i1, _ = fetch2(multi(ops, rhs, 1))
        t1 = statistics.median(
            _timed(lambda: fetch2(multi(ops, rhs, 1))) for _ in range(reps))
        iS, _ = fetch2(multi(ops, rhs, S))
        tS = statistics.median(
            _timed(lambda: fetch2(multi(ops, rhs, S))) for _ in range(reps))
        per_solve = (tS - t1) / (S - 1)
        per_iter = per_solve / i1
        print(f"{label:28s} niter={i1:4d} per_solve={per_solve*1e3:8.3f} ms "
              f"per_iter={per_iter*1e6:8.2f} us", flush=True)
        return i1, per_iter

    # ---- variant implementations -------------------------------------

    orig_orth = gm._orthogonalize
    orig_rot = gm._apply_prev_rotations

    def orth_maskh(V, q, k, mem, extra_pass):
        # mask the coefficient vector, not the basis panel
        mask = jnp.arange(mem) <= k
        h = jnp.where(mask, jnp.conj(V) @ q, 0)
        q = q - V.T @ h
        h2 = jnp.where(mask, jnp.conj(V) @ q, 0)
        q = q - V.T @ h2
        h = h + h2
        if extra_pass:
            h3 = jnp.where(mask, jnp.conj(V) @ q, 0)
            q = q - V.T @ h3
            h = h + h3
        return q, h

    def rot_unrolled(hcol, c, s, k, mem):
        for i in range(mem):
            active = i < k
            hi, hi1 = hcol[i], hcol[i + 1]
            new_i = c[i] * hi + s[i] * hi1
            new_i1 = jnp.conj(s[i]) * hi - c[i] * hi1
            hcol = hcol.at[i].set(jnp.where(active, new_i, hi))
            hcol = hcol.at[i + 1].set(jnp.where(active, new_i1, hi1))
        return hcol

    def orth_vpu(V, q, k, mem, extra_pass):
        # multiply-reduce on the VPU: a (mem,n)@(n,) dot at highest
        # precision is 6 MXU passes with a 20×1 output — all padding;
        # an explicit elementwise product + axis reduction is one
        # bandwidth-bound VPU pass and f32-exact.
        mask = jnp.arange(mem) <= k

        def proj(qv):
            h = jnp.where(mask, jnp.sum(jnp.conj(V) * qv[None, :], axis=1), 0)
            return qv - jnp.sum(V * h[:, None], axis=0), h

        q, h = proj(q)
        q, h2 = proj(q)
        h = h + h2
        if extra_pass:
            q, h3 = proj(q)
            h = h + h3
        return q, h

    variants = [
        ("base", orig_orth, orig_rot),
        ("mask-h orth", orth_maskh, orig_rot),
        ("unrolled rotations", orig_orth, rot_unrolled),
        ("both", orth_maskh, rot_unrolled),
        ("vpu orth", orth_vpu, orig_rot),
        ("vpu orth + unrolled", orth_vpu, rot_unrolled),
    ]
    base_niter = None
    for label, orth, rot in variants:
        gm._orthogonalize = orth
        gm._apply_prev_rotations = rot
        jax.clear_caches()
        niter, _ = measure(label)
        if base_niter is None:
            base_niter = niter
        elif niter != base_niter:
            print(f"  !! niter changed vs base: {niter} != {base_niter}")
    gm._orthogonalize = orig_orth
    gm._apply_prev_rotations = orig_rot


if __name__ == "__main__":
    main()
