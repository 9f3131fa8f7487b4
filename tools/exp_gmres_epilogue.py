#!/usr/bin/env python
"""Isolate the GMRES pass-epilogue cost (~1.6 ms/pass inferred) at
n=110592, mem=20: time back_substitute, V.T@y + x update, and the
restart re-init individually via S-in-one-jit differencing.
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
    from krylov_tpu.operators import DIAOperator
    from krylov_tpu.ops.kops import knorm
    from krylov_tpu.solvers import gmres as gm

    dtype = np.float32
    N = 48
    D = convdiff_dia(N, N, N, pe=0.3, dtype=dtype)
    n = D.shape[0]
    A = DIAOperator(D)
    b = jnp.ones(n, dtype)
    mem = 20
    btol = float(np.finfo(dtype).eps ** 0.75)

    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((mem, n)).astype(dtype))
    R = jnp.asarray((rng.standard_normal((mem, mem)) +
                     5 * np.eye(mem)).astype(dtype))
    z = jnp.asarray(rng.standard_normal(mem + 1).astype(dtype))
    x = jnp.asarray(rng.standard_normal(n).astype(dtype))

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    def run(label, step):
        # A and b passed as jit ARGUMENTS (CLAUDE.md: closed-over arrays
        # embed as HLO constants and can 413 the remote-compile tunnel).
        @jax.jit
        def multi(A, b, V, R, z, x, S):
            def body(i, acc):
                out = step(A, b, V, R, z * (1 + 0.001 * i), x)
                return acc + out
            return jax.lax.fori_loop(0, S, body, jnp.float32(0))

        def fetch(S):
            return float(jax.device_get(
                multi(A, b, V, R, z, x, jnp.int32(S))))

        fetch(1)
        t1 = statistics.median(_timed(lambda: fetch(1)) for _ in range(5))
        S = 256
        fetch(S)
        tS = statistics.median(_timed(lambda: fetch(S)) for _ in range(5))
        per = (tS - t1) / (S - 1)
        print(f"{label:30s} per_call={per*1e6:9.2f} us", flush=True)

    def step_backsub(A, b, V, R, z, x):
        y, sing = gm._back_substitute(R, z, jnp.int32(mem), mem, btol)
        return jnp.sum(y)

    def step_xupdate(A, b, V, R, z, x):
        y = z[:mem]
        return jnp.sum(x + V.T @ y)

    def step_reinit(A, b, V, R, z, x):
        w2 = b - A.matvec(x)
        beta = knorm(w2)
        Vr = jnp.zeros((mem, n), dtype).at[0].set(w2 / beta.astype(dtype))
        return jnp.sum(Vr[0]) + beta

    def step_full(A, b, V, R, z, x):
        y, sing = gm._back_substitute(R, z, jnp.int32(mem), mem, btol)
        xf = x + V.T @ y
        w2 = b - A.matvec(xf)
        beta = knorm(w2)
        Vr = jnp.zeros((mem, n), dtype).at[0].set(w2 / beta.astype(dtype))
        return jnp.sum(Vr[0]) + beta

    run("back_substitute", step_backsub)
    run("V.T@y + x update", step_xupdate)
    run("reinit matvec + V rebuild", step_reinit)
    run("full epilogue", step_full)


if __name__ == "__main__":
    main()
