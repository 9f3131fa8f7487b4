#!/usr/bin/env python
"""Diagnostic: per-iteration floor of a bare Arnoldi while_loop on TPU.

Same data movement as `_gmres_core`'s steady-state iteration (DIA SpMV,
Jacobi M, CGS2 against a (mem, n) panel, Givens column update, one
panel-row write) with NO lax.cond/finalize/restart machinery — isolates
how much of the general path's ~198 µs/iter is inherent vs structural.
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

    dtype = np.float32
    N = 48
    D = convdiff_dia(N, N, N, pe=0.3, dtype=dtype)
    n = D.shape[0]
    A = DIAOperator(D)
    Md = jnp.full(n, 1.0 / 6.0, dtype)
    b = jnp.ones(n, dtype)
    mem = 20
    NITER = 186

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    def bare(A, Md, b, iters, prec="highest"):
        with jax.default_matmul_precision(prec):
            V = jnp.zeros((mem, n), dtype).at[0].set(b / jnp.linalg.norm(b))
            c = jnp.zeros((mem,), dtype)
            s = jnp.zeros((mem,), dtype)

            def body(st):
                V, c, s, i = st
                k = i % mem
                w = A.matvec(V[k]) * Md
                mask = jnp.arange(mem) <= k
                Vm = jnp.where(mask[:, None], V, 0)
                h = Vm @ w
                w = w - Vm.T @ h
                h2 = Vm @ w
                w = w - Vm.T @ h2
                h = h + h2
                hb = jnp.linalg.norm(w)
                hcol = jnp.zeros((mem + 1,), dtype).at[:mem].set(h)
                for j in range(mem):  # unrolled rotations
                    active = j < k
                    hi, hi1 = hcol[j], hcol[j + 1]
                    hcol = hcol.at[j].set(
                        jnp.where(active, c[j] * hi + s[j] * hi1, hi))
                    hcol = hcol.at[j + 1].set(
                        jnp.where(active, s[j] * hi - c[j] * hi1, hi1))
                rho = jnp.sqrt(hcol[k] ** 2 + hb ** 2)
                ck = jnp.where(rho > 0, hcol[k] / rho, 1.0)
                sk = jnp.where(rho > 0, hb / rho, 0.0)
                c = c.at[k].set(ck)
                s = s.at[k].set(sk)
                V = V.at[(k + 1) % mem].set(w / jnp.maximum(hb, 1e-30))
                return V, c, s, i + 1

            def cond(st):
                return st[3] < iters

            V, c, s, i = jax.lax.while_loop(cond, body,
                                            (V, c, s, jnp.int32(0)))
            return i, jnp.sum(V[0]) + jnp.sum(c)

    import functools

    for prec in ("highest", "high", "default"):
        @functools.partial(jax.jit, static_argnames=("prec",))
        def multi(A, Md, b, S, prec=prec):
            def body(i, acc):
                it, chk = bare(A, Md, b * (1 + 0.001 * i), NITER, prec)
                return acc[0] + it, acc[1] + chk
            return jax.lax.fori_loop(0, S, body, (jnp.int32(0),
                                                  jnp.float32(0)))

        def fetch(S):
            r = jax.device_get(multi(A, Md, b, jnp.int32(S)))
            return int(r[0]), float(r[1])

        fetch(1)
        t1 = statistics.median(_timed(lambda: fetch(1)) for _ in range(5))
        S = 16
        tS = statistics.median(_timed(lambda: fetch(S)) for _ in range(5))
        per_iter = (tS - t1) / (S - 1) / NITER
        print(f"bare arnoldi floor [{prec:8s}]: per_iter="
              f"{per_iter*1e6:8.2f} us ({NITER} iters, mem={mem}, n={n})",
              flush=True)


if __name__ == "__main__":
    main()
