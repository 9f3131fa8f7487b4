#!/usr/bin/env python
"""Bisect the gap between the bare Arnoldi floor (~109 µs/iter) and the
real `_gmres_core` inner iteration (~197 µs/iter) at n=110592, mem=20.

Variants add the real core's inner-body pieces to the bare loop one at
a time: sym_givens, the full state carry (x/z/R/eps_lim/flags/hist),
operator-protocol M/N applies, and finally the real inner_body called
directly (no outer/finalize) — whichever step jumps is the cost.
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
    from krylov_tpu.ops.kops import knorm, sym_givens
    from krylov_tpu.solvers import gmres as gm
    from krylov_tpu import _runtime as rt

    dtype = np.float32
    N = 48
    D = convdiff_dia(N, N, N, pe=0.3, dtype=dtype)
    n = D.shape[0]
    A = DIAOperator(D)
    Mop = DiagonalOperator(jnp.full(n, 1.0 / 6.0, dtype))
    b = jnp.ones(n, dtype)
    mem = 20
    NITER = 186

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    def run_variant(label, loop_fn):
        @jax.jit
        def multi(A, Mop, b, S):
            def body(i, acc):
                it, chk = loop_fn(A, Mop, b * (1 + 0.001 * i))
                return acc[0] + it, acc[1] + chk
            return jax.lax.fori_loop(0, S, body,
                                     (jnp.int32(0), jnp.float32(0)))

        def fetch(S):
            r = jax.device_get(multi(A, Mop, b, jnp.int32(S)))
            return int(r[0]), float(r[1])

        fetch(1)
        t1 = statistics.median(_timed(lambda: fetch(1)) for _ in range(5))
        S = 16
        fetch(S)
        tS = statistics.median(_timed(lambda: fetch(S)) for _ in range(5))
        per = (tS - t1) / (S - 1) / NITER
        print(f"{label:34s} per_iter={per*1e6:8.2f} us", flush=True)

    # ---- variant A: bare floor (repeated from exp_gmres_floor) --------
    def loop_bare(A, Mop, b):
        with jax.default_matmul_precision("highest"):
            V = jnp.zeros((mem, n), dtype).at[0].set(b / knorm(b))
            c = jnp.zeros((mem,), dtype)
            s = jnp.zeros((mem,), dtype)

            def body(st):
                V, c, s, i = st
                k = i % mem
                w = A.matvec(V[k]) * (1.0 / 6.0)
                q, h = gm._orthogonalize(V, w, k, mem, False)
                hb = knorm(q)
                hcol = jnp.zeros((mem + 1,), dtype).at[:mem].set(h)
                hcol = gm._apply_prev_rotations(hcol, c, s, k, mem)
                ck, sk, rkk = sym_givens(hcol[k], hb.astype(dtype))
                c = c.at[k].set(jnp.real(ck))
                s = s.at[k].set(sk)
                safe = jnp.maximum(hb, 1e-30)
                V = V.at[(k + 1) % mem].set(q / safe.astype(dtype))
                return V, c, s, i + 1

            V, c, s, i = jax.lax.while_loop(
                lambda st: st[3] < NITER, body,
                (V, c, s, jnp.int32(0)))
            return i, jnp.sum(V[0]) + jnp.sum(c)

    # ---- variant B: bare + full state carry + z/R updates + hist ------
    def loop_fullstate(A, Mop, b):
        with jax.default_matmul_precision("highest"):
            beta = knorm(b)
            st0 = gm.GmresState(
                x=jnp.zeros(n, dtype),
                V=jnp.zeros((mem, n), dtype).at[0].set(b / beta),
                Z=jnp.zeros((0,), dtype),
                R=jnp.zeros((mem, mem), dtype),
                c=jnp.zeros((mem,), dtype),
                s=jnp.zeros((mem,), dtype),
                z=jnp.zeros((mem + 1,), dtype).at[0].set(beta.astype(dtype)),
                inner_k=jnp.int32(0), iter=jnp.int32(0),
                npass=jnp.int32(1), rNorm=beta,
                eps_lim=jnp.asarray(1e-30, dtype),
                status=jnp.int32(rt.RUNNING),
                inconsistent=jnp.zeros((), jnp.bool_),
                hist_r=rt.hist_init(0, dtype),
                f_resid=jnp.zeros((), jnp.bool_),
                f_break=jnp.zeros((), jnp.bool_),
            )

            def body(s):
                k = s.inner_k % mem
                w = A.matvec(s.V[k]) * (1.0 / 6.0)
                q, hcol = gm._orthogonalize(s.V, w, k, mem, False)
                Hbis = knorm(q)
                hcol_ext = jnp.zeros((mem + 1,), dtype).at[:mem].set(hcol)
                hcol_ext = gm._apply_prev_rotations(hcol_ext, s.c, s.s, k,
                                                    mem)
                ck, sk, rkk = sym_givens(hcol_ext[k], Hbis.astype(dtype))
                c_new = s.c.at[k].set(jnp.real(ck))
                s_new = s.s.at[k].set(sk)
                Rcol = hcol_ext[:mem].at[k].set(rkk)
                R_new = s.R.at[:, k].set(
                    jnp.where(jnp.arange(mem) <= k, Rcol, s.R[:, k]))
                zeta_next = sk * s.z[k]
                z_new = s.z.at[k].set(jnp.real(ck) * s.z[k])
                rNorm = jnp.abs(zeta_next)
                safe = jnp.maximum(Hbis, 1e-30)
                V_next = s.V.at[(k + 1) % mem].set(q / safe.astype(dtype))
                z_cont = z_new.at[(k + 1) % (mem + 1)].set(zeta_next)
                return s._replace(
                    V=V_next, R=R_new, c=c_new, s=s_new, z=z_cont,
                    inner_k=(k + 1) % mem, iter=s.iter + 1, rNorm=rNorm,
                    f_resid=rNorm <= s.eps_lim, f_break=Hbis <= 0.0)

            out = jax.lax.while_loop(lambda s: s.iter < NITER, body, st0)
            return out.iter, jnp.sum(out.V[0]) + jnp.sum(out.c)

    # ---- variant C: the real inner_body via _gmres_core with itmax so
    # large it never restarts mid-measurement is impossible (mem fixed);
    # instead: real core, mem=20 (with restarts) for comparison --------

    # ---- variant C: real inner-body details (cont-blended V row write,
    # operator-protocol M apply, flags/status logic), no epilogue ------
    from krylov_tpu.operators import precond_apply

    def loop_realbody(A, Mop, b):
        with jax.default_matmul_precision("highest"):
            beta = knorm(b)
            btol = jnp.asarray(jnp.finfo(dtype).eps ** 0.75, dtype)
            st0 = gm.GmresState(
                x=jnp.zeros(n, dtype),
                V=jnp.zeros((mem, n), dtype).at[0].set(b / beta),
                Z=jnp.zeros((0,), dtype),
                R=jnp.zeros((mem, mem), dtype),
                c=jnp.zeros((mem,), dtype),
                s=jnp.zeros((mem,), dtype),
                z=jnp.zeros((mem + 1,), dtype).at[0].set(beta.astype(dtype)),
                inner_k=jnp.int32(0), iter=jnp.int32(0),
                npass=jnp.int32(1), rNorm=beta,
                eps_lim=jnp.asarray(1e-30, dtype),
                status=jnp.int32(rt.RUNNING),
                inconsistent=jnp.zeros((), jnp.bool_),
                hist_r=rt.hist_init(0, dtype),
                f_resid=jnp.zeros((), jnp.bool_),
                f_break=jnp.zeros((), jnp.bool_),
            )

            def body(s):
                k = s.inner_k
                vk = s.V[k]
                w = A.matvec(vk)
                q = precond_apply(Mop, w, False)
                q, hcol = gm._orthogonalize(s.V, q, k, mem, False)
                Hbis = knorm(q)
                hcol_ext = jnp.zeros((mem + 1,), dtype).at[:mem].set(hcol)
                hcol_ext = gm._apply_prev_rotations(hcol_ext, s.c, s.s, k,
                                                    mem)
                ck, sk, rkk = sym_givens(hcol_ext[k], Hbis.astype(dtype))
                c_new = s.c.at[k].set(jnp.real(ck))
                s_new = s.s.at[k].set(sk)
                Rcol = hcol_ext[:mem].at[k].set(rkk)
                R_new = s.R.at[:, k].set(
                    jnp.where(jnp.arange(mem) <= k, Rcol, s.R[:, k]))
                zeta_next = sk * s.z[k]
                z_new = s.z.at[k].set(jnp.real(ck) * s.z[k])
                rNorm = jnp.abs(zeta_next)
                it = s.iter + 1
                kk = k + 1
                resid_decrease = (rNorm <= s.eps_lim) | ((rNorm + 1.) <= 1.)
                breakdown = Hbis <= btol
                inner_tired = kk >= mem
                inner_done = resid_decrease | breakdown | inner_tired
                cont = ~inner_done
                safe = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
                V_next = s.V.at[(k + 1) % mem].set(
                    jnp.where(cont, q / safe.astype(dtype),
                              s.V[(k + 1) % mem]))
                z_cont = z_new.at[k + 1].set(
                    jnp.where(cont, zeta_next, z_new[k + 1]))
                return s._replace(
                    V=V_next, R=R_new, c=c_new, s=s_new, z=z_cont,
                    inner_k=kk % mem, iter=it, rNorm=rNorm,
                    f_resid=resid_decrease, f_break=breakdown)

            out = jax.lax.while_loop(lambda s: s.iter < NITER, body, st0)
            return out.iter, jnp.sum(out.V[0]) + jnp.sum(out.c)

    # ---- variant E: variant-C body inside the real nested structure
    # (outer pass-while + lax.cond epilogue), restarting every mem -----
    def make_nested(use_cond):
        def loop_nested(A, Mop, b):
            with jax.default_matmul_precision("highest"):
                beta = knorm(b)
                btol = jnp.asarray(jnp.finfo(dtype).eps ** 0.75, dtype)
                st0 = gm.GmresState(
                    x=jnp.zeros(n, dtype),
                    V=jnp.zeros((mem, n), dtype).at[0].set(b / beta),
                    Z=jnp.zeros((0,), dtype),
                    R=jnp.zeros((mem, mem), dtype),
                    c=jnp.zeros((mem,), dtype),
                    s=jnp.zeros((mem,), dtype),
                    z=jnp.zeros((mem + 1,), dtype).at[0].set(
                        beta.astype(dtype)),
                    inner_k=jnp.int32(0), iter=jnp.int32(0),
                    npass=jnp.int32(1), rNorm=beta,
                    eps_lim=jnp.asarray(1e-30, dtype),
                    status=jnp.int32(rt.RUNNING),
                    inconsistent=jnp.zeros((), jnp.bool_),
                    hist_r=rt.hist_init(0, dtype),
                    f_resid=jnp.zeros((), jnp.bool_),
                    f_break=jnp.zeros((), jnp.bool_),
                )

                def inner_body(s):
                    k = s.inner_k
                    vk = s.V[k]
                    w = A.matvec(vk)
                    q = precond_apply(Mop, w, False)
                    q, hcol = gm._orthogonalize(s.V, q, k, mem, False)
                    Hbis = knorm(q)
                    hcol_ext = jnp.zeros((mem + 1,), dtype).at[:mem].set(
                        hcol)
                    hcol_ext = gm._apply_prev_rotations(hcol_ext, s.c, s.s,
                                                        k, mem)
                    ck, sk, rkk = sym_givens(hcol_ext[k], Hbis.astype(dtype))
                    c_new = s.c.at[k].set(jnp.real(ck))
                    s_new = s.s.at[k].set(sk)
                    Rcol = hcol_ext[:mem].at[k].set(rkk)
                    R_new = s.R.at[:, k].set(
                        jnp.where(jnp.arange(mem) <= k, Rcol, s.R[:, k]))
                    zeta_next = sk * s.z[k]
                    z_new = s.z.at[k].set(jnp.real(ck) * s.z[k])
                    rNorm = jnp.abs(zeta_next)
                    it = s.iter + 1
                    kk = k + 1
                    resid = (rNorm <= s.eps_lim) | ((rNorm + 1.) <= 1.)
                    brk = Hbis <= btol
                    inner_done = resid | brk | (kk >= mem) | (it >= NITER)
                    cont = ~inner_done
                    safe = jnp.where(Hbis == 0, jnp.ones_like(Hbis), Hbis)
                    V_next = s.V.at[(k + 1) % mem].set(
                        jnp.where(cont, q / safe.astype(dtype),
                                  s.V[(k + 1) % mem]))
                    z_cont = z_new.at[k + 1].set(
                        jnp.where(cont, zeta_next, z_new[k + 1]))
                    return s._replace(
                        V=V_next, R=R_new, c=c_new, s=s_new, z=z_cont,
                        inner_k=kk, iter=it, rNorm=rNorm,
                        f_resid=resid, f_break=brk)

                def inner_cond(s):
                    done = (s.f_resid | s.f_break | (s.iter >= NITER)
                            | (s.inner_k >= mem))
                    return (s.status == rt.RUNNING) & ~done

                def finalize(ms):
                    y, sing = gm._back_substitute(ms.R, ms.z, ms.inner_k,
                                                  mem, btol)
                    xf = ms.x + ms.V.T @ y
                    w2 = b - A.matvec(xf)
                    beta = knorm(w2)
                    safe = jnp.where(beta == 0, jnp.ones_like(beta), beta)
                    Vr = jnp.zeros((mem, n), dtype).at[0].set(
                        w2 / safe.astype(dtype))
                    zr = jnp.zeros((mem + 1,), dtype).at[0].set(
                        beta.astype(dtype))
                    done = ms.iter >= NITER
                    return ms._replace(
                        x=xf, V=Vr, z=zr, R=jnp.zeros_like(ms.R),
                        c=jnp.zeros_like(ms.c), s=jnp.zeros_like(ms.s),
                        inner_k=jnp.int32(0), npass=ms.npass + 1,
                        rNorm=beta,
                        status=jnp.where(done, jnp.int32(rt.TIRED),
                                         jnp.int32(rt.RUNNING)),
                        f_resid=jnp.zeros((), jnp.bool_),
                        f_break=jnp.zeros((), jnp.bool_))

                def outer_body(s):
                    s = jax.lax.while_loop(inner_cond, inner_body, s)
                    if use_cond:
                        inner_done = (s.f_resid | s.f_break
                                      | (s.iter >= NITER)
                                      | (s.inner_k >= mem))
                        return jax.lax.cond(inner_done, finalize,
                                            lambda ms: ms, s)
                    return finalize(s)

                def outer_cond(s):
                    return (s.status == rt.RUNNING) & (s.iter < NITER)

                out = jax.lax.while_loop(outer_cond, outer_body, st0)
                return out.iter, jnp.sum(out.x) + jnp.sum(out.V[0])
        return loop_nested

    run_variant("A bare floor", loop_bare)
    run_variant("B full-state carry", loop_fullstate)
    run_variant("C real inner body", loop_realbody)
    run_variant("E nested + cond epilogue", make_nested(True))
    run_variant("F nested, uncond epilogue", make_nested(False))


if __name__ == "__main__":
    main()
