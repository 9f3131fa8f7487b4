"""Micro-benchmark: cost of the per-iteration V.at[k+1].set on TPU.

The block-GMRES inner body commits the new basis block with a
dynamic_update_slice into the (mem+1, n, p) while-loop carry.  If XLA
aliases the buffer this is a 0.5 MB write; if the surrounding reads
defeat aliasing it is a full 17 MB copy (~40 µs at HBM speed).
Measures a loop body with chunked reads plus the update vs reads only.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mem, n, p = 32, 32768, 4
CH = 8
FC = jnp.float32
rng = np.random.default_rng(0)
V0 = jnp.asarray(rng.standard_normal((mem + 1, n, p)).astype(np.float32))
W0 = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))


def chunk_pass(V, W, k):
    def body(c, carry):
        H, P = carry
        Vb = jax.lax.dynamic_slice(
            V, (c * CH, jnp.int32(0), jnp.int32(0)), (CH, n, p))
        Hc = jnp.einsum("inp,nq->ipq", Vb, W)
        P = P + jnp.einsum("inp,ipq->nq", Vb, Hc)
        return jax.lax.dynamic_update_slice(
            H, Hc, (c * CH, jnp.int32(0), jnp.int32(0))), P
    H, P = jax.lax.fori_loop(0, k // CH + 1, body,
                             (jnp.zeros((mem, p, p), FC),
                              jnp.zeros_like(W)))
    return W - P, H


def step_with_set(V, W, k):
    W, H = chunk_pass(V, W, k)
    W, H2 = chunk_pass(V, W, k)
    nrm = jnp.sqrt(jnp.sum(W * W))
    V = V.at[k + 1].set(W / nrm)
    return V, W, H + H2


def step_no_set(V, W, k):
    W, H = chunk_pass(V, W, k)
    W, H2 = chunk_pass(V, W, k)
    return V, W, H + H2


def timer(step, label, S=256):
    def many(S):
        @jax.jit
        def run(V, W):
            def body(i, carry):
                Vc, Wc, acc = carry
                Vc, Wn, H = step(Vc, Wc + 0.0 * acc, jnp.int32(15))
                return Vc, Wn, acc + jnp.sum(H)
            Vc, Wn, acc = jax.lax.fori_loop(
                0, S, body, (V, W, jnp.zeros((), FC)))
            return jnp.sum(Wn) + jnp.sum(Vc[16]) + acc
        return run

    def med(fn, reps=5):
        float(fn(V0, W0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(V0, W0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tS = med(many(1)), med(many(S))
    per = (tS - t1) / (S - 1)
    print(f"{label}: per_step={per*1e6:.2f}us (t1={t1*1e3:.1f}ms "
          f"tS={tS*1e3:.1f}ms)", flush=True)


with jax.default_matmul_precision("highest"):
    timer(step_no_set, "CGS2 chunked, no V commit")
    timer(step_with_set, "CGS2 chunked + V.at[k+1].set")


# Variant: deferred commit — the pending block is committed at the TOP
# of the body, so the carried V's only consumer is the update itself
# (aliasable); the CGS reads consume the updated buffer.
def step_deferred(V, Vpend, W, k):
    V = jax.lax.dynamic_update_slice(
        V, Vpend[None], (k, jnp.int32(0), jnp.int32(0)))
    W, H = chunk_pass(V, W, k)
    W, H2 = chunk_pass(V, W, k)
    nrm = jnp.sqrt(jnp.sum(W * W))
    return V, W / nrm, W, H + H2


def timer_deferred(label, S=256):
    def many(S):
        @jax.jit
        def run(V, W):
            def body(i, carry):
                Vc, Vp, Wc, acc = carry
                Vc, Vp, Wn, H = step_deferred(Vc, Vp, Wc + 0.0 * acc,
                                              jnp.int32(15))
                return Vc, Vp, Wn, acc + jnp.sum(H)
            Vc, Vp, Wn, acc = jax.lax.fori_loop(
                0, S, body, (V, W, W, jnp.zeros((), FC)))
            return jnp.sum(Wn) + jnp.sum(Vc[16]) + jnp.sum(Vp) + acc
        return run

    def med(fn, reps=5):
        float(fn(V0, W0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(V0, W0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tS = med(many(1)), med(many(S))
    per = (tS - t1) / (S - 1)
    print(f"{label}: per_step={per*1e6:.2f}us (t1={t1*1e3:.1f}ms "
          f"tS={tS*1e3:.1f}ms)", flush=True)


with jax.default_matmul_precision("highest"):
    timer_deferred("CGS2 chunked + deferred top-of-body commit")
