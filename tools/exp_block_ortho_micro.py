"""Micro-benchmark: block-CGS2 orthogonalization formulations on TPU.

Isolates the inner-loop projection cost of the block-GMRES general path
(32³, p=4, mem=32 fixture): per-iteration device time of one CGS2 step
at a mid-pass k, for competing formulations:

  A  full-basis einsums (pre-round-5: 4 reads of (mem+1, n, p))
  B  chunked fused loop (Hc + P per trip, one dynamic_slice per trip)
  C  chunked split loops (Hc loop, then P loop — each slice consumed
     once so XLA can fuse the read into the GEMM)
  D  full-basis, V pre-flattened to (n, mem·p) 2-D GEMMs

Times via S-steps-in-one-jit median differencing at a FIXED traced k.
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
V = jnp.asarray(rng.standard_normal((mem + 1, n, p)).astype(np.float32))
V = V.at[16:].set(0.0)          # mid-pass occupancy (k = 15)
W0 = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))


def variant_a(W, k):
    Vm = V[:mem]
    H1 = jnp.einsum("inp,nq->ipq", Vm, W)
    W = W - jnp.einsum("inp,ipq->nq", Vm, H1)
    H2 = jnp.einsum("inp,nq->ipq", Vm, W)
    W = W - jnp.einsum("inp,ipq->nq", Vm, H2)
    return W, H1 + H2


def _chunk_fused_pass(W, k):
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


def variant_b(W, k):
    W, H1 = _chunk_fused_pass(W, k)
    W, H2 = _chunk_fused_pass(W, k)
    return W, H1 + H2


def _chunk_split_pass(W, k):
    def hbody(c, H):
        Vb = jax.lax.dynamic_slice(
            V, (c * CH, jnp.int32(0), jnp.int32(0)), (CH, n, p))
        Hc = jnp.einsum("inp,nq->ipq", Vb, W)
        return jax.lax.dynamic_update_slice(
            H, Hc, (c * CH, jnp.int32(0), jnp.int32(0)))
    H = jax.lax.fori_loop(0, k // CH + 1, hbody,
                          jnp.zeros((mem, p, p), FC))

    def pbody(c, P):
        Vb = jax.lax.dynamic_slice(
            V, (c * CH, jnp.int32(0), jnp.int32(0)), (CH, n, p))
        Hc = jax.lax.dynamic_slice(
            H, (c * CH, jnp.int32(0), jnp.int32(0)), (CH, p, p))
        return P + jnp.einsum("inp,ipq->nq", Vb, Hc)
    P = jax.lax.fori_loop(0, k // CH + 1, pbody, jnp.zeros_like(W))
    return W - P, H


def variant_c(W, k):
    W, H1 = _chunk_split_pass(W, k)
    W, H2 = _chunk_split_pass(W, k)
    return W, H1 + H2


V2 = jnp.reshape(jnp.transpose(V[:mem], (1, 0, 2)), (n, mem * p))


def variant_d(W, k):
    H1 = V2.T @ W
    W = W - V2 @ H1
    H2 = V2.T @ W
    W = W - V2 @ H2
    return W, H1 + H2


def timer(step, label, S=256):
    def many(S):
        @jax.jit
        def run(W):
            def body(i, carry):
                Wc, acc = carry
                Wn, H = step(Wc + 0.0 * acc, jnp.int32(15))
                return Wn, acc + jnp.sum(H)
            Wn, acc = jax.lax.fori_loop(0, S, body,
                                        (W, jnp.zeros((), FC)))
            return jnp.sum(Wn) + acc
        return run

    def med(fn, reps=5):
        float(fn(W0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(W0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tS = med(many(1)), med(many(S))
    per = (tS - t1) / (S - 1)
    print(f"{label}: per_step={per*1e6:.2f}us (t1={t1*1e3:.1f}ms "
          f"tS={tS*1e3:.1f}ms)", flush=True)
    return per


with jax.default_matmul_precision("highest"):
    timer(variant_a, "A full-basis einsum CGS2")
    timer(variant_b, "B chunked fused (CH=8)")
    timer(variant_c, "C chunked split  (CH=8)")
    timer(variant_d, "D full-basis 2-D GEMM CGS2")


# E: transposed layout — V stored ((mem)·p, n) row-major (lane dim = n),
# W as (p, n); CGS2 via two dot_generals contracting n / p.
Vt = jnp.reshape(jnp.transpose(V[:mem], (0, 2, 1)), (mem * p, n))
W0t = W0.T.copy()


def variant_e(Wt, k):
    H1 = jax.lax.dot_general(Vt, Wt, (((1,), (1,)), ((), ())))  # (mp, p)
    Wt = Wt - jax.lax.dot_general(H1, Vt, (((0,), (0,)), ((), ())))
    H2 = jax.lax.dot_general(Vt, Wt, (((1,), (1,)), ((), ())))
    Wt = Wt - jax.lax.dot_general(H2, Vt, (((0,), (0,)), ((), ())))
    return Wt, H1 + H2


CHR = CH * p


def _chunk_t_pass(Wt, k):
    def body(c, carry):
        H, P = carry
        Vb = jax.lax.dynamic_slice(Vt, (c * CHR, jnp.int32(0)), (CHR, n))
        Hc = jax.lax.dot_general(Vb, Wt, (((1,), (1,)), ((), ())))
        P = P + jax.lax.dot_general(Hc, Vb, (((0,), (0,)), ((), ())))
        return jax.lax.dynamic_update_slice(
            H, Hc, (c * CHR, jnp.int32(0))), P
    H, P = jax.lax.fori_loop(0, k // CH + 1, body,
                             (jnp.zeros((mem * p, p), FC),
                              jnp.zeros_like(Wt)))
    return Wt - P, H


def variant_f(Wt, k):
    Wt, H1 = _chunk_t_pass(Wt, k)
    Wt, H2 = _chunk_t_pass(Wt, k)
    return Wt, H1 + H2


def timer_t(step, label, S=256):
    def many(S):
        @jax.jit
        def run(Wt):
            def body(i, carry):
                Wc, acc = carry
                Wn, H = step(Wc + 0.0 * acc, jnp.int32(15))
                return Wn, acc + jnp.sum(H)
            Wn, acc = jax.lax.fori_loop(0, S, body,
                                        (Wt, jnp.zeros((), FC)))
            return jnp.sum(Wn) + acc
        return run

    def med(fn, reps=5):
        float(fn(W0t))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(W0t))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tS = med(many(1)), med(many(S))
    per = (tS - t1) / (S - 1)
    print(f"{label}: per_step={per*1e6:.2f}us (t1={t1*1e3:.1f}ms "
          f"tS={tS*1e3:.1f}ms)", flush=True)


with jax.default_matmul_precision("highest"):
    timer_t(variant_e, "E transposed 2-D GEMM CGS2")
    timer_t(variant_f, "F transposed chunked (CH=8)")
