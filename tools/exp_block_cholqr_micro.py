"""Micro-benchmark: CholQR2 panel formulations on TPU (32³, p=4).

The block-GMRES inner body runs two Gram matmuls (Wᴴ W over n=32768)
and two triangular applications (W·R⁻¹ with 32768 rows) per iteration.
As `@` / solve_triangular these are skinny MXU ops (the p=4 dim pads to
128 lanes, and HIGHEST-precision f32 multiplies the pass count); as
broadcast-multiply-reduce they are pure VPU streams.  Times both.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, p = 32768, 4
FC = jnp.float32
rng = np.random.default_rng(0)
W0 = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))


def cholqr2_mxu(W):
    G1 = jnp.conj(W.T) @ W
    R1 = jnp.linalg.cholesky(G1, upper=True)
    Q1 = jax.scipy.linalg.solve_triangular(R1.T, W.T, lower=True).T
    G2 = jnp.conj(Q1.T) @ Q1
    R2 = jnp.linalg.cholesky(G2, upper=True)
    Vn = jax.scipy.linalg.solve_triangular(R2.T, Q1.T, lower=True).T
    return Vn, R2 @ R1


def _gram(W):
    return jnp.sum(jnp.conj(W)[:, :, None] * W[:, None, :], axis=0)


def _apply_rinv(W, R):
    Rinv = jax.scipy.linalg.solve_triangular(R, jnp.eye(p, dtype=R.dtype))
    return jnp.sum(W[:, :, None] * Rinv[None, :, :], axis=1)


def cholqr2_vpu(W):
    G1 = _gram(W)
    R1 = jnp.linalg.cholesky(G1, upper=True)
    Q1 = _apply_rinv(W, R1)
    G2 = _gram(Q1)
    R2 = jnp.linalg.cholesky(G2, upper=True)
    Vn = _apply_rinv(Q1, R2)
    return Vn, R2 @ R1


def timer(step, label, S=256):
    def many(S):
        @jax.jit
        def run(W):
            def body(i, carry):
                Wc, acc = carry
                Vn, H = step(Wc + 0.0 * acc)
                return Vn, acc + jnp.sum(H)
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


with jax.default_matmul_precision("highest"):
    timer(cholqr2_mxu, "CholQR2 @/solve_triangular (current)")
    timer(cholqr2_vpu, "CholQR2 broadcast-reduce VPU")
    Va, _ = cholqr2_mxu(W0)
    Vb, _ = cholqr2_vpu(W0)
    print("max|dV| =", float(jnp.max(jnp.abs(Va - Vb))))
