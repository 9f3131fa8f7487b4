#!/usr/bin/env python
"""Full benchmark suite over the BASELINE.json configs.

Runs each config on the default JAX device and prints a JSON report:

1. CG on SPD 3-D Poisson (get_div_grad), single chip
2. GMRES(restart) + BiCGSTAB on nonsymmetric convection-diffusion with
   Jacobi preconditioner
3. LSQR/LSMR on tall regularized least-squares (gen_lsq-style), λ > 0
4. TriCG/TriMR on partitioned saddle-point systems
5. Block-GMRES + cg_lanczos_shift (multi-RHS and shifted families)

Usage: python benchmarks/suite.py [--size small|full]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _complete(x):
    import jax.numpy as jnp
    float(jnp.sum(jnp.abs(x)))


def timed(fn, *args, **kw):
    out = fn(*args, **kw)          # compile + run
    x = out[0]
    _complete(x)
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _complete(out[0])
    return time.perf_counter() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="small", choices=["small", "full"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import krylov_tpu as kt
    from krylov_tpu.ops.dia import poisson_dia
    from krylov_tpu.operators import DIAOperator, DiagonalOperator

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    rtol = 1e-5 if on_tpu else 1e-8
    N = 64 if args.size == "full" else 24
    report = {"device": str(dev), "dtype": str(np.dtype(dtype)), "configs": {}}

    # 1. CG on 3-D Poisson
    D = poisson_dia(N, N, N, dtype=dtype)
    b = jnp.ones(N ** 3, dtype=dtype)
    t, (x, stats) = timed(kt.cg, DIAOperator(D), b, atol=0.0, rtol=rtol)
    report["configs"]["cg_poisson"] = {
        "n": N ** 3, "time_s": round(t, 4), "niter": stats.niter,
        "solved": stats.solved}

    # 2. convection-diffusion: 2-D PDE with strong convection
    n2 = 48 if args.size == "full" else 24
    h = 1.0 / (n2 + 1)
    # DIA 5-point convection-diffusion: -Δu + 20 uₓ
    offs = (-n2, -1, 0, 1, n2)
    nn = n2 * n2
    data = np.zeros((5, nn), dtype=dtype)
    data[2] = 4.0 / h**2
    data[1] = -1.0 / h**2 - 10.0 / h
    data[3] = -1.0 / h**2 + 10.0 / h
    data[0] = -1.0 / h**2
    data[4] = -1.0 / h**2
    ix = np.arange(nn) % n2
    data[1][ix == n2 - 1] = 0
    data[3][ix == 0] = 0
    from krylov_tpu.ops.dia import DIAMatrix
    CD = DIAMatrix(jnp.asarray(data), offs, (nn, nn))
    bc = jnp.ones(nn, dtype=dtype)
    M = DiagonalOperator(jnp.asarray(1.0 / data[2]))
    for name, method, kw in (
        ("gmres_restart", kt.gmres, dict(memory=30, restart=True)),
        ("bicgstab", kt.bicgstab, dict()),
    ):
        t, (x, stats) = timed(method, DIAOperator(CD), bc, M=M,
                              atol=0.0, rtol=rtol, **kw)
        report["configs"][f"convdiff_{name}"] = {
            "n": nn, "time_s": round(t, 4), "niter": stats.niter,
            "solved": stats.solved}

    # 3. regularized least squares (tall)
    mr = 4000 if args.size == "full" else 800
    nr = mr // 2
    rng = np.random.default_rng(0)
    Adense = jnp.asarray(rng.standard_normal((mr, nr)).astype(dtype))
    bls = jnp.asarray(rng.standard_normal(mr).astype(dtype))
    for name, method in (("lsqr", kt.lsqr), ("lsmr", kt.lsmr)):
        t, (x, stats) = timed(method, Adense, bls, lam=1.0)
        report["configs"][name + "_reg"] = {
            "shape": [mr, nr], "time_s": round(t, 4), "niter": stats.niter,
            "solved": stats.solved}

    # 4. saddle point TriCG/TriMR
    ns = 512 if args.size == "full" else 128
    As = jnp.asarray(rng.standard_normal((ns, ns)).astype(dtype) / np.sqrt(ns))
    bs_ = jnp.ones(ns, dtype=dtype)
    cs_ = -jnp.ones(ns, dtype=dtype)
    for name, method in (("tricg", kt.tricg), ("trimr", kt.trimr)):
        t, out = timed(method, As, bs_, cs_)
        stats = out[2]
        report["configs"][name + "_sqd"] = {
            "n": 2 * ns, "time_s": round(t, 4), "niter": stats.niter,
            "solved": stats.solved}

    # 5. multi-RHS + multi-shift
    Bm = jnp.stack([b, 0.5 * b], axis=1)
    t, (X, stats) = timed(kt.block_gmres, DIAOperator(D), Bm, memory=16,
                          restart=True, atol=0.0, rtol=rtol)
    report["configs"]["block_gmres_poisson"] = {
        "n": N ** 3, "p": 2, "time_s": round(t, 4), "niter": stats.niter,
        "solved": stats.solved}
    t, (X, stats) = timed(kt.cg_lanczos_shift, DIAOperator(D), b,
                          [0.5, 1.0, 2.0], atol=0.0, rtol=rtol)
    report["configs"]["cg_lanczos_shift_poisson"] = {
        "n": N ** 3, "nshifts": 3, "time_s": round(t, 4),
        "niter": stats.niter, "solved": stats.solved}

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
