import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from krylov_tpu.ops.dia import poisson_dia
from krylov_tpu.ops.pallas_dia import dia_align

LANES = 128

def make_spmv_xres(offsets, n, tr, dtype=np.float32):
    """x fully VMEM-resident; grid over pd/y tiles; x reads via dynamic row slices."""
    npad = -(-n // (tr * LANES)) * tr * LANES
    rows = npad // LANES
    ntiles = rows // tr
    P = max(8, -(-max(abs(k) // LANES + 2 for k in offsets) // 8) * 8)
    shifts = tuple((int(k) // LANES, int(k) % LANES) for k in offsets)
    nd = len(offsets)

    def kernel(x_ref, pd_ref, y_ref):
        t = pl.program_id(0)
        base = pl.multiple_of(t * tr, tr)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
        acc = jnp.zeros((tr, LANES), jnp.float32)
        for d, (q, r) in enumerate(shifts):
            w = pd_ref[d]
            if r == 0:
                sx = x_ref[pl.ds(base + P + q, tr)]
            else:
                seg = x_ref[pl.ds(base + P + q, tr + 1)]
                rolled = pltpu.roll(seg, np.int32(LANES - r), 1)
                sx = jnp.where(lane < LANES - r, rolled[:tr], rolled[1:])
            acc = acc + w.astype(jnp.float32) * sx.astype(jnp.float32)
        y_ref[:] = acc.astype(y_ref.dtype)

    @jax.jit
    def spmv(pd, x):
        xp = jnp.zeros(((rows + 2 * P) * LANES,), x.dtype).at[
            P * LANES: P * LANES + n].set(x).reshape(-1, LANES)
        pdw = jnp.zeros((nd, npad), pd.dtype).at[:, :n].set(pd).reshape(
            nd, rows, LANES)
        y = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full x
                pl.BlockSpec((nd, tr, LANES), lambda t: (0, t, 0)),
            ],
            out_specs=pl.BlockSpec((tr, LANES), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(xp, pdw)
        return y.reshape(-1)[:n]
    return spmv

def bench(fn, pd, b, nnz, K=1000):
    @jax.jit
    def loop(pd_, x):
        def body(_, v):
            return fn.__wrapped__(pd_, v) if hasattr(fn, "__wrapped__") else fn(pd_, v)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x))
    float(loop(pd, b))
    best = 1e9
    for t in range(3):
        xin = jnp.full_like(b, 1.0 + 0.01 * t)
        t0 = time.perf_counter()
        float(loop(pd, xin))
        best = min(best, (time.perf_counter() - t0) / K)
    return nnz / best / 1e9

for N, tr in ((64, 256), (128, 512), (128, 1024)):
    n = N ** 3
    D = poisson_dia(N, N, N, dtype=np.float32)
    pd = dia_align(D.data / 12.0, D.offsets, n)
    b = jnp.ones(n, np.float32)
    try:
        f = make_spmv_xres(D.offsets, n, tr)
        y = f(pd, b)
        yref = dia_align(D.data, D.offsets, n)  # correctness check vs existing kernel
        from krylov_tpu.ops.pallas_dia import dia_spmv_pallas
        yr = dia_spmv_pallas(dia_align(D.data / 12.0, D.offsets, n), D.offsets, b)
        err = float(jnp.max(jnp.abs(y - yr)))
        g = bench(f, pd, b, D.nnz)
        print(f"x-resident N={N} tr={tr}: {g:.1f} Gnnz/s err={err:.2e}", flush=True)
    except Exception as e:
        print(f"x-resident N={N} tr={tr}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

# VMEM capacity probe: fused CG at 128^3 (~90MB working set)
try:
    from krylov_tpu.ops.pallas_fused import cg_dia_fused
    N = 128; n = N ** 3
    D = poisson_dia(N, N, N, dtype=np.float32)
    pd = dia_align(D.data, D.offsets, n)
    b = jnp.ones(n, np.float32)
    t0 = time.perf_counter()
    x, it, rn, st = cg_dia_fused(pd, D.offsets, b, 0.0, 1e-6, 2 * n)
    print(f"fused CG 128^3: compile+solve {time.perf_counter()-t0:.1f}s niter={int(it)} status={int(st)}", flush=True)
    t0 = time.perf_counter()
    x, it, rn, st = cg_dia_fused(pd, D.offsets, jnp.full(n, 1.01, np.float32), 0.0, 1e-6, 2 * n)
    print(f"fused CG 128^3 warm: {time.perf_counter()-t0:.3f}s niter={int(it)}", flush=True)
except Exception as e:
    print(f"fused CG 128^3: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
