"""Probe 2: SELL kernel building blocks on real TPU.

(a) (1,128) x-chunk block fetch from a (nchunks,128) array via a
    scalar-prefetched index map;
(b) accumulator init/flush across a flat (slice,chunk)-pair grid using
    scalar-prefetch boundary comparisons.
Together: a miniature SELL-C-128 SpMV vs scipy.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mini_sell(xlayout="flat"):
    rng = np.random.default_rng(0)
    n = 2048                      # 2 slices of 1024 rows, 16 chunks
    SL, CH = 1024, 128
    import scipy.sparse as sp
    A = sp.random(n, n, density=0.003, random_state=1, format="csr")
    A = (A + sp.eye(n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    yref = A @ x

    nslices = n // SL
    nchunks = n // CH
    # group nnz by (slice, chunk)
    pairs = {}
    indptr, cols, vals = A.indptr, A.indices, A.data.astype(np.float32)
    for i in range(n):
        s = i // SL
        for p in range(indptr[i], indptr[i + 1]):
            c = int(cols[p]) // CH
            pairs.setdefault((s, c), []).append((i, int(cols[p]) % CH,
                                                 vals[p]))
    keys = sorted(pairs)
    P = len(keys)
    # per-pair K = max nnz of any row in this (slice,chunk)
    Kmax = 0
    for k in keys:
        cnt = {}
        for (i, _, _) in pairs[k]:
            cnt[i] = cnt.get(i, 0) + 1
        Kmax = max(Kmax, max(cnt.values()))
    K8 = Kmax * 8
    data = np.zeros((P, K8, 128), np.float32)
    idx = np.zeros((P, K8, 128), np.int32)
    slice_of = np.zeros(P + 1, np.int32)
    chunk_of = np.zeros(P, np.int32)
    for pi, (s, c) in enumerate(keys):
        slice_of[pi] = s
        chunk_of[pi] = c
        used = {}
        for (i, lc, v) in pairs[(s, c)]:
            r = i - s * SL            # row within slice, 0..1023
            k = used.get(i, 0)
            used[i] = k + 1
            data[pi, k * 8 + r // 128, r % 128] = v
            idx[pi, k * 8 + r // 128, r % 128] = lc
    slice_of[P] = slice_of[P - 1] + 1   # sentinel => last pair flushes

    x2 = x.reshape(nchunks, CH)
    if xlayout == "x8":
        x2 = np.broadcast_to(x2[:, None, :], (nchunks, 8, CH)).copy()

    def kernel(slice_ref, chunk_ref, x_ref, d_ref, i_ref, o_ref, acc_ref):
        p = pl.program_id(0)
        prev = jnp.where(p == 0, -1, slice_ref[jnp.maximum(p - 1, 0)])

        @pl.when(slice_ref[p] != prev)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if xlayout == "x8":
            xrow = x_ref[0, 0:1, :]            # (1,128)
        else:
            xrow = x_ref[:]                     # (1,128)
        g = jnp.take_along_axis(
            jnp.broadcast_to(xrow, (K8, 128)), i_ref[0], axis=1)
        contrib = (d_ref[0] * g).reshape(Kmax, 8, 128).sum(axis=0)
        acc_ref[:] += contrib

        @pl.when(slice_ref[p + 1] != slice_ref[p])
        def _flush():
            o_ref[:] = acc_ref[:]

    if xlayout == "x8":
        x_spec = pl.BlockSpec((1, 8, 128), lambda p, so, co: (co[p], 0, 0))
    else:
        x_spec = pl.BlockSpec((1, 128), lambda p, so, co: (co[p], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, K8, 128), lambda p, so, co: (p, 0, 0)),
            pl.BlockSpec((1, K8, 128), lambda p, so, co: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda p, so, co: (so[p], 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nslices * 8, 128), jnp.float32),
    )(jnp.asarray(slice_of), jnp.asarray(chunk_of), jnp.asarray(x2),
      jnp.asarray(data), jnp.asarray(idx))
    y = np.asarray(out).reshape(-1)
    err = np.max(np.abs(y - yref))
    print(f"mini_sell[{xlayout}]: P={P} Kmax={Kmax} maxerr={err}")
    return err


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for layout in ("flat", "x8"):
        try:
            mini_sell(layout)
        except Exception as e:
            print(f"mini_sell[{layout}]: FAIL {type(e).__name__}:",
                  str(e).split(chr(10))[0][:200])
