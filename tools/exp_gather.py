"""Empirical probe: which gather forms does Mosaic TPU support in-kernel?

Decides the sliced-ELL SpMV kernel design (VERDICT r2 item 5).  Run on
the real chip: `python tools/exp_gather.py`.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out, ref = fn()
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: {'OK' if ok else 'WRONG'}"
              + ("" if ok else f" maxerr={np.max(np.abs(np.asarray(out)-ref))}"))
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


rng = np.random.default_rng(0)


def lane_gather_128():
    # gathered[s, l] = x[s, idx[s, l]] within each 128-lane row
    x = rng.standard_normal((8, 128)).astype(np.float32)
    idx = rng.integers(0, 128, (8, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x, idx)
    return out, np.take_along_axis(x, idx, axis=1)


def lane_gather_wide():
    # source row wider than one vreg (256 lanes)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    idx = rng.integers(0, 256, (8, 256)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(x, idx)
    return out, np.take_along_axis(x, idx, axis=1)


def sublane_gather():
    x = rng.standard_normal((32, 128)).astype(np.float32)
    idx = rng.integers(0, 32, (32, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(x, idx)
    return out, np.take_along_axis(x, idx, axis=0)


def lane_gather_bcast_src():
    # ELL shape: data rows gather from ONE shared 128-vector
    x = rng.standard_normal((1, 128)).astype(np.float32)
    idx = rng.integers(0, 128, (32, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        xb = jnp.broadcast_to(x_ref[:], i_ref.shape)
        o_ref[:] = jnp.take_along_axis(xb, i_ref[:], axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(x, idx)
    return out, np.take_along_axis(np.broadcast_to(x, (32, 128)), idx, axis=1)


def dynamic_gather_prim():
    # pltpu-specific gather primitive, if present in this jax version
    if not hasattr(pltpu, "dynamic_gather"):
        raise RuntimeError("pltpu.dynamic_gather not present")
    x = rng.standard_normal((8, 128)).astype(np.float32)
    idx = rng.integers(0, 128, (8, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = pltpu.dynamic_gather(x_ref[:], i_ref[:], 1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x, idx)
    return out, np.take_along_axis(x, idx, axis=1)


def flat_take():
    # whole-window flat gather (32x128 window, arbitrary flat idx)
    x = rng.standard_normal((32, 128)).astype(np.float32)
    idx = rng.integers(0, 32 * 128, (8, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(-1)[i_ref[:]]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x, idx)
    return out, x.reshape(-1)[idx]


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0])
    probe("lane_gather_128 (take_along_axis axis=1, 128 lanes)", lane_gather_128)
    probe("lane_gather_wide (256-lane source)", lane_gather_wide)
    probe("sublane_gather (axis=0)", sublane_gather)
    probe("lane_gather_bcast_src (shared 128-vec source)", lane_gather_bcast_src)
    probe("pltpu.dynamic_gather", dynamic_gather_prim)
    probe("flat_take (whole-window fancy index)", flat_take)
