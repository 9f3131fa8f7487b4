"""Dtype policy helpers.

The reference library is generic over ``FC ∈ {T, Complex{T}}`` with
``T <: AbstractFloat`` (reference: src/krylov_utils.jl:10).  Here the
element dtype ``FC`` is a jnp dtype (bfloat16/float32/float64/complex64/
complex128) and ``T`` its real counterpart.  fp64 runs natively on CPU
(tests) and is XLA-emulated or disabled on TPU; the TPU-native precision
story is fp32 accumulation with optional compensated dot kernels.
"""

import jax.numpy as jnp
import numpy as np

_REAL_OF = {
    jnp.dtype("bfloat16"): jnp.dtype("bfloat16"),
    jnp.dtype("float16"): jnp.dtype("float16"),
    jnp.dtype("float32"): jnp.dtype("float32"),
    jnp.dtype("float64"): jnp.dtype("float64"),
    jnp.dtype("complex64"): jnp.dtype("float32"),
    jnp.dtype("complex128"): jnp.dtype("float64"),
}


def real_dtype(dtype):
    """T for FC: the real dtype underlying a (possibly complex) dtype."""
    return _REAL_OF[jnp.dtype(dtype)]


def is_complex(dtype):
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def eps(dtype):
    """Machine epsilon of the real dtype underlying ``dtype``."""
    return float(jnp.finfo(real_dtype(dtype)).eps)


def sqrt_eps(dtype):
    """Default atol/rtol = √eps(T) (reference: src/cg.jl:104-105)."""
    return float(np.sqrt(eps(dtype)))
