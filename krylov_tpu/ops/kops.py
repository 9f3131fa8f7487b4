"""L0 kernel layer ("k-ops").

JAX-native equivalents of the reference's scalar/vector kernel layer
(reference: src/krylov_utils.jl:21-402).  In Krylov.jl these dispatch to
BLAS; here they are jnp ops — XLA fuses them into surrounding computation,
and under `jit` over sharded arrays the reductions ride ICI via `psum`s
inserted automatically by SPMD partitioning.  Mutating k-ops (`kaxpy!`,
`kaxpby!`, `kscal!`, ...) have no functional analogue: solvers express the
same updates as pure jnp expressions and rely on XLA buffer reuse/donation
for the zero-allocation property.

Traceable numerics helpers with exact branch parity:
  - ``sym_givens``     (real: src/krylov_utils.jl:21-51, complex: :61-94)
  - ``roots_quadratic``(src/krylov_utils.jl:110-152)
  - ``to_boundary``    (src/krylov_utils.jl:375-402)
"""

import jax
import jax.numpy as jnp

from .._dtypes import real_dtype, is_complex


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def kdot(x, y):
    """⟨x, y⟩ with conjugation on x (BLAS dotc semantics)."""
    return jnp.sum(jnp.conj(x) * y)


def kdotr(x, y):
    """Real part of ⟨x, y⟩ (reference kdotr, src/krylov_utils.jl:318)."""
    return jnp.real(kdot(x, y))


def knorm(x):
    """Euclidean norm, always real."""
    return jnp.sqrt(jnp.real(jnp.sum(jnp.conj(x) * x)))


def knorm_elliptic(x, mx):
    """Elliptic norm √(xᴴ M x) given x and Mx (reference knorm_elliptic)."""
    return jnp.sqrt(kdotr(x, mx))


# ---------------------------------------------------------------------------
# compensated (double-word) reductions — fp64-grade dot products from fp32
# hardware (SURVEY.md §7.2 "fp64 on TPU").  Ogita-Rump-Oishi Dot2: the
# product error terms from TwoProd and the running-sum error terms from
# TwoSum are accumulated separately and folded back in, giving results as
# if computed in twice the working precision.
# ---------------------------------------------------------------------------

def _dekker_split(a):
    """Split a into hi + lo with hi carrying the top half of the mantissa."""
    # 2^ceil(p/2)+1 with p the mantissa bits of the dtype.
    bits = {jnp.dtype(jnp.float32): 4097.0, jnp.dtype(jnp.float64): 134217729.0,
            jnp.dtype(jnp.bfloat16): 17.0}[jnp.dtype(a.dtype)]
    c = jnp.asarray(bits, a.dtype) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod_vec(a, b):
    """Vectorized TwoProd via Dekker splitting (no FMA required)."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _comp_pairwise_sum(v):
    """Compensated pairwise summation: a TwoSum reduction tree (fully
    vectorized, log2(n) levels) whose per-level error terms are folded
    back in — Sum2-grade accuracy with VPU-friendly shapes."""
    err = jnp.zeros((), v.dtype)
    while v.shape[0] > 1:
        n = v.shape[0]
        if n % 2:
            v = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        a, b = v[0::2], v[1::2]
        s = a + b
        bp = s - a
        e = (a - (s - bp)) + (b - bp)
        err = err + jnp.sum(e)
        v = s
    return v[0] + err


def kdotr2(x, y):
    """Compensated Re⟨x, y⟩ (Ogita-Rump-Oishi Dot2, vectorized):
    fp32 inputs with close-to-fp64 result accuracy — the kernel that
    recovers fp64-grade iteration counts from fp32 TPU arithmetic."""
    if jnp.iscomplexobj(x) or jnp.iscomplexobj(y):
        xr, xi = jnp.real(x), jnp.imag(x)
        yr, yi = jnp.real(y), jnp.imag(y)
        return kdotr2(xr, yr) + kdotr2(xi, yi)
    p, err = _two_prod_vec(x, y)
    return _comp_pairwise_sum(p) + _comp_pairwise_sum(err)


def knorm2(x):
    """Compensated Euclidean norm."""
    if jnp.iscomplexobj(x):
        return jnp.sqrt(jnp.maximum(
            kdotr2(jnp.real(x), jnp.real(x))
            + kdotr2(jnp.imag(x), jnp.imag(x)), 0))
    return jnp.sqrt(jnp.maximum(kdotr2(x, x), 0))


# ---------------------------------------------------------------------------
# double-word (hi, lo) vector arithmetic — fp64-grade storage from pairs of
# fp32 arrays.  A dw vector represents hi + lo elementwise with
# |lo| ≤ ulp(hi)/2, giving ~48 mantissa bits on f32 hardware.  These feed
# the `precision="double_word"` iterative-refinement path: inner solves run
# plain f32 (fused kernels eligible), the outer loop accumulates x and the
# residual in dw so the TRUE residual reaches fp64 tolerances
# (SURVEY.md §7.2 "fp64 on TPU").
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Exact addition: s + e == a + b with s = fl(a+b) (Knuth TwoSum)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def dw_add(hi, lo, y):
    """(hi, lo) + y  →  renormalized dw pair (y a plain vector)."""
    s, e = two_sum(hi, y)
    return two_sum(s, e + lo)


def dw_add_dw(hi, lo, yhi, ylo):
    """(hi, lo) + (yhi, ylo)  →  renormalized dw pair."""
    s, e = two_sum(hi, yhi)
    return two_sum(s, e + (lo + ylo))


def dw_norm(hi, lo):
    """Compensated ‖hi + lo‖ (lo only shifts the norm at the ~1e-8
    relative level — folded in via the cross term)."""
    n2 = kdotr2(hi, hi) + 2.0 * kdotr2(hi, lo)
    return jnp.sqrt(jnp.maximum(n2, 0))


# ---------------------------------------------------------------------------
# Givens reflections
# ---------------------------------------------------------------------------

def _safe(d, zero_pred):
    """Replace d by 1 where zero_pred, to make untaken where-branches finite."""
    return jnp.where(zero_pred, jnp.ones_like(d), d)


def _sym_givens_real(a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b, dtype=a.dtype)
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    b_zero = abs_b == 0
    a_zero = abs_a == 0
    b_dominant = abs_b > abs_a

    one = jnp.ones_like(a)

    # |b| > |a| branch: t = a/b, s = sign(b)/√(1+t²), c = s·t, ρ = b/s
    t3 = a / _safe(b, b_zero)
    s3 = jnp.sign(b) / jnp.sqrt(one + t3 * t3)
    c3 = s3 * t3
    rho3 = b / _safe(s3, s3 == 0)

    # |a| ≥ |b| branch: t = b/a, c = sign(a)/√(1+t²), s = c·t, ρ = a/c
    t4 = b / _safe(a, a_zero)
    c4 = jnp.sign(a) / jnp.sqrt(one + t4 * t4)
    s4 = c4 * t4
    rho4 = a / _safe(c4, c4 == 0)

    # sign(0) = 0 in both Julia and jnp; the reference uses sign(a)+iszero(a)
    # so that sym_givens(0, 0) = (1, 0, 0).
    c = jnp.where(
        b_zero,
        jnp.sign(a) + a_zero.astype(a.dtype),
        jnp.where(a_zero, jnp.zeros_like(a), jnp.where(b_dominant, c3, c4)),
    )
    s = jnp.where(
        b_zero,
        jnp.zeros_like(a),
        jnp.where(a_zero, jnp.sign(b), jnp.where(b_dominant, s3, s4)),
    )
    rho = jnp.where(
        b_zero, abs_a, jnp.where(a_zero, abs_b, jnp.where(b_dominant, rho3, rho4))
    )
    return c, s, rho


def _sym_givens_complex(a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b).astype(a.dtype)
    rdt = real_dtype(a.dtype)
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    b_zero = abs_b == 0
    a_zero = abs_a == 0
    b_dominant = abs_b > abs_a

    one_r = jnp.ones((), dtype=rdt)
    # phase factor conj((b/|b|)/(a/|a|)); safe where either is zero
    phase = jnp.conj(
        (b / _safe(abs_b, b_zero).astype(a.dtype))
        / (a / _safe(abs_a, a_zero).astype(a.dtype))
    )

    # |b| > |a|: t = |a|/|b|, c₀ = 1/√(1+t²), s = c₀·phase, c = c₀·t, ρ = b/conj(s)
    t3 = abs_a / _safe(abs_b, b_zero)
    c0_3 = one_r / jnp.sqrt(one_r + t3 * t3)
    s3 = c0_3.astype(a.dtype) * phase
    c3 = c0_3 * t3
    rho3 = b / _safe(jnp.conj(s3), s3 == 0)

    # |a| ≥ |b|: t = |b|/|a|, c = 1/√(1+t²), s = c·t·phase, ρ = a/c
    t4 = abs_b / _safe(abs_a, a_zero)
    c4 = one_r / jnp.sqrt(one_r + t4 * t4)
    s4 = (c4 * t4).astype(a.dtype) * phase
    rho4 = a / _safe(c4, c4 == 0).astype(a.dtype)

    zero_c = jnp.zeros((), dtype=a.dtype)
    c = jnp.where(
        b_zero, one_r, jnp.where(a_zero, jnp.zeros((), rdt), jnp.where(b_dominant, c3, c4))
    )
    s = jnp.where(
        b_zero, zero_c, jnp.where(a_zero, jnp.ones((), a.dtype), jnp.where(b_dominant, s3, s4))
    )
    rho = jnp.where(b_zero, a, jnp.where(a_zero, b, jnp.where(b_dominant, rho3, rho4)))
    return c, s, rho


def sym_givens(a, b):
    """Numerically stable symmetric Givens reflection.

    Returns (c, s, ρ) with [c s; s̄ -c]ᵀ applied to [a; b] giving [ρ; 0].
    c is always real; s, ρ match the (possibly complex) input dtype.
    Branch structure mirrors reference src/krylov_utils.jl:21-97 exactly
    (corner cases asserted by test/test_aux.jl:3-34) but is expressed
    branchlessly so it traces under jit/while_loop.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    dt = jnp.promote_types(a.dtype, b.dtype)
    if is_complex(dt):
        return _sym_givens_complex(a.astype(dt), b.astype(dt))
    return _sym_givens_real(a.astype(dt), b.astype(dt))


# ---------------------------------------------------------------------------
# quadratic roots & trust-region boundary
# ---------------------------------------------------------------------------

def roots_quadratic(q2, q1, q0, nitref=1):
    """Real roots of q(x) = q₂x² + q₁x + q₀, cancellation-safe.

    Traceable (branchless) version of reference src/krylov_utils.jl:110-152,
    including the ill-conditioned |q₀q₂| ≤ √eps·q₁² fallback and ``nitref``
    Newton refinement steps.  When called with concrete (non-traced) values
    it additionally raises on complex roots, matching the reference errors.
    """
    q2 = jnp.asarray(q2)
    q1 = jnp.asarray(q1, dtype=q2.dtype)
    q0 = jnp.asarray(q0, dtype=q2.dtype)
    dt = q2.dtype
    eps_t = jnp.finfo(dt).eps

    concrete = not any(
        isinstance(v, jax.core.Tracer) for v in (q2, q1, q0)
    )
    if concrete:
        if q2 == 0 and q1 == 0 and q0 != 0:
            raise ValueError("The quadratic `q` doesn't have real roots.")
        if q2 != 0 and abs(q0 * q2) > jnp.sqrt(eps_t) * q1 * q1:
            if q1 * q1 - 4 * q2 * q0 < 0:
                raise ValueError("The quadratic `q` doesn't have real roots.")

    linear = q2 == 0
    lin_root = jnp.where(q1 == 0, jnp.zeros_like(q0), -q0 / _safe(q1, q1 == 0))

    well_cond = jnp.abs(q0 * q2) > jnp.sqrt(eps_t) * q1 * q1
    disc = q1 * q1 - 4 * q2 * q0
    d = -(q1 + jnp.copysign(jnp.sqrt(jnp.maximum(disc, 0)), q1)) / 2
    safe_q2 = _safe(q2, linear)
    root1_w = d / safe_q2
    root2_w = q0 / _safe(d, d == 0)
    root1_i = -q1 / safe_q2
    root2_i = jnp.zeros_like(q0)

    root1 = jnp.where(linear, lin_root, jnp.where(well_cond, root1_w, root1_i))
    root2 = jnp.where(linear, lin_root, jnp.where(well_cond, root2_w, root2_i))

    def refine(root):
        for _ in range(nitref):
            q = (q2 * root + q1) * root + q0
            dq = 2 * q2 * root + q1
            root = jnp.where(dq == 0, root, root - q / _safe(dq, dq == 0))
        return root

    return refine(root1), refine(root2)


def to_boundary(x, d, radius, flip=False, xNorm2=None, dNorm2=None, M_apply=None):
    """σ₁, σ₂ with ‖x + σᵢ d‖ = radius (M-elliptic norm if M_apply given).

    Traceable analogue of reference src/krylov_utils.jl:375-402.  ``M_apply``
    is a callable v ↦ Mv (already resolved for ldiv); solvers pass the raw
    preconditioner apply.  Returns both roots; callers take the max.
    """
    if M_apply is None:
        rxd = kdotr(x, d)
        dn2 = kdotr(d, d) if dNorm2 is None else dNorm2
        xn2 = kdotr(x, x) if xNorm2 is None else xNorm2
    else:
        mx = M_apply(x)
        rxd = jnp.real(kdot(mx, d))
        xn2 = kdotr(mx, x)
        md = M_apply(d)
        dn2 = kdotr(md, d)
    if flip:
        rxd = -rxd
    radius2 = radius * radius
    return roots_quadratic(dn2, 2 * rxd, xn2 - radius2)
