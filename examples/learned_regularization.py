#!/usr/bin/env python
"""Differentiate THROUGH a Krylov solve: learn a ridge weight λ.

A capability beyond the reference (Krylov.jl has no AD rules): because
``kt.diff.lstsq`` registers the solve with ``lax.custom_linear_solve``,
``jax.grad`` flows through the normal equations and the regularization
weight itself becomes a trainable parameter.  We fit

    x(λ) = argmin ‖A_train x − b_train‖² + λ‖x‖²

and pick λ by gradient descent on the VALIDATION loss
``‖A_val x(λ) − b_val‖²`` — each optimization step runs one CG-based
solve forward and one adjoint solve backward (implicit differentiation,
O(n) memory, no unrolled iterations).  See docs/autodiff.md.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from krylov_tpu import diff


def main():
    rng = np.random.default_rng(7)
    m, n = 120, 40
    # Ill-conditioned design matrix + noisy observations of a true x.
    col_scale = np.logspace(-3, 0, n)
    A = rng.standard_normal((m, n)) * col_scale / np.sqrt(m)
    x_true = rng.standard_normal(n)
    noise = 0.05 * rng.standard_normal(m)
    b = A @ x_true + noise

    A_tr, A_val = jnp.asarray(A[: m // 2]), jnp.asarray(A[m // 2:])
    b_tr, b_val = jnp.asarray(b[: m // 2]), jnp.asarray(b[m // 2:])

    def val_loss(log_lam):
        x = diff.lstsq(A_tr, b_tr, lam=jnp.exp(log_lam), rtol=1e-12)
        r = A_val @ x - b_val
        return jnp.sum(r * r)

    g = jax.jit(jax.value_and_grad(val_loss))

    log_lam = jnp.asarray(np.log(1e-6))  # start badly under-regularized
    lr = 0.4
    loss0, _ = g(log_lam)
    for step in range(60):
        loss, grad = g(log_lam)
        log_lam = log_lam - lr * grad
    loss_final, _ = g(log_lam)
    lam = float(jnp.exp(log_lam))
    print(f"initial val loss {float(loss0):.4f} -> final "
          f"{float(loss_final):.4f} at learned lambda = {lam:.3e}")

    # The learned λ must beat both endpoints of the sweep it searched.
    assert loss_final < loss0
    for probe in (1e-6, 1.0):
        assert loss_final <= float(val_loss(jnp.asarray(np.log(probe)))) + 1e-9

    # And the solve at the learned λ recovers x_true better than
    # the unregularized solution.
    x_hat = np.asarray(diff.lstsq(A_tr, b_tr, lam=lam, rtol=1e-12))
    x_raw = np.asarray(diff.lstsq(A_tr, b_tr, lam=1e-10, rtol=1e-12))
    err_hat = np.linalg.norm(x_hat - x_true)
    err_raw = np.linalg.norm(x_raw - x_true)
    print(f"recovery error: learned-lambda {err_hat:.3f} vs "
          f"unregularized {err_raw:.3f}")
    assert err_hat < err_raw


if __name__ == "__main__":
    main()
