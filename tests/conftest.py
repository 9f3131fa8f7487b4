"""Test configuration: CPU backend with 8 virtual devices + fp64 enabled.

Mirrors the reference's strategy of validating numerics on a host backend
(SURVEY.md §4.8): correctness on the "fake device" CPU mesh; the real TPU
chip is exercised by bench.py and the driver's compile checks.

Note: the environment's sitecustomize registers a remote-TPU ("axon") JAX
backend and forces jax_platforms; we override it back to cpu here before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
