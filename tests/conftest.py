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


# jaxlib 0.9's CPU (LLVM ORC) JIT segfaults inside backend_compile once a
# single process accumulates ~900 live compiled executables (reproduced
# deterministically at tests/test_twosided.py in full-suite order; any
# individual file passes).  Bound the live-executable count by dropping
# JAX's compilation caches between test modules — recompiles of shared
# fixtures cost a few seconds, a segfault costs the suite.
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
