"""Smoke-run the worked examples (reference docs/src/examples/ parity).

Each example is a standalone script with its own asserts; run a
representative subset in a fresh CPU interpreter so example drift fails
CI.  The multichip/native examples are exercised by their own suites.
"""
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

EXAMPLES = [
    "bicgstab_convdiff.py",
    "car_shifted_poisson.py",
    "symmlq_minres_qlp.py",
    "cgls_crls_regularized.py",
    "cgne_crmr_least_norm.py",
    "lsmr_rank_deficient.py",
    "trimr_usymlqr_saddle.py",
    "learned_regularization.py",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / name)],
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
