"""Exact-string rendering of stats (reference test/test_stats.jl:1-26)."""

import numpy as np

from krylov_tpu.stats import (SimpleStats, LsmrStats, LanczosStats,
                              AdjointStats)
from krylov_tpu.show import show_stats, vec2str


def test_simple_stats_exact():
    stats = SimpleStats(niter=0, solved=True, inconsistent=True,
                        indefinite=False, npc_count=0,
                        residuals=np.array([1.0]),
                        Aresiduals=np.array([2.0]),
                        timer=1.234, status="unknown")
    expected = """SimpleStats
 niter: 0
 solved: true
 inconsistent: true
 indefinite: false
 npcCount: 0
 residuals: [ 1.0e+00 ]
 Aresiduals: [ 2.0e+00 ]
 κ₂(A): []
 timer: 1.23s
 status: unknown"""
    assert show_stats(stats) == expected


def test_lsmr_stats_exact():
    stats = LsmrStats(niter=0, solved=True, inconsistent=True,
                      residuals=np.array([1.0]), Aresiduals=np.array([2.0]),
                      residual=3.0, Aresidual=4.0, Acond=7.0, Anorm=6.0,
                      xNorm=5.0, timer=0.1234, status="unknown")
    s = show_stats(stats)
    assert s.startswith("LsmrStats\n niter: 0\n solved: true\n")
    assert " residual: 3.0\n" in s
    assert " ‖A‖F: 6.0\n" in s
    assert " κ₂(A): 7.0\n" in s
    assert s.endswith(" timer: 123.40ms\n status: unknown")


def test_timer_units():
    st = SimpleStats(niter=1, timer=5.42e-4, status="unknown")
    assert " timer: 542.00μs" in show_stats(st)
    st = SimpleStats(niter=1, timer=0.542, status="unknown")
    assert " timer: 542.00ms" in show_stats(st)
    st = SimpleStats(niter=1, timer=5.42, status="unknown")
    assert " timer: 5.42s" in show_stats(st)


def test_vec2str_elision():
    assert vec2str(np.zeros(0)) == "[]"
    assert vec2str(np.array([1.0])) == "[ 1.0e+00 ]"
    long = np.arange(1.0, 11.0)
    s = vec2str(long)
    assert "... " in s
    assert s.startswith("[ 1.0e+00 ") and s.endswith(" 1.0e+01 ]")


def test_adjoint_stats_fields():
    st = AdjointStats(niter=3, solved_primal=True, solved_dual=False,
                      residuals_primal=np.array([1.0]),
                      residuals_dual=np.zeros(0),
                      timer=1.0, status="unknown")
    s = show_stats(st)
    assert " solved primal: true" in s
    assert " solved dual: false" in s
    assert " residuals primal: [ 1.0e+00 ]" in s


def test_lanczos_stats():
    st = LanczosStats(niter=2, solved=True, residuals=np.zeros(0),
                      indefinite=False, Anorm=1.5, Acond=2.5,
                      timer=1e-5, status="unknown")
    s = show_stats(st)
    assert " ‖A‖F: 1.5" in s
    assert " κ₂(A): 2.5" in s
    assert " timer: 10.00μs" in s


def test_api_reference_covers_exports():
    """docs/reference.md (tools/gen_api_reference.py) must document every
    public symbol of the package root."""
    import pathlib
    import types

    import krylov_tpu as kt

    doc = (pathlib.Path(__file__).parent.parent / "docs"
           / "reference.md").read_text()
    missing = [
        n for n in dir(kt)
        if not n.startswith("_")
        and not isinstance(getattr(kt, n), types.ModuleType)
        and f"### `{n}`" not in doc
    ]
    assert not missing, f"regenerate docs/reference.md: missing {missing}"
