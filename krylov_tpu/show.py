"""Pretty-printing for stats and workspaces (reference src/krylov_show.jl).

``show_stats`` renders the field table of any stats object;
``show_workspace`` renders per-field byte sizes of the last solve's
device state with architecture detection (CPU/TPU/GPU) from the buffer's
device — the analogue of the reference's table with ktypeof-based
architecture detection (src/krylov_show.jl:66-83).
"""

import numpy as np


def _fmt_val(v):
    if isinstance(v, float):
        return f"{v:.2e}"
    if isinstance(v, np.ndarray):
        return f"array[{v.shape[0]}]" if v.ndim == 1 else f"array{v.shape}"
    if isinstance(v, list):
        return f"list[{len(v)}]"
    return repr(v)


def show_stats(stats):
    name = type(stats).__name__
    lines = [f"┌ {name}"]
    for field, value in vars(stats).items():
        lines.append(f"│ {field:<18s} {_fmt_val(value)}")
    lines.append("└")
    return "\n".join(lines)


def _device_arch(leaf):
    try:
        dev = list(leaf.devices())[0]
        plat = dev.platform.upper()
        return plat
    except Exception:
        return "CPU"


def show_workspace(ws):
    lines = [f"┌ {type(ws).__name__}  method={ws.method}"]
    if ws.stats is not None:
        lines.append(f"│ {'niter':<18s} {ws.stats.niter}")
        lines.append(f"│ {'status':<18s} {ws.stats.status!r}")
    total = 0
    arch = "CPU"
    if ws.state is not None:
        for fname, leaf in zip(ws.state._fields, ws.state):
            nbytes = getattr(leaf, "nbytes", 0)
            total += nbytes
            if hasattr(leaf, "devices"):
                arch = _device_arch(leaf)
            shape = getattr(leaf, "shape", ())
            lines.append(f"│ {fname:<18s} {str(shape):<14s} {nbytes} bytes")
    lines.append(f"│ {'architecture':<18s} {arch}")
    lines.append(f"│ {'total storage':<18s} {total} bytes")
    lines.append("└")
    return "\n".join(lines)
