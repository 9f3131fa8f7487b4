"""Statistics objects returned by every solver.

Host-side dataclasses mirroring the reference's 8 mutable stats structs
(reference: src/krylov_stats.jl:24-365).  The jitted solver cores return a
pytree of device scalars/history buffers; ``from_device``-style decoding in
each solver fills these in, trimming history arrays to ``niter + 1``
entries (the reference pushes one residual before the loop and one per
iteration).

Status strings use the reference's fixed vocabulary (e.g.
src/cg.jl:272-278, src/gmres.jl:367-371) so downstream code matching on
``stats.status`` ports unchanged.
"""

from dataclasses import dataclass, field
from typing import List

import numpy as np


# Shared status vocabulary; each solver maps its internal status codes to
# these exact strings (reference: src/cg.jl:272-278 etc.).
UNKNOWN = "unknown"
SOLVED = "solution good enough given atol and rtol"
SOLVED_AR = "found approximate minimum least-squares solution"
SOLVED_X = "found approximate minimum-norm solution"
ZERO_RESIDUAL = "x is a zero-residual solution"
TIRED = "maximum number of iterations exceeded"
OVERTIMED = "time limit exceeded"
USER_EXIT = "user-requested exit"
NPC = "nonpositive curvature"
ON_BOUNDARY = "on trust-region boundary"
ZERO_CURVATURE = "zero curvature detected"
INCONSISTENT = "found approximate least-squares solution"


def _np1(x):
    return np.asarray(x)


@dataclass
class KrylovStatsBase:
    niter: int = 0
    timer: float = 0.0
    status: str = UNKNOWN

    def __post_init__(self):
        pass


@dataclass
class SimpleStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:24-36."""
    solved: bool = False
    inconsistent: bool = False
    indefinite: bool = False
    npc_count: int = 0
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    Aresiduals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    Acond: np.ndarray = field(default_factory=lambda: np.zeros(0))

    # Julia-name alias
    @property
    def npcCount(self):
        return self.npc_count


@dataclass
class LsmrStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:76-90."""
    solved: bool = False
    inconsistent: bool = False
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    Aresiduals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    residual: float = 0.0
    Aresidual: float = 0.0
    Acond: float = 0.0
    Anorm: float = 0.0
    xNorm: float = 0.0


@dataclass
class LanczosStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:127-137."""
    solved: bool = False
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    indefinite: bool = False
    Anorm: float = 0.0
    Acond: float = 0.0


@dataclass
class LanczosShiftStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:169-179."""
    solved: bool = False
    residuals: List[np.ndarray] = field(default_factory=list)
    indefinite: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=bool))
    Anorm: float = 0.0
    Acond: float = 0.0


@dataclass
class SymmlqStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:215-227 (Missing ↦ np.nan)."""
    solved: bool = False
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    residualscg: np.ndarray = field(default_factory=lambda: np.zeros(0))
    errors: np.ndarray = field(default_factory=lambda: np.zeros(0))
    errorscg: np.ndarray = field(default_factory=lambda: np.zeros(0))
    Anorm: float = 0.0
    Acond: float = 0.0


@dataclass
class AdjointStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:263-272."""
    solved_primal: bool = False
    solved_dual: bool = False
    residuals_primal: np.ndarray = field(default_factory=lambda: np.zeros(0))
    residuals_dual: np.ndarray = field(default_factory=lambda: np.zeros(0))

    @property
    def solved(self):
        return self.solved_primal and self.solved_dual


@dataclass
class LNLQStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:305-315."""
    solved: bool = False
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    error_with_bnd: bool = False
    error_bnd_x: np.ndarray = field(default_factory=lambda: np.zeros(0))
    error_bnd_y: np.ndarray = field(default_factory=lambda: np.zeros(0))


@dataclass
class LSLQStats(KrylovStatsBase):
    """reference: src/krylov_stats.jl:352-365."""
    solved: bool = False
    inconsistent: bool = False
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    Aresiduals: np.ndarray = field(default_factory=lambda: np.zeros(0))
    err_lbnds: np.ndarray = field(default_factory=lambda: np.zeros(0))
    error_with_bnd: bool = False
    err_ubnds_lq: np.ndarray = field(default_factory=lambda: np.zeros(0))
    err_ubnds_cg: np.ndarray = field(default_factory=lambda: np.zeros(0))
