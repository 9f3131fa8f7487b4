"""krylov_tpu — a TPU-native Krylov-subspace solver library in JAX.

A from-scratch JAX/Pallas framework with the capability surface of
JuliaSmoothOptimizers/Krylov.jl (reference layout documented in SURVEY.md):
the full method basket, preconditioning, warm starts, workspaces,
per-iteration statistics, real/complex dtypes, and multi-device sharding.

Compute path: jax.numpy + lax.while_loop solver cores (traced once, compiled
by XLA), Pallas kernels for sparse matvec, jax.sharding for multi-chip.
"""

from .ops.kops import (
    kdot,
    kdotr,
    knorm,
    knorm_elliptic,
    sym_givens,
    roots_quadratic,
    to_boundary,
)
from .operators import (
    AbstractLinearOperator,
    MatrixOperator,
    CSROperator,
    FunctionOperator,
    DiagonalOperator,
    IdentityOperator,
    as_operator,
)
from .ops.sparse import CSRMatrix, csr_from_dense, csr_from_coo
from .stats import (
    SimpleStats,
    LsmrStats,
    LanczosStats,
    LanczosShiftStats,
    SymmlqStats,
    AdjointStats,
    LNLQStats,
    LSLQStats,
)

from .solvers.cg import cg
from .solvers.cr import cr, car
from .solvers.minres import minres
from .solvers.cg_lanczos import cg_lanczos, cg_lanczos_shift
from .solvers.gmres import gmres, fgmres
from .solvers.fom import fom, diom, dqgmres
from .solvers.bicgstab import bicgstab, cgs
from .solvers.lsqr import lsqr
from .solvers.lsmr import lsmr
from .solvers.cgls import cgls, crls, cgls_lanczos_shift
from .solvers.cgne import cgne, crmr
from .solvers.symmlq import symmlq
from .solvers.minres_qlp import minres_qlp
from .solvers.minares import minares
from .solvers.bilq import bilq, qmr, bilqr
from .solvers.usymlq import usymlq, usymqr, trilqr, usymlqr
from .solvers.tricg import tricg, trimr
from .solvers.gpmr import gpmr
from .solvers.craig import craig, craigmr, lnlq
from .solvers.lslq import lslq

__version__ = "0.1.0"
