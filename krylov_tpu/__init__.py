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
    kdotr2,
    knorm,
    knorm2,
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
    DIAOperator,
    BELLOperator,
    HybridOperator,
    as_operator,
)
from .ops.sparse import CSRMatrix, csr_from_dense, csr_from_coo
from .ops.hybrid import HybridMatrix, hybrid_from_csr, split_diagonals
from .ops.pallas_sell import (SELLBucketed, SELLMatrix,
                              sell_bucketed_from_csr, sell_from_csr,
                              sell_spmv)
from .precond import ChebyshevPreconditioner, power_bound
from .parallel.pipelined import pipelined_cg
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
from .solvers.block import block_minres, block_gmres

# Krylov processes (standalone basis-building API).
from .processes import (
    hermitian_lanczos,
    nonhermitian_lanczos,
    arnoldi,
    golub_kahan,
    saunders_simon_yip,
    montoison_orban,
    block_hermitian_lanczos,
    block_nonhermitian_lanczos,
    block_arnoldi,
    block_golub_kahan,
    block_saunders_simon_yip,
    block_montoison_orban,
)

# Generic interface + workspaces.
from .interface import (
    krylov_solve,
    krylov_workspace,
    krylov_solve_inplace,
    KRYLOV_METHODS,
)
from .show import show_stats, show_workspace, kstdout
from .workspaces import (
    KrylovConstructor,
    KrylovWorkspace,
    BlockKrylovWorkspace,
    METHOD_TABLE,
    solution,
    statistics,
    results,
    issolved,
    iteration_count,
    Aprod_count,
    Atprod_count,
    warm_start,
    elapsed_time,
)

# Differentiable solves (kt.diff.solve / kt.diff.lstsq): implicit
# differentiation through the same solver cores — a TPU/JAX-native
# extension with no reference analogue (Krylov.jl ships no AD rules).
from . import diff
# Batched small-systems solves: vmapped cores + per-item stats.
from .batched import batched_solve, batched_solve_xy, BatchedStats
# Ahead-of-time solver export for serving (jax.export artifacts).
from .aot import export_solver, export_solver_xy, load_solver

# Re-export the generated per-method workspace classes (CgWorkspace,
# MinresWorkspace, ...) to mirror the reference's exported workspace types
# (reference src/krylov_workspaces.jl).
from . import workspaces as _workspaces

for _method in METHOD_TABLE:
    _cname = "".join(_w.capitalize() for _w in _method.split("_")) + "Workspace"
    globals()[_cname] = getattr(_workspaces, _cname)
del _method, _cname

__version__ = "0.1.0"
