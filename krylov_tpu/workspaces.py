"""L3 workspace layer + accessors.

In the reference, a workspace is a bag of preallocated vectors with an
in-place ``xyz!(workspace, A, b)`` contract (src/krylov_workspaces.jl).
Under JAX the buffers live in jit-managed device memory and re-solving
with identical static configuration hits the compilation cache — the
functional analogue of the zero-allocation contract
(test/test_allocations.jl).  A ``KrylovWorkspace`` here carries:

* the method name and its solve-time configuration,
* the last solve's full state pytree (so solver internals such as
  ``npc_dir`` remain accessible, like the reference's workspace fields),
* the last stats object,
* a pending warm-start guess set by ``warm_start(ws, x0[, y0])``.

Accessor functions mirror src/workspace_accessors.jl: ``solution``,
``statistics``, ``results``, ``issolved``, ``iteration_count``,
``Aprod_count``, ``Atprod_count``, ``elapsed_time``, ``warm_start``.
The per-method (nsol, nA, nAt, warm) table is the reference's
(src/workspace_accessors.jl:101-139).
"""

import jax
import jax.numpy as jnp


# method -> (nsol, nA, nAt, warm_start_allowed, needs_c, two_operators)
METHOD_TABLE = {
    "cg": (1, 1, 0, True, False, False),
    "cr": (1, 1, 0, True, False, False),
    "car": (1, 1, 0, True, False, False),
    "cg_lanczos": (1, 1, 0, True, False, False),
    "cg_lanczos_shift": (1, 1, 0, False, False, False),
    "symmlq": (1, 1, 0, True, False, False),
    "minres": (1, 1, 0, True, False, False),
    "minres_qlp": (1, 1, 0, True, False, False),
    "minares": (1, 1, 0, True, False, False),
    "cgs": (1, 2, 0, True, False, False),
    "bicgstab": (1, 2, 0, True, False, False),
    "bilq": (1, 1, 1, True, False, False),
    "qmr": (1, 1, 1, True, False, False),
    "bilqr": (2, 1, 1, True, True, False),
    "diom": (1, 1, 0, True, False, False),
    "fom": (1, 1, 0, True, False, False),
    "dqgmres": (1, 1, 0, True, False, False),
    "gmres": (1, 1, 0, True, False, False),
    "fgmres": (1, 1, 0, True, False, False),
    "cgls": (1, 1, 1, False, False, False),
    "cgls_lanczos_shift": (1, 1, 1, False, False, False),
    "crls": (1, 1, 1, False, False, False),
    "lslq": (1, 1, 1, False, False, False),
    "lsqr": (1, 1, 1, False, False, False),
    "lsmr": (1, 1, 1, False, False, False),
    "cgne": (1, 1, 1, False, False, False),
    "crmr": (1, 1, 1, False, False, False),
    "lnlq": (2, 1, 1, False, False, False),
    "craig": (2, 1, 1, False, False, False),
    "craigmr": (2, 1, 1, False, False, False),
    "usymlq": (1, 1, 1, True, True, False),
    "usymqr": (1, 1, 1, True, True, False),
    "usymlqr": (2, 1, 1, True, True, False),
    "trilqr": (2, 1, 1, True, True, False),
    "tricg": (2, 1, 1, True, True, False),
    "trimr": (2, 1, 1, True, True, False),
    "gpmr": (2, 1, 0, True, True, True),
    "block_minres": (1, 1, 0, True, False, False),
    "block_gmres": (1, 1, 0, True, False, False),
}


def _resolve(method):
    import importlib
    mapping = {
        "cg": ("krylov_tpu.solvers.cg", "_cg_solve"),
        "cr": ("krylov_tpu.solvers.cr", "_cr_solve"),
        "car": ("krylov_tpu.solvers.cr", "_car_solve"),
        "cg_lanczos": ("krylov_tpu.solvers.cg_lanczos", "_cg_lanczos_solve"),
        "cg_lanczos_shift": ("krylov_tpu.solvers.cg_lanczos",
                             "_cg_lanczos_shift_solve"),
        "symmlq": ("krylov_tpu.solvers.symmlq", "_symmlq_solve"),
        "minres": ("krylov_tpu.solvers.minres", "_minres_solve"),
        "minres_qlp": ("krylov_tpu.solvers.minres_qlp", "_minres_qlp_solve"),
        "minares": ("krylov_tpu.solvers.minares", "_minares_solve"),
        "cgs": ("krylov_tpu.solvers.bicgstab", None),
        "bicgstab": ("krylov_tpu.solvers.bicgstab", None),
        "bilq": ("krylov_tpu.solvers.bilq", "_bilq_solve"),
        "qmr": ("krylov_tpu.solvers.bilq", "_qmr_solve"),
        "bilqr": ("krylov_tpu.solvers.bilq", "_bilqr_solve"),
        "diom": ("krylov_tpu.solvers.fom", None),
        "dqgmres": ("krylov_tpu.solvers.fom", None),
        "fom": ("krylov_tpu.solvers.fom", "_fom_solve"),
        "gmres": ("krylov_tpu.solvers.gmres", None),
        "fgmres": ("krylov_tpu.solvers.gmres", None),
        "cgls": ("krylov_tpu.solvers.cgls", "_cgls_solve"),
        "cgls_lanczos_shift": ("krylov_tpu.solvers.cgls",
                               "_cgls_lanczos_shift_solve"),
        "crls": ("krylov_tpu.solvers.cgls", "_crls_solve"),
        "lslq": ("krylov_tpu.solvers.lslq", "_lslq_solve"),
        "lsqr": ("krylov_tpu.solvers.lsqr", "_lsqr_solve"),
        "lsmr": ("krylov_tpu.solvers.lsmr", "_lsmr_solve"),
        "cgne": ("krylov_tpu.solvers.cgne", None),
        "crmr": ("krylov_tpu.solvers.cgne", None),
        "lnlq": ("krylov_tpu.solvers.craig", "_lnlq_solve"),
        "craig": ("krylov_tpu.solvers.craig", "_craig_solve"),
        "craigmr": ("krylov_tpu.solvers.craig", "_craigmr_solve"),
        "usymlq": ("krylov_tpu.solvers.usymlq", "_usymlq_solve"),
        "usymqr": ("krylov_tpu.solvers.usymlq", "_usymqr_solve"),
        "usymlqr": ("krylov_tpu.solvers.usymlq", "_usymlqr_solve"),
        "trilqr": ("krylov_tpu.solvers.usymlq", "_trilqr_solve"),
        "tricg": ("krylov_tpu.solvers.tricg", "_tricg_solve"),
        "trimr": ("krylov_tpu.solvers.tricg", "_trimr_solve"),
        "gpmr": ("krylov_tpu.solvers.gpmr", "_gpmr_solve"),
        "block_minres": ("krylov_tpu.solvers.block", "_block_minres_solve"),
        "block_gmres": ("krylov_tpu.solvers.block", "_block_gmres_solve"),
    }
    modname, fname = mapping[method]
    mod = importlib.import_module(modname)
    if fname is None:
        # public function returning (x, stats) only: wrap the private one
        priv = {"cgs": "_biortho_solve", "bicgstab": "_biortho_solve",
                "gmres": "_gmres_like_solve", "fgmres": "_gmres_like_solve",
                "diom": "_trunc_solve", "dqgmres": "_trunc_solve",
                "cgne": "_cgne_like_solve", "crmr": "_cgne_like_solve"}[method]
        base = getattr(mod, priv)
        if method in ("cgs", "bicgstab"):
            core = getattr(mod, f"_{method}_core")
            return lambda A, b, *a, **k: base(core, A, b, *a, **k)
        if method in ("gmres", "fgmres"):
            return lambda A, b, *a, **k: base(method == "fgmres", A, b, *a, **k)
        return lambda A, b, *a, **k: base(method, A, b, *a, **k)
    return getattr(mod, fname)


class KrylovConstructor:
    """Prototype-vector workspace allocator (reference krylov_workspaces.jl:36-54).

    Holds prototype vectors `vm` (length m, the b-side) and `vn`
    (length n, the c-side; defaults to `vm`) from which workspaces
    derive their problem dimensions and dtype.  In JAX the prototypes
    only contribute shape/dtype — sharding and storage follow the
    operands of the actual solve.
    """

    def __init__(self, vm, vn=None):
        self.vm = jnp.asarray(vm)
        self.vn = self.vm if vn is None else jnp.asarray(vn)

    @property
    def m(self):
        return self.vm.shape[0]

    @property
    def n(self):
        return self.vn.shape[0]

    @property
    def dtype(self):
        return self.vm.dtype


class KrylovWorkspace:
    """Reusable solve context for one method (reference XyzWorkspace)."""

    def __init__(self, method, m=None, n=None, dtype=None, **config):
        if isinstance(method, KrylovConstructor):
            raise ValueError(
                "pass the method name first: "
                "KrylovWorkspace('cg', KrylovConstructor(...))")
        if isinstance(m, KrylovConstructor):
            kc = m
            m, n, dtype = kc.m, kc.n, kc.dtype
        if method not in METHOD_TABLE:
            raise ValueError(f"unknown Krylov method: {method!r}")
        self.method = method
        self.m = m
        self.n = n
        self.dtype = dtype
        self.config = config          # construction-time options
        self.nsol, self.nA, self.nAt, self.warm_allowed, self.needs_c, \
            self.two_ops = METHOD_TABLE[method]
        self._solver = _resolve(method)
        self._x0 = None
        self._y0 = None
        self.stats = None
        self.state = None
        self.x = None
        self.y = None

    # -- solving ----------------------------------------------------------
    def solve(self, A, b, *args, **kwargs):
        """In-place-style solve (the reference's xyz!(workspace, ...))."""
        kw = dict(self.config)
        kw.update(kwargs)
        pos = list(args)
        if self._x0 is not None and self.warm_allowed:
            if self.nsol == 2 and self._y0 is not None:
                pos = pos + [self._x0, self._y0]
            else:
                pos = pos + [self._x0]
            self._x0 = self._y0 = None
        if kw.get("precision") not in (None, "working"):
            # precision="double_word"/"compensated" lives in the PUBLIC
            # wrappers (the registry's private _solve entries would
            # swallow the kwarg in **_ig and silently return a plain
            # working-precision solve).  dw solves keep no reusable
            # device state (x is a host f64 array).
            import krylov_tpu as _kt
            out = getattr(_kt, self.method)(A, b, *pos, **kw)
            if len(out) == 3:
                self.x, self.y, self.stats = out
            else:
                self.x, self.stats = out
                self.y = None
            self.state = None
            return self
        out = self._solver(A, b, *pos, **kw)
        if len(out) == 4:
            self.x, self.y, self.stats, self.state = out
        else:
            self.x, self.stats, self.state = out
            self.y = None
        return self

    def __getattr__(self, name):
        # Fall through to solver-state fields (npc_dir, rNorm, V, ...).
        state = self.__dict__.get("state")
        if state is not None and hasattr(state, name):
            return getattr(state, name)
        raise AttributeError(name)

    def __repr__(self):
        lines = [f"{type(self).__name__}(method={self.method!r})"]
        if self.stats is not None:
            lines.append(f"  niter: {self.stats.niter}")
            lines.append(f"  status: {self.stats.status!r}")
        if self.state is not None:
            total = 0
            for leaf in jax.tree_util.tree_leaves(self.state):
                total += getattr(leaf, "nbytes", 0)
            lines.append(f"  state storage: {total} bytes")
        return "\n".join(lines)


class BlockKrylovWorkspace(KrylovWorkspace):
    """Supertype of the block-method workspaces.

    Mirrors the reference's abstract ``BlockKrylovWorkspace`` (reference
    src/block_krylov_workspaces.jl): ``BlockMinresWorkspace`` and
    ``BlockGmresWorkspace`` subclass it, so ``isinstance(ws,
    BlockKrylovWorkspace)`` distinguishes multi-RHS workspaces.
    """


# Generated per-method workspace classes (CgWorkspace, MinresWorkspace, ...)
def _make_ws_class(method):
    cname = "".join(w.capitalize() for w in method.split("_")) + "Workspace"

    def __init__(self, *shape_args, **config):
        m = n = dtype = None
        if len(shape_args) >= 1 and isinstance(shape_args[0],
                                               KrylovConstructor):
            kc = shape_args[0]
            m, n, dtype = kc.m, kc.n, kc.dtype
        elif len(shape_args) >= 2 and all(isinstance(a, int)
                                          for a in shape_args[:2]):
            m, n = shape_args[:2]
            if len(shape_args) >= 3:
                dtype = shape_args[2]
        elif len(shape_args) >= 1:
            A = shape_args[0]
            if hasattr(A, "shape") and A.shape is not None:
                m, n = A.shape[0], A.shape[-1]
            if len(shape_args) >= 2 and hasattr(shape_args[1], "dtype"):
                dtype = shape_args[1].dtype
        KrylovWorkspace.__init__(self, method, m, n, dtype, **config)

    base = (BlockKrylovWorkspace if method.startswith("block_")
            else KrylovWorkspace)
    cls = type(cname, (base,), {"__init__": __init__})
    return cname, cls


for _method in METHOD_TABLE:
    _name, _cls = _make_ws_class(_method)
    globals()[_name] = _cls


# -- accessors (reference src/workspace_accessors.jl) -----------------------

def solution(ws, index=None):
    """x (or (x, y) for two-output methods; index selects one)."""
    if ws.nsol == 2:
        if index is not None:
            return (ws.x, ws.y)[index - 1]
        return ws.x, ws.y
    if index not in (None, 1):
        raise ValueError(f"{ws.method} returns only one solution")
    return ws.x


def statistics(ws):
    return ws.stats


def results(ws):
    """(solution..., stats) — what the out-of-place API returns."""
    if ws.nsol == 2:
        return ws.x, ws.y, ws.stats
    return ws.x, ws.stats


def issolved(ws):
    st = ws.stats
    if hasattr(st, "solved_primal"):
        return st.solved_primal and st.solved_dual
    return bool(st.solved)


def issolved_primal(ws):
    return bool(ws.stats.solved_primal)


def issolved_dual(ws):
    return bool(ws.stats.solved_dual)


def iteration_count(ws):
    return ws.stats.niter


def Aprod_count(ws):
    return ws.nA * ws.stats.niter


def Atprod_count(ws):
    return ws.nAt * ws.stats.niter


def Bprod_count(ws):
    """gpmr only: one B product per iteration."""
    return ws.stats.niter


def elapsed_time(ws):
    return ws.stats.timer


def warm_start(ws, x0, y0=None):
    """Register an initial guess for the next solve (reference warm_start!)."""
    if not ws.warm_allowed:
        raise ValueError(f"{ws.method} does not support warm starts")
    ws._x0 = x0
    ws._y0 = y0
    return ws
