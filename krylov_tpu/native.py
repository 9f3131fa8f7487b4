"""ctypes binding to the native libkrylov C ABI (native/).

The reference ships a juliac-compiled shared library with 22 C entry
points (interfaces/src/LibKrylov.jl); here the native core is C++
(native/src/libkrylov.cpp) and this module is the Python-side bridge —
useful for embedding the solvers in non-JAX host code and as the test
harness for the C ABI.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_HERE, "native")
_SO = os.path.join(_NATIVE, "build", "libkrylov.so")

# Enum values mirror the reference ABI table one-for-one
# (reference interfaces/scripts/solver_table.jl:7-43).
SOLVERS = {
    "cg": 0, "cr": 1, "symmlq": 2, "minres": 3, "minres_qlp": 4,
    "diom": 5, "dqgmres": 6, "fom": 7, "gmres": 8, "fgmres": 9,
    "bicgstab": 10, "cgs": 11, "bilq": 12, "qmr": 13, "usymlq": 14,
    "usymqr": 15, "tricg": 16, "trimr": 17, "trilqr": 18, "bilqr": 19,
    "lslq": 20, "lsqr": 21, "lsmr": 22, "usymlqr": 23, "cgls": 24,
    "crls": 25, "cgne": 26, "crmr": 27, "craig": 28, "craigmr": 29,
    "lnlq": 30, "gpmr": 31, "car": 32, "minares": 33,
}
BLOCK_SOLVERS = {"block_gmres": 0, "block_minres": 1}
DTYPES = {np.float32: 0, np.float64: 1, np.complex64: 2, np.complex128: 3}

MATVEC = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p,
                          ctypes.c_void_p)


class KrylovOptions(ctypes.Structure):
    _fields_ = [
        ("atol", ctypes.c_double), ("rtol", ctypes.c_double),
        ("itmax", ctypes.c_int64), ("verbose", ctypes.c_int64),
        ("lambda_", ctypes.c_double), ("tau", ctypes.c_double),
        ("nu", ctypes.c_double), ("timemax", ctypes.c_double),
        ("radius", ctypes.c_double), ("restart", ctypes.c_int64),
        ("reorthogonalization", ctypes.c_int64),
        ("linesearch", ctypes.c_int64),
    ]


class KrylovWorkspaceOptions(ctypes.Structure):
    _fields_ = [("memory", ctypes.c_int64), ("window", ctypes.c_int64)]


def build(force=False):
    """Build libkrylov.so with make (g++).

    make is always invoked — its own dependency tracking makes this a
    no-op when the library is fresh, and guarantees source edits are
    never silently untested (advisor round-1 finding).
    """
    del force  # make's dependency tracking decides what to rebuild
    subprocess.run(["make"], cwd=_NATIVE, check=True,
                   capture_output=True)
    return _SO


_lib = None


def load():
    global _lib
    if _lib is None:
        path = build()
        _lib = ctypes.CDLL(path)
        _lib.krylov_workspace_create.restype = ctypes.c_void_p
        _lib.krylov_workspace_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p]
        _lib.krylov_solve.restype = ctypes.c_int
        _lib.krylov_solve.argtypes = [ctypes.c_void_p] + [MATVEC] * 4 + [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(KrylovOptions)]
        _lib.krylov_get_x.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.krylov_get_y.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.krylov_niter.restype = ctypes.c_int64
        _lib.krylov_niter.argtypes = [ctypes.c_void_p]
        _lib.krylov_is_solved.argtypes = [ctypes.c_void_p]
        _lib.krylov_elapsed_time.restype = ctypes.c_double
        _lib.krylov_elapsed_time.argtypes = [ctypes.c_void_p]
        _lib.krylov_get_status.restype = ctypes.c_char_p
        _lib.krylov_get_status.argtypes = [ctypes.c_void_p]
        _lib.krylov_warm_start.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.krylov_warm_start2.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_void_p]
        _lib.krylov_workspace_free.argtypes = [ctypes.c_void_p]
    return _lib


def default_options(**kw):
    o = KrylovOptions()
    nan = float("nan")
    o.atol = kw.get("atol", nan)
    o.rtol = kw.get("rtol", nan)
    o.itmax = kw.get("itmax", 0)
    o.verbose = kw.get("verbose", 0)
    o.lambda_ = kw.get("lam", nan)
    o.tau = nan
    o.nu = nan
    o.timemax = nan
    o.radius = nan
    o.restart = kw.get("restart", 0)
    o.reorthogonalization = 0
    o.linesearch = 0
    return o


def native_solve(method, A, b, At=None, x0=None, c=None, y0=None, **opts):
    """Solve with the native library using dense-matrix callbacks.

    A and At may be numpy 2-D arrays (callbacks generated here) or
    ctypes MATVEC callables.  Returns (x, info dict).
    """
    lib = load()
    A = np.asarray(A)
    b = np.ascontiguousarray(b)
    dtype = b.dtype.type
    m, n = A.shape

    # ctypes has no complex scalar types: view complex buffers as 2x
    # real floats and reinterpret on the numpy side.
    is_cplx = np.issubdtype(np.dtype(dtype), np.complexfloating)
    scalar = {np.dtype(np.complex64): np.float32,
              np.dtype(np.complex128): np.float64}.get(np.dtype(dtype), dtype)
    mult = 2 if is_cplx else 1

    def make_cb(mat):
        mat = np.ascontiguousarray(mat)
        rows, cols = mat.shape

        def view(ptr, length):
            arr = np.ctypeslib.as_array(
                ctypes.cast(ptr, ctypes.POINTER(
                    np.ctypeslib.as_ctypes_type(scalar))),
                shape=(length * mult,))
            return arr.view(dtype) if is_cplx else arr

        def cb(ud, xp, yp):
            x = view(xp, cols)
            y = view(yp, rows)
            y[:] = mat @ x
        return MATVEC(cb)

    cbA = make_cb(A)
    adjoint_methods = (
        "lsqr", "lsmr", "cgls", "crls", "cgne", "crmr", "craig", "craigmr",
        "usymlq", "usymqr", "qmr", "bilq", "lslq", "lnlq", "bilqr", "trilqr",
        "usymlqr", "tricg", "trimr", "gpmr")
    cbAt = make_cb(A.conj().T) if (method in adjoint_methods
                                   or At is not None) else MATVEC(0)
    null = MATVEC(0)
    # output shapes per solver (C kernels): x length m for the
    # saddle-point family, n otherwise; y for the two-output solvers.
    xlen = m if method in ("usymlqr", "tricg", "trimr", "gpmr") else n
    ylen = {"craig": m, "craigmr": m, "lnlq": m, "bilqr": n, "trilqr": m,
            "usymlqr": n, "tricg": n, "trimr": n, "gpmr": n}.get(method)

    ws = lib.krylov_workspace_create(SOLVERS[method], DTYPES[dtype], m, n,
                                     None)
    try:
        if x0 is not None and y0 is not None:
            x0 = np.ascontiguousarray(x0, dtype=dtype)
            y0 = np.ascontiguousarray(y0, dtype=dtype)
            lib.krylov_warm_start2(ws, x0.ctypes.data_as(ctypes.c_void_p),
                                   y0.ctypes.data_as(ctypes.c_void_p))
        elif x0 is not None:
            x0 = np.ascontiguousarray(x0, dtype=dtype)
            lib.krylov_warm_start(ws, x0.ctypes.data_as(ctypes.c_void_p))
        o = default_options(**opts)
        cptr = None
        if c is not None:
            c = np.ascontiguousarray(c, dtype=dtype)
            cptr = c.ctypes.data_as(ctypes.c_void_p)
        rc = lib.krylov_solve(ws, cbA, cbAt, null, null,
                              b.ctypes.data_as(ctypes.c_void_p), cptr, None,
                              ctypes.byref(o))
        if rc != 0:
            raise RuntimeError(f"krylov_solve failed with code {rc}")
        x = np.zeros(xlen, dtype=dtype)
        lib.krylov_get_x(ws, x.ctypes.data_as(ctypes.c_void_p))
        info = {
            "niter": int(lib.krylov_niter(ws)),
            "solved": bool(lib.krylov_is_solved(ws)),
            "elapsed": float(lib.krylov_elapsed_time(ws)),
            "status": lib.krylov_get_status(ws).decode(),
        }
        if ylen is not None:
            y = np.zeros(ylen, dtype=dtype)
            if lib.krylov_get_y(ws, y.ctypes.data_as(ctypes.c_void_p)) == 0:
                info["y"] = y
        return x, info
    finally:
        lib.krylov_workspace_free(ws)
