"""ctypes bindings to the C++ native host engine (native/).

The reference's row-builder + solver are C++ (SURVEY.md §2); this module is
the rebuild's native host tier — the same constraint spec (SPEC.md) assembled
and solved at C++ speed without Python/NumPy overhead. Used for fast oracle
checks, CPU-only deployment, and as the reference-parity benchmark baseline.

The library is built on demand with `make -C native` (g++ only, no deps). If
no compiler is available, `is_available()` returns False and callers fall
back to the NumPy/SciPy path in explicit.py.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

from .grid import Grid
from .weights import Weights

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfield_interpolation_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_i64 = ctypes.c_int64
_f64 = ctypes.c_double
_pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    lib.fi_equation_new.restype = ctypes.c_void_p
    lib.fi_equation_free.argtypes = [ctypes.c_void_p]
    lib.fi_equation_rows.argtypes = [ctypes.c_void_p]
    lib.fi_equation_rows.restype = _i64
    lib.fi_equation_nnz.argtypes = [ctypes.c_void_p]
    lib.fi_equation_nnz.restype = _i64
    lib.fi_add_equation.argtypes = [ctypes.c_void_p, _f64, _f64,
                                    ctypes.c_int, _pi64, _pf64]
    lib.fi_add_field_constraints.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                             _pi64, _pf64]
    lib.fi_add_value_constraints.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                             _pi64, _i64, _pf64, _pf64, _pf64]
    lib.fi_add_gradient_constraints.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                                _pi64, _i64, _pf64, _pf64, _pf64]
    lib.fi_equation_export.argtypes = [ctypes.c_void_p, _pi64, _pi64, _pf64, _pf64]
    lib.fi_solve_normal_cg.argtypes = [ctypes.c_void_p, _i64, _f64, _i64,
                                       _pf64, ctypes.c_void_p]
    lib.fi_solve_normal_cg.restype = _i64
    lib.fi_sdf_from_points.argtypes = [ctypes.c_int, _pi64, _pf64, _f64, _f64,
                                       _i64, _pf64, _pf64, ctypes.c_void_p,
                                       _f64, _i64, _pf64]
    lib.fi_sdf_from_points.restype = _i64
    lib.fi_solve_approximate_lattice.argtypes = [
        ctypes.c_int, _pi64, _pf64, _f64, _f64, _i64, _pf64, _pf64,
        ctypes.c_void_p, ctypes.c_void_p, _i64, _f64, _i64, _pf64]
    lib.fi_solve_approximate_lattice.restype = _i64
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


class NativeEquation:
    """C++ `LinearEquation` handle (reference C1 surface at native speed)."""

    def __init__(self, grid: Grid):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable (no compiler?)")
        self._lib = lib
        self._eq = lib.fi_equation_new()
        self.grid = grid
        self._sizes = np.asarray(grid.shape, dtype=np.int64)

    def __del__(self):
        if getattr(self, "_eq", None):
            self._lib.fi_equation_free(self._eq)
            self._eq = None

    @property
    def num_rows(self) -> int:
        return int(self._lib.fi_equation_rows(self._eq))

    @property
    def nnz(self) -> int:
        return int(self._lib.fi_equation_nnz(self._eq))

    def add_equation(self, weight, rhs, indices, coeffs):
        idxs = np.ascontiguousarray(indices, dtype=np.int64)
        cfs = np.ascontiguousarray(coeffs, dtype=np.float64)
        self._lib.fi_add_equation(self._eq, float(weight), float(rhs),
                                  len(idxs), idxs, cfs)

    def add_field_constraints(self, weights: Weights):
        mw = np.asarray([weights.model_0, weights.model_1, weights.model_2,
                         weights.model_3], dtype=np.float64)
        self._lib.fi_add_field_constraints(self._eq, self.grid.ndim,
                                           self._sizes, mw)

    def add_value_constraints(self, positions, values, weights):
        pos = np.ascontiguousarray(positions, dtype=np.float64)
        val = np.ascontiguousarray(values, dtype=np.float64)
        w = np.ascontiguousarray(weights, dtype=np.float64)
        self._lib.fi_add_value_constraints(self._eq, self.grid.ndim,
                                           self._sizes, len(val), pos, val, w)

    def add_gradient_constraints(self, positions, gradients, weights):
        pos = np.ascontiguousarray(positions, dtype=np.float64)
        grd = np.ascontiguousarray(gradients, dtype=np.float64)
        w = np.ascontiguousarray(weights, dtype=np.float64)
        self._lib.fi_add_gradient_constraints(self._eq, self.grid.ndim,
                                              self._sizes, len(w), pos, grd, w)

    def export_rows(self):
        """(rows, cols, values, rhs) — for cross-implementation checks."""
        nnz, nrows = self.nnz, self.num_rows
        rows = np.empty(nnz, np.int64)
        cols = np.empty(nnz, np.int64)
        vals = np.empty(nnz, np.float64)
        rhs = np.empty(nrows, np.float64)
        self._lib.fi_equation_export(self._eq, rows, cols, vals, rhs)
        return rows, cols, vals, rhs

    def solve(self, tol: float = 1e-10, maxiter: int = 100000,
              x0: Optional[np.ndarray] = None) -> tuple[np.ndarray, int]:
        """Normal-equations Jacobi-PCG in double. Returns (x, iterations)."""
        n = self.grid.num_nodes
        x = np.empty(n, np.float64)
        if x0 is not None:
            x0 = np.ascontiguousarray(x0, dtype=np.float64)
            p0 = x0.ctypes.data_as(ctypes.c_void_p)
        else:
            p0 = None
        it = int(self._lib.fi_solve_normal_cg(self._eq, n, tol, maxiter, x, p0))
        if it < 0:
            raise RuntimeError("native CG did not converge")
        return x.reshape(self.grid.shape), it


def sdf_from_points_native(
    grid: Grid,
    weights: Weights,
    positions: np.ndarray,
    normals: np.ndarray,
    point_weights: Optional[np.ndarray] = None,
    tol: float = 1e-10,
    maxiter: int = 100000,
) -> tuple[np.ndarray, int]:
    """One-call native SDF reconstruction (reference C6 at C++ speed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sizes = np.asarray(grid.shape, dtype=np.int64)
    mw = np.asarray([weights.model_0, weights.model_1, weights.model_2,
                     weights.model_3], dtype=np.float64)
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    nrm = np.ascontiguousarray(normals, dtype=np.float64)
    if point_weights is not None:
        pw = np.ascontiguousarray(point_weights, dtype=np.float64)
        pwp = pw.ctypes.data_as(ctypes.c_void_p)
    else:
        pwp = None
    x = np.empty(grid.num_nodes, np.float64)
    it = int(lib.fi_sdf_from_points(grid.ndim, sizes, mw, weights.data_pos,
                                    weights.data_gradient, len(pos), pos, nrm,
                                    pwp, tol, maxiter, x))
    if it < 0:
        raise RuntimeError("native CG did not converge")
    return x.reshape(grid.shape), it


def solve_approximate_lattice_native(
    grid: Grid,
    weights: Weights,
    positions: np.ndarray,
    values: np.ndarray,
    gradients: Optional[np.ndarray] = None,
    point_weights: Optional[np.ndarray] = None,
    downscale: int = 2,
    tol: float = 1e-10,
    maxiter: int = 100000,
) -> tuple[np.ndarray, int]:
    """Native approximate coarse-lattice solve (reference C9 —
    `solve_sparse_linear_approximate_lattice`): assemble + solve the same
    constraint set on the downscaled lattice, multilinearly upsample.
    Conventions match the Python oracle (explicit.py) exactly; the result
    is usable directly or as an `x0` warm start for the full solve.
    Returns (field [*grid.shape] in COARSE-lattice value units, coarse CG
    iterations)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sizes = np.asarray(grid.shape, dtype=np.int64)
    mw = np.asarray([weights.model_0, weights.model_1, weights.model_2,
                     weights.model_3], dtype=np.float64)
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    vals = np.ascontiguousarray(values, dtype=np.float64)
    if gradients is not None:
        grad = np.ascontiguousarray(gradients, dtype=np.float64)
        gp = grad.ctypes.data_as(ctypes.c_void_p)
    else:
        gp = None
    if point_weights is not None:
        pw = np.ascontiguousarray(point_weights, dtype=np.float64)
        pwp = pw.ctypes.data_as(ctypes.c_void_p)
    else:
        pwp = None
    x = np.empty(grid.num_nodes, np.float64)
    it = int(lib.fi_solve_approximate_lattice(
        grid.ndim, sizes, mw, weights.data_pos, weights.data_gradient,
        len(pos), pos, vals, gp, pwp, downscale, tol, maxiter, x))
    if it < 0:
        raise RuntimeError("native coarse CG did not converge")
    return x.reshape(grid.shape), it
