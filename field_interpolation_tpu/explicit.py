"""Explicit row-by-row assembly — the reference-parity CPU surface & oracle.

This module mirrors the reference's L1/L2 API one-to-one (SURVEY.md §1):
`LinearEquation`/`Triplet` + `add_equation` (C1), `add_value_constraint` (C4),
`add_gradient_constraint` (C5), `add_field_constraints` (C3),
`solve_sparse_linear` / `solve_sparse_linear_with_guess` /
`solve_sparse_linear_approximate_lattice` (C7–C9) — implemented in
NumPy/SciPy per SPEC.md. It is NOT the TPU path: it exists (a) as the
float64 oracle standing in for the reference's Eigen solution
(`BASELINE.json:5` "1e-6 relative residual vs the Eigen solution"), and
(b) so reference users find the exact API shape they know. The production
path is operators.py/solver.py.

A C++ implementation of the same surface lives in native/ (see
field_interpolation_tpu/native.py) for reference-speed host assembly.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
from typing import Optional, Sequence

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from .grid import Grid
from .stencils import STENCIL_TAPS
from .weights import Weights


@dataclasses.dataclass
class Triplet:
    row: int
    col: int
    value: float


@dataclasses.dataclass
class LinearEquation:
    """Sparse least-squares rows ``min ||Ax - b||²`` under construction."""

    triplets: list = dataclasses.field(default_factory=list)
    rhs: list = dataclasses.field(default_factory=list)

    @property
    def num_rows(self) -> int:
        return len(self.rhs)

    def add_equation(self, weight: float, rhs: float,
                     indices: Sequence[int], coeffs: Sequence[float]) -> None:
        """Append one weighted row; zero/invalid coefficients are skipped
        (reference C1 behavior, SURVEY.md §2)."""
        if weight == 0.0:
            return
        row = self.num_rows
        for idx, c in zip(indices, coeffs):
            if c != 0.0:
                self.triplets.append(Triplet(row, int(idx), weight * float(c)))
        self.rhs.append(weight * float(rhs))

    def to_scipy(self, num_columns: int):
        rows = [t.row for t in self.triplets]
        cols = [t.col for t in self.triplets]
        vals = [t.value for t in self.triplets]
        A = scipy.sparse.csr_matrix(
            (vals, (rows, cols)), shape=(self.num_rows, num_columns), dtype=np.float64
        )
        return A, np.asarray(self.rhs, dtype=np.float64)


def _corner_data(grid: Grid, pos: np.ndarray):
    """Cell, frac, and corner flat indices for one sample (SPEC.md)."""
    shape = np.asarray(grid.shape)
    cell = np.clip(np.floor(pos).astype(int), 0, shape - 2)
    frac = pos - cell
    D = grid.ndim
    strides = np.asarray(grid.strides)
    corners, wvals = [], []
    for c in range(1 << D):
        bits = [(c >> d) & 1 for d in range(D)]
        corners.append(int(np.dot(cell + bits, strides)))
        w = 1.0
        for d in range(D):
            w *= frac[d] if bits[d] else 1.0 - frac[d]
        wvals.append(w)
    return cell, frac, corners, np.asarray(wvals)


def _in_bounds(grid: Grid, pos: np.ndarray) -> bool:
    shape = np.asarray(grid.shape)
    return bool(np.all((pos >= 0.0) & (pos <= shape - 1.0)))


def add_value_constraint(eq: LinearEquation, grid: Grid, pos, value: float,
                         weight: float) -> None:
    """One row: multilinear interpolation at ``pos`` equals ``value``
    (reference C4; SURVEY.md §3.3)."""
    pos = np.asarray(pos, dtype=np.float64)
    if not _in_bounds(grid, pos) or weight == 0.0:
        return
    _, _, corners, w = _corner_data(grid, pos)
    eq.add_equation(weight, value, corners, w)


def add_gradient_constraint(eq: LinearEquation, grid: Grid, pos, gradient,
                            weight: float) -> None:
    """D rows: exact multilinear-interpolant partials equal ``gradient``
    (reference C5; SPEC.md)."""
    pos = np.asarray(pos, dtype=np.float64)
    gradient = np.asarray(gradient, dtype=np.float64)
    if not _in_bounds(grid, pos) or weight == 0.0:
        return
    _, frac, corners, _ = _corner_data(grid, pos)
    D = grid.ndim
    for a in range(D):
        coeffs = []
        for c in range(1 << D):
            bits = [(c >> d) & 1 for d in range(D)]
            w = 1.0
            for d in range(D):
                if d != a:
                    w *= frac[d] if bits[d] else 1.0 - frac[d]
            coeffs.append(w if bits[a] else -w)
        eq.add_equation(weight, gradient[a], corners, coeffs)


def add_field_constraints(eq: LinearEquation, grid: Grid, weights: Weights) -> None:
    """Smoothness rows: order 0 once per node; orders 1-3 per axis for every
    fully-inside stencil window (dropped-row boundaries — reference C3,
    SPEC.md)."""
    shape = grid.shape
    strides = grid.strides
    D = grid.ndim
    if weights.model_0 != 0.0:
        for i in range(grid.num_nodes):
            eq.add_equation(weights.model_0, 0.0, [i], [1.0])
    for order in (1, 2, 3):
        w = weights.model_weight(order)
        if w == 0.0:
            continue
        taps = STENCIL_TAPS[order]
        L = len(taps)
        for ax in range(D):
            n = shape[ax]
            if n < L:
                continue
            other = [range(shape[d]) if d != ax else [0] for d in range(D)]
            for coord in itertools.product(*other):
                base = sum(c * s for c, s in zip(coord, strides))
                for start in range(n - L + 1):
                    idxs = [base + (start + k) * strides[ax] for k in range(L)]
                    eq.add_equation(w, 0.0, idxs, taps)


def assemble_explicit(
    grid: Grid,
    weights: Weights,
    positions: np.ndarray,
    values: np.ndarray,
    gradients: Optional[np.ndarray] = None,
    point_weights: Optional[np.ndarray] = None,
) -> LinearEquation:
    """Full explicit system for the same inputs as operators.assemble."""
    eq = LinearEquation()
    add_field_constraints(eq, grid, weights)
    n = len(positions)
    pw = np.ones(n) if point_weights is None else np.asarray(point_weights)
    for i in range(n):
        add_value_constraint(eq, grid, positions[i], float(values[i]),
                             weights.data_pos * float(pw[i]))
        if gradients is not None:
            add_gradient_constraint(eq, grid, positions[i], gradients[i],
                                    weights.data_gradient * float(pw[i]))
    return eq


def normal_equations(eq: LinearEquation, num_columns: int):
    """AᵀA (sparse, float64) and Aᵀb — what the reference hands to Eigen
    (SURVEY.md §3.1)."""
    A, b = eq.to_scipy(num_columns)
    return (A.T @ A).tocsr(), A.T @ b


def solve_sparse_linear(num_columns: int, eq: LinearEquation) -> np.ndarray:
    """Direct float64 normal-equations solve (the Eigen-oracle stand-in,
    reference C7)."""
    AtA, Atb = normal_equations(eq, num_columns)
    return scipy.sparse.linalg.spsolve(AtA.tocsc(), Atb)


def solve_sparse_linear_with_guess(num_columns: int, eq: LinearEquation,
                                   guess: np.ndarray, tol: float = 1e-10,
                                   maxiter: int = 10000) -> np.ndarray:
    """Warm-started iterative solve (reference C8)."""
    AtA, Atb = normal_equations(eq, num_columns)
    x, _ = scipy.sparse.linalg.cg(AtA, Atb, x0=np.asarray(guess, dtype=np.float64),
                                  rtol=tol, maxiter=maxiter)
    return x


def solve_sparse_linear_approximate_lattice(
    grid: Grid, weights: Weights, positions, values,
    gradients=None, point_weights=None, downscale: int = 2,
) -> np.ndarray:
    """Solve on a downsampled lattice then multilinearly upsample (reference
    C9 — the 2-level multiresolution accelerator that seeds the multigrid
    preconditioner, SURVEY.md §3.5)."""
    coarse = Grid(tuple(max(2, (n - 1) // downscale + 1) for n in grid.shape))
    scale = np.asarray([(cn - 1) / (fn - 1) for cn, fn in zip(coarse.shape, grid.shape)])
    # Gradient targets are per-unit-length: coarse coord = fine coord × scale,
    # so df/d(coarse) = df/d(fine) / scale per axis.
    grad_c = None if gradients is None else np.asarray(gradients) / scale
    eq = assemble_explicit(coarse, weights, np.asarray(positions) * scale,
                           values, grad_c, point_weights)
    xc = solve_sparse_linear(coarse.num_nodes, eq).reshape(coarse.shape)
    return _multilinear_resize(xc, grid.shape).ravel()


def _multilinear_resize(x: np.ndarray, out_shape: tuple[int, ...]) -> np.ndarray:
    """Separable linear resample with endpoints aligned (host helper)."""
    out = x.astype(np.float64)
    for ax, n_out in enumerate(out_shape):
        n_in = out.shape[ax]
        if n_in == n_out:
            continue
        src = np.linspace(0.0, n_in - 1.0, n_out)
        lo = np.clip(np.floor(src).astype(int), 0, n_in - 2)
        t = src - lo
        a = np.take(out, lo, axis=ax)
        b = np.take(out, lo + 1, axis=ax)
        shape = [1] * out.ndim
        shape[ax] = n_out
        t = t.reshape(shape)
        out = a * (1 - t) + b * t
    return out
