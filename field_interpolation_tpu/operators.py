"""The matrix-free normal operator and problem assembly.

This is the TPU replacement for the reference's triplet pipeline
(`LinearEquation` → `Eigen::SparseMatrix` → `AᵀA` → factorization,
SURVEY.md §3.1): `A x = S x + (DᵀWD) x` where

* ``S`` — smoothness normal operator, exact composite convolutions
  (stencils.py),
* ``DᵀWD`` — scattered-data normal operator, densified at assembly into a
  spatially-varying 3^D stencil (constraints.py),

and ``b = Aᵀ rhs`` is a grid. Nothing resembling the sparse matrix is ever
materialized (`BASELINE.json:5`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import constraints as cons
from . import stencils
from .grid import Grid
from .weights import Weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    """Assembled normal-equations problem ``A x = b`` (a pytree; ``grid`` and
    ``weights`` are static metadata so jit re-specializes per geometry)."""

    coeff: jax.Array          # [3^D, *grid] densified data-term stencil
    b: jax.Array              # [*grid] Aᵀb
    diag: jax.Array           # [*grid] diag(A), for Jacobi/multigrid
    grid: Grid = dataclasses.field(metadata=dict(static=True))
    weights: Weights = dataclasses.field(metadata=dict(static=True))

    def apply(self, x: jax.Array) -> jax.Array:
        """A x. ``x``: [..., *grid] (leading axes = batch)."""
        s = stencils.smoothness_apply(x, self.weights, self.grid.ndim)
        d = cons.data_apply(x, self.coeff, self.grid.ndim)
        return s + d


def assemble(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                      # [n, D]
    values: jax.Array,                         # [n] value-row targets
    gradients: Optional[jax.Array] = None,     # [n, D] gradient-row targets
    point_weights: Optional[jax.Array] = None,  # [n]
) -> Problem:
    """Vectorized assembly of the full normal-equations problem.

    Replaces the reference's per-sample ``add_value_constraint`` /
    ``add_gradient_constraint`` loops + ``add_field_constraints``
    (SURVEY.md §3.1 hot loops #1/#2) with one batched computation.
    Zero-weight samples act as padding, so callers can use fixed-size arrays.
    """
    # Argument validation (the reference's loguru CHECK_F layer, SURVEY.md
    # §2 C12): fail at trace time with a precise message rather than a
    # broadcasting error deep inside the scatter.
    if positions.ndim != 2 or positions.shape[-1] != grid.ndim:
        raise ValueError(
            f"positions must be [n, {grid.ndim}] for grid {grid.shape}, "
            f"got {positions.shape}")
    n = positions.shape[0]
    if values.shape != (n,):
        raise ValueError(f"values must be [{n}], got {values.shape}")
    if gradients is not None and gradients.shape != (n, grid.ndim):
        raise ValueError(
            f"gradients must be [{n}, {grid.ndim}], got {gradients.shape}")
    if point_weights is not None and point_weights.shape != (n,):
        raise ValueError(
            f"point_weights must be [{n}], got {point_weights.shape}")
    if point_weights is None:
        point_weights = jnp.ones((n,), dtype=positions.dtype)
    with_gradient = gradients is not None

    corner_idx, row_coeffs, in_bounds = cons.multilinear_corner_data(grid, positions)
    row_w = cons.sample_row_weights(weights, in_bounds, point_weights,
                                    grid.ndim, with_gradient)
    if with_gradient:
        row_t = jnp.concatenate([values[:, None], gradients], axis=1)
    else:
        row_coeffs = row_coeffs[:, :1, :]
        row_w = row_w[:, :1]
        row_t = values[:, None]

    coeff, b = cons.densify_data_term(grid, corner_idx, row_coeffs,
                                      row_w, row_t.astype(row_coeffs.dtype))
    diag = (stencils.smoothness_diag(grid.shape, weights, dtype=coeff.dtype)
            + cons.data_diag(coeff, grid.ndim))
    return Problem(coeff=coeff, b=b, diag=diag, grid=grid, weights=weights)


def validate_problem(problem: Problem) -> list[str]:
    """Debug-mode sanity checks (SURVEY.md §5 'race detection / sanitizers'
    row: the XLA analog of the reference's CHECK_F runtime assertions).
    Returns a list of human-readable issues (empty = healthy). Host-side —
    call outside jit, e.g. in tests or when a solve misbehaves."""
    import numpy as np

    issues = []
    coeff = np.asarray(problem.coeff)
    b = np.asarray(problem.b)
    diag = np.asarray(problem.diag)
    if not np.all(np.isfinite(coeff)):
        issues.append("non-finite entries in the data coefficient tensor")
    if not np.all(np.isfinite(b)):
        issues.append("non-finite entries in b")
    if np.any(diag < 0):
        issues.append("negative operator diagonal (operator not SPD)")
    if np.all(diag == 0):
        issues.append("all-zero diagonal: no constraints at all?")
    center = (3 ** problem.grid.ndim) // 2
    if np.any(coeff[center] < -1e-6 * max(1.0, np.abs(coeff).max())):
        issues.append("negative data-term diagonal entries (bad row weights?)")
    if problem.weights.active_orders() == () and not np.any(coeff):
        issues.append("no smoothness weights and no data: singular system")
    return issues
