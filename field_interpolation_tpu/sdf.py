"""Top-level drivers: SDF-from-points and generic scattered interpolation.

Reference counterpart: `sdf_from_points(sizes, weights, n, positions, normals,
point_weights)` — the flagship entry point (SURVEY.md §2 C6, §3.1) — and the
generic value-only interpolation path the GUI demos use. Assembly + solve are
both jitted; batching is plain `vmap` over the sample arrays (SURVEY.md §7
PR3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .grid import Grid
from .operators import Problem, assemble
from .solver import SolveInfo, solve
from .weights import SolverConfig, Weights


@functools.partial(jax.jit, static_argnames=("grid", "weights"))
def assemble_sdf(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                     # [n, D] oriented point positions
    normals: jax.Array,                       # [n, D] unit surface normals
    point_weights: Optional[jax.Array] = None,
) -> Problem:
    """Per oriented point: value row f(p)=0 + gradient rows ∇f(p)=n̂ (SPEC.md)."""
    zeros = jnp.zeros(positions.shape[0], dtype=jnp.float32)
    return assemble(grid, weights, positions, zeros, gradients=normals,
                    point_weights=point_weights)


def sdf_from_points(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    normals: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Reconstruct a signed-distance field from an oriented point cloud.

    Returns (field [*grid.shape], SolveInfo). Warm start via ``x0`` supports
    the reference's interactive re-solve loop (SURVEY.md §3.2).
    """
    problem = assemble_sdf(grid, weights, positions, normals, point_weights)
    return solve(problem, config, x0=x0)


def assemble_precise(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    values: jax.Array,
    gradients: Optional[jax.Array] = None,
    point_weights: Optional[jax.Array] = None,
) -> Problem:
    """Assemble with float64 leaves for the mixed-precision refined solve
    (solver.solve_refined). Run once, off the hot path."""
    with jax.enable_x64():
        n = positions.shape[0]
        pw = (jnp.ones((n,), jnp.float64) if point_weights is None
              else point_weights.astype(jnp.float64))
        p64 = _assemble_f64(grid, weights, positions.astype(jnp.float64),
                            values.astype(jnp.float64),
                            None if gradients is None else gradients.astype(jnp.float64),
                            pw)
    return p64


@functools.partial(jax.jit, static_argnames=("grid", "weights"))
def _assemble_f64(grid, weights, positions, values, gradients, point_weights):
    return assemble(grid, weights, positions, values, gradients=gradients,
                    point_weights=point_weights)


def sdf_from_points_precise(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    normals: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """SDF reconstruction to a TRUE ≤tol relative residual vs the float64
    normal equations (the honest `BASELINE.json:5` bar): f64 assembly + fp32
    PCG inner solves + f64 iterative refinement."""
    from .solver import solve_refined
    zeros = jnp.zeros(positions.shape[0], dtype=jnp.float32)
    p64 = assemble_precise(grid, weights, positions, zeros, gradients=normals,
                           point_weights=point_weights)
    return solve_refined(p64, config, x0=x0)


@functools.partial(jax.jit, static_argnames=("grid", "weights"))
def assemble_interpolation(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                     # [n, D]
    values: jax.Array,                        # [n]
    point_weights: Optional[jax.Array] = None,
) -> Problem:
    """Value-only scattered interpolation (the generic reference use case)."""
    return assemble(grid, weights, positions, values.astype(jnp.float32),
                    point_weights=point_weights)


def interpolate(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    values: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Interpolate scattered values onto the lattice. Returns (field, info)."""
    problem = assemble_interpolation(grid, weights, positions, values, point_weights)
    return solve(problem, config, x0=x0)
