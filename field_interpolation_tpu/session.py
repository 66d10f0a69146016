"""Reusable-setup interactive solver — the reference GUI's frame loop.

The reference application re-solves the SAME geometry every frame while the
user edits values (SURVEY.md §3.2 / C8: `solve_sparse_linear_with_guess`
against an unchanged matrix). On this framework a cold `sdf_from_points`
per frame re-pays assembly's geometry work (corner rows, densified data
stencil, operator diagonal — ~0.05 ms fp32 / ~0.22 ms precise at 256² on
v5e) and the multigrid setup (~0.2 ms: hierarchy + dense-coarsest factor),
even though only ``b`` changes. `Solver` splits those: everything derived
from (grid, weights, positions, point_weights, config) is computed ONCE at
construction; each `solve()` call only rebuilds the right-hand side from
the new targets and runs the PCG with the prepared setup as jit inputs
(solver.prepare / multigrid.MGPrep).

Staleness by construction: the reusable state is owned by the object and
keyed to inputs that cannot change under it — new positions/weights mean a
new `Solver`. Cross-checks for the functional `prepare`/`solve(prep=...)`
API live in solver._check_prep (trace-time shape/weights/config
signature).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import constraints as cons
from . import stencils
from .grid import Grid
from .operators import Problem
from .sdf import PreciseProblem
from .solver import SolveInfo, SolverConfig, prepare, solve, solve_refined
from .weights import Weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Geometry:
    """Everything assembly derives from positions/weights alone (no
    targets): the weighted data rows and the operator. ``rows64`` is only
    populated for precise sessions (f64 leaves require x64 at use time)."""

    corner_idx: jax.Array          # [n, C] int32
    rows32: jax.Array              # [n, R, C] fp32 weighted rows (B·w)
    row_w32: jax.Array             # [n, R] fp32 row weights
    coeff: jax.Array               # [3^D, *grid] fp32 data stencil
    diag: jax.Array                # [*grid] fp32 operator diagonal
    rows64: jax.Array | None       # [n, R, C] f64 weighted rows (precise)
    row_w64: jax.Array | None      # [n, R] f64 row weights (precise)
    grid: Grid = dataclasses.field(metadata=dict(static=True))
    weights: Weights = dataclasses.field(metadata=dict(static=True))
    with_gradient: bool = dataclasses.field(metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("grid", "weights",
                                             "with_gradient", "precise"))
def _build_geometry(grid: Grid, weights: Weights, positions, point_weights,
                    with_gradient: bool, precise: bool) -> _Geometry:
    """One-time geometry assembly: the target-independent part of
    operators.assemble (+ the f64 rows of sdf.assemble_precise when
    ``precise``). The data stencil/diag are densified with ZERO targets —
    the b plane rides along in the fused scatter for free and is
    discarded."""
    n = positions.shape[0]
    corner_idx, row_coeffs, in_bounds = cons.multilinear_corner_data(
        grid, positions)
    row_w = cons.sample_row_weights(weights, in_bounds, point_weights,
                                    grid.ndim, with_gradient)
    if not with_gradient:
        row_coeffs = row_coeffs[:, :1, :]
        row_w = row_w[:, :1]
    rows32 = row_coeffs * row_w[:, :, None]
    zeros_t = jnp.zeros(row_w.shape, row_coeffs.dtype)
    coeff, _ = cons.densify_data_term(grid, corner_idx, row_coeffs, row_w,
                                      zeros_t)
    diag = (stencils.smoothness_diag(grid.shape, weights, dtype=coeff.dtype)
            + cons.data_diag(coeff, grid.ndim))
    rows64 = row_w64 = None
    if precise:
        # fp32-input fast path of assemble_precise: exact fp32 prefix +
        # minimal f64 tail (constraints.multilinear_rows_f64).
        cidx64, rc64, ib64 = cons.multilinear_rows_f64(grid, positions)
        rw64 = cons.sample_row_weights(weights, ib64,
                                       point_weights.astype(jnp.float64),
                                       grid.ndim, with_gradient)
        if not with_gradient:
            rc64 = rc64[:, :1, :]
            rw64 = rw64[:, :1]
        rows64 = rc64 * rw64[:, :, None]
        row_w64 = rw64
    return _Geometry(corner_idx=corner_idx, rows32=rows32, row_w32=row_w,
                     coeff=coeff, diag=diag, rows64=rows64, row_w64=row_w64,
                     grid=grid, weights=weights, with_gradient=with_gradient)


def _assemble_b32(geo: _Geometry, row_t) -> jax.Array:
    """b = Bᵀ W t from new targets only: one small einsum + the gated
    matmul scatter — the ONLY assembly work a re-solve pays."""
    tw = row_t.astype(jnp.float32) * geo.row_w32
    bvec = jnp.einsum("nrc,nr->nc", geo.rows32, tw,
                      precision=jax.lax.Precision.HIGHEST)
    if cons.use_matmul_scatter(geo.grid, geo.corner_idx.shape[0]):
        return cons.scatter_corners_matmul(geo.grid, geo.corner_idx, bvec)
    return (jnp.zeros((geo.grid.num_nodes,), jnp.float32)
            .at[geo.corner_idx].add(bvec).reshape(geo.grid.shape))


def _row_targets(geo: _Geometry, values, gradients):
    if geo.with_gradient:
        if gradients is None:
            raise ValueError("this Solver was built with gradient rows — "
                             "pass gradients (e.g. normals)")
        return jnp.concatenate([values[:, None], gradients], axis=1)
    return values[:, None]


@functools.partial(jax.jit, static_argnames=("config",))
def _resolve32(geo: _Geometry, values, gradients, x0, prep,
               config: SolverConfig):
    row_t = _row_targets(geo, values, gradients)
    problem = Problem(coeff=geo.coeff, b=_assemble_b32(geo, row_t),
                      diag=geo.diag, grid=geo.grid, weights=geo.weights)
    return solve(problem, config, x0=x0, prep=prep)


@functools.partial(jax.jit, static_argnames=("config",))
def _resolve_precise(geo: _Geometry, values, gradients, x0, prep,
                     config: SolverConfig):
    row_t = _row_targets(geo, values, gradients)
    p32 = Problem(coeff=geo.coeff, b=_assemble_b32(geo, row_t),
                  diag=geo.diag, grid=geo.grid, weights=geo.weights)
    tw64 = row_t.astype(jnp.float64) * geo.row_w64
    bvec = jnp.einsum("nrc,nr->nc", geo.rows64, tw64,
                      precision=jax.lax.Precision.HIGHEST)
    if cons.use_matmul_scatter(geo.grid, geo.corner_idx.shape[0]):
        b64 = cons.scatter_corners_exact(geo.grid, geo.corner_idx, bvec)
    else:
        b64 = (jnp.zeros((geo.grid.num_nodes,), jnp.float64)
               .at[geo.corner_idx].add(bvec).reshape(geo.grid.shape))
    pp = PreciseProblem(p32=p32, b64=b64, corner_idx=geo.corner_idx,
                        rows64=geo.rows64, tw64=tw64, grid=geo.grid,
                        weights=geo.weights)
    from .solver import _solve_refined_impl
    return _solve_refined_impl(pp, config, x0, prep)


class Solver:
    """Per-session solver with reusable setup (see module docstring).

    >>> s = Solver(grid, weights, positions, config=cfg)      # once
    >>> x, info = s.solve(values, gradients=normals)          # per frame
    >>> x, info = s.solve(values2, gradients=normals, x0=x)   # warm start

    ``precise=True`` solves to a TRUE ≤tol relative residual per frame
    (sdf_from_points_precise semantics). ``gradients=False`` builds a
    value-only session (`interpolate` semantics).

    Construction pays the full assembly + multigrid setup once; each
    ``solve`` pays only the RHS rebuild (einsum + gated matmul scatter)
    and the PCG iterations. Positions, weights, point weights, and the
    setup-relevant config are FIXED for the object's lifetime — build a
    new Solver to change them (multigrid.setup_signature lists which
    config fields those are; tol/maxiter may vary per call via
    ``solve(..., config=...)``)."""

    def __init__(self, grid: Grid, weights: Weights, positions,
                 point_weights=None, *, gradients: bool = True,
                 config: SolverConfig = SolverConfig(),
                 precise: bool = False):
        n = positions.shape[0]
        if positions.ndim != 2 or positions.shape[-1] != grid.ndim:
            raise ValueError(
                f"positions must be [n, {grid.ndim}] for grid {grid.shape}, "
                f"got {positions.shape}")
        if point_weights is None:
            point_weights = jnp.ones((n,), jnp.float32)
        self.grid, self.weights, self.config = grid, weights, config
        self.precise = precise
        self.n = n
        if precise:
            with jax.enable_x64():
                self._geo = _build_geometry(grid, weights, positions,
                                            point_weights, gradients, True)
        else:
            self._geo = _build_geometry(grid, weights, positions,
                                        point_weights, gradients, False)
        p_setup = Problem(coeff=self._geo.coeff,
                          b=jnp.zeros(grid.shape, jnp.float32),
                          diag=self._geo.diag, grid=grid, weights=weights)
        self._prep = prepare(p_setup, config)

    def solve(self, values, gradients=None, x0: Optional[jax.Array] = None,
              config: Optional[SolverConfig] = None
              ) -> tuple[jax.Array, SolveInfo]:
        """Solve for new targets on the fixed geometry. ``values`` [n];
        ``gradients`` [n, D] when the session has gradient rows (SDF
        normals). ``x0`` warm-starts from a previous frame's solution.
        ``config`` may override per-call as long as the setup signature
        matches construction (checked at trace time)."""
        cfg = self.config if config is None else config
        if self.precise:
            with jax.enable_x64():
                return _resolve_precise(self._geo, values, gradients, x0,
                                        self._prep, cfg)
        return _resolve32(self._geo, values, gradients, x0, self._prep, cfg)
