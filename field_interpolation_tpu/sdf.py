"""Top-level drivers: SDF-from-points and generic scattered interpolation.

Reference counterpart: `sdf_from_points(sizes, weights, n, positions, normals,
point_weights)` — the flagship entry point (SURVEY.md §2 C6, §3.1) — and the
generic value-only interpolation path the GUI demos use. Assembly + solve are
both jitted; batching is plain `vmap` over the sample arrays (SURVEY.md §7
PR3).
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


def _fmg_guess(grid: Grid, weights: Weights, positions, normals,
               point_weights, config: SolverConfig,
               depth: int = 1) -> Optional[jax.Array]:
    """Nested-iteration (FMG) initial guess: assemble + solve the SAME cloud
    on the (n+1)//2-coarsened grid, prolong, rescale to fine lattice units.

    Lab-measured iteration counts (NOTES_ROUND4 round-5 queue): at 256² the
    guess cuts fine iterations 14 → 7 (coarse tol 1e-3) but coarse
    iterations are latency-bound there and the extra coarse assembly eats
    the win — use only at bandwidth-bound scales (1024²+: 9 → 5 fine at
    ~0.25× per-coarse-iteration cost). Opt-in via ``fmg_start=True``.

    ``depth > 1`` recurses (classic full-FMG nested iteration): the coarse
    solve itself starts from a 2×-coarser guess, which cuts the COARSE
    iteration bill while leaving the fine count unchanged (the guess
    converges to the same coarse tolerance either way). Worthwhile only
    while the child level is still bandwidth-bound — each extra level adds
    its own assembly + latency-bound solve floor.
    """
    cshape = tuple(max(2, (n + 1) // 2) for n in grid.shape)
    if cshape == grid.shape:
        return None
    import numpy as np
    cgrid = Grid(cshape)
    scale = ((np.asarray(cshape, np.float64) - 1.0)
             / (np.asarray(grid.shape, np.float64) - 1.0))
    cpos = positions * jnp.asarray(scale, positions.dtype)
    cprob = assemble_sdf(cgrid, weights, cpos, normals, point_weights)
    ccfg = dataclasses.replace(config, tol=max(1e-3, config.tol),
                               debug=False)
    cx0 = None
    if depth > 1:
        cx0 = _fmg_guess(cgrid, weights, cpos, normals, point_weights,
                         config, depth - 1)
    xc, _ = solve(cprob, ccfg, x0=cx0)
    from .multigrid import prolong
    # SDF values are in lattice units: rescale by the spacing ratio.
    return prolong(xc, grid.shape) * jnp.asarray(1.0 / scale.min(), xc.dtype)


def sdf_from_points(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    normals: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    fmg_start: bool | int = False,
) -> tuple[jax.Array, SolveInfo]:
    """Reconstruct a signed-distance field from an oriented point cloud.

    Returns (field [*grid.shape], SolveInfo). Warm start via ``x0`` supports
    the reference's interactive re-solve loop (SURVEY.md §3.2).
    ``fmg_start=True`` (ignored when ``x0`` is given) computes a nested-
    iteration initial guess from a half-resolution solve — worthwhile at
    bandwidth-bound grid sizes; an int value recurses that many levels
    (classic full-FMG nested iteration), see _fmg_guess. Coarse-solve iterations are
    NOT counted in the returned SolveInfo.
    ``config.debug=True`` runs the pipeline under checkify (NaN/bounds
    checks surface as exceptions — see debugging.py).
    """
    # FMG guess BEFORE the debug dispatch so config.debug=True debugs the
    # same pipeline production runs (the fine solve starting from the
    # prolonged coarse solution), not a different zero-start problem.
    if fmg_start and x0 is None:
        x0 = _fmg_guess(grid, weights, positions, normals, point_weights,
                        config, depth=int(fmg_start))
    if config.debug:
        return _debug_pipeline(grid, weights, positions, normals=normals,
                               point_weights=point_weights, config=config,
                               x0=x0, sdf=True)
    problem = assemble_sdf(grid, weights, positions, normals, point_weights)
    return solve(problem, config, x0=x0)


def _debug_pipeline(grid, weights, positions, *, values=None, normals=None,
                    point_weights, config, x0, sdf):
    """Checkified assemble+solve + host-side problem audit (debugging.py)."""
    import dataclasses

    from . import debugging
    from .operators import validate_problem
    cfg = dataclasses.replace(config, debug=False, backend="xla")

    def run(positions, normals, values, point_weights, x0):
        debugging.check_sample_inputs(grid, positions, values=values,
                                      gradients=normals,
                                      point_weights=point_weights)
        if sdf:
            problem = assemble_sdf(grid, weights, positions, normals,
                                   point_weights)
        else:
            problem = assemble_interpolation(grid, weights, positions,
                                             values, point_weights)
        x, info = solve(problem, cfg, x0=x0)
        debugging.check_solution(x)
        return problem, x, info

    problem, x, info = debugging.checked_call(run, positions, normals,
                                              values, point_weights, x0)
    issues = validate_problem(problem)  # host-side audit (outside jit)
    if issues:
        raise ValueError("validate_problem: " + "; ".join(issues))
    return x, info


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreciseProblem:
    """Mixed-precision problem for solver.solve_refined: the fast fp32
    problem (densified data stencil, Pallas hot path) plus a float64 system
    kept MATTER-FREE — per-sample weighted rows instead of a densified
    coefficient tensor, because software-emulated f64 makes the dense 3^D
    apply and its 16k-element assembly scatter the most expensive parts of
    the refinement. The f64 residual is exact smoothness convs + tiny
    einsums over [n, R, 2^D] rows + one corner scatter of the per-sample
    ROW residuals (see residual64)."""

    p32: Problem
    b64: jax.Array          # [*grid] float64 — Aᵀb of the f64 system
    corner_idx: jax.Array   # [n, 2^D] int32
    rows64: jax.Array       # [n, R, 2^D] float64 — weight-scaled row coeffs
    tw64: jax.Array         # [n, R] float64 — weight-scaled row targets
    grid: Grid = dataclasses.field(metadata=dict(static=True))
    weights: Weights = dataclasses.field(metadata=dict(static=True))

    def _row_contrib(self, y: jax.Array) -> jax.Array:
        """Bᵀy per corner: [n, R] row values → [n, 2^D] corner contribs.
        Straight f64 einsum — the ORACLE form; the solve path uses the
        double-float versions below (same values to ~2⁻⁴⁸)."""
        return jnp.einsum("nrc,nr->nc", self.rows64, y,
                          precision=jax.lax.Precision.HIGHEST)

    def _rows_apply(self, x: jax.Array) -> jax.Array:
        """B x: [grid] → [n, R] per-sample row values (f64 oracle form)."""
        xc = x.reshape(-1)[self.corner_idx]                     # [n, C]
        return jnp.einsum("nrc,nc->nr", self.rows64, xc,
                          precision=jax.lax.Precision.HIGHEST)

    def _rows_apply_df(self, x: jax.Array) -> jax.Array:
        """B x via double-float (hi/lo fp32) arithmetic: exact splits of x
        and the rows, elementwise TwoProd products with all cross terms,
        compensated sum over the corner axis. Matches the f64 einsum to
        ~C·2⁻⁴⁸ relative (tests pin ≤1e-12) but costs a fused chain of
        fp32 VPU ops instead of a software-emulated f64 contraction —
        measured 0.111 → ~0.05 ms per residual evaluation at 256²/1k pts
        on v5e (probes/res64_decomp.py; the plain 3-einsum hi/lo variant
        floors at 1.1e-7 from fp32 ACCUMULATION error, which would break
        the 2% report-vs-oracle honesty bar — hence the compensated
        form)."""
        from .df import DF, df_mul_split, df_split_f64, df_sum_axis, df_to_f64
        xh, xl = df_split_f64(x.reshape(-1))
        ch, cl = xh[self.corner_idx], xl[self.corner_idx]       # [n, C] fp32
        rh, rl = df_split_f64(self.rows64)                      # [n, R, C]
        prod = df_mul_split(rh, rl, ch[:, None, :], cl[:, None, :])
        return df_to_f64(df_sum_axis(prod, axis=2))             # [n, R]

    def _row_contrib_df(self, y: jax.Array) -> jax.Array:
        """Bᵀy per corner in double-float (see _rows_apply_df)."""
        from .df import df_mul_split, df_split_f64, df_sum_axis, df_to_f64
        yh, yl = df_split_f64(y)
        rh, rl = df_split_f64(self.rows64)
        prod = df_mul_split(rh, rl, yh[:, :, None], yl[:, :, None])
        return df_to_f64(df_sum_axis(prod, axis=1))             # [n, C]

    def residual64(self, x: jax.Array) -> jax.Array:
        """r = b − A x in LEAST-SQUARES form −S x + Bᵀ(t − B x), with the
        corner scatter EXACT in float64 (the least-squares row residuals do
        NOT vanish at convergence, so a fast fp32-accumulated scatter here
        would leave a fixed ~1e-6-scale error floor — measured).
        solve_refined calls this ONCE per solve and tracks later rounds
        incrementally via apply64_delta. Precision budget: the data rows run
        in compensated double-float (~2⁻⁴⁸ relative — two orders below the
        2% honesty bar at tol=1e-6), the smoothness conv stays f64 (measured
        CHEAP: 0.010 ms — it is the row einsums and the scatter that cost),
        and gated 2D/3D problems use the exact integer-grid matmul scatter
        (~0.05 ms vs the ~0.35 ms flat f64 XLA scatter; see
        constraints.use_matmul_scatter for the 3D gates)."""
        s = stencils.smoothness_apply(x, self.weights, self.grid.ndim)
        contrib = self._row_contrib_df(self.tw64 - self._rows_apply_df(x))
        if cons.use_matmul_scatter(self.grid, self.corner_idx.shape[0]):
            return cons.scatter_corners_exact(
                self.grid, self.corner_idx, contrib) - s
        d = jnp.zeros((self.grid.num_nodes,), x.dtype
                      ).at[self.corner_idx].add(contrib)
        return d.reshape(self.grid.shape) - s

    def apply64_delta(self, d: jax.Array) -> jax.Array:
        """A d for a refinement CORRECTION d, with fp32 arithmetic where it
        self-scales: every error here is ∝ ‖d‖, which shrinks geometrically
        over rounds (round 1 is peeled through the EXACT residual64), so
        the fp32 errors land orders below the honesty bar — unlike a
        full-residual evaluation (see residual64).

        * data term — PLAIN fp32 rows + fp32 matmul scatter: the error is
          ~2⁻²⁴·‖BᵀB d‖ ≈ 2⁻²⁴·‖r_prev‖, i.e. ~6e-12·‖b‖ by the first
          incremental round (r ≤ 1e-4·‖b‖ after the peeled round) — four
          orders below the 2%-of-5e-7 honesty budget. Replaces the f64
          einsums + hi/lo scatter (measured 0.111 + 0.040 ms → ~0.04 ms,
          probes/res64_decomp.py).
        * smoothness — two fp32 applies on the exact split d = hi + lo
          instead of one software-emulated f64 apply; fp32 rounding error
          ~2⁻²⁴·‖S‖·‖d‖, the same self-scaling class — verified by
          test_refined_reported_residual_is_true_256's 2% report-vs-oracle
          bar."""
        hi = d.astype(jnp.float32)
        lo = (d - hi).astype(jnp.float32)
        nd = self.grid.ndim
        s = (stencils.smoothness_apply(hi, self.weights, nd)
             .astype(jnp.float64)
             + stencils.smoothness_apply(lo, self.weights, nd)
             .astype(jnp.float64))
        rows32 = self.rows64.astype(jnp.float32)
        ch = hi.reshape(-1)[self.corner_idx]                    # [n, C] fp32
        y = jnp.einsum("nrc,nc->nr", rows32, ch,
                       precision=jax.lax.Precision.HIGHEST)
        contrib = jnp.einsum("nrc,nr->nc", rows32, y,
                             precision=jax.lax.Precision.HIGHEST)
        if cons.use_matmul_scatter(self.grid, self.corner_idx.shape[0]):
            dd = cons.scatter_corners_matmul(self.grid, self.corner_idx,
                                             contrib)
        else:
            dd = jnp.zeros((self.grid.num_nodes,), jnp.float32
                           ).at[self.corner_idx].add(contrib
                                                     ).reshape(self.grid.shape)
        return s + dd.astype(jnp.float64)

def assemble_precise(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    values: jax.Array,
    gradients: Optional[jax.Array] = None,
    point_weights: Optional[jax.Array] = None,
) -> PreciseProblem:
    """Assemble for the mixed-precision refined solve (solver.solve_refined):
    a fast fp32 problem + a matter-free float64 system. Run once, off the
    hot path.

    fp32 inputs take a fast path whose f64-emulated tail is minimal
    (constraints.multilinear_rows_f64 — bit-identical rows, ~3x cheaper);
    float64 inputs keep the full-f64 assembly so no input precision is
    lost vs the oracle system (tests pass host f64 arrays)."""
    n = positions.shape[0]
    # Inspect dtypes WITHOUT jnp.asarray: outside enable_x64 that would
    # silently downcast host float64 arrays to f32 and misroute them.
    f64_inputs = any(
        getattr(a, "dtype", None) == jnp.float64
        for a in (positions, values, gradients, point_weights)
        if a is not None)
    with jax.enable_x64():
        if not f64_inputs:
            pw32 = (jnp.ones((n,), jnp.float32) if point_weights is None
                    else point_weights.astype(jnp.float32))
            return _assemble_precise_impl32(grid, weights, positions, values,
                                            gradients, pw32)
        pw64 = (jnp.ones((n,), jnp.float64) if point_weights is None
                else point_weights.astype(jnp.float64))
        pp = _assemble_precise_impl(grid, weights,
                                    positions.astype(jnp.float64),
                                    values.astype(jnp.float64),
                                    None if gradients is None
                                    else gradients.astype(jnp.float64),
                                    pw64)
    return pp


@functools.partial(jax.jit, static_argnames=("grid", "weights"))
def _assemble_precise_impl32(grid, weights, positions, values, gradients,
                             point_weights):
    """Fast precise assembly for FP32 inputs: the f64-emulated tail is
    minimal (constraints.multilinear_rows_f64 — the fp32 prefix is exact,
    so rows/b64 are bit-identical to the full-f64 path; measured ~0.2 ms
    cheaper per 256² assembly on v5e). All args fp32; x64 must be enabled."""
    with_gradient = gradients is not None
    corner_idx, row_coeffs, in_bounds = cons.multilinear_rows_f64(
        grid, positions)
    row_w = cons.sample_row_weights(weights, in_bounds,
                                    point_weights.astype(jnp.float64),
                                    grid.ndim, with_gradient)
    if with_gradient:
        row_t = jnp.concatenate([values[:, None], gradients],
                                axis=1).astype(jnp.float64)
    else:
        row_coeffs = row_coeffs[:, :1, :]
        row_w = row_w[:, :1]
        row_t = values[:, None].astype(jnp.float64)
    rows64 = row_coeffs * row_w[:, :, None]
    tw = row_t * row_w
    bvec = jnp.einsum("nrc,nr->nc", rows64, tw,
                      precision=jax.lax.Precision.HIGHEST)
    if cons.use_matmul_scatter(grid, corner_idx.shape[0]):
        b64 = cons.scatter_corners_exact(grid, corner_idx, bvec)
    else:
        b64 = jnp.zeros((grid.num_nodes,), jnp.float64
                        ).at[corner_idx].add(bvec).reshape(grid.shape)
    p32 = assemble(grid, weights, positions, values, gradients=gradients,
                   point_weights=point_weights)
    return PreciseProblem(p32=p32, b64=b64, corner_idx=corner_idx,
                          rows64=rows64, tw64=tw, grid=grid, weights=weights)


@functools.partial(jax.jit, static_argnames=("grid", "weights"))
def _assemble_precise_impl(grid, weights, positions, values, gradients,
                           point_weights):
    with_gradient = gradients is not None
    corner_idx, row_coeffs, in_bounds = cons.multilinear_corner_data(
        grid, positions)
    row_w = cons.sample_row_weights(weights, in_bounds, point_weights,
                                    grid.ndim, with_gradient)
    if with_gradient:
        row_t = jnp.concatenate([values[:, None], gradients], axis=1)
    else:
        row_coeffs = row_coeffs[:, :1, :]
        row_w = row_w[:, :1]
        row_t = values[:, None]
    rows64 = row_coeffs * row_w[:, :, None]
    tw = row_t * row_w
    bvec = jnp.einsum("nrc,nr->nc", rows64, tw,
                      precision=jax.lax.Precision.HIGHEST)
    # b64 = residual64(0), scattered EXACTLY (integer-grid matmul passes).
    if cons.use_matmul_scatter(grid, corner_idx.shape[0]):
        b64 = cons.scatter_corners_exact(grid, corner_idx, bvec)
    else:
        b64 = jnp.zeros((grid.num_nodes,), jnp.float64
                        ).at[corner_idx].add(bvec).reshape(grid.shape)

    # fp32 problem from the same (f64-rounded) inputs.
    p32 = assemble(grid, weights, positions.astype(jnp.float32),
                   values.astype(jnp.float32),
                   gradients=None if gradients is None
                   else gradients.astype(jnp.float32),
                   point_weights=point_weights.astype(jnp.float32))
    return PreciseProblem(p32=p32, b64=b64, corner_idx=corner_idx,
                          rows64=rows64, tw64=tw, grid=grid, weights=weights)


def sdf_from_points_precise(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    normals: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    fmg_start: bool | int = False,
) -> tuple[jax.Array, SolveInfo]:
    """SDF reconstruction to a TRUE ≤tol relative residual vs the float64
    normal equations (the honest `BASELINE.json:5` bar): f64 assembly + fp32
    PCG inner solves + f64 iterative refinement. ``fmg_start`` as in
    sdf_from_points (the guess feeds the refinement loop's warm-start
    path, which pays one exact f64 residual at x0)."""
    from .solver import solve_refined
    if fmg_start and x0 is None:
        x0 = _fmg_guess(grid, weights, positions, normals, point_weights,
                        config, depth=int(fmg_start))
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


def _fmg_guess_interp(grid: Grid, weights: Weights, positions, values,
                      point_weights, config: SolverConfig, depth: int = 1):
    """Value-interpolation FMG guess (no lattice-unit rescale — values are
    values, unlike SDF distances). Lab iteration counts: 1024²@1e-4
    cold=20 → fine=9-10 with 4-9 coarse iterations. ``depth`` recurses as
    in _fmg_guess."""
    cshape = tuple(max(2, (n + 1) // 2) for n in grid.shape)
    if cshape == grid.shape:
        return None
    import numpy as np
    cgrid = Grid(cshape)
    scale = ((np.asarray(cshape, np.float64) - 1.0)
             / (np.asarray(grid.shape, np.float64) - 1.0))
    cpos = positions * jnp.asarray(scale, positions.dtype)
    cprob = assemble_interpolation(cgrid, weights, cpos, values,
                                   point_weights)
    ccfg = dataclasses.replace(config, tol=max(1e-3, config.tol),
                               debug=False)
    cx0 = None
    if depth > 1:
        cx0 = _fmg_guess_interp(cgrid, weights, cpos, values, point_weights,
                                config, depth - 1)
    xc, _ = solve(cprob, ccfg, x0=cx0)
    from .multigrid import prolong
    return prolong(xc, grid.shape)


def interpolate(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    values: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    fmg_start: bool | int = False,
) -> tuple[jax.Array, SolveInfo]:
    """Interpolate scattered values onto the lattice. Returns (field, info).
    ``fmg_start`` as in sdf_from_points (nested-iteration initial guess).
    ``config.debug=True`` runs under checkify (see debugging.py)."""
    if fmg_start and x0 is None:
        x0 = _fmg_guess_interp(grid, weights, positions, values,
                               point_weights, config, depth=int(fmg_start))
    if config.debug:
        return _debug_pipeline(grid, weights, positions, values=values,
                               point_weights=point_weights, config=config,
                               x0=x0, sdf=False)
    problem = assemble_interpolation(grid, weights, positions, values, point_weights)
    return solve(problem, config, x0=x0)


def interpolate_precise(
    grid: Grid,
    weights: Weights,
    positions: jax.Array,
    values: jax.Array,
    point_weights: Optional[jax.Array] = None,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    fmg_start: bool | int = False,
) -> tuple[jax.Array, SolveInfo]:
    """Value-only interpolation to a TRUE ≤tol relative residual (the
    mixed-precision counterpart of `interpolate`). ``fmg_start`` as in
    `interpolate` (feeds the refinement loop's warm-start path)."""
    from .solver import solve_refined
    if fmg_start and x0 is None:
        x0 = _fmg_guess_interp(grid, weights, positions, values,
                               point_weights, config, depth=int(fmg_start))
    pp = assemble_precise(grid, weights, positions, values,
                          point_weights=point_weights)
    return solve_refined(pp, config, x0=x0)


@functools.partial(jax.jit, static_argnames=("grid",))
def sample_field(grid: Grid, field: jax.Array,
                 positions: jax.Array) -> jax.Array:
    """Multilinear interpolation of a solved lattice field at continuous
    positions [n, D] → values [n] — the read-side counterpart of
    ``add_value_constraint`` (identical corner weights, SPEC.md §3), and
    what the reference GUI does to draw readouts at sample positions.

    jit/vmap/grad-friendly. Out-of-bounds positions are clamped to the
    lattice; non-finite positions return NaN.
    """
    from .constraints import multilinear_corner_data
    corner_idx, rows, _ = multilinear_corner_data(
        grid, positions.astype(field.dtype))
    vals = jnp.einsum("nc,nc->n", field.reshape(-1)[corner_idx],
                      rows[:, 0, :], precision=jax.lax.Precision.HIGHEST)
    finite = jnp.all(jnp.isfinite(positions), axis=-1)
    return jnp.where(finite, vals, jnp.nan)


@functools.partial(jax.jit, static_argnames=("grid",))
def sample_field_gradient(grid: Grid, field: jax.Array,
                          positions: jax.Array) -> jax.Array:
    """Gradient of the multilinearly-interpolated field at continuous
    positions [n, D] → gradients [n, D] — exactly the finite-difference
    gradient ``add_gradient_constraint`` asserts (SPEC.md §4; the GUI's
    gradient arrows). Piecewise-multilinear: within a cell the axis-a
    derivative is the corner-pair difference weighted in the other axes.

    Out-of-bounds positions are clamped to the lattice; non-finite
    positions return NaN.
    """
    from .constraints import multilinear_corner_data
    corner_idx, rows, _ = multilinear_corner_data(
        grid, positions.astype(field.dtype))
    grads = jnp.einsum("nc,ndc->nd", field.reshape(-1)[corner_idx],
                       rows[:, 1:, :], precision=jax.lax.Precision.HIGHEST)
    finite = jnp.all(jnp.isfinite(positions), axis=-1)
    return jnp.where(finite[:, None], grads, jnp.nan)
