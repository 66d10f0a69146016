"""Solver tests (SURVEY.md §4): end-to-end field equality vs the float64
oracle (Eigen stand-in), warm start, preconditioner behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, SolverConfig, Weights, interpolate, solve
from field_interpolation_tpu.explicit import (
    assemble_explicit,
    normal_equations,
    solve_sparse_linear,
    solve_sparse_linear_approximate_lattice,
    solve_sparse_linear_with_guess,
)
from field_interpolation_tpu.operators import assemble as assemble_problem


def _random_problem(rng, grid, n=100, weights=None):
    weights = weights or Weights(model_1=0.1, model_2=1.0)
    pos = rng.uniform(0, np.asarray(grid.shape) - 1, size=(n, grid.ndim))
    vals = rng.standard_normal(n)
    return weights, pos, vals


def _rel_residual_f64(grid, weights, pos, vals, x):
    """Residual of the NORMAL equations in float64 — the honest check
    (BASELINE.json:5)."""
    eq = assemble_explicit(grid, weights, pos, vals)
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    r = Atb - AtA @ np.asarray(x, dtype=np.float64).ravel()
    return np.linalg.norm(r) / np.linalg.norm(Atb)


def test_pr1_config_64x64_plain_cg(rng):
    """BASELINE.md config 1: 64×64, ~100 value constraints, Laplacian
    smoothness, plain CG. fp32 CG legitimately bottoms out near ~1e-4
    relative residual (measured rounding floor; see solver.solve_refined
    docstring) — the honest 1e-6 bar is covered by test_refined_solve."""
    grid = Grid((64, 64))
    weights, pos, vals = _random_problem(rng, grid, n=100)
    cfg = SolverConfig(tol=5e-4, preconditioner="none", maxiter=20000)
    field, info = interpolate(grid, weights, jnp.asarray(pos, jnp.float32),
                              jnp.asarray(vals, jnp.float32), config=cfg)
    assert bool(info.converged)
    assert _rel_residual_f64(grid, weights, pos, vals, field) < 5e-4

    oracle = solve_sparse_linear(
        grid.num_nodes, assemble_explicit(grid, weights, pos, vals)
    ).reshape(grid.shape)
    err = np.abs(np.asarray(field) - oracle).max() / np.abs(oracle).max()
    assert err < 1e-2


def test_refined_solve_hits_1e6(rng):
    """The BASELINE.json:5 bar: TRUE relative residual ≤ 1e-6 measured in
    float64 against the explicitly assembled (Eigen-oracle) system."""
    from field_interpolation_tpu import assemble_precise, solve_refined
    grid = Grid((64, 64))
    weights, pos, vals = _random_problem(rng, grid, n=100)
    # Pass host float64 arrays: assemble_precise converts inside the x64
    # context, so no precision is lost vs the float64 oracle system.
    p64 = assemble_precise(grid, weights, pos, vals)
    cfg = SolverConfig(tol=1e-6, preconditioner="jacobi", maxiter=20000)
    field, info = solve_refined(p64, cfg)
    assert bool(info.converged), float(info.rel_residual)
    r = _rel_residual_f64(grid, weights, pos, vals, np.asarray(field, np.float64))
    assert r < 1e-6, r

    oracle = solve_sparse_linear(
        grid.num_nodes, assemble_explicit(grid, weights, pos, vals)
    ).reshape(grid.shape)
    err = np.abs(np.asarray(field) - oracle).max() / np.abs(oracle).max()
    assert err < 1e-4


def test_multigrid_beats_jacobi_iterations(rng):
    """V-cycle preconditioning must slash CG iteration counts (SURVEY.md §4
    'Jacobi & V-cycle preconditioners reduce iteration counts')."""
    grid = Grid((65, 65))
    weights, pos, vals = _random_problem(rng, grid, n=120)
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    _, info_jac = solve(problem, SolverConfig(tol=1e-4, preconditioner="jacobi",
                                              maxiter=20000))
    _, info_mg = solve(problem, SolverConfig(tol=1e-4, preconditioner="multigrid",
                                             maxiter=20000))
    assert bool(info_mg.converged)
    assert int(info_mg.iterations) < int(info_jac.iterations) // 4, (
        int(info_mg.iterations), int(info_jac.iterations))


def test_refined_multigrid_1e6(rng):
    from field_interpolation_tpu import assemble_precise, solve_refined
    grid = Grid((64, 64))
    weights, pos, vals = _random_problem(rng, grid, n=100)
    # Pass host float64 arrays: assemble_precise converts inside the x64
    # context, so no precision is lost vs the float64 oracle system.
    p64 = assemble_precise(grid, weights, pos, vals)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    field, info = solve_refined(p64, cfg)
    assert bool(info.converged), float(info.rel_residual)
    r = _rel_residual_f64(grid, weights, pos, vals, np.asarray(field, np.float64))
    assert r < 1e-6, r


def test_jacobi_beats_plain_cg(rng):
    grid = Grid((32, 32))
    weights, pos, vals = _random_problem(rng, grid, n=60,
                                         weights=Weights(model_0=0.01, model_2=1.0))
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    _, info_plain = solve(problem, SolverConfig(tol=1e-4, preconditioner="none"))
    _, info_jac = solve(problem, SolverConfig(tol=1e-4, preconditioner="jacobi"))
    assert bool(info_jac.converged)
    assert int(info_jac.iterations) <= int(info_plain.iterations)


def test_warm_start_fewer_iterations(rng):
    """Reference C8 behavior: re-solving a perturbed problem from the previous
    solution converges in fewer iterations (SURVEY.md §3.2)."""
    grid = Grid((32, 32))
    weights, pos, vals = _random_problem(rng, grid, n=80)
    p1 = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                          jnp.asarray(vals, jnp.float32))
    x1, _ = solve(p1, SolverConfig(tol=1e-4))
    vals2 = vals + 0.01 * rng.standard_normal(len(vals))
    p2 = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                          jnp.asarray(vals2, jnp.float32))
    _, cold = solve(p2, SolverConfig(tol=1e-4))
    _, warm = solve(p2, SolverConfig(tol=1e-4), x0=x1)
    assert int(warm.iterations) < int(cold.iterations)


def test_zero_rhs_converges_immediately():
    grid = Grid((16, 16))
    weights = Weights(model_2=1.0)
    pos = jnp.zeros((1, 2))
    vals = jnp.zeros(1)
    pw = jnp.zeros(1)
    field, info = interpolate(grid, weights, pos, vals, point_weights=pw)
    assert bool(info.converged)
    np.testing.assert_array_equal(np.asarray(field), 0.0)


def test_oracle_warm_start_and_approximate_lattice(rng):
    """The reference C8/C9 API surface works on the host path too."""
    grid = Grid((17, 17))
    weights, pos, vals = _random_problem(rng, grid, n=40)
    eq = assemble_explicit(grid, weights, pos, vals)
    x_direct = solve_sparse_linear(grid.num_nodes, eq)
    x_warm = solve_sparse_linear_with_guess(grid.num_nodes, eq, x_direct)
    np.testing.assert_allclose(x_warm, x_direct, atol=1e-6 * np.abs(x_direct).max())

    x_approx = solve_sparse_linear_approximate_lattice(grid, weights, pos, vals)
    # Coarse solve is approximate: just require it's in the right ballpark.
    rel = np.linalg.norm(x_approx - x_direct) / np.linalg.norm(x_direct)
    assert rel < 0.5


def test_1d_end_to_end(rng):
    """1-D grids work through the whole pipeline (reference is N-D generic)."""
    grid = Grid((128,))
    weights = Weights(model_2=1.0)
    pos = rng.uniform(0, 127, (30, 1))
    vals = np.sin(pos[:, 0] / 20.0)
    field, info = interpolate(grid, weights, jnp.asarray(pos, jnp.float32),
                              jnp.asarray(vals, jnp.float32),
                              config=SolverConfig(tol=1e-4,
                                                  preconditioner="multigrid"))
    assert bool(info.converged)
    assert _rel_residual_f64(grid, weights, pos, vals, field) < 1e-3
    # Field should roughly track the sine at sample locations.
    idx = np.clip(np.round(pos[:, 0]).astype(int), 0, 127)
    err = np.abs(np.asarray(field)[idx] - vals)
    assert np.median(err) < 0.2


def test_interpolate_precise_hits_1e6(rng):
    """Value-only mixed-precision driver reaches the true 1e-6 bar."""
    from field_interpolation_tpu import interpolate_precise
    grid = Grid((48, 48))
    weights, pos, vals = _random_problem(rng, grid, n=80)
    field, info = interpolate_precise(grid, weights, pos, vals,
                                      config=SolverConfig(tol=1e-6,
                                                          preconditioner="multigrid"))
    assert bool(info.converged)
    r = _rel_residual_f64(grid, weights, pos, vals, np.asarray(field, np.float64))
    assert r < 1e-6, r
