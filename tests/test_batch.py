"""Batched-solve tests (SURVEY.md §7 PR3): vmap'ed assemble+solve must equal
per-field solves, including per-field convergence masking."""

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, SolverConfig, Weights, solve
from field_interpolation_tpu.batch import (
    assemble_batch,
    sdf_from_points_batch,
    solve_batch,
)
from field_interpolation_tpu.operators import assemble


def _cloud(rng, batch, n, grid):
    center = (np.asarray(grid.shape) - 1.0) / 2.0
    theta = rng.uniform(0, 2 * np.pi, (batch, n))
    normals = np.stack([np.cos(theta), np.sin(theta)], axis=-1)
    # different radius per field -> different convergence speed per lane
    radii = rng.uniform(0.2, 0.4, (batch, 1, 1)) * min(grid.shape)
    pts = center + radii * normals
    return pts.astype(np.float32), normals.astype(np.float32)


def test_batched_equals_individual(rng):
    grid = Grid((24, 24))
    weights = Weights(model_2=0.3)
    cfg = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=3000)
    pts, nrm = _cloud(rng, 5, 40, grid)

    xb, infob = sdf_from_points_batch(grid, weights, jnp.asarray(pts),
                                      jnp.asarray(nrm), config=cfg)
    assert xb.shape == (5, 24, 24)
    assert bool(jnp.all(infob.converged))

    for i in range(5):
        p = assemble(grid, weights, jnp.asarray(pts[i]),
                     jnp.zeros(40, jnp.float32), gradients=jnp.asarray(nrm[i]))
        xi, infoi = solve(p, cfg)
        # Same solution to fp32 solver noise; iteration counts may differ by
        # a step because the batched loop keeps running lanes until all done.
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi),
                                   atol=5e-3 * np.abs(np.asarray(xi)).max())


def test_batched_convergence_is_per_field(rng):
    """Finished lanes must be frozen (not corrupted) while slow lanes run."""
    grid = Grid((16, 16))
    weights = Weights(model_2=0.3)
    pts, nrm = _cloud(rng, 4, 30, grid)
    # Make lane 0 trivial: all points out of bounds -> b = 0 -> converged at 0.
    pts[0] += 1e4
    cfg = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=3000)
    xb, infob = sdf_from_points_batch(grid, weights, jnp.asarray(pts),
                                      jnp.asarray(nrm), config=cfg)
    assert bool(jnp.all(infob.converged))
    np.testing.assert_array_equal(np.asarray(xb[0]), 0.0)
    assert np.abs(np.asarray(xb[1:])).max() > 0.1


def test_batched_multigrid(rng):
    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid")
    pts, nrm = _cloud(rng, 3, 50, grid)
    xb, infob = sdf_from_points_batch(grid, weights, jnp.asarray(pts),
                                      jnp.asarray(nrm), config=cfg)
    assert bool(jnp.all(infob.converged))
    assert int(jnp.max(infob.iterations)) < 200


def test_batched_value_interpolation(rng):
    grid = Grid((20, 20))
    weights = Weights(model_1=0.1, model_2=1.0)
    pos = jnp.asarray(rng.uniform(0, 19, (6, 25, 2)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((6, 25)), jnp.float32)
    problems = assemble_batch(grid, weights, pos, vals, with_gradient=False)
    xb, infob = solve_batch(problems, SolverConfig(tol=1e-4))
    assert xb.shape == (6, 20, 20)
    assert bool(jnp.all(infob.converged))


@pytest.mark.slow
def test_sdf_precise_batch_matches_unbatched(rng):
    """The one-call batched precise driver hits TRUE 1e-6 per lane and
    matches the unbatched precise driver (VERDICT r1 item 9)."""
    from field_interpolation_tpu import sdf_from_points_precise
    from field_interpolation_tpu.batch import sdf_from_points_precise_batch
    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    pts, nrm = _cloud(rng, 3, 50, grid)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", backend="xla",
                       maxiter=3000)
    xb, ib = sdf_from_points_precise_batch(grid, weights, jnp.asarray(pts),
                                           jnp.asarray(nrm), config=cfg)
    assert xb.shape == (3, 32, 32)
    assert bool(jnp.all(ib.converged))
    assert float(jnp.max(ib.rel_residual)) <= 1e-6
    for i in range(3):
        xi, infoi = sdf_from_points_precise(grid, weights, jnp.asarray(pts[i]),
                                            jnp.asarray(nrm[i]), config=cfg)
        # Both are true-1e-6 solutions of the same f64 system.
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi),
                                   atol=1e-4 * np.abs(np.asarray(xi)).max())


@pytest.mark.slow
def test_batched_refined_to_1e6(rng):
    """Batched TRUE-1e-6 mode: vmap of the mixed-precision refined solve."""
    import jax
    from field_interpolation_tpu.batch import solve_refined_batch
    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    B = 3
    theta = rng.uniform(0, 2 * np.pi, (B, 60))
    nrm = np.stack([np.cos(theta), np.sin(theta)], -1)
    pts = 15.5 + 10.0 * nrm
    with jax.enable_x64():
        def one(p, n):
            return assemble(grid, weights, p, jnp.zeros(60, jnp.float64),
                            gradients=n)
        p64 = jax.vmap(one)(jnp.asarray(pts, jnp.float64),
                            jnp.asarray(nrm, jnp.float64))
    xb, ib = solve_refined_batch(p64, SolverConfig(tol=1e-6,
                                                   preconditioner="multigrid",
                                                   backend="xla"))
    assert bool(jnp.all(ib.converged))
    assert float(jnp.max(ib.rel_residual)) <= 1e-6


@pytest.mark.slow
def test_precise_batch_warm_start_cuts_iterations(rng):
    """x0 on the batched precise drivers (VERDICT r3 item 8 / reference C8:
    the interactive re-solve). Warm-starting every lane with the solution of
    a nearby problem must converge with strictly fewer total iterations than
    the cold batched solve, and still hit the TRUE <=tol bar."""
    from field_interpolation_tpu.batch import sdf_from_points_precise_batch
    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    pts, nrm = _cloud(rng, 3, 50, grid)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", backend="xla",
                       maxiter=3000)
    xb, ib = sdf_from_points_precise_batch(grid, weights, jnp.asarray(pts),
                                           jnp.asarray(nrm), config=cfg)
    # Nudge the points slightly (an interactive edit) and re-solve warm.
    pts2 = pts + 0.05 * rng.standard_normal(pts.shape).astype(np.float32)
    xw, iw = sdf_from_points_precise_batch(
        grid, weights, jnp.asarray(pts2), jnp.asarray(nrm), config=cfg,
        x0=xb.astype(jnp.float32))
    xc, ic = sdf_from_points_precise_batch(grid, weights, jnp.asarray(pts2),
                                           jnp.asarray(nrm), config=cfg)
    assert bool(jnp.all(iw.converged))
    assert float(jnp.max(iw.rel_residual)) <= 1e-6
    assert int(jnp.sum(iw.iterations)) < int(jnp.sum(ic.iterations)), (
        np.asarray(iw.iterations), np.asarray(ic.iterations))
