"""Reusable-setup solving: solver.prepare / solve(prep=...) and the
session.Solver frame loop (VERDICT r4 weak #4 — the reference GUI's
interactive re-solve pattern). Correctness bar: a prepared/ session solve
must match the cold path (same iterations, same field) and stale preps
must fail loudly at trace time."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import field_interpolation_tpu as fi
from field_interpolation_tpu.solver import prepare, solve
from field_interpolation_tpu.weights import SolverConfig, Weights


def _cloud(rng, grid, n=120):
    pos = rng.uniform(0, 1, (n, grid.ndim)) * (np.array(grid.shape) - 1)
    nrm = rng.standard_normal((n, grid.ndim))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(nrm, jnp.float32),
            jnp.asarray(rng.standard_normal(n), jnp.float32))


CFG = SolverConfig(tol=1e-5, preconditioner="multigrid")


def test_prepare_solve_matches_cold(rng):
    grid = fi.Grid((48, 40))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid)
    prob = fi.assemble_sdf(grid, w, pos, nrm)
    x_cold, i_cold = solve(prob, CFG)
    prep = prepare(prob, CFG)
    assert prep is not None
    x_prep, i_prep = solve(prob, CFG, prep=prep)
    assert int(i_prep.iterations) == int(i_cold.iterations)
    np.testing.assert_allclose(np.asarray(x_prep), np.asarray(x_cold),
                               rtol=0, atol=1e-5 * float(jnp.max(
                                   jnp.abs(x_cold))))


def test_prepare_solve_matches_cold_fused_interpret(rng):
    """The fused-Pallas prep path (backend='pallas' runs interpret mode on
    CPU): prepared operands must reproduce the cold fused solve."""
    grid = fi.Grid((32, 32))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid, n=60)
    prob = fi.assemble_sdf(grid, w, pos, nrm)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid",
                       backend="pallas")
    x_cold, i_cold = solve(prob, cfg)
    prep = prepare(prob, cfg)
    assert prep.fused is not None
    x_prep, i_prep = solve(prob, cfg, prep=prep)
    assert int(i_prep.iterations) == int(i_cold.iterations)
    np.testing.assert_allclose(np.asarray(x_prep), np.asarray(x_cold),
                               rtol=0, atol=1e-5 * float(jnp.max(
                                   jnp.abs(x_cold))))


@pytest.mark.slow
def test_prepare_refined_matches_cold(rng):
    grid = fi.Grid((40, 40))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid")
    pp = fi.assemble_precise(grid, w, pos, jnp.zeros(pos.shape[0]),
                             gradients=nrm)
    x_cold, i_cold = fi.solve_refined(pp, cfg)
    prep = prepare(pp, cfg)
    x_prep, i_prep = fi.solve_refined(pp, cfg, prep=prep)
    assert bool(i_prep.converged)
    assert int(i_prep.iterations) == int(i_cold.iterations)
    ref = np.asarray(x_cold)
    np.testing.assert_allclose(np.asarray(x_prep), ref,
                               rtol=0, atol=1e-6 * np.abs(ref).max())


def test_stale_prep_raises(rng):
    grid = fi.Grid((48, 40))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid)
    prob = fi.assemble_sdf(grid, w, pos, nrm)
    prep = prepare(prob, CFG)

    # Different weights -> different operator: must refuse.
    w2 = Weights(model_2=0.7)
    prob_w2 = fi.assemble_sdf(grid, w2, pos, nrm)
    with pytest.raises(ValueError, match="Weights"):
        solve(prob_w2, CFG, prep=prep)

    # Different grid shape: must refuse.
    grid2 = fi.Grid((40, 48))
    pos2, nrm2, _ = _cloud(rng, grid2)
    prob_g2 = fi.assemble_sdf(grid2, w, pos2, nrm2)
    with pytest.raises(ValueError, match="grid"):
        solve(prob_g2, CFG, prep=prep)

    # Setup-relevant config change: must refuse.
    cfg2 = SolverConfig(tol=1e-5, preconditioner="multigrid",
                        mg_pre_smooth=2, mg_post_smooth=2)
    with pytest.raises(ValueError, match="config"):
        solve(prob, cfg2, prep=prep)

    # tol/maxiter changes do NOT invalidate.
    cfg3 = SolverConfig(tol=1e-4, maxiter=500, preconditioner="multigrid")
    x, info = solve(prob, cfg3, prep=prep)
    assert bool(info.converged)


def test_session_solver_matches_cold_sdf(rng):
    grid = fi.Grid((48, 40))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid)
    s = fi.Solver(grid, w, pos, config=CFG)
    x_s, i_s = s.solve(jnp.zeros(pos.shape[0]), gradients=nrm)
    x_c, i_c = fi.sdf_from_points(grid, w, pos, nrm, config=CFG)
    assert bool(i_s.converged)
    assert int(i_s.iterations) == int(i_c.iterations)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_c),
                               rtol=0, atol=2e-4 * float(jnp.max(
                                   jnp.abs(x_c))))


def test_session_solver_value_only_and_retarget(rng):
    """Value-only session: first frame matches interpolate; a SECOND frame
    with different values matches a cold solve of those values (the b
    rebuild is correct, not a stale-b reuse)."""
    grid = fi.Grid((40, 32))
    w = Weights(model_2=0.5)
    pos, _, vals = _cloud(rng, grid)
    vals2 = jnp.asarray(rng.standard_normal(pos.shape[0]), jnp.float32)
    s = fi.Solver(grid, w, pos, gradients=False, config=CFG)
    x1, i1 = s.solve(vals)
    x1c, _ = fi.interpolate(grid, w, pos, vals, config=CFG)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x1c),
                               rtol=0, atol=2e-4 * float(jnp.max(
                                   jnp.abs(x1c))))
    x2, i2 = s.solve(vals2)
    x2c, _ = fi.interpolate(grid, w, pos, vals2, config=CFG)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2c),
                               rtol=0, atol=2e-4 * float(jnp.max(
                                   jnp.abs(x2c))))


def test_session_solver_warm_start_cuts_iterations(rng):
    grid = fi.Grid((48, 48))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid)
    s = fi.Solver(grid, w, pos, config=CFG)
    zeros = jnp.zeros(pos.shape[0])
    x1, i1 = s.solve(zeros, gradients=nrm)
    # Slightly perturbed frame, warm-started from the previous solution.
    nrm2 = nrm * 0.98 + 0.02
    x2, i2 = s.solve(zeros, gradients=nrm2, x0=x1)
    x2cold, i2cold = s.solve(zeros, gradients=nrm2)
    assert bool(i2.converged)
    assert int(i2.iterations) < int(i2cold.iterations)


@pytest.mark.slow
def test_session_solver_precise_true_residual(rng):
    """Precise session hits the TRUE <=tol bar vs the f64 oracle on frame 2
    (fresh targets, reused geometry + rows64)."""
    from field_interpolation_tpu.explicit import (assemble_explicit,
                                                  normal_equations)
    grid = fi.Grid((32, 32))
    w = Weights(model_2=0.3)
    pos, nrm, _ = _cloud(rng, grid, n=60)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid")
    s = fi.Solver(grid, w, pos, config=cfg, precise=True)
    zeros = jnp.zeros(pos.shape[0])
    s.solve(zeros, gradients=nrm)
    nrm2 = jnp.asarray(np.roll(np.asarray(nrm), 1, axis=0))
    x2, i2 = s.solve(zeros, gradients=nrm2)
    assert bool(i2.converged)
    eq = assemble_explicit(grid, w, np.asarray(pos, np.float64),
                           np.zeros(pos.shape[0]),
                           gradients=np.asarray(nrm2, np.float64))
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    r = Atb - AtA @ np.asarray(x2, np.float64).ravel()
    rel = np.linalg.norm(r) / np.linalg.norm(Atb)
    assert rel < 1e-6, rel
    # And the reported residual is honest (2% bar, as the cold driver).
    assert abs(rel - float(i2.rel_residual)) <= 0.02 * rel + 1e-12
