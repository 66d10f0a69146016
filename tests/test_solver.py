"""Solver tests (SURVEY.md §4): end-to-end field equality vs the float64
oracle (Eigen stand-in), warm start, preconditioner behavior."""

import jax
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


def test_safeguarded_exit_restarts_on_drift(rng):
    """Regression for the round-1 config-5 failure: fp32 recurrence drift let
    CG exit 'done' while the TRUE residual sat above tol. The safeguarded
    stopping rule must verify every exit and restart on a failed check.

    Tuned case (probe: κ=1e4 SPD, tol=3e-4 just above the fp32 floor):
    max_restarts=1 (trust the recurrence) exits with true rel > tol, while
    the default restarts once and honestly converges."""
    from field_interpolation_tpu.solver import pcg
    n = 300
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * np.logspace(0, 4, n)) @ Q.T
    A = 0.5 * (A + A.T)
    b = rng.standard_normal(n)
    A32, b32 = jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
    apply_fn = lambda x: A32 @ x

    tol = 3e-4
    x1, info1 = pcg(apply_fn, b32, tol=tol, maxiter=10000, max_restarts=1)
    x8, info8 = pcg(apply_fn, b32, tol=tol, maxiter=10000)

    def true_rel(x):
        x64 = np.asarray(x, np.float64)
        return np.linalg.norm(b - A @ x64) / np.linalg.norm(b)

    # Unverified recurrence exit drifts above tol...
    assert not bool(info1.converged)
    assert true_rel(x1) > tol
    # ...the safeguarded exit restarts and honestly meets it.
    assert bool(info8.converged)
    assert true_rel(x8) <= tol * 1.01, true_rel(x8)
    # The reported residual is a true residual (the f64 re-check agrees up
    # to fp32 residual-evaluation noise, not up to recurrence drift).
    assert abs(true_rel(x8) - float(info8.rel_residual)) < 0.3 * tol


@pytest.mark.slow
def test_converged_flag_is_true_residual_1024(rng):
    """VERDICT r1 item 2: on a 1024²-class problem the converged flag must be
    backed by a float64-verified TRUE residual ≤ tol (the recurrence exit
    alone understated it at this scale in round 1)."""
    import jax

    from field_interpolation_tpu import sdf_from_points
    grid = Grid((1024, 1024))
    n = 4000
    theta = rng.uniform(0, 2 * np.pi, n)
    nrm = np.stack([np.cos(theta), np.sin(theta)], -1)
    pos = 511.5 + 360.0 * nrm + 0.5 * rng.standard_normal((n, 2))
    weights = Weights(model_2=0.3)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=500)
    x, info = sdf_from_points(grid, weights, jnp.asarray(pos, jnp.float32),
                              jnp.asarray(nrm, jnp.float32), config=cfg)
    assert bool(info.converged), float(info.rel_residual)
    # f64 verification of the fp32-assembled system's residual.
    with jax.enable_x64():
        p64 = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float64),
                               jnp.zeros((n,), jnp.float64),
                               gradients=jnp.asarray(nrm, jnp.float64))
        r = p64.b - p64.apply(jnp.asarray(np.asarray(x), jnp.float64))
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(p64.b))
    # Slack: the solve targets the fp32-rounded system; re-measuring against
    # the f64 assembly adds rounding of the operator itself.
    assert rel <= 1.2e-4, rel


def test_fused_pcg_matches_xla(rng):
    """The fully-fused PCG path (2 Pallas kernels/iteration, interpret mode
    here) must reach the same solution and tol as the generic XLA loop."""
    grid = Grid((64, 64))
    weights = Weights(model_2=0.3)
    theta = rng.uniform(0, 2 * np.pi, 100)
    nrm = np.stack([np.cos(theta), np.sin(theta)], -1)
    pos = 31.5 + 20.0 * nrm
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.zeros(100, jnp.float32),
                               gradients=jnp.asarray(nrm, jnp.float32))
    cfg_p = SolverConfig(tol=1e-4, preconditioner="multigrid",
                         backend="pallas")
    cfg_x = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla")
    x_p, info_p = solve(problem, cfg_p)
    x_x, info_x = solve(problem, cfg_x)
    assert bool(info_p.converged), float(info_p.rel_residual)
    # Same preconditioner, same math — iteration counts agree to ±2.
    assert abs(int(info_p.iterations) - int(info_x.iterations)) <= 2
    scale = np.abs(np.asarray(x_x)).max()
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               atol=2e-3 * scale)


def test_fused_pcg_refined_to_1e6(rng):
    """solve_refined routes its fp32 inner solves through the fused PCG when
    available; the TRUE-1e-6 bar must still hold (f64 oracle check)."""
    from field_interpolation_tpu import assemble_precise, solve_refined
    grid = Grid((64, 64))
    weights, pos, vals = _random_problem(rng, grid, n=100,
                                         weights=Weights(model_2=0.3))
    p64 = assemble_precise(grid, weights, pos, vals)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid",
                       backend="pallas", maxiter=2000)
    field, info = solve_refined(p64, cfg)
    assert bool(info.converged), float(info.rel_residual)
    r = _rel_residual_f64(grid, weights, pos, vals, np.asarray(field, np.float64))
    assert r < 1e-6, r


@pytest.mark.slow
def test_refined_reported_residual_is_true_256(rng):
    """The bench-config problem (256², 1k oriented points): the SELF-reported
    relative residual must agree with the external f64-oracle residual to
    many digits — the refined driver's precision protocol (one exact-scatter
    residual + self-scaling incremental updates) makes the report exact, not
    just the convergence honest. Regression for the hi/lo-scatter episode
    where the report was ~3x below the truth."""
    from field_interpolation_tpu import sdf_from_points_precise
    grid = Grid((256, 256))
    weights = Weights(model_2=0.3)
    theta = rng.uniform(0, 2 * np.pi, 1000)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1)
    pts = 127.5 + 89.6 * nrm + 0.2 * rng.standard_normal((1000, 2))
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000,
                       backend="xla")
    x, info = sdf_from_points_precise(grid, weights, pts, nrm, config=cfg)
    assert bool(info.converged)
    eq = assemble_explicit(grid, weights, pts, np.zeros(1000), nrm)
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    r = Atb - AtA @ np.asarray(x, np.float64).ravel()
    external = np.linalg.norm(r) / np.linalg.norm(Atb)
    assert external <= 1e-6, external
    # The report must BE the true residual (not merely below tol).
    assert abs(external - float(info.rel_residual)) <= 0.02 * external, (
        external, float(info.rel_residual))


def test_multigrid_lumped_fine_operator(rng):
    """mg_fine_operator='lumped' (diag-lumped data term inside the V-cycle,
    the large-grid traffic saver) is still a valid SPD preconditioner: the
    solve converges to the same field with a comparable iteration count."""
    grid = Grid((64, 64))
    theta = rng.uniform(0, 2 * np.pi, 120)
    nrm = np.stack([np.cos(theta), np.sin(theta)], -1)
    pos = 31.5 + 20.0 * nrm
    problem = assemble_problem(grid, Weights(model_2=0.3),
                               jnp.asarray(pos, jnp.float32),
                               jnp.zeros(120, jnp.float32),
                               gradients=jnp.asarray(nrm, jnp.float32))
    cfg_e = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla",
                         mg_fine_operator="exact", maxiter=2000)
    cfg_l = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla",
                         mg_fine_operator="lumped", maxiter=2000)
    x_e, info_e = solve(problem, cfg_e)
    x_l, info_l = solve(problem, cfg_l)
    assert bool(info_l.converged)
    assert int(info_l.iterations) <= 3 * int(info_e.iterations)
    scale = np.abs(np.asarray(x_e)).max()
    np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_e),
                               atol=2e-3 * scale)


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


def test_precise_assembly_fast_path_bit_identical(rng):
    """assemble_precise's fp32 fast path (minimal f64 tail,
    constraints.multilinear_rows_f64) must produce the SAME f64 system as
    the full-f64 path: every op dropped from f64 was exact in fp32."""
    import jax

    from field_interpolation_tpu import assemble_precise
    from field_interpolation_tpu.sdf import _assemble_precise_impl
    grid = Grid((32, 48))
    weights = Weights(model_1=0.2, model_2=1.0)
    n = 60
    pos32 = jnp.asarray(rng.uniform(-1, 48, (n, 2)), jnp.float32)  # some OOB
    vals32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    grads32 = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    pw32 = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)

    pp_fast = assemble_precise(grid, weights, pos32, vals32, gradients=grads32,
                               point_weights=pw32)
    with jax.enable_x64():
        pp_slow = _assemble_precise_impl(
            grid, weights, pos32.astype(jnp.float64),
            vals32.astype(jnp.float64), grads32.astype(jnp.float64),
            pw32.astype(jnp.float64))

    assert np.array_equal(np.asarray(pp_fast.corner_idx),
                          np.asarray(pp_slow.corner_idx))
    np.testing.assert_array_equal(np.asarray(pp_fast.rows64),
                                  np.asarray(pp_slow.rows64))
    np.testing.assert_array_equal(np.asarray(pp_fast.tw64),
                                  np.asarray(pp_slow.tw64))
    np.testing.assert_array_equal(np.asarray(pp_fast.b64),
                                  np.asarray(pp_slow.b64))


@pytest.mark.slow
def test_pallas_smoothers_jacobi_coarsest(rng):
    """Regression: the batched path (vmap + mg_coarse_solver='jacobi')
    routes through fused_smooth with diagonal-data coarse levels; diag_data
    must be a STATIC jit arg (a traced bool crashed bench config 3). The
    crash is trace-time, so 32² pins it as well as 64² did. Slow-marked:
    the interpret-mode fused-PCG compile alone costs ~80 s on the 1-core
    host; the quick tier keeps test_batched_solve_vmap_pallas, which traces
    the same diag_data static-arg path in 7 s."""
    grid = Grid((32, 32))
    weights, pos, vals = _random_problem(rng, grid, n=100)
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid",
                       mg_coarse_solver="jacobi", backend="pallas",
                       maxiter=2000)
    x_p, info = solve(problem, cfg)
    assert bool(info.converged)
    x_x, _ = solve(problem, SolverConfig(tol=1e-4, preconditioner="multigrid",
                                         mg_coarse_solver="jacobi",
                                         backend="xla", maxiter=2000))
    scale = np.abs(np.asarray(x_x)).max()
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               atol=5e-3 * scale)


def test_batched_solve_vmap_pallas(rng):
    """vmap'ed solve with the batch module's config (jacobi coarsest) +
    pallas backend — the exact bench-config-3 shape, on CPU interpret."""
    from field_interpolation_tpu.batch import (assemble_batch,
                                               sdf_from_points_batch)
    gridb = Grid((32, 32))
    B, n = 4, 50
    theta = rng.uniform(0, 2 * np.pi, (B, n))
    nrm = np.stack([np.cos(theta), np.sin(theta)], -1).astype(np.float32)
    pts = (15.5 + 8.0 * nrm).astype(np.float32)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid",
                       backend="pallas", maxiter=2000)
    xb, infob = sdf_from_points_batch(gridb, Weights(model_2=0.3),
                                      jnp.asarray(pts), jnp.asarray(nrm),
                                      config=cfg)
    assert xb.shape == (B, 32, 32)
    assert bool(jnp.all(infob.converged))


def test_precise_path_handles_nonfinite_and_oob(rng):
    """NaN/Inf positions and out-of-bounds samples must be dropped by the
    precise (fast f64-tail) assembly exactly like the fp32 path: finite
    field, honest convergence, and equality with the same problem minus the
    bad samples."""
    from field_interpolation_tpu import (assemble_precise, solve_refined)
    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    n = 60
    pos = rng.uniform(0, 31, (n, 2)).astype(np.float32)
    vals = rng.standard_normal(n).astype(np.float32)
    bad = pos.copy()
    bad[0] = [np.nan, 3.0]
    bad[1] = [np.inf, 5.0]
    bad[2] = [-7.0, 2.0]     # out of bounds
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=4000,
                       backend="xla")

    p_bad = assemble_precise(grid, weights, jnp.asarray(bad),
                             jnp.asarray(vals))
    x_bad, info_bad = solve_refined(p_bad, cfg)
    assert bool(jnp.all(jnp.isfinite(x_bad)))
    assert bool(info_bad.converged)

    # Same system with the bad samples' weights zeroed explicitly.
    pw = np.ones(n, np.float32)
    pw[:3] = 0.0
    safe = bad.copy()
    safe[:3] = 1.0
    p_ref = assemble_precise(grid, weights, jnp.asarray(safe),
                             jnp.asarray(vals), point_weights=jnp.asarray(pw))
    x_ref, _ = solve_refined(p_ref, cfg)
    np.testing.assert_allclose(np.asarray(x_bad), np.asarray(x_ref),
                               atol=1e-5 * np.abs(np.asarray(x_ref)).max())


@pytest.mark.parametrize("from_zero", [True, False])
@pytest.mark.slow
def test_fused_smooth_striped_matches_sweeps(rng, from_zero):
    """Multi-sweep striped smoother ≡ plain damped-Jacobi sweeps (interpret
    mode), including global-edge masks and stripe-margin recomputation."""
    from field_interpolation_tpu.ops.pallas_stencil import fused_smooth_striped
    grid = Grid((32, 96))
    weights = Weights(model_1=0.2, model_2=1.0)
    w, pos, vals = _random_problem(rng, grid, n=80)
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    sid = jnp.where(problem.diag > 0, 0.3 / problem.diag, 1.0
                    ).astype(jnp.float32)
    nu = 3

    z_ref = jnp.zeros_like(r) if from_zero else z0
    for _ in range(nu):
        z_ref = z_ref + sid * (r - problem.apply(z_ref))

    z_got = fused_smooth_striped(r, z0, problem.coeff.astype(jnp.float32),
                                 sid, weights, sweeps=nu, stripe=8,
                                 from_zero=from_zero, interpret=True)
    scale = float(jnp.max(jnp.abs(z_ref)))
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               atol=2e-6 * max(scale, 1.0), rtol=2e-6)


@pytest.mark.slow
def test_precise_3d_gated_matmul_scatter(rng):
    """3D refined solve at a size inside the matmul-scatter gates: the
    PreciseProblem residual path must route through the exact integer-grid
    scatter (VERDICT r2 item 7) and still hit TRUE 1e-6."""
    from field_interpolation_tpu import constraints as cons
    from field_interpolation_tpu.sdf import assemble_precise
    from field_interpolation_tpu.solver import solve_refined
    grid = Grid((24, 16, 40))
    n = 300
    assert cons.use_matmul_scatter(grid, n)
    pos = jnp.asarray(rng.uniform(0, np.asarray(grid.shape) - 1, (n, 3)),
                      jnp.float32)
    vals = jnp.asarray(rng.standard_normal(n), jnp.float32)
    pp = assemble_precise(grid, Weights(model_2=0.5), pos, vals)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", backend="xla")
    x, info = solve_refined(pp, cfg)
    assert bool(info.converged)
    # independent f64 check of the reported residual
    with jax.enable_x64():
        r = pp.residual64(x)
        rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
    assert rel <= 1.1e-6


@pytest.mark.parametrize("from_zero", [True, False])
@pytest.mark.slow
def test_fused_smooth_tiled_matches_sweeps(rng, from_zero):
    """2D-tiled multi-sweep smoother ≡ plain damped-Jacobi sweeps (interpret
    mode): both-axis tile-margin recomputation and the GLOBAL axis-1 window
    masks (tile edges are interior; only grid edges drop rows) must
    reproduce the reference sweeps exactly (VERDICT r2 item 6)."""
    from field_interpolation_tpu.ops.pallas_stencil import fused_smooth_tiled
    grid = Grid((32, 256))
    weights = Weights(model_1=0.2, model_2=1.0)
    w, pos, vals = _random_problem(rng, grid, n=80)
    problem = assemble_problem(grid, weights, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    sid = jnp.where(problem.diag > 0, 0.3 / problem.diag, 1.0
                    ).astype(jnp.float32)
    nu = 3

    z_ref = jnp.zeros_like(r) if from_zero else z0
    for _ in range(nu):
        z_ref = z_ref + sid * (r - problem.apply(z_ref))

    z_got = fused_smooth_tiled(r, z0, problem.coeff.astype(jnp.float32),
                               sid, weights, sweeps=nu, tiles=(16, 128),
                               from_zero=from_zero, interpret=True)
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("weights", [
    Weights(model_1=0.2, model_2=1.0),
    Weights(model_2=0.5, model_3=0.8),   # radius-3 stencil through the halo
])
def test_fused_sweep_striped2_3d_matches_xla(rng, weights):
    """Per-sweep fused 3D diag-data Jacobi kernel (two-axis striped) ≡ the
    XLA lumped sweep, including inter-tile seams and global-edge masks."""
    from field_interpolation_tpu import stencils
    from field_interpolation_tpu.constraints import data_diag
    from field_interpolation_tpu.ops.pallas_stencil import (
        fused_sweep_striped2_3d)
    grid = Grid((32, 64, 128))
    n = 200
    pos = jnp.asarray(rng.uniform(0, np.asarray(grid.shape) - 1, (n, 3)),
                      jnp.float32)
    vals = jnp.asarray(rng.standard_normal(n), jnp.float32)
    problem = assemble_problem(grid, weights, pos, vals)
    dd = data_diag(problem.coeff, 3)
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    sid = jnp.where(problem.diag > 0, 0.3 / problem.diag, 1.0
                    ).astype(jnp.float32)
    az = stencils.smoothness_apply(z, weights, 3) + dd * z
    want = z + sid * (r - az)
    got = fused_sweep_striped2_3d(r, z, dd, sid, weights, tiles=(8, 16),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("weights", [
    Weights(model_1=0.2, model_2=1.0),
    Weights(model_2=0.5, model_3=0.8),   # radius-3 stencil through the halo
])
def test_fused_sweep_striped_diag_2d_matches_xla(rng, weights):
    """Per-sweep fused 2D diag-data Jacobi kernel (single-axis striped) ≡
    the XLA lumped sweep, incl. stripe seams and global-edge masks."""
    from field_interpolation_tpu import stencils
    from field_interpolation_tpu.constraints import data_diag
    from field_interpolation_tpu.ops.pallas_stencil import (
        fused_sweep_striped_diag)
    grid = Grid((64, 96))
    n = 150
    pos = jnp.asarray(rng.uniform(0, np.asarray(grid.shape) - 1, (n, 2)),
                      jnp.float32)
    vals = jnp.asarray(rng.standard_normal(n), jnp.float32)
    problem = assemble_problem(grid, weights, pos, vals)
    dd = data_diag(problem.coeff, 2)
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    sid = jnp.where(problem.diag > 0, 0.3 / problem.diag, 1.0
                    ).astype(jnp.float32)
    az = stencils.smoothness_apply(z, weights, 2) + dd * z
    want = z + sid * (r - az)
    got = fused_sweep_striped_diag(r, z, dd, sid, weights, stripe=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_zero_smoothing_sweeps_backend_parity(rng):
    """mg_pre_smooth=mg_post_smooth=0 (coarse-correction-only V-cycle): the
    fused/pallas smoothers must treat '0 sweeps from zero' as ZERO, not one
    implicit τD⁻¹r step, so both backends compute the SAME (weak, singular)
    preconditioner (code-review finding). Convergence is not expected — the
    smoother-free V-cycle is rank-deficient — so the parity check is on the
    preconditioner output itself."""
    from field_interpolation_tpu.multigrid import make_vcycle_preconditioner
    grid = Grid((64, 64))
    w, pos, vals = _random_problem(rng, grid, n=80)
    problem = assemble_problem(grid, Weights(model_2=0.5),
                               jnp.asarray(pos, jnp.float32),
                               jnp.asarray(vals, jnp.float32))
    cfg = SolverConfig(preconditioner="multigrid",
                       mg_pre_smooth=0, mg_post_smooth=0)
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z_x = make_vcycle_preconditioner(problem, cfg)(r)
    z_p = make_vcycle_preconditioner(problem, cfg, pallas_smooth=True,
                                     pallas_interpret=True)(r)
    scale = float(jnp.max(jnp.abs(z_x)))
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                               rtol=0, atol=1e-5 * max(scale, 1e-30))


@pytest.mark.slow
def test_fmg_start_cuts_fine_iterations(rng):
    """Nested-iteration initial guess (fmg_start): same convergence bar,
    fewer fine-level iterations than a zero start (lab: 14 -> 7 at 256²
    with the default 1e-3 coarse tol; pinned looser here on a smaller
    grid). Precise driver accepts it through the warm-start path."""
    from field_interpolation_tpu.sdf import sdf_from_points, \
        sdf_from_points_precise

    grid = Grid((64, 64))
    rng2 = np.random.default_rng(7)
    theta = rng2.uniform(0, 2 * np.pi, 300)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (31.5 + 20.0 * nrm + 0.2 * rng2.standard_normal((300, 2))
           ).astype(np.float32)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid")
    x_cold, cold = sdf_from_points(grid, Weights(model_2=0.3),
                                   jnp.asarray(pts), jnp.asarray(nrm),
                                   config=cfg)
    x_fmg, fmg = sdf_from_points(grid, Weights(model_2=0.3),
                                 jnp.asarray(pts), jnp.asarray(nrm),
                                 config=cfg, fmg_start=True)
    assert bool(fmg.converged)
    assert int(fmg.iterations) < int(cold.iterations)
    # same solution up to the solve tolerance
    np.testing.assert_allclose(np.asarray(x_fmg), np.asarray(x_cold),
                               atol=5e-2)

    xp, infop = sdf_from_points_precise(grid, Weights(model_2=0.3),
                                        jnp.asarray(pts), jnp.asarray(nrm),
                                        config=SolverConfig(tol=1e-6),
                                        fmg_start=True)
    assert bool(infop.converged)


@pytest.mark.slow
def test_fmg_start_recursive_depth(rng):
    """fmg_start=<int> recurses the nested iteration (classic full-FMG):
    the coarse solve itself starts from a 2x-coarser guess. Same
    convergence bar and field as depth 1; the fine-level cut vs a cold
    start is preserved; a huge depth bottoms out at the 2-node floor
    without error. The coarse-level iteration saving itself is measured
    level-wise (the recursion exists to cut the COARSE bill at
    bandwidth-bound scales, NOTES_ROUND4 round-5 queue)."""
    from field_interpolation_tpu.sdf import _fmg_guess, sdf_from_points

    grid = Grid((64, 64))
    rng2 = np.random.default_rng(7)
    theta = rng2.uniform(0, 2 * np.pi, 300)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (31.5 + 20.0 * nrm + 0.2 * rng2.standard_normal((300, 2))
           ).astype(np.float32)
    w = Weights(model_2=0.3)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid")
    x_cold, cold = sdf_from_points(grid, w, jnp.asarray(pts),
                                   jnp.asarray(nrm), config=cfg)
    for depth in (2, 99):
        x_d, info_d = sdf_from_points(grid, w, jnp.asarray(pts),
                                      jnp.asarray(nrm), config=cfg,
                                      fmg_start=depth)
        assert bool(info_d.converged)
        assert int(info_d.iterations) < int(cold.iterations)
        # tol=1e-4 solves from different starts agree only to the solve
        # tolerance; far-field |SDF| here is ~9 lattice units
        np.testing.assert_allclose(np.asarray(x_d), np.asarray(x_cold),
                                   atol=1e-1)

    # the recursion really warm-starts the COARSE solve: solving the
    # 32² child problem from the depth-1 guess takes fewer iterations
    # than from zero (counted directly at the child level)
    import dataclasses as dc

    from field_interpolation_tpu.sdf import assemble_sdf
    cshape = tuple((n + 1) // 2 for n in grid.shape)
    scale = (np.asarray(cshape, np.float64) - 1) / (np.asarray(grid.shape,
                                                               np.float64) - 1)
    cgrid = Grid(cshape)
    cpos = jnp.asarray(pts * scale.astype(np.float32))
    ccfg = dc.replace(cfg, tol=1e-3)
    cprob = assemble_sdf(cgrid, w, cpos, jnp.asarray(nrm))
    _, c_cold = solve(cprob, ccfg)
    cx0 = _fmg_guess(cgrid, w, cpos, jnp.asarray(nrm), None, cfg, depth=1)
    _, c_warm = solve(cprob, ccfg, x0=cx0)
    assert int(c_warm.iterations) < int(c_cold.iterations)


def test_fmg_start_interpolate(rng):
    """Value-interpolation fmg_start: fewer fine iterations, same field."""
    from field_interpolation_tpu.sdf import interpolate

    grid = Grid((64, 64))
    rng2 = np.random.default_rng(5)
    pos = rng2.uniform(1, 62, size=(200, 2)).astype(np.float32)
    vals = np.sin(pos[:, 0] / 9.0).astype(np.float32)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid")
    w = Weights(model_2=0.3)
    x_cold, cold = interpolate(grid, w, jnp.asarray(pos), jnp.asarray(vals),
                               config=cfg)
    x_fmg, fmg = interpolate(grid, w, jnp.asarray(pos), jnp.asarray(vals),
                             config=cfg, fmg_start=True)
    assert bool(fmg.converged)
    assert int(fmg.iterations) < int(cold.iterations)
    np.testing.assert_allclose(np.asarray(x_fmg), np.asarray(x_cold),
                               atol=5e-2)


def test_headline_family_iteration_count_pinned(rng):
    """Absolute iteration-count guard for the headline problem family
    (circle-cloud SDF, production multigrid config): iteration counts are
    backend-independent, so this is the perf-regression canary the
    relative preconditioner tests can't provide (both arms of a relative
    test can regress together). 128² measures 10-11 on the production
    V-cycle; 13 leaves margin for cloud-seed variation, not for a
    preconditioner regression (Jacobi takes 100+)."""
    from field_interpolation_tpu.sdf import sdf_from_points

    grid = Grid((128, 128))
    rng2 = np.random.default_rng(0)
    theta = rng2.uniform(0, 2 * np.pi, 500)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (63.5 + 44.0 * nrm + 0.2 * rng2.standard_normal((500, 2))
           ).astype(np.float32)
    _, info = sdf_from_points(grid, Weights(model_2=0.3),
                              jnp.asarray(pts), jnp.asarray(nrm),
                              config=SolverConfig(tol=1e-4,
                                                  preconditioner="multigrid"))
    assert bool(info.converged)
    assert int(info.iterations) <= 13, int(info.iterations)


def test_empty_and_single_point_clouds(rng):
    """n=0 and n=1 sample clouds run end-to-end on every driver tier
    (the exact integer-grid scatter crashed on n=0 via log2(0) before the
    guard; reference behavior is a pure-smoothness solve — zero field)."""
    from field_interpolation_tpu.batch import sdf_from_points_batch
    from field_interpolation_tpu.sdf import (interpolate_precise,
                                             sdf_from_points,
                                             sdf_from_points_precise)

    g = Grid((24, 24))
    w = Weights(model_2=0.3)
    p0 = jnp.zeros((0, 2), jnp.float32)
    n0 = jnp.zeros((0, 2), jnp.float32)
    cfg4 = SolverConfig(tol=1e-4)
    x, info = sdf_from_points(g, w, p0, n0, config=cfg4)
    assert bool(info.converged) and float(jnp.abs(x).max()) == 0.0
    x, info = sdf_from_points_precise(g, w, p0, n0,
                                      config=SolverConfig(tol=1e-6))
    assert bool(info.converged) and float(jnp.abs(x).max()) == 0.0
    x, info = interpolate_precise(g, w, p0, jnp.zeros((0,), jnp.float32),
                                  config=SolverConfig(tol=1e-6))
    assert bool(info.converged) and float(jnp.abs(x).max()) == 0.0

    p1 = jnp.asarray([[11.5, 11.5]], jnp.float32)
    n1 = jnp.asarray([[1.0, 0.0]], jnp.float32)
    x, info = sdf_from_points(g, w, p1, n1, config=cfg4)
    assert bool(info.converged) and np.isfinite(np.asarray(x)).all()

    xb, infob = sdf_from_points_batch(g, w, jnp.zeros((3, 0, 2), jnp.float32),
                                      jnp.zeros((3, 0, 2), jnp.float32),
                                      config=cfg4)
    assert xb.shape == (3, 24, 24)
    assert bool(np.all(np.asarray(infob.converged)))


@pytest.mark.slow
def test_refined_randomized_oracle_sweep(rng):
    """Randomized honest-tier sweep: solve_refined must reach a TRUE <= 1e-6
    relative residual measured in float64 against the explicitly assembled
    oracle system, across random dims (1-3), grid shapes, weight mixes,
    OOB samples, gradients, and per-point weights — the refined-tier
    counterpart of the native-vs-oracle randomized sweep (SPEC.md's
    three-implementation contract applied to the precision protocol)."""
    from field_interpolation_tpu import assemble_precise, solve_refined

    sweep = np.random.default_rng(11)
    for trial in range(6):
        D = int(sweep.integers(1, 4))
        shape = tuple(int(sweep.integers(8, 21 if D < 3 else 13))
                      for _ in range(D))
        grid = Grid(shape)
        weights = Weights(
            model_0=float(sweep.uniform(0, 0.2)) * int(sweep.integers(0, 2)),
            model_1=float(sweep.uniform(0, 0.6)) * int(sweep.integers(0, 2)),
            model_2=float(sweep.uniform(0.1, 1.0)),
            data_pos=float(sweep.uniform(0.3, 2.0)),
            data_gradient=float(sweep.uniform(0.3, 2.0)),
        )
        n = int(sweep.integers(10, 40))
        pos = sweep.uniform(-0.5, np.asarray(shape) - 0.6, size=(n, D))
        vals = sweep.standard_normal(n)
        grads = (sweep.standard_normal((n, D))
                 if sweep.integers(0, 2) else None)
        pw = (sweep.uniform(0.5, 1.5, n).astype(np.float64)
              if sweep.integers(0, 2) else None)

        pp = assemble_precise(grid, weights, pos, vals, gradients=grads,
                              point_weights=pw)
        cfg = SolverConfig(tol=1e-6, preconditioner="multigrid",
                           maxiter=20000)
        x, info = solve_refined(pp, cfg)
        assert bool(info.converged), (trial, shape, float(info.rel_residual))

        eq = assemble_explicit(grid, weights, pos, vals, grads, pw)
        AtA, Atb = normal_equations(eq, grid.num_nodes)
        r = Atb - AtA @ np.asarray(x, np.float64).ravel()
        rel = np.linalg.norm(r) / np.linalg.norm(Atb)
        assert rel <= 1e-6, (trial, shape, rel)
