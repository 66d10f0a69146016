"""Sharded-solve tests on 8 virtual CPU devices (SURVEY.md §4 'distributed
without a cluster'): sharded ≡ unsharded to fp32 reduction noise, across mesh
shapes, stencil orders (halo widths), and dimensions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from field_interpolation_tpu import Grid, SolverConfig, Weights, solve
from field_interpolation_tpu.operators import assemble
from field_interpolation_tpu.parallel import shard_problem, solve_sharded


pytestmark = pytest.mark.slow  # heavy end-to-end sharded solves (quick tier: -m 'not slow')


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axis_names=names)


def _problem_2d(rng, grid, weights, n=80):
    pos = rng.uniform(0, np.asarray(grid.shape) - 1, size=(n, grid.ndim))
    vals = rng.standard_normal(n)
    grads = rng.standard_normal((n, grid.ndim))
    return assemble(grid, weights, jnp.asarray(pos, jnp.float32),
                    jnp.asarray(vals, jnp.float32),
                    gradients=jnp.asarray(grads, jnp.float32))


@pytest.mark.parametrize("mesh_shape,names", [
    ((8,), ("x",)),
    ((2, 4), ("x", "y")),
    ((4, 2), ("x", "y")),
])
def test_sharded_equals_unsharded_2d(rng, mesh_shape, names):
    grid = Grid((32, 64))
    weights = Weights(model_1=0.1, model_2=1.0)
    problem = _problem_2d(rng, grid, weights)
    cfg = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=4000)

    x_ref, info_ref = solve(problem, cfg)
    mesh = _mesh(mesh_shape, names)
    sharded = shard_problem(problem, mesh)
    x_sh, info_sh = solve_sharded(sharded, mesh, cfg)

    assert bool(info_sh.converged)
    scale = np.abs(np.asarray(x_ref)).max()
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               atol=2e-3 * scale)


@pytest.mark.parametrize("weights", [
    Weights(model_0=0.1, model_2=1.0),
    Weights(model_1=1.0),
    Weights(model_3=0.5, model_2=0.2),   # radius-3 halos
])
def test_sharded_orders_and_boundaries(rng, weights):
    """Internal shard boundaries must NOT look like grid boundaries: the
    dropped-row policy applies only at global edges."""
    grid = Grid((32, 32))
    problem = _problem_2d(rng, grid, weights, n=50)
    cfg = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=6000)
    x_ref, _ = solve(problem, cfg)
    mesh = _mesh((2, 4), ("x", "y"))
    x_sh, info_sh = solve_sharded(shard_problem(problem, mesh), mesh, cfg)
    assert bool(info_sh.converged)
    scale = np.abs(np.asarray(x_ref)).max()
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               atol=2e-3 * scale)


def test_sharded_3d(rng):
    grid = Grid((16, 16, 8))
    weights = Weights(model_2=0.5)
    n = 40
    pos = rng.uniform(0, np.asarray(grid.shape) - 1, size=(n, 3))
    vals = rng.standard_normal(n)
    problem = assemble(grid, weights, jnp.asarray(pos, jnp.float32),
                       jnp.asarray(vals, jnp.float32))
    cfg = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=4000)
    x_ref, _ = solve(problem, cfg)
    mesh = _mesh((2, 2, 2), ("x", "y", "z"))
    x_sh, info_sh = solve_sharded(shard_problem(problem, mesh), mesh, cfg)
    assert bool(info_sh.converged)
    scale = np.abs(np.asarray(x_ref)).max()
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               atol=2e-3 * scale)


def test_sharded_apply_matches_exactly(rng):
    """The sharded operator apply itself (one matvec) must match the
    unsharded apply almost bit-for-bit — isolates halo/mask bugs from CG
    accumulation differences."""
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from field_interpolation_tpu.parallel.sharded import (
        _grid_partition_spec, make_sharded_apply)

    grid = Grid((24, 40))
    weights = Weights(model_1=0.2, model_2=1.0, model_3=0.3)
    problem = _problem_2d(rng, grid, weights, n=60)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    want = problem.apply(x)

    mesh = _mesh((2, 4), ("x", "y"))
    spec_g = _grid_partition_spec(mesh, 2)
    spec_c = _grid_partition_spec(mesh, 2, lead_dims=1)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec_c, spec_g),
             out_specs=spec_g)
    def apply_sharded(coeff_l, x_l):
        return make_sharded_apply(grid.shape, weights, mesh, coeff_l)(x_l)

    got = apply_sharded(problem.coeff, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("mesh_shape,names", [((2, 4), ("x", "y")),
                                              ((8,), ("x",))])
def test_sharded_pallas_apply_matches_exactly(rng, mesh_shape, names):
    """VERDICT r1 item 4: the fused Pallas kernel on the halo-extended block
    (backend='pallas', interpret mode on the CPU mesh) must match the
    unsharded apply as exactly as the XLA shift path does."""
    from functools import partial
    from field_interpolation_tpu.parallel.sharded import (
        _grid_partition_spec, make_sharded_apply)

    grid = Grid((24, 40))
    weights = Weights(model_1=0.2, model_2=1.0, model_3=0.3)  # radius 3
    problem = _problem_2d(rng, grid, weights, n=60)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    want = problem.apply(x)

    mesh = _mesh(mesh_shape, names)
    spec_g = _grid_partition_spec(mesh, 2)
    spec_c = _grid_partition_spec(mesh, 2, lead_dims=1)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec_c, spec_g),
             out_specs=spec_g, check_vma=False)  # interpret-mode pallas
    def apply_sharded(coeff_l, x_l):
        return make_sharded_apply(grid.shape, weights, mesh, coeff_l,
                                  backend="pallas")(x_l)

    got = apply_sharded(problem.coeff, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("weights", [Weights(model_2=1.0),
                                     Weights(model_2=0.4, model_3=0.3)])
def test_striped_ext_kernel_matches_unsharded(rng, weights):
    """The striped halo-extended kernel (for shard blocks too big for whole
    VMEM) must reproduce the unsharded apply on a simulated 2-shard row
    split, including global boundary masks and cross-shard halos."""
    from field_interpolation_tpu.ops.pallas_stencil import (
        fused_normal_apply_ext_striped)
    from field_interpolation_tpu.stencils import max_stencil_radius

    grid = Grid((64, 48))
    problem = _problem_2d(rng, grid, weights, n=70)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    want = np.asarray(problem.apply(x))

    r = max(max_stencil_radius(weights), 1)
    n0_loc = 32
    pieces = []
    xp = np.asarray(x)
    for s in range(2):
        rows = slice(s * n0_loc, (s + 1) * n0_loc)
        # axis-1 halos: axis 1 is unsharded -> zeros (global-edge semantics)
        x1 = np.pad(xp[rows], ((0, 0), (r, r)))
        top = (np.pad(xp[s * n0_loc - r:s * n0_loc], ((0, 0), (r, r)))
               if s > 0 else np.zeros((r, 48 + 2 * r)))
        bot = (np.pad(xp[(s + 1) * n0_loc:(s + 1) * n0_loc + r],
                      ((0, 0), (r, r)))
               if s < 1 else np.zeros((r, 48 + 2 * r)))
        got = fused_normal_apply_ext_striped(
            jnp.asarray(x1, jnp.float32), jnp.asarray(top, jnp.float32),
            jnp.asarray(bot, jnp.float32),
            problem.coeff[:, rows], jnp.asarray([s * n0_loc, 0], jnp.int32),
            weights, r, grid.shape, 8, interpret=True)
        pieces.append(np.asarray(got))
    np.testing.assert_allclose(np.concatenate(pieces), want, atol=2e-4)


def test_sharded_solve_pallas_backend_equals_xla(rng):
    """Full sharded PCG with the Pallas ext-kernel apply (interpret mode)
    converges to the same field as the XLA path."""
    grid = Grid((32, 32))
    weights = Weights(model_2=0.5)
    problem = _problem_2d(rng, grid, weights, n=50)
    mesh = _mesh((2, 2), ("x", "y"))
    sp = shard_problem(problem, mesh)
    cfg_x = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=4000,
                         backend="xla")
    cfg_p = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=4000,
                         backend="pallas")
    x_x, _ = solve_sharded(sp, mesh, cfg_x)
    x_p, info_p = solve_sharded(sp, mesh, cfg_p)
    assert bool(info_p.converged)
    scale = np.abs(np.asarray(x_x)).max()
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               atol=2e-3 * scale)


@pytest.mark.parametrize("precond", ["jacobi", "multigrid"])
def test_sharded_refined_true_1e6(rng, precond):
    """VERDICT r1 item 3: the sharded mixed-precision refined solve reaches a
    TRUE 1e-6 relative residual, verified against the float64 oracle system
    (scipy), on an 8-virtual-device mesh."""
    from field_interpolation_tpu.explicit import assemble_explicit, normal_equations
    from field_interpolation_tpu.parallel import solve_refined_sharded

    grid = Grid((32, 64))
    weights = Weights(model_2=0.3)
    n = 80
    pos = rng.uniform(0, np.asarray(grid.shape) - 1, size=(n, 2))
    vals = rng.standard_normal(n)
    grads = rng.standard_normal((n, 2))

    with jax.enable_x64():
        p64 = assemble(grid, weights, jnp.asarray(pos, jnp.float64),
                       jnp.asarray(vals, jnp.float64),
                       gradients=jnp.asarray(grads, jnp.float64))
        mesh = _mesh((2, 4), ("x", "y"))
        cfg = SolverConfig(tol=1e-6, preconditioner=precond, maxiter=20000)
        x, info = solve_refined_sharded(shard_problem(p64, mesh), mesh, cfg)

    assert bool(info.converged), float(info.rel_residual)
    assert float(info.rel_residual) <= 1e-6

    # Independent f64 verification vs the explicitly assembled oracle.
    eq = assemble_explicit(grid, weights, pos, vals, grads)
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    r = Atb - AtA @ np.asarray(x, np.float64).ravel()
    rel = np.linalg.norm(r) / np.linalg.norm(Atb)
    assert rel <= 1.1e-6, rel


def test_sharded_rejects_indivisible(rng):
    grid = Grid((30, 32))
    problem = _problem_2d(rng, grid, Weights(model_2=1.0), n=10)
    mesh = _mesh((4, 2), ("x", "y"))
    # device_put itself rejects the uneven layout; solve_sharded's own check
    # covers problems sharded by other means.
    with pytest.raises(ValueError, match="divisible"):
        solve_sharded(shard_problem(problem, mesh), mesh)
    with pytest.raises(ValueError, match="not divisible"):
        solve_sharded(problem, mesh)


def test_sharded_multigrid_beats_jacobi(rng):
    """Distributed-MG preconditioning converges to the same solution with
    far fewer iterations than plain Jacobi at scale."""
    grid = Grid((64, 64))
    problem = _problem_2d(rng, grid, Weights(model_2=0.3), n=120)
    mesh = _mesh((2, 4), ("x", "y"))
    sp = shard_problem(problem, mesh)
    cfg_j = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=20000)
    cfg_m = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=20000)
    x_j, info_j = solve_sharded(sp, mesh, cfg_j)
    x_m, info_m = solve_sharded(sp, mesh, cfg_m)
    assert bool(info_m.converged)
    assert float(info_m.rel_residual) <= 1e-4
    # Distributed MG should slash iterations (observed ~8 vs ~235 here).
    assert int(info_m.iterations) < int(info_j.iterations) // 3, (
        int(info_m.iterations), int(info_j.iterations))
    # Both solves honestly meet the 1e-4 residual; the remaining solution gap
    # is residual-to-error amplification (condition number), so compare
    # loosely.
    scale = np.abs(np.asarray(x_j)).max()
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j),
                               atol=2e-2 * scale)


def test_distributed_mg_matches_unsharded(rng):
    """Distributed-MG contract (sharded.py _make_mg_plan): the sharded
    preconditioner is the SAME V-cycle hierarchy the unsharded solver builds,
    so iteration counts are shard-count independent and equal the unsharded
    count — for every mesh shape, including the (2,2)/(1,8) aspect ratios
    that blew up 4-8x under round 1's block-Schwarz scheme."""
    grid = Grid((64, 64))
    problem = _problem_2d(rng, grid, Weights(model_2=0.3), n=120)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000,
                       backend="xla")
    x_ref, info_ref = solve(problem, cfg)
    ref_iters = int(info_ref.iterations)

    # (2,2) square, (2,4) rectangular, (1,8) extreme aspect — the shapes that
    # blew up under block-Schwarz. (1,1) and (8,1) dropped from the loop:
    # degenerate/transpose cases whose machinery the other three compile paths
    # cover, and each mesh shape is a full PCG+MG shard_map recompile on the
    # 1-core host (suite-budget audit, round 5).
    for mesh_shape in [(2, 2), (2, 4), (1, 8)]:
        mesh = _mesh(mesh_shape, ("x", "y"))
        x, info = solve_sharded(shard_problem(problem, mesh), mesh, cfg)
        assert bool(info.converged), mesh_shape
        assert abs(int(info.iterations) - ref_iters) <= 2, (
            mesh_shape, int(info.iterations), ref_iters)
        scale = np.abs(np.asarray(x_ref)).max()
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   atol=2e-3 * scale)


def test_distributed_mg_precond_equals_unsharded_vcycle(rng):
    """One application of the distributed V-cycle equals the unsharded
    V-cycle to fp32 reduction noise — pins transfers, masks, taus, and the
    replicated coarsest solve, not just end-to-end convergence."""
    import functools

    from jax.sharding import PartitionSpec as P

    from field_interpolation_tpu.multigrid import make_vcycle_preconditioner
    from field_interpolation_tpu.parallel.sharded import (
        _grid_partition_spec, _make_mg_plan, _make_mg_precond,
        make_sharded_apply)

    grid = Grid((64, 96))
    weights = Weights(model_1=0.1, model_2=1.0)
    problem = _problem_2d(rng, grid, weights, n=100)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla")
    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)

    z_ref = make_vcycle_preconditioner(problem, cfg)(r)

    mesh = _mesh((2, 4), ("x", "y"))
    plan, mg_ops, mg_specs = _make_mg_plan(problem, mesh, cfg)
    spec_g = _grid_partition_spec(mesh, 2)
    spec_c = _grid_partition_spec(mesh, 2, lead_dims=1)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec_c, spec_g, spec_g, mg_specs),
                       out_specs=spec_g, check_vma=False)
    def one_vcycle(coeff_l, diag_l, r_l, mg_ops):
        apply_fn = make_sharded_apply(grid.shape, weights, mesh, coeff_l)
        precond = _make_mg_precond(plan, mg_ops, apply_fn, diag_l, mesh, cfg)
        return precond(r_l)

    z_sh = jax.jit(one_vcycle)(problem.coeff, problem.diag, r, mg_ops)
    scale = np.abs(np.asarray(z_ref)).max()
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                               atol=1e-5 * scale, rtol=1e-5)


def test_distributed_mg_sharded_coarse_level(rng):
    """Exercise the 'ss' (sharded coarse level) machinery: a 256x128 grid on
    a (2,4) mesh keeps its first coarse level (128x64 = 8192 > 4096 nodes)
    SHARDED, so the banded transfer matmuls, per-level halo smoothing, and
    the psum gather at the sharded->replicated boundary all run — the
    smaller grids elsewhere in this file replicate every coarse level."""
    import functools

    from field_interpolation_tpu.multigrid import make_vcycle_preconditioner
    from field_interpolation_tpu.parallel.sharded import (
        _grid_partition_spec, _make_mg_plan, _make_mg_precond,
        make_sharded_apply)

    grid = Grid((256, 128))
    weights = Weights(model_2=0.3)
    problem = _problem_2d(rng, grid, weights, n=300)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla")
    mesh = _mesh((2, 4), ("x", "y"))

    plan, mg_ops, mg_specs = _make_mg_plan(problem, mesh, cfg)
    assert plan.n_sh >= 1, plan  # the point of this test
    assert plan.trans[0][0] == "ss", plan.trans

    r = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    z_ref = make_vcycle_preconditioner(problem, cfg)(r)

    spec_g = _grid_partition_spec(mesh, 2)
    spec_c = _grid_partition_spec(mesh, 2, lead_dims=1)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec_c, spec_g, spec_g, mg_specs),
                       out_specs=spec_g, check_vma=False)
    def one_vcycle(coeff_l, diag_l, r_l, mg_ops):
        apply_fn = make_sharded_apply(grid.shape, weights, mesh, coeff_l)
        precond = _make_mg_precond(plan, mg_ops, apply_fn, diag_l, mesh, cfg)
        return precond(r_l)

    z_sh = jax.jit(one_vcycle)(problem.coeff, problem.diag, r, mg_ops)
    scale = np.abs(np.asarray(z_ref)).max()
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                               atol=2e-5 * scale, rtol=1e-5)

    # End-to-end: sharded solve matches unsharded iteration count.
    x_ref, info_ref = solve(problem, cfg)
    x_sh, info_sh = solve_sharded(shard_problem(problem, mesh), mesh, cfg)
    assert bool(info_sh.converged)
    assert abs(int(info_sh.iterations) - int(info_ref.iterations)) <= 2


def test_fused_ext_diag_data_matches_xla(rng):
    """fused_normal_apply_ext(diag_data=True) — the distributed-MG coarse
    level form (smoothness + diagonal data in one kernel) — must equal the
    XLA smoothness apply + diag multiply on an interior block with global
    window masks (VERDICT r2 item 8)."""
    import jax.numpy as jnp
    from field_interpolation_tpu import stencils
    from field_interpolation_tpu.ops.pallas_stencil import fused_normal_apply_ext

    grid_shape = (64, 96)
    weights = Weights(model_1=0.2, model_2=1.0)
    r = 2
    x = rng.standard_normal(grid_shape).astype(np.float32)
    dd = np.abs(rng.standard_normal(grid_shape)).astype(np.float32)
    want = np.asarray(stencils.smoothness_apply(jnp.asarray(x), weights, 2)
                      ) + dd * x
    # Emulate a (2,2) shard layout: each local block extended with true
    # neighbor data (zeros at global edges).
    xp = np.pad(x, r)
    b0, b1 = grid_shape[0] // 2, grid_shape[1] // 2
    for i in range(2):
        for j in range(2):
            ext = xp[i * b0:i * b0 + b0 + 2 * r, j * b1:j * b1 + b1 + 2 * r]
            gs = jnp.asarray([i * b0, j * b1], jnp.int32)
            got = fused_normal_apply_ext(
                jnp.asarray(ext), jnp.asarray(dd[i * b0:(i + 1) * b0,
                                                 j * b1:(j + 1) * b1]),
                gs, weights, 2, r, grid_shape, interpret=True,
                diag_data=True)
            np.testing.assert_allclose(
                np.asarray(got), want[i * b0:(i + 1) * b0,
                                      j * b1:(j + 1) * b1],
                rtol=0, atol=2e-5)


@pytest.mark.slow
def test_distributed_mg_pallas_levels_match_xla(rng):
    """Distributed MG with backend='pallas' (fused ext kernels for the
    fine apply AND the sharded coarse-level smoothing, interpret mode) must
    keep the iteration-parity contract and the solution (VERDICT r2
    item 8). Grid sized so the first coarse level (80² = 6400 nodes) stays
    SHARDED — the fused diag-data level path is actually exercised."""
    from field_interpolation_tpu.parallel import sharded as sh

    grid = Grid((160, 160))
    problem = _problem_2d(rng, grid, Weights(model_2=0.3), n=150)
    mesh = _mesh((2, 2), ("x", "y"))
    cfg_x = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000,
                         backend="xla")
    plan, _, _ = sh._make_mg_plan(problem, mesh, cfg_x)
    assert plan.n_sh >= 1, plan  # the coarse level really is sharded
    sp = shard_problem(problem, mesh)
    x_x, info_x = solve_sharded(sp, mesh, cfg_x)
    cfg_p = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000,
                         backend="pallas")
    x_p, info_p = solve_sharded(sp, mesh, cfg_p)
    assert bool(info_p.converged)
    assert abs(int(info_p.iterations) - int(info_x.iterations)) <= 1
    scale = np.abs(np.asarray(x_x)).max()
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               atol=2e-3 * scale)


def test_overlap_apply_equals_sequential(rng):
    """The overlapped 2D sharded apply (concurrent axis exchanges + corner
    patch exchange + interior/shell split) must equal the sequential
    exchange-then-compute apply to fp32 reduction-order noise on every
    mesh shape (VERDICT r2 item 8)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P
    from field_interpolation_tpu.parallel.sharded import (
        _grid_partition_spec, make_sharded_apply)

    grid = Grid((64, 96))
    weights = Weights(model_1=0.2, model_2=1.0)
    problem = _problem_2d(rng, grid, weights, n=120)
    x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    for mesh_shape in [(2, 4), (4, 2), (8, 1), (1, 8)]:
        mesh = _mesh(mesh_shape, ("x", "y"))
        spec_g = _grid_partition_spec(mesh, 2)
        spec_c = _grid_partition_spec(mesh, 2, lead_dims=1)
        outs = {}
        for ov in (False, True):
            @partial(jax.shard_map, mesh=mesh, in_specs=(spec_c, spec_g),
                     out_specs=spec_g)
            def body(coeff_l, x_l, ov=ov):
                f = make_sharded_apply(grid.shape, weights, mesh, coeff_l,
                                       overlap=ov)
                return f(x_l)
            outs[ov] = np.asarray(jax.jit(body)(
                jax.device_put(problem.coeff, NamedSharding(mesh, spec_c)),
                jax.device_put(x, NamedSharding(mesh, spec_g))))
        scale = np.abs(outs[False]).max()
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=0, atol=1e-5 * scale)


@pytest.mark.parametrize("mesh_shape,names", [
    ((2, 4), ("x", "y")),
    ((8,), ("x",)),
])
def test_sharded_refined_precise_matter_free(rng, mesh_shape, names):
    """VERDICT r3 item 4: solve_refined_sharded on a PreciseProblem — the
    matter-free precision protocol (owner-sharded f64 sample rows, ONE exact
    f64 residual, incremental hi/lo-fp32 apply64_delta) inside shard_map.
    Residual parity with the single-chip solve_refined + independent scipy
    f64 oracle verification."""
    from field_interpolation_tpu.parallel import solve_refined_sharded
    from field_interpolation_tpu.sdf import assemble_precise
    from field_interpolation_tpu.solver import solve_refined
    from field_interpolation_tpu.explicit import (assemble_explicit,
                                                  normal_equations)

    grid = Grid((32, 64))
    weights = Weights(model_2=0.3)
    n = 200
    pos = rng.uniform(0, np.asarray(grid.shape) - 1.001, size=(n, 2))
    vals = rng.standard_normal(n)
    grads = rng.standard_normal((n, 2))

    pp = assemble_precise(grid, weights, jnp.asarray(pos, jnp.float32),
                          jnp.asarray(vals, jnp.float32),
                          gradients=jnp.asarray(grads, jnp.float32))
    mesh = _mesh(mesh_shape, names)
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=20000)
    x_sh, info_sh = solve_refined_sharded(pp, mesh, cfg)
    assert bool(info_sh.converged), float(info_sh.rel_residual)
    assert float(info_sh.rel_residual) <= 1e-6

    # Single-chip parity: both are TRUE-1e-6 solutions of the same system.
    x_1, info_1 = solve_refined(pp, cfg)
    scale = float(np.max(np.abs(np.asarray(x_1))))
    np.testing.assert_allclose(np.asarray(x_sh, np.float64),
                               np.asarray(x_1, np.float64),
                               atol=2e-4 * max(scale, 1e-30))

    # Independent f64 verification vs the explicitly assembled oracle.
    eq = assemble_explicit(grid, weights, pos, vals, grads)
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    r = Atb - AtA @ np.asarray(x_sh, np.float64).ravel()
    rel = np.linalg.norm(r) / np.linalg.norm(Atb)
    assert rel <= 1.1e-6, rel


def test_sharded_refined_precise_warm_start(rng):
    """x0 through the matter-free sharded refinement: warm-starting with the
    cold solution converges immediately (round-1 residual already ≤ tol)."""
    from field_interpolation_tpu.parallel import solve_refined_sharded
    from field_interpolation_tpu.sdf import assemble_precise

    grid = Grid((32, 32))
    weights = Weights(model_2=0.3)
    n = 120
    pos = rng.uniform(0, 30.999, size=(n, 2))
    vals = rng.standard_normal(n)
    pp = assemble_precise(grid, weights, jnp.asarray(pos, jnp.float32),
                          jnp.asarray(vals, jnp.float32))
    mesh = _mesh((2, 2), ("x", "y"))
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=20000)
    x, info = solve_refined_sharded(pp, mesh, cfg)
    xw, infow = solve_refined_sharded(pp, mesh, cfg,
                                      x0=x.astype(jnp.float32))
    assert bool(infow.converged)
    assert int(infow.iterations) < int(info.iterations)


def test_sharded_refined_precise_3d_mesh(rng):
    """Matter-free sharded refinement on a 2x2x2 mesh (3D owner sharding,
    corner spill crosses THREE axes transitively in _ext_hi/_scatter_fold_hi)."""
    from field_interpolation_tpu.parallel import solve_refined_sharded
    from field_interpolation_tpu.sdf import assemble_precise
    from field_interpolation_tpu.solver import solve_refined

    grid = Grid((16, 16, 32))
    weights = Weights(model_2=0.4)
    n = 150
    pos = rng.uniform(0, np.asarray(grid.shape) - 1.001, size=(n, 3))
    vals = rng.standard_normal(n)
    pp = assemble_precise(grid, weights, jnp.asarray(pos, jnp.float32),
                          jnp.asarray(vals, jnp.float32))
    mesh = _mesh((2, 2, 2), ("x", "y", "z"))
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=20000)
    x_sh, info_sh = solve_refined_sharded(pp, mesh, cfg)
    assert bool(info_sh.converged), float(info_sh.rel_residual)
    x_1, info_1 = solve_refined(pp, cfg)
    scale = float(np.max(np.abs(np.asarray(x_1))))
    np.testing.assert_allclose(np.asarray(x_sh, np.float64),
                               np.asarray(x_1, np.float64),
                               atol=2e-4 * max(scale, 1e-30))
    # TRUE residual vs the matter-free f64 system
    with jax.enable_x64():
        r = pp.residual64(jnp.asarray(np.asarray(x_sh)))
        rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
    assert rel <= 1.1e-6, rel


def test_marching_squares_sharded_matches_device():
    """Sharded contour extraction (one-node halo exchange, per-shard
    compaction) reproduces the unsharded device extraction's live segment
    set in global coordinates — seam cells extracted exactly once, edge
    shards' halo garbage masked — on 2x4 and 4x2 meshes, divisible and
    seam-crossing fields, plus the overflow report."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from field_interpolation_tpu.contour import marching_squares_device
    from field_interpolation_tpu.parallel.contour import (
        marching_squares_sharded)

    rng = np.random.default_rng(5)
    for mesh_shape, (H, W) in (((2, 4), (16, 32)), ((4, 2), (32, 20))):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(mesh_shape),
                    axis_names=("x", "y"))
        yy, xx = np.mgrid[0:H, 0:W]
        f = (np.hypot(yy - H / 2, xx - W / 2) - 0.35 * min(H, W)
             + 0.6 * rng.standard_normal((H, W))).astype(np.float32)

        segs_full, valid = marching_squares_device(jnp.asarray(f))
        want = np.asarray(segs_full)[np.asarray(valid)]

        segs, counts, ovf = marching_squares_sharded(jnp.asarray(f), mesh)
        assert not bool(ovf)
        got = []
        cnp = np.asarray(counts)
        snp = np.asarray(segs)
        for a in range(mesh_shape[0]):
            for b in range(mesh_shape[1]):
                got.append(snp[a, b, :cnp[a, b]])
                assert np.all(snp[a, b, cnp[a, b]:] == 0.0)
        got = np.concatenate(got, axis=0)
        assert got.shape[0] == want.shape[0]

        def canon(s):
            s = np.round(np.asarray(s, np.float64), 4)
            flip = s[:, 0, :].sum(-1) > s[:, 1, :].sum(-1)
            s[flip] = s[flip][:, ::-1, :]
            idx = np.lexsort((s[:, 1, 1], s[:, 1, 0], s[:, 0, 1], s[:, 0, 0]))
            return s[idx]

        np.testing.assert_allclose(canon(got), canon(want), atol=3e-5)

    # overflow is reported, never silent
    _, counts, ovf = marching_squares_sharded(jnp.asarray(f), mesh,
                                              max_segments_per_shard=2)
    assert bool(ovf)


def test_marching_tetrahedra_sharded_matches_device():
    """3D sharded extraction (face/edge/corner halos) reproduces the
    unsharded device extraction's live triangle set in global coordinates
    on a 2x2x2 mesh, including a noisy seam-crossing field."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from field_interpolation_tpu.contour import marching_tetrahedra_device
    from field_interpolation_tpu.parallel.contour import (
        marching_tetrahedra_sharded)

    rng = np.random.default_rng(9)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                axis_names=("x", "y", "z"))
    NI, NJ, NK = 8, 10, 12
    ii, jj, kk = np.mgrid[0:NI, 0:NJ, 0:NK]
    f = (np.sqrt((ii - NI / 2) ** 2 + (jj - NJ / 2) ** 2
                 + (kk - NK / 2) ** 2) - 3.4
         + 0.5 * rng.standard_normal((NI, NJ, NK))).astype(np.float32)

    tris_full, valid = marching_tetrahedra_device(jnp.asarray(f))
    want = np.asarray(tris_full)[np.asarray(valid)]

    tris, counts, ovf = marching_tetrahedra_sharded(jnp.asarray(f), mesh)
    assert not bool(ovf)
    cnp = np.asarray(counts)
    tnp = np.asarray(tris)
    got = []
    for a in range(2):
        for b in range(2):
            for c in range(2):
                got.append(tnp[a, b, c, :cnp[a, b, c]])
                assert np.all(tnp[a, b, c, cnp[a, b, c]:] == 0.0)
    got = np.concatenate(got, axis=0)
    assert got.shape[0] == want.shape[0]

    def canon(t):
        t = np.round(np.asarray(t, np.float64), 4)
        for n in range(t.shape[0]):
            order = np.lexsort((t[n, :, 2], t[n, :, 1], t[n, :, 0]))
            t[n] = t[n][order]
        flat = t.reshape(t.shape[0], -1)
        return t[np.lexsort(flat.T[::-1])]

    np.testing.assert_allclose(canon(got), canon(want), atol=3e-4)

    # overflow reported
    _, _, ovf2 = marching_tetrahedra_sharded(jnp.asarray(f), mesh,
                                             max_triangles_per_shard=3)
    assert bool(ovf2)
