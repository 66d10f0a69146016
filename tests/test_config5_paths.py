"""CPU-size regression tests for the BASELINE config-5 code paths
(VERDICT r2 items 2-3): the 3D two-axis striped apply driving a full solve,
and the mixed-precision refined solve on a beyond-VMEM 2D grid (striped
fine kernels inside the refinement loop). Shapes are chosen so the SAME
backend-selection logic the 256³ / 4096² bench configs hit picks the same
kernels here (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import field_interpolation_tpu as fi
from field_interpolation_tpu.ops import pallas_stencil as ps

pytestmark = pytest.mark.slow  # interpret-mode Pallas solves (quick: -m 'not slow')


def _sphere_cloud(rng, n, shape, radius_frac=0.35):
    c = (np.asarray(shape, np.float64) - 1.0) / 2.0
    u = rng.standard_normal((n, len(shape)))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = c + radius_frac * min(shape) * u
    return pts.astype(np.float32), u.astype(np.float32)


def test_solve_through_two_axis_striped_3d():
    """A 3D shape where _make_apply's selection (whole → single-stripe →
    two-axis) lands on pick_stripe2_3d — the same routing the 256³ bench
    config takes — must solve and match the XLA backend."""
    rng = np.random.default_rng(0)
    shape = (16, 192, 128)
    grid = fi.Grid(shape)
    assert not ps.fits_vmem(shape)
    assert ps.pick_stripe(shape, 2) is None
    assert ps.pick_stripe2_3d(shape) is not None
    pts, nrm = _sphere_cloud(rng, 400, shape)
    w = fi.Weights(model_2=0.3)
    cfg_x = fi.SolverConfig(tol=1e-3, preconditioner="multigrid",
                            backend="xla")
    x_ref, info_ref = fi.sdf_from_points(grid, w, jnp.asarray(pts),
                                         jnp.asarray(nrm), config=cfg_x)
    cfg_p = fi.SolverConfig(tol=1e-3, preconditioner="multigrid",
                            backend="pallas")
    x_p, info_p = fi.sdf_from_points(grid, w, jnp.asarray(pts),
                                     jnp.asarray(nrm), config=cfg_p)
    assert bool(info_p.converged)
    scale = float(jnp.max(jnp.abs(x_ref)))
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=0, atol=2e-2 * scale)


def test_refined_true_1e6_two_axis_striped_3d():
    """The 3D half of config 5 at the HONEST bar (VERDICT r3 item 3): a 3D
    shape routed through pick_stripe2_3d (same selection the 256³ bench
    config hits) solved by sdf_from_points_precise — the fp32 inner solves
    run the two-axis striped kernels inside the refinement loop, and the
    reported residual must be TRUE f64 ≤1e-6."""
    rng = np.random.default_rng(2)
    shape = (16, 192, 128)
    grid = fi.Grid(shape)
    assert not ps.fits_vmem(shape)
    assert ps.pick_stripe(shape, 2) is None
    assert ps.pick_stripe2_3d(shape) is not None
    pts, nrm = _sphere_cloud(rng, 400, shape)
    w = fi.Weights(model_2=0.3)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid",
                          backend="pallas")
    from field_interpolation_tpu.sdf import assemble_precise
    from field_interpolation_tpu.solver import solve_refined
    pp = assemble_precise(grid, w, jnp.asarray(pts),
                          jnp.zeros(pts.shape[0], jnp.float32),
                          gradients=jnp.asarray(nrm))
    x, info = solve_refined(pp, cfg)
    assert bool(info.converged), (int(info.iterations),
                                  float(info.rel_residual))
    with jax.enable_x64():
        r = pp.residual64(x)
        rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
    assert rel <= 1.1e-6, rel


def test_refined_true_1e6_beyond_vmem_striped():
    """solve_refined on a grid past the whole-VMEM gate: the fp32 inner
    solves must run through the STRIPED fused kernel (the 4096² bench
    config's fine-apply routing) and the reported residual must be a TRUE
    f64 ≤1e-6 (VERDICT r2 item 3)."""
    rng = np.random.default_rng(1)
    shape = (4096, 64)
    grid = fi.Grid(shape)
    assert not ps.fits_vmem(shape)
    assert ps.pick_stripe(shape, 2) is not None
    pts, nrm = _sphere_cloud(rng, 600, (64, 64))
    # stretch the cloud onto the tall grid
    pts = pts * np.asarray([63.0, 1.0], np.float32)
    pts[:, 0] = np.clip(pts[:, 0], 0, shape[0] - 1)
    w = fi.Weights(model_2=0.3)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid",
                          backend="pallas")
    from field_interpolation_tpu.sdf import assemble_precise
    from field_interpolation_tpu.solver import solve_refined
    pp = assemble_precise(grid, w, jnp.asarray(pts),
                          jnp.zeros(pts.shape[0], jnp.float32),
                          gradients=jnp.asarray(nrm))
    x, info = solve_refined(pp, cfg)
    assert bool(info.converged), (int(info.iterations),
                                  float(info.rel_residual))
    with jax.enable_x64():
        r = pp.residual64(x)
        rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
    assert rel <= 1.1e-6, rel
