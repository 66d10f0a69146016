"""In-jit debug mode (SURVEY.md §5 sanitizers row, VERDICT r1 item 8):
`SolverConfig(debug=True)` must surface poisoned inputs as checkify errors
instead of silent NaN fields — and stay silent on healthy inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, SolverConfig, Weights, interpolate, sdf_from_points


def _cloud(rng, n, grid):
    center = (np.asarray(grid.shape) - 1.0) / 2.0
    theta = rng.uniform(0, 2 * np.pi, n)
    normals = np.stack([np.cos(theta), np.sin(theta)], axis=-1)
    pts = center + 0.3 * min(grid.shape) * normals
    return pts.astype(np.float32), normals.astype(np.float32)


DBG = SolverConfig(tol=1e-4, preconditioner="jacobi", maxiter=3000, debug=True)


def test_debug_clean_inputs_pass(rng):
    grid = Grid((16, 16))
    pts, nrm = _cloud(rng, 30, grid)
    x, info = sdf_from_points(grid, Weights(model_2=0.3), jnp.asarray(pts),
                              jnp.asarray(nrm), config=DBG)
    assert bool(info.converged)
    assert np.all(np.isfinite(np.asarray(x)))


def test_debug_nan_position_raises(rng):
    grid = Grid((16, 16))
    pts, nrm = _cloud(rng, 30, grid)
    pts[3, 0] = np.nan
    with pytest.raises(Exception, match="non-finite sample position"):
        sdf_from_points(grid, Weights(model_2=0.3), jnp.asarray(pts),
                        jnp.asarray(nrm), config=DBG)


def test_debug_nan_weight_raises(rng):
    """Production mode would propagate a NaN point weight into a silent NaN
    field (in-bounds NaN weight × finite rows); debug mode must raise."""
    grid = Grid((16, 16))
    pts, nrm = _cloud(rng, 30, grid)
    pw = np.ones(30, np.float32)
    pw[7] = np.nan
    with pytest.raises(Exception, match="non-finite point weight"):
        sdf_from_points(grid, Weights(model_2=0.3), jnp.asarray(pts),
                        jnp.asarray(nrm), point_weights=jnp.asarray(pw),
                        config=DBG)


def test_debug_out_of_bounds_raises(rng):
    grid = Grid((16, 16))
    pts, nrm = _cloud(rng, 30, grid)
    pts[0] = (40.0, 2.0)  # outside the 16x16 lattice
    with pytest.raises(Exception, match="outside the lattice"):
        sdf_from_points(grid, Weights(model_2=0.3), jnp.asarray(pts),
                        jnp.asarray(nrm), config=DBG)


def test_debug_interpolate_nan_value_raises(rng):
    grid = Grid((12, 12))
    pos = jnp.asarray(rng.uniform(0, 11, (20, 2)), jnp.float32)
    vals = np.asarray(rng.standard_normal(20), np.float32)
    vals[5] = np.inf
    with pytest.raises(Exception, match="non-finite sample value"):
        interpolate(grid, Weights(model_2=1.0), pos, jnp.asarray(vals),
                    config=DBG)
