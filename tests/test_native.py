"""Native C++ engine tests: same rows, same solutions as the Python oracle
(the two implement SPEC.md independently — C++ in native/, NumPy in
explicit.py — so agreement cross-checks both)."""

import numpy as np
import pytest
import scipy.sparse

from field_interpolation_tpu import Grid, Weights
from field_interpolation_tpu.explicit import (
    assemble_explicit,
    normal_equations,
    solve_sparse_linear,
)
from field_interpolation_tpu import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


def _explicit_matrix(eq, ncols):
    A, b = eq.to_scipy(ncols)
    return A.toarray(), b


def _native_matrix(neq, ncols):
    rows, cols, vals, rhs = neq.export_rows()
    A = scipy.sparse.csr_matrix((vals, (rows, cols)),
                                shape=(neq.num_rows, ncols)).toarray()
    return A, rhs


def test_rows_match_python_oracle(rng):
    grid = Grid((6, 5))
    weights = Weights(model_0=0.1, model_1=0.2, model_2=1.0, model_3=0.4,
                      data_pos=1.1, data_gradient=0.9)
    pos = rng.uniform(0, 4, size=(20, 2))
    vals = rng.standard_normal(20)
    grads = rng.standard_normal((20, 2))
    pw = rng.uniform(0.5, 1.5, size=20)

    eq = assemble_explicit(grid, weights, pos, vals, grads, pw)
    A_py, b_py = _explicit_matrix(eq, grid.num_nodes)

    neq = native.NativeEquation(grid)
    neq.add_field_constraints(weights)
    neq.add_value_constraints(pos, vals, weights.data_pos * pw)
    neq.add_gradient_constraints(pos, grads, weights.data_gradient * pw)
    A_n, b_n = _native_matrix(neq, grid.num_nodes)

    # Row ORDER differs (native batches value rows then gradient rows; the
    # oracle interleaves per sample) — compare the order-invariant normal
    # equations plus the row count.
    assert A_n.shape == A_py.shape
    np.testing.assert_allclose(A_n.T @ A_n, A_py.T @ A_py, atol=1e-10)
    np.testing.assert_allclose(A_n.T @ b_n, A_py.T @ b_py, atol=1e-10)


def test_native_solve_matches_scipy(rng):
    grid = Grid((16, 16))
    weights = Weights(model_1=0.1, model_2=1.0)
    pos = rng.uniform(0, 15, size=(50, 2))
    vals = rng.standard_normal(50)

    eq = assemble_explicit(grid, weights, pos, vals)
    x_scipy = solve_sparse_linear(grid.num_nodes, eq)

    neq = native.NativeEquation(grid)
    neq.add_field_constraints(weights)
    neq.add_value_constraints(pos, vals, weights.data_pos * np.ones(50))
    x_native, iters = neq.solve(tol=1e-12)
    assert iters > 0
    np.testing.assert_allclose(x_native.ravel(), x_scipy,
                               atol=1e-6 * np.abs(x_scipy).max())


def test_native_sdf_one_call(rng):
    grid = Grid((24, 24))
    weights = Weights(model_2=0.3)
    theta = rng.uniform(0, 2 * np.pi, 80)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1)
    pts = 11.5 + 7.0 * nrm
    x, iters = native.sdf_from_points_native(grid, weights, pts, nrm)
    assert iters > 0
    # zero level set near radius 7
    row = x[12]
    crossings = np.sum(np.diff(np.sign(row)) != 0)
    assert crossings == 2


def test_native_3d_and_warm_start(rng):
    grid = Grid((8, 8, 8))
    weights = Weights(model_2=0.5)
    pos = rng.uniform(0, 7, size=(30, 3))
    vals = rng.standard_normal(30)
    neq = native.NativeEquation(grid)
    neq.add_field_constraints(weights)
    neq.add_value_constraints(pos, vals, np.ones(30))
    x, it_cold = neq.solve(tol=1e-10)
    x2, it_warm = neq.solve(tol=1e-10, x0=x.ravel())
    assert it_warm < it_cold
    np.testing.assert_allclose(x2, x, atol=1e-8 * np.abs(x).max())


def test_native_out_of_bounds_dropped(rng):
    grid = Grid((10, 10))
    weights = Weights(model_2=1.0)
    neq = native.NativeEquation(grid)
    neq.add_value_constraints(np.array([[5.0, 5.0], [-1.0, 5.0], [5.0, 99.0]]),
                              np.ones(3), np.ones(3))
    assert neq.num_rows == 1


def test_randomized_native_matches_oracle(rng):
    """Random-config sweep for the C++ engine, mirroring the JAX-vs-oracle
    sweep in test_operator_vs_oracle: any convention drift between the
    THREE implementations (SPEC.md contract) must surface in one of the
    two pairwise sweeps."""
    if not native.is_available():
        import pytest
        pytest.skip("native engine unavailable")
    for trial in range(10):
        D = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(4, 9)) for _ in range(D))
        grid = Grid(shape)
        weights = Weights(
            model_0=float(rng.uniform(0, 0.5)) * int(rng.integers(0, 2)),
            model_1=float(rng.uniform(0, 1.0)) * int(rng.integers(0, 2)),
            model_2=float(rng.uniform(0, 1.5)) * int(rng.integers(0, 2)),
            model_3=float(rng.uniform(0, 0.5)) * int(rng.integers(0, 2)),
            data_pos=float(rng.uniform(0.2, 2.0)),
            data_gradient=float(rng.uniform(0.2, 2.0)),
        )
        n = int(rng.integers(4, 20))
        pos = rng.uniform(-1.0, np.asarray(shape) + 0.5, size=(n, D))
        vals = rng.standard_normal(n)
        grads = rng.standard_normal((n, D)) if rng.integers(0, 2) else None
        pw = (rng.uniform(0.5, 1.5, n) if rng.integers(0, 2)
              else np.ones(n))

        eq = assemble_explicit(grid, weights, pos, vals, grads, pw)
        A_py, b_py = _explicit_matrix(eq, grid.num_nodes)

        neq = native.NativeEquation(grid)
        neq.add_field_constraints(weights)
        neq.add_value_constraints(pos, vals, weights.data_pos * pw)
        if grads is not None:
            neq.add_gradient_constraints(pos, grads,
                                         weights.data_gradient * pw)
        A_n, b_n = _native_matrix(neq, grid.num_nodes)
        np.testing.assert_allclose(A_n.T @ A_n, A_py.T @ A_py, atol=1e-9,
                                   err_msg=f"trial {trial} {shape}")
        np.testing.assert_allclose(A_n.T @ b_n, A_py.T @ b_py, atol=1e-9,
                                   err_msg=f"trial {trial} {shape}")


def test_native_approximate_lattice_matches_oracle(rng):
    """Reference C9 in the C++ engine: the native approximate coarse-lattice
    solve equals the Python oracle (explicit.solve_sparse_linear_
    approximate_lattice) — same coarse assembly conventions (position
    scaling, per-unit-length gradient rescale), same endpoint-aligned
    multilinear upsample. 2D and 3D, with and without gradients."""
    if not native.is_available():
        import pytest
        pytest.skip("native engine unavailable")
    from field_interpolation_tpu.explicit import (
        solve_sparse_linear_approximate_lattice)
    from field_interpolation_tpu.native import solve_approximate_lattice_native

    for shape, downscale in [((17, 13), 2), ((9, 8, 7), 2), ((21, 21), 4)]:
        D = len(shape)
        grid = Grid(shape)
        weights = Weights(model_2=0.3, data_pos=1.0, data_gradient=0.7)
        n = 25
        pos = rng.uniform(0.0, np.asarray(shape) - 1.001, size=(n, D))
        vals = rng.standard_normal(n)
        for grads in (None, rng.standard_normal((n, D))):
            x_py = solve_sparse_linear_approximate_lattice(
                grid, weights, pos, vals, grads, downscale=downscale
            ).reshape(shape)
            x_n, it = solve_approximate_lattice_native(
                grid, weights, pos, vals, grads, downscale=downscale,
                tol=1e-12)
            assert it >= 0
            scale = max(1.0, float(np.max(np.abs(x_py))))
            np.testing.assert_allclose(x_n, x_py, atol=2e-6 * scale,
                                       err_msg=f"{shape} grads={grads is not None}")
