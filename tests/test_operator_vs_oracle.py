"""THE correctness test (SURVEY.md §4, §7 hard-part #1): the matrix-free
normal operator — composite-conv smoothness + densified data stencil — must
equal AᵀA of the explicitly assembled row list on small grids, including the
dropped-row boundary behavior, to float tolerance."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, Weights
from field_interpolation_tpu.explicit import assemble_explicit, normal_equations
from field_interpolation_tpu.operators import assemble as assemble_problem


def _dense_normal_matrix(problem):
    """Materialize the matrix-free operator by applying it to identity."""
    n = problem.grid.num_nodes
    eye = jnp.eye(n, dtype=jnp.float32).reshape((n,) + problem.grid.shape)
    cols = problem.apply(eye)  # batched over leading axis
    return np.asarray(cols.reshape(n, n)).T


def _check(grid, weights, positions, values, gradients=None, pw=None):
    problem = assemble_problem(
        grid, weights,
        jnp.asarray(positions, jnp.float32),
        jnp.asarray(values, jnp.float32),
        None if gradients is None else jnp.asarray(gradients, jnp.float32),
        None if pw is None else jnp.asarray(pw, jnp.float32),
    )
    eq = assemble_explicit(grid, weights, np.asarray(positions),
                           np.asarray(values), gradients, pw)
    AtA, Atb = normal_equations(eq, grid.num_nodes)
    got = _dense_normal_matrix(problem)
    want = AtA.toarray()
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1.0, np.abs(want).max()))
    np.testing.assert_allclose(np.asarray(problem.b).ravel(), Atb,
                               atol=1e-4 * max(1.0, np.abs(Atb).max()))
    # Diagonal closed form matches too (Jacobi correctness).
    np.testing.assert_allclose(np.asarray(problem.diag).ravel(), AtA.diagonal(),
                               atol=1e-4 * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("order_weights", [
    dict(model_0=0.3, model_1=0.0, model_2=0.0, model_3=0.0),
    dict(model_0=0.0, model_1=0.7, model_2=0.0, model_3=0.0),
    dict(model_0=0.0, model_1=0.0, model_2=1.0, model_3=0.0),
    dict(model_0=0.0, model_1=0.0, model_2=0.0, model_3=0.5),
    dict(model_0=0.1, model_1=0.2, model_2=1.0, model_3=0.4),
])
def test_smoothness_only_matches_explicit_2d(order_weights):
    grid = Grid((5, 6))
    weights = Weights(**order_weights)
    _check(grid, weights, np.zeros((1, 2)), np.zeros(1), pw=np.zeros(1))


def test_smoothness_1d_and_3d():
    _check(Grid((9,)), Weights(model_1=0.3, model_2=1.0),
           np.zeros((1, 1)), np.zeros(1), pw=np.zeros(1))
    _check(Grid((4, 5, 3)), Weights(model_2=1.0, model_1=0.1),
           np.zeros((1, 3)), np.zeros(1), pw=np.zeros(1))


def test_value_constraints_match_explicit(rng):
    grid = Grid((5, 5))
    weights = Weights(model_2=0.5, data_pos=1.3)
    pos = rng.uniform(0, 4, size=(30, 2))
    vals = rng.standard_normal(30)
    pw = rng.uniform(0.2, 2.0, size=30)
    _check(grid, weights, pos, vals, pw=pw)


def test_gradient_constraints_match_explicit(rng):
    grid = Grid((6, 5))
    weights = Weights(model_2=1.0, data_pos=1.0, data_gradient=0.8)
    pos = rng.uniform(0, 4, size=(25, 2))
    vals = np.zeros(25)
    grads = rng.standard_normal((25, 2))
    pw = rng.uniform(0.5, 1.5, size=25)
    _check(grid, weights, pos, vals, grads, pw)


def test_3d_full_system(rng):
    grid = Grid((4, 4, 4))
    weights = Weights(model_1=0.2, model_2=1.0, data_pos=1.0, data_gradient=1.0)
    pos = rng.uniform(0, 3, size=(15, 3))
    vals = np.zeros(15)
    grads = rng.standard_normal((15, 3))
    _check(grid, weights, pos, vals, grads)


def test_out_of_bounds_samples_dropped(rng):
    grid = Grid((5, 5))
    weights = Weights(model_2=1.0)
    pos = np.array([[2.0, 2.0], [-1.0, 2.0], [2.0, 7.0]])
    vals = np.array([1.0, 5.0, 5.0])
    _check(grid, weights, pos, vals)


def test_samples_at_domain_edges(rng):
    """Positions exactly on the far boundary (pos == n-1) use the last cell."""
    grid = Grid((5, 5))
    weights = Weights(model_2=1.0)
    pos = np.array([[4.0, 4.0], [0.0, 4.0], [4.0, 0.0], [0.0, 0.0], [4.0, 2.5]])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    _check(grid, weights, pos, vals)


@pytest.mark.slow
def test_randomized_configurations_match_explicit(rng):
    """Property sweep: 8 seeded random configurations (dims 1-3, random
    order-weight mixes, random data weights / point weights / sample mixes
    incl. OOB) — broader than the fixed cases above; any convention drift
    between the vectorized assembly and the oracle shows up here. Each trial
    is a distinct (shape, n) → a fresh jit compile on the 1-core host
    (~6 s/trial), so the trial count is a suite-budget tradeoff."""
    for trial in range(8):
        D = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(5, 12)) for _ in range(D))
        grid = Grid(shape)
        w = Weights(
            model_0=float(rng.uniform(0, 0.5)) * int(rng.integers(0, 2)),
            model_1=float(rng.uniform(0, 1.0)) * int(rng.integers(0, 2)),
            model_2=float(rng.uniform(0, 1.5)) * int(rng.integers(0, 2)),
            model_3=float(rng.uniform(0, 0.5)) * int(rng.integers(0, 2)),
            data_pos=float(rng.uniform(0.2, 2.0)),
            data_gradient=float(rng.uniform(0.2, 2.0)),
        )
        n = int(rng.integers(5, 25))
        pos = rng.uniform(-1.5, np.asarray(shape) + 0.5, size=(n, D))
        vals = rng.standard_normal(n)
        grads = (rng.standard_normal((n, D))
                 if rng.integers(0, 2) else None)
        pw = (rng.uniform(0, 2, n).astype(np.float32)
              if rng.integers(0, 2) else None)
        _check(grid, w, pos.astype(np.float32), vals.astype(np.float32),
               grads if grads is None else grads.astype(np.float32), pw)
