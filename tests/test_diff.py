"""Implicit-differentiation tests: gradients through assemble+solve match
finite differences (this capability has no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, SolverConfig, Weights
from field_interpolation_tpu.diff import solve_implicit
from field_interpolation_tpu.operators import assemble


def _loss_fn(grid, weights, cfg, pos, target):
    def loss(vals, pw):
        p = assemble(grid, weights, pos, vals, point_weights=pw)
        x = solve_implicit(p, cfg)
        return jnp.sum((x - target) ** 2)
    return loss


def test_grad_matches_finite_differences(rng):
    grid = Grid((12, 12))
    weights = Weights(model_2=0.5)
    cfg = SolverConfig(tol=1e-10, maxiter=4000, preconditioner="jacobi")
    n = 15
    pos = jnp.asarray(rng.uniform(1, 10, (n, 2)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal(n), jnp.float32)
    pw = jnp.ones(n, jnp.float32)
    target = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)

    loss = _loss_fn(grid, weights, cfg, pos, target)
    g_vals, g_pw = jax.grad(loss, argnums=(0, 1))(vals, pw)

    eps = 1e-2
    for i in [0, 7, 14]:
        dv = vals.at[i].add(eps)
        dv2 = vals.at[i].add(-eps)
        fd = (loss(dv, pw) - loss(dv2, pw)) / (2 * eps)
        np.testing.assert_allclose(float(g_vals[i]), float(fd), rtol=2e-2)
    for i in [3, 9]:
        dw = pw.at[i].add(eps)
        dw2 = pw.at[i].add(-eps)
        fd = (loss(vals, dw) - loss(vals, dw2)) / (2 * eps)
        np.testing.assert_allclose(float(g_pw[i]), float(fd), rtol=2e-2)


def test_gradient_descent_recovers_values(rng):
    """End-to-end: fit sample values so the solved field matches a target
    reconstruction — the 'inverse interpolation' use case."""
    grid = Grid((10, 10))
    weights = Weights(model_2=0.5)
    cfg = SolverConfig(tol=1e-8, maxiter=2000, preconditioner="jacobi")
    n = 10
    pos = jnp.asarray(rng.uniform(1, 8, (n, 2)), jnp.float32)
    true_vals = jnp.asarray(rng.standard_normal(n), jnp.float32)
    p_true = assemble(grid, weights, pos, true_vals)
    target = solve_implicit(p_true, cfg)

    def loss(vals):
        return jnp.sum((solve_implicit(assemble(grid, weights, pos, vals), cfg)
                        - target) ** 2)

    vals = jnp.zeros(n, jnp.float32)
    g = jax.jit(jax.grad(loss))
    lj = jax.jit(loss)
    l0 = float(lj(vals))
    # Exact line search on the quadratic via a two-point parabola fit
    # (the raw curvature is large; fixed steps diverge).
    for _ in range(40):
        gv = g(vals)
        a0 = float(lj(vals))
        t = 1e-3
        a1 = float(lj(vals - t * gv))
        gg = float(jnp.vdot(gv, gv))
        # q(alpha) = a0 - gg*alpha + c*alpha^2;  q(t) = a1
        c = (a1 - a0 + gg * t) / (t * t)
        alpha = gg / (2 * c) if c > 0 else t
        vals = vals - alpha * gv
    l1 = float(lj(vals))
    assert l1 < 1e-3 * l0, (l0, l1)


def test_grad_through_positions(rng):
    """Gradients flow to sample POSITIONS too (multilinear weights are
    piecewise differentiable)."""
    grid = Grid((10, 10))
    # model_0 pins the biharmonic nullspace (2 points alone leave affine
    # modes free -> near-singular system, garbage gradients).
    weights = Weights(model_0=0.1, model_2=0.5)
    cfg = SolverConfig(tol=1e-8, maxiter=2000, preconditioner="jacobi")
    pos = jnp.asarray([[3.3, 4.6], [6.2, 2.7]], jnp.float32)
    vals = jnp.asarray([1.0, -1.0], jnp.float32)

    def loss(pos):
        p = assemble(grid, weights, pos, vals)
        return jnp.sum(solve_implicit(p, cfg) ** 2)

    g = jax.grad(loss)(pos)
    assert g.shape == (2, 2)
    eps = 1e-2
    dp = pos.at[0, 0].add(eps)
    dm = pos.at[0, 0].add(-eps)
    fd = (loss(dp) - loss(dm)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=5e-2)
