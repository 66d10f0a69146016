"""Differentiable solves via the implicit function theorem.

Beyond the reference's capability surface (it has no autodiff story at all):
since the solution satisfies ``A(coeff) x* = b`` with SPD ``A``, the VJP of
``x*`` needs one ADJOINT SOLVE with the same operator (A is self-adjoint)
instead of differentiating through the CG iterations:

    λ = A⁻¹ x̄            (one more PCG solve)
    b̄ = λ
    coeff̄[o, i] = -λ_i · x*_{i+o}   (the data term is linear in coeff)

``diag`` only enters the preconditioner, which does not change the converged
solution — its gradient is zero. Smoothness weights are static metadata.

This makes whole pipelines end-to-end differentiable: assembly (gather/
scatter of multilinear weights) is ordinary JAX, so gradients flow to sample
positions, values, normals, and per-point weights — e.g. fitting point
weights so the reconstruction matches a target field by gradient descent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import constraints as cons
from .operators import Problem
from .solver import pcg, _make_apply, _make_precond
from .weights import SolverConfig


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _solve_x(coeff: jax.Array, b: jax.Array, diag: jax.Array,
             static: tuple) -> jax.Array:
    grid, weights, config = static
    problem = Problem(coeff=coeff, b=b, diag=diag, grid=grid, weights=weights)
    apply_fn = _make_apply(problem, config)
    x, _ = pcg(apply_fn, b, precond_fn=_make_precond(problem, config, apply_fn),
               tol=config.tol, maxiter=config.maxiter,
               recompute_every=config.recompute_every)
    return x


def _solve_x_fwd(coeff, b, diag, static):
    x = _solve_x(coeff, b, diag, static)
    return x, (coeff, diag, x)


def _solve_x_bwd(static, res, x_bar):
    grid, weights, config = static
    coeff, diag, x = res
    problem = Problem(coeff=coeff, b=x_bar, diag=diag, grid=grid,
                      weights=weights)
    apply_fn = _make_apply(problem, config)
    lam, _ = pcg(apply_fn, x_bar,
                 precond_fn=_make_precond(problem, config, apply_fn),
                 tol=config.tol, maxiter=config.maxiter,
                 recompute_every=config.recompute_every)
    # coeff̄[o, i] = -λ_i · x_{i+o}  (same shifted-read pattern as the apply)
    offsets = cons.offset_list(grid.ndim)
    coeff_bar = jnp.stack(
        [-lam * cons._shift(x, offsets[o_idx], grid.ndim)
         for o_idx in range(offsets.shape[0])], axis=0)
    return coeff_bar, lam, jnp.zeros_like(diag)


_solve_x.defvjp(_solve_x_fwd, _solve_x_bwd)


def solve_implicit(problem: Problem,
                   config: SolverConfig = SolverConfig()) -> jax.Array:
    """Differentiable solve: returns x* only (see module docstring).

    Use inside jax.grad/vmap/jit; for diagnostics use solver.solve."""
    static = (problem.grid, problem.weights, config)
    return _solve_x(problem.coeff, problem.b, problem.diag, static)
