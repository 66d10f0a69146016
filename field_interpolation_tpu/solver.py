"""Matrix-free preconditioned conjugate gradients.

Replaces the reference's Eigen normal-equations factorization and its
warm-start / approximate-lattice variants (SURVEY.md §2 C7–C9):

* `solve` — jitted PCG on ``A x = b`` with fp32 iterates; relative-residual
  stopping with periodic true-residual recomputation to cancel recurrence
  drift (the fp32/“fp64-equivalent check” strategy, `BASELINE.json:5`).
* warm start — pass ``x0`` (reference `solve_sparse_linear_with_guess`).
* preconditioners — identity, Jacobi (closed-form diag), or geometric
  multigrid V-cycle (multigrid.py; generalizes the reference's coarse-lattice
  approximate solve).

Everything is a single `lax.while_loop` under jit: no data-dependent Python
control flow, shapes static, safe under `vmap` (the while batching rule masks
finished lanes) — SURVEY.md §7 PR3.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .operators import Problem
from .weights import SolverConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveInfo:
    iterations: jax.Array     # int32
    rel_residual: jax.Array   # float32, ||b - Ax|| / ||b|| at exit
    converged: jax.Array      # bool


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision dot over all elements. Elementwise multiply + reduce
    stays on the VPU in true fp32 (jnp.vdot would lower to an MXU dot whose
    TPU default precision is bf16 — fatal for 1e-6 convergence). XLA's tree
    reduction keeps accumulation error ~eps·log(n), adequate with the
    periodic true-residual refresh."""
    return jnp.sum(a * b)


def pcg(
    apply_fn: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    precond_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    *,
    tol: float = 1e-6,
    maxiter: int = 2000,
    recompute_every: int = 50,
    max_restarts: int = 8,
    dot_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Preconditioned CG on an SPD operator. Returns (x, SolveInfo).

    The stopping rule is SAFEGUARDED: the fast in-loop check uses the cheap
    recurrence residual, but every candidate exit is verified against a fresh
    true residual ``b − Ax``; if fp32 recurrence drift left the true residual
    above tol, CG restarts from the verified residual and keeps iterating
    (at most ``max_restarts`` segments, sharing one global ``maxiter``
    budget). The ``converged`` flag is therefore always backed by a true
    residual at most ``tol``·‖b‖ — the honest exit the 4096²-class grids
    need, at the cost of one extra operator apply per segment (the final
    verification apply every exit already paid).

    ``dot_fn`` overrides the inner product — the sharded path passes a
    psum-reduced dot so each shard_map block sees globally consistent
    scalars (SURVEY.md §5: the CG inner products are the only global syncs
    per iteration).
    """
    if precond_fn is None:
        precond_fn = lambda r: r
    dot = _dot if dot_fn is None else dot_fn
    x = jnp.zeros_like(b) if x0 is None else x0

    b_norm2 = dot(b, b)
    # Guard all-zero rhs: declare converged immediately with x = x0.
    tol2 = tol * tol * jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny)

    def inner_cond(state):
        _, r, _, _, k, done = state
        return jnp.logical_not(done) & (k < maxiter)

    def inner_body(state):
        x, r, p, rz, k, _ = state
        Ap = apply_fn(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / pAp, 0.0)
        x = x + alpha * p
        # Optional periodic true-residual recomputation (off by default: on
        # TPU the in-loop lax.cond pays for both branches every iteration;
        # the restart safeguard below handles drift off the hot path).
        if recompute_every > 0:
            refresh = (k + 1) % recompute_every == 0
            r = lax.cond(refresh,
                         lambda _: b - apply_fn(x),
                         lambda r_: r_ - alpha * Ap,
                         r)
        else:
            r = r - alpha * Ap
        z = precond_fn(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = z + beta * p
        done = dot(r, r) <= tol2
        return x, r, p, rz_new, k + 1, done

    def outer_cond(state):
        _, r, k, segments, progressed = state
        return ((dot(r, r) > tol2) & (k < maxiter)
                & (segments < max_restarts) & progressed)

    def outer_body(state):
        x, r, k, segments, _ = state
        # ``r`` is a verified true residual: start a CG segment from it.
        z = precond_fn(r)
        x, _, _, _, k_new, _ = lax.while_loop(
            inner_cond, inner_body,
            (x, r, z, dot(r, z), k, jnp.bool_(False)))
        r = b - apply_fn(x)  # verify the recurrence exit
        return x, r, k_new, segments + 1, k_new > k

    r0 = b - apply_fn(x)
    x, r, k, _, _ = lax.while_loop(
        outer_cond, outer_body,
        (x, r0, jnp.int32(0), jnp.int32(0), jnp.bool_(True)))
    rr = dot(r, r)
    rel = jnp.sqrt(rr / jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny))
    # ``r`` is always a TRUE residual here, so the flag needs no slack.
    converged = rr <= tol2
    return x, SolveInfo(iterations=k, rel_residual=rel, converged=converged)


def _wdepth(config, fine_shape) -> int:
    """Doubled-transition count for the W-cycle (0 = plain V); resolves
    mg_cycle="auto" by VMEM regime — see multigrid.resolve_wdepth."""
    from .multigrid import resolve_wdepth
    return resolve_wdepth(config, fine_shape)


def _pcg_fused(ops, b: jax.Array, x0: Optional[jax.Array], *, tol, maxiter,
               max_restarts, nu, interpret,
               wdepth=0, chunk=1) -> tuple[jax.Array, SolveInfo]:
    """Fully-fused 2D multigrid-PCG: each safeguard SEGMENT (V-cycle, then a
    while-loop of complete CG iterations) runs inside ONE Pallas kernel
    (ops.pallas_stencil.fused_pcg_solve) with all state VMEM-resident; the
    outer loop verifies each exit against a fresh true residual and restarts
    on fp32 recurrence drift — the same safeguarded stopping rule as `pcg`.
    ``ops`` comes from multigrid.build_fused_solver_operands."""
    from .ops.pallas_stencil import fused_normal_apply, fused_pcg_solve
    coeffs, sids, Rs, inv32, lw, cfs = ops
    weights = lw[0]

    def apply_f(v):
        return fused_normal_apply(v, coeffs[0], weights, 2,
                                  interpret=interpret)

    b_norm2 = _dot(b, b)
    tol2 = tol * tol * jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny)
    tol2_s = jnp.reshape(tol2.astype(jnp.float32), (1, 1))

    def outer_cond(state):
        _, r, k, segments, progressed = state
        return ((_dot(r, r) > tol2) & (k < maxiter)
                & (segments < max_restarts) & progressed)

    def outer_body(state):
        x, r, k, segments, _ = state
        budget = jnp.reshape((jnp.int32(maxiter) - k), (1, 1))
        x, iters, _ = fused_pcg_solve(x, r, tol2_s, budget, coeffs, sids,
                                      Rs, inv32, lw, nu, interpret,
                                      cheb_coefs=cfs, wdepth=wdepth,
                                      chunk=chunk)
        k_new = k + iters[0, 0]
        r = b - apply_f(x)  # verify the recurrence exit (see pcg)
        return x, r, k_new, segments + 1, iters[0, 0] > 0

    if x0 is None:
        x, r0 = jnp.zeros_like(b), b  # r(0) = b exactly: skip one apply
    else:
        x, r0 = x0, b - apply_f(x0)
    x, r, k, _, _ = lax.while_loop(
        outer_cond, outer_body,
        (x, r0, jnp.int32(0), jnp.int32(0), jnp.bool_(True)))
    rr = _dot(r, r)
    rel = jnp.sqrt(rr / jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny))
    return x, SolveInfo(iterations=k, rel_residual=rel, converged=rr <= tol2)


def _fused_solver_ops(problem: Problem, config: SolverConfig, prep=None):
    """(ops, interpret) for the fully-fused PCG path, or (None, _) when the
    problem/config/backend rules it out. ``prep`` (solver.prepare) supplies
    prebuilt operands as jit inputs."""
    if config.backend == "xla" or config.preconditioner != "multigrid":
        return None, False
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if not (on_tpu or config.backend == "pallas"):
        return None, False
    from .multigrid import build_fused_solver_operands
    ops = build_fused_solver_operands(problem, config, prep)
    return ops, not on_tpu


def _make_apply(problem: Problem, config: SolverConfig):
    """Resolve the fp32 operator-apply backend (config.backend): whole-array
    fused Pallas kernel when the problem fits VMEM, striped kernel when axis
    0 tiles evenly, XLA shifts otherwise."""
    if config.backend == "xla":
        return problem.apply
    from .ops import pallas_stencil as ps
    from .stencils import max_stencil_radius
    whole = ps.fits_vmem(problem.grid.shape)
    radius = max(max_stencil_radius(problem.weights), 1)
    stripe = None if whole else ps.pick_stripe(problem.grid.shape, radius)
    tiles2 = (None if (whole or stripe is not None or problem.grid.ndim != 3)
              else ps.pick_stripe2_3d(problem.grid.shape))
    if not whole and stripe is None and tiles2 is None:
        return problem.apply
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if config.backend == "auto" and not on_tpu:
        return problem.apply
    interpret = not on_tpu  # "pallas" off-TPU: interpret mode (tests)
    weights, nd = problem.weights, problem.grid.ndim
    coeff = problem.coeff

    def apply_fn(x):
        if x.dtype != jnp.float32:
            return problem.apply(x)  # f64 outer path stays on XLA
        c32 = coeff.astype(jnp.float32)
        if whole:
            return ps.fused_normal_apply(x, c32, weights, nd,
                                         interpret=interpret)
        if stripe is not None:
            return ps.fused_normal_apply_striped(x, c32, weights, nd, stripe,
                                                 interpret=interpret)
        return ps.fused_normal_apply_striped2_3d(x, c32, weights, tiles2,
                                                 interpret=interpret)

    return apply_fn


def _make_precond(problem: Problem, config: SolverConfig, apply_fn=None,
                  prep=None):
    if config.preconditioner == "none":
        return None
    if config.preconditioner == "jacobi":
        inv_diag = jnp.where(problem.diag > 0, 1.0 / problem.diag, 1.0)
        return lambda r: inv_diag * r
    if config.preconditioner == "multigrid":
        from .multigrid import make_vcycle_preconditioner
        pallas_smooth = False
        pallas_interpret = False
        if config.backend != "xla" and problem.diag.dtype == jnp.float32:
            platform = jax.devices()[0].platform
            on_tpu = platform in ("tpu", "axon")
            pallas_smooth = on_tpu or config.backend == "pallas"
            pallas_interpret = not on_tpu
        return make_vcycle_preconditioner(problem, config, apply_fn=apply_fn,
                                          pallas_smooth=pallas_smooth,
                                          pallas_interpret=pallas_interpret,
                                          prep=prep)
    raise ValueError(f"unknown preconditioner {config.preconditioner!r}")


def _check_prep(problem: Problem, config: SolverConfig, prep) -> None:
    """Trace-time staleness check for a prepared setup: a prep built for a
    different geometry, weights, or MG config raises instead of silently
    preconditioning with the wrong hierarchy (all compared fields are
    static pytree metadata, so this costs nothing at run time)."""
    if prep is None:
        return
    from .multigrid import setup_signature
    if prep.shape != problem.grid.shape:
        raise ValueError(
            f"prep was built for grid {prep.shape}, problem has "
            f"{problem.grid.shape} — rebuild with solver.prepare")
    if prep.weights != problem.weights:
        raise ValueError(
            "prep was built for different Weights — the data/smoothness "
            "operator changed; rebuild with solver.prepare")
    if prep.sig != setup_signature(config):
        raise ValueError(
            "prep was built under a different solver/multigrid config "
            "(see multigrid.setup_signature) — rebuild with solver.prepare")


def prepare(problem: Problem, config: SolverConfig = SolverConfig()):
    """Precompute the reusable solver setup for repeated solves on a FIXED
    operator (positions/weights unchanged; values/targets — i.e. ``b`` —
    may change freely): the multigrid hierarchy, Gershgorin smoothing
    steps, dense-coarsest factor, and fused-kernel operands. Pass the
    result to ``solve(problem, config, prep=...)`` / ``solve_refined`` —
    each solve then receives the setup as jit inputs instead of
    recomputing ~0.2 ms of it per call (256², v5e; the interactive
    re-solve pattern of the reference GUI, SURVEY.md §3.2).

    Returns None for non-multigrid configs (nothing worth reusing).
    Staleness is caught at trace time (_check_prep); for a driver-level
    loop that also reuses the ASSEMBLY geometry, see session.Solver."""
    if config.preconditioner != "multigrid":
        return None
    platform = jax.devices()[0].platform
    want_fused = config.backend != "xla" and (
        platform in ("tpu", "axon") or config.backend == "pallas")
    p32 = problem.p32 if hasattr(problem, "p32") else problem
    return _prepare_impl(p32, config, want_fused)


@functools.partial(jax.jit, static_argnames=("config", "want_fused"))
def _prepare_impl(problem: Problem, config: SolverConfig, want_fused: bool):
    from .multigrid import prepare_mg
    return prepare_mg(problem, config, want_fused)


@functools.partial(jax.jit, static_argnames=("config",))
def solve(
    problem: Problem,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    prep=None,
) -> tuple[jax.Array, SolveInfo]:
    """Solve the assembled problem; the reference's `solve_sparse_linear`
    (+`_with_guess` via ``x0``) equivalent (SURVEY.md §2 C7/C8).
    ``prep`` — a prepared setup from ``prepare`` (same operator/config):
    repeated solves then skip the per-solve multigrid setup."""
    _check_prep(problem, config, prep)
    fused_ops, fused_interpret = _fused_solver_ops(problem, config, prep)
    if fused_ops is not None:
        return _pcg_fused(fused_ops, problem.b, x0, tol=config.tol,
                          maxiter=config.maxiter,
                          max_restarts=config.max_restarts,
                          nu=config.mg_pre_smooth, interpret=fused_interpret,
                          wdepth=_wdepth(config, problem.grid.shape),
                          chunk=config.pcg_chunk)
    apply_fn = _make_apply(problem, config)
    return pcg(
        apply_fn,
        problem.b,
        x0=x0,
        precond_fn=_make_precond(problem, config, apply_fn, prep),
        tol=config.tol,
        maxiter=config.maxiter,
        recompute_every=config.recompute_every,
        max_restarts=config.max_restarts,
    )


def _downcast_problem(p64: Problem) -> Problem:
    return dataclasses.replace(
        p64,
        coeff=p64.coeff.astype(jnp.float32),
        b=p64.b.astype(jnp.float32),
        diag=p64.diag.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _solve_refined_impl(p64, config: SolverConfig,
                        x0: Optional[jax.Array],
                        prep=None) -> tuple[jax.Array, SolveInfo]:
    # Accept either a float64-assembled Problem (legacy) or the matter-free
    # PreciseProblem (sdf.assemble_precise) whose f64 data term stays in
    # per-sample form — much cheaper under f64 emulation on TPU. Precision
    # protocol: ONE exact-f64-scatter residual evaluation after round 1
    # (residual64), then incremental updates r ← r − A·d_k whose hi/lo
    # fp32-matmul scatter error scales with the shrinking corrections
    # (apply64_delta) — see the PreciseProblem docstrings.
    if hasattr(p64, "residual64"):
        p32 = p64.p32
        residual64 = p64.residual64
        apply_delta = p64.apply64_delta
        b64 = p64.b64
    else:
        p32 = _downcast_problem(p64)
        residual64 = lambda x: p64.b - p64.apply(x)
        apply_delta = p64.apply
        b64 = p64.b
    _check_prep(p32, config, prep)
    fused_ops, fused_interpret = _fused_solver_ops(p32, config, prep)
    if fused_ops is None:
        apply32 = _make_apply(p32, config)
        precond = _make_precond(p32, config, apply32, prep)
    bnorm2 = jnp.maximum(_dot(b64, b64), jnp.finfo(jnp.float64).tiny)
    tol2 = config.tol * config.tol * bnorm2
    # fp32 inner solves stagnate around ~1e-4 relative (rounding floor).
    floor = max(config.tol, 1e-4)

    if x0 is None:
        x = jnp.zeros_like(b64)
        r = b64  # skip one f64-emulated apply: r(0) = b
        rr = bnorm2
    else:
        x = x0.astype(jnp.float64)
        r = residual64(x)
        rr = _dot(r, r)

    def inner(r, inner_tol):
        # Each round only needs to shrink the CURRENT residual down to the
        # final target — e.g. from 1e-4·||b|| a 1e-2 inner reduction suffices
        # for 1e-6 overall. Solving every round to the fp32 floor wastes
        # ~40% of the iterations. max_restarts=1: the f64 outer loop IS the
        # verification layer here; fp32-verifying each inner exit would pay
        # an apply for a residual the next f64 round recomputes anyway.
        if fused_ops is not None:
            return _pcg_fused(fused_ops, r.astype(jnp.float32), None,
                              tol=inner_tol, maxiter=config.maxiter,
                              max_restarts=1, nu=config.mg_pre_smooth,
                              interpret=fused_interpret,
                              wdepth=_wdepth(config, p32.grid.shape),
                              chunk=config.pcg_chunk)
        return pcg(apply32, r.astype(jnp.float32),
                   precond_fn=precond, tol=inner_tol,
                   maxiter=config.maxiter,
                   recompute_every=config.recompute_every,
                   max_restarts=1)

    # Round 1 (peeled): the big step from (near) zero, followed by the ONE
    # exact-scatter residual evaluation of the solve. ⟨r,r⟩ is carried
    # through the loop state so each round pays exactly one f64 dot.
    rel0 = jnp.sqrt(rr / bnorm2)
    inner_tol0 = jnp.clip(0.5 * config.tol / rel0, floor, 0.5
                          ).astype(jnp.float32)
    d32, info0 = inner(r, inner_tol0)
    x = x + d32.astype(jnp.float64)
    r = residual64(x)
    rr = _dot(r, r)

    def cond(state):
        _, _, rr, k, iters = state
        return (rr > tol2) & (k < config.refine_rounds)

    def body(state):
        x, r, rr, k, iters = state
        rel = jnp.sqrt(rr / bnorm2)
        inner_tol = jnp.clip(0.5 * config.tol / rel, floor, 0.5
                             ).astype(jnp.float32)
        d32, info = inner(r, inner_tol)
        d64 = d32.astype(jnp.float64)
        x = x + d64
        r = r - apply_delta(d64)  # incremental: scatter error ∝ ‖d‖
        return x, r, _dot(r, r), k + 1, iters + info.iterations

    x, r, rr, k, iters = lax.while_loop(
        cond, body, (x, r, rr, jnp.int32(1), info0.iterations))
    rel = jnp.sqrt(rr / bnorm2)
    return x, SolveInfo(iterations=iters, rel_residual=rel.astype(jnp.float32),
                        converged=rel <= config.tol)


def solve_refined(
    problem64: Problem,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
    prep=None,
) -> tuple[jax.Array, SolveInfo]:
    """Mixed-precision solve to a TRUE ≤`tol` relative residual.

    A plain fp32 solve bottoms out near 1e-4 relative residual, and even the
    exactly-rounded fp32 solution of a 256²-class problem sits above 1e-6
    (measured repr floor ≈ 2e-6) — so honest 1e-6 (`BASELINE.json:5`) requires
    extended precision in exactly three places: the assembled operator/RHS,
    the accumulated solution, and the outer residual. This driver keeps those
    in float64 (software-emulated on TPU, off the hot path) and runs all CG
    iterations in fast fp32 — classic mixed-precision iterative refinement.

    ``problem64`` is a PreciseProblem from ``sdf.assemble_precise`` (fp32
    fast path + matter-free float64 system), or — legacy — a Problem whose
    leaves were assembled in float64.
    """
    with jax.enable_x64():
        return _solve_refined_impl(problem64, config, x0, prep)
