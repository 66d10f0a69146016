"""Spatially-sharded solves: one large grid block-decomposed over the TPU mesh.

The reference cannot scale past one core (dense vector + Cholesky,
SURVEY.md §5 "long-context" row); the TPU-native scaling axis is domain
decomposition (`BASELINE.json:11` — "Sharded 2D 4096² / 3D 256³ across v5p-8
with halo exchange over ICI"):

* Grid dim ``d`` is sharded over mesh axis ``mesh.axis_names[d]``; each device
  owns one contiguous block of the lattice (plus the `coeff`/`b`/`diag`
  leaves, co-sharded).
* The whole PCG loop runs inside one `shard_map`. Per iteration:
  - halo exchange via `lax.ppermute` (neighbor slabs of width = the operator
    radius, sequential per axis so corner halos fill transitively). Edge
    shards receive zeros from ppermute's no-source behavior — exactly the
    zero-padding the unsharded operator uses.
  - the smoothness composite conv runs on the halo-extended block with the
    valid-window mask evaluated in GLOBAL coordinates (a row is emitted iff
    its stencil window lies fully inside the global grid — the dropped-row
    boundary policy must not appear at internal shard boundaries).
  - CG inner products use `psum` over the mesh — the only global syncs per
    iteration (SURVEY.md §5).

Correctness contract (tested on 8 virtual CPU devices, SURVEY.md §4):
sharded solve ≡ unsharded solve to fp32 reduction-order noise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constraints as cons
from .. import stencils
from ..grid import Grid
from ..operators import Problem
from ..solver import SolveInfo, pcg
from ..weights import SolverConfig


def _grid_partition_spec(mesh: Mesh, ndim: int, lead_dims: int = 0) -> P:
    """Grid dim d <- mesh axis d (by order); leading extra dims (e.g. the
    coeff channel axis) unsharded."""
    names = list(mesh.axis_names[:ndim])
    names += [None] * (ndim - len(names))
    return P(*([None] * lead_dims + names))


def shard_problem(problem: Problem, mesh: Mesh) -> Problem:
    """Place the problem's leaves on the mesh with the canonical sharding."""
    nd = problem.grid.ndim
    spec_g = _grid_partition_spec(mesh, nd)
    spec_c = _grid_partition_spec(mesh, nd, lead_dims=1)
    return Problem(
        coeff=jax.device_put(problem.coeff, NamedSharding(mesh, spec_c)),
        b=jax.device_put(problem.b, NamedSharding(mesh, spec_g)),
        diag=jax.device_put(problem.diag, NamedSharding(mesh, spec_g)),
        grid=problem.grid,
        weights=problem.weights,
    )


def _halo_slabs(x: jax.Array, axis: int, h: int, axis_name: str,
                n_shards: int) -> tuple[jax.Array, jax.Array]:
    """(from_left, from_right) neighbor slabs of width h along ``axis``
    (zeros at global edges, matching the unsharded zero-pad semantics)."""
    n = x.shape[axis]
    right_slab = lax.slice_in_dim(x, n - h, n, axis=axis)
    left_slab = lax.slice_in_dim(x, 0, h, axis=axis)
    if n_shards > 1:
        # send my right slab to my right neighbor -> arrives as his left halo
        from_left = lax.ppermute(right_slab, axis_name,
                                 [(i, i + 1) for i in range(n_shards - 1)])
        from_right = lax.ppermute(left_slab, axis_name,
                                  [(i + 1, i) for i in range(n_shards - 1)])
    else:
        from_left = jnp.zeros_like(right_slab)
        from_right = jnp.zeros_like(left_slab)
    return from_left, from_right


def _halo_exchange(x: jax.Array, axis: int, h: int, axis_name: str,
                   n_shards: int) -> jax.Array:
    """Extend block by h on both sides along ``axis`` with neighbor data."""
    if h == 0:
        return x
    from_left, from_right = _halo_slabs(x, axis, h, axis_name, n_shards)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def _sharded_axis_normal_apply(x_ext: jax.Array, order: int, axis: int,
                               h: int, n_glob: int, n_loc: int,
                               global_start: jax.Array) -> jax.Array:
    """(BᵀB)x along one SHARDED axis on the halo-extended block.

    x_ext is extended by h >= order on both sides along ``axis``;
    global_start is the global coordinate of the local block's first node.
    Returns the local-block result (length n_loc along ``axis``)."""
    taps = stencils.STENCIL_TAPS[order]
    L = len(taps)
    y = stencils._valid_corr(x_ext, taps, axis)
    # Window r of x_ext starts at global coordinate (global_start - h + r);
    # only windows fully inside the global grid correspond to emitted rows.
    m = y.shape[axis]
    win_g = (global_start - h) + lax.broadcasted_iota(jnp.int32, y.shape, axis)
    y = jnp.where((win_g >= 0) & (win_g <= n_glob - L), y, 0.0)
    z = stencils._full_conv_t(y, taps, axis, m + L - 1)  # length n_loc + 2h
    return lax.slice_in_dim(z, h, h + n_loc, axis=axis)


def make_sharded_apply(grid_shape: tuple[int, ...], weights, mesh: Mesh,
                       coeff: jax.Array, backend: str = "xla"):
    """Local-block operator apply with halo exchange, for use inside
    shard_map. ``coeff`` is the local data-term block.

    ``backend`` mirrors SolverConfig.backend: "auto" runs the fused Pallas
    kernel on the halo-extended block when on TPU and the extended block
    fits VMEM (ops.pallas_stencil.fused_normal_apply_ext — one kernel pass
    instead of ~a dozen XLA HBM round trips per iteration); "pallas" forces
    it (interpret mode off-TPU: tests); "xla" always uses the shift path.
    The halo exchange itself is always XLA ppermute."""
    ndim = len(grid_shape)
    axis_names = mesh.axis_names[:ndim]
    shards = tuple(mesh.shape[a] for a in axis_names) + (1,) * (ndim - len(axis_names))
    radius = max(stencils.max_stencil_radius(weights), 1)

    smooth_orders = [k for k in weights.active_orders() if k > 0]
    w0_2 = weights.model_0 ** 2 if 0 in weights.active_orders() else 0.0

    use_pallas = False
    stripe_ext = None
    pallas_interpret = False
    if backend != "xla":
        from ..ops import pallas_stencil as ps
        local_shape = tuple(grid_shape[d] // shards[d] for d in range(ndim))
        whole = ps.ext_fits_vmem(local_shape, radius)
        if not whole and ndim == 2:
            stripe_ext = ps.pick_stripe_ext(local_shape, radius)
        if whole or stripe_ext is not None:
            platform = jax.devices()[0].platform
            on_tpu = platform in ("tpu", "axon")
            use_pallas = on_tpu or backend == "pallas"
            pallas_interpret = not on_tpu
            if not whole and not use_pallas:
                stripe_ext = None

    def _global_start_vec(x_loc):
        gs = []
        for d in range(ndim):
            if d < len(axis_names) and shards[d] > 1:
                gs.append(lax.axis_index(axis_names[d]) * x_loc.shape[d])
            else:
                gs.append(jnp.int32(0))
        return jnp.stack(gs)

    def apply_fn(x_loc: jax.Array) -> jax.Array:
        if use_pallas and x_loc.dtype == jnp.float32:
            c32 = coeff.astype(jnp.float32)
            if stripe_ext is not None:
                from ..ops.pallas_stencil import fused_normal_apply_ext_striped
                name1 = axis_names[1] if len(axis_names) > 1 else None
                x1 = _halo_exchange(x_loc, 1, radius, name1, shards[1])
                from_top, from_bot = _halo_slabs(
                    x1, 0, radius, axis_names[0] if axis_names else None,
                    shards[0])
                return fused_normal_apply_ext_striped(
                    x1, from_top, from_bot, c32, _global_start_vec(x_loc),
                    weights, radius, grid_shape, stripe_ext,
                    interpret=pallas_interpret)
            from ..ops.pallas_stencil import fused_normal_apply_ext
            x_ext = x_loc
            for d in range(ndim):
                x_ext = _halo_exchange(x_ext, d, radius,
                                       axis_names[d] if d < len(axis_names)
                                       else None, shards[d])
            return fused_normal_apply_ext(
                x_ext, c32, _global_start_vec(x_loc),
                weights, ndim, radius, grid_shape,
                interpret=pallas_interpret)
        return _xla_apply(x_loc)

    def _xla_apply(x_loc: jax.Array) -> jax.Array:
        # Sequential per-axis exchange fills corner halos transitively.
        x_ext = x_loc
        for d in range(ndim):
            # Always extend (1-shard axes get zero halos — the same zero-pad
            # the unsharded operator uses), so the body below is uniform.
            x_ext = _halo_exchange(x_ext, d, radius,
                                   axis_names[d] if d < len(axis_names) else None,
                                   shards[d])
        # x_ext now extended by `radius` along every grid axis.
        out = jnp.zeros_like(x_loc)
        if w0_2:
            out = out + w0_2 * x_loc

        for d in range(ndim):
            n_loc = x_loc.shape[d]
            n_glob = grid_shape[d]
            if len(axis_names) > d and shards[d] > 1:
                global_start = lax.axis_index(axis_names[d]) * n_loc
            else:
                global_start = jnp.int32(0)
            # View extended only along axis d (crop other axes' halos).
            view = x_ext
            for d2 in range(ndim):
                if d2 != d:
                    view = lax.slice_in_dim(view, radius,
                                            radius + x_loc.shape[d2], axis=d2)
            for order in smooth_orders:
                w2 = weights.model_weight(order) ** 2
                out = out + w2 * _sharded_axis_normal_apply(
                    view, order, d, radius, n_glob, n_loc, global_start)

        # Data term: offsets in {-1,0,1}^D; crop the extension to ±1 so the
        # shifted reads see neighbor values (coeff never references nodes
        # outside the global grid, so no masking is needed).
        x1 = x_ext
        for d in range(ndim):
            x1 = lax.slice_in_dim(x1, radius - 1, radius - 1 + x_loc.shape[d] + 2,
                                  axis=d)
        offsets = cons.offset_list(ndim)
        data = jnp.zeros_like(x_loc)
        for o_idx in range(offsets.shape[0]):
            sl = tuple(slice(1 + int(o), 1 + int(o) + x_loc.shape[d])
                       for d, o in enumerate(offsets[o_idx]))
            data = data + coeff[o_idx] * x1[sl]
        return out + data

    return apply_fn


def _make_coarse_correction(problem: Problem, mesh: Mesh):
    """Global coarse-grid correction for the sharded preconditioner
    (two-level additive Schwarz): a small global coarse operator is built
    and densely inverted at setup; inside shard_map each shard restricts its
    block (one dynamic-slice of the global Pᵀ per axis), psum assembles the
    full coarse residual on every shard, one replicated matmul solves it,
    and each shard prolongs back its own block. Exactly symmetric
    (P A_c⁻¹ Pᵀ), so the combined preconditioner stays SPD.

    Returns (inv [n_c, n_c], R_global list of per-axis [n_c_d, n_f_d],
    cshape) — passed into shard_map as replicated operands; the in-body
    restrict/solve/prolong lives in `_coarse_fn`."""
    import math

    from ..multigrid import _resize_matrix, restrict_diag
    from ..stencils import axis_normal_apply, smoothness_diag

    grid = problem.grid
    nd = grid.ndim
    axis_names = tuple(mesh.axis_names[:nd])
    shards = tuple(mesh.shape[a] for a in axis_names) + (1,) * (nd - len(axis_names))

    # Coarse shape: cap total nodes so the dense inverse stays cheap.
    per_axis = {1: 2048, 2: 45, 3: 12}[nd]
    cshape = tuple(min(n, per_axis) for n in grid.shape)
    n_c = math.prod(cshape)

    # Rediscretized coarse smoothness with anisotropic energy matching:
    # E_k,d ≈ w² · (spacing_d)^{2k} · (#rows ∝ 1/volume) · ∫(u^{(k)})², and
    # coarse spacing along axis d is f_d fine units, coarse row count shrinks
    # by vol = Π f — so matching the fine energy needs
    # w_c² = w_f² · vol / f_d^{2k} (and w_c² = w_f² · vol for order 0).
    factors = [(grid.shape[d] - 1) / max(1, cshape[d] - 1) for d in range(nd)]
    vol = float(np.prod(factors))
    weights = problem.weights
    term_scale = {}
    for order in weights.active_orders():
        if order == 0:
            term_scale[(0, 0)] = weights.model_0 ** 2 * vol
            continue
        for d in range(nd):
            term_scale[(order, d)] = (weights.model_weight(order) ** 2
                                      * vol / factors[d] ** (2 * order))

    ddiag_c = restrict_diag(cons.data_diag(problem.coeff, nd), cshape)

    def coarse_apply(x):
        out = jnp.zeros_like(x)
        for (order, d), s in term_scale.items():
            if order == 0:
                out = out + s * x
            else:
                out = out + s * axis_normal_apply(x, order, d)
        return out + ddiag_c * x

    eye = jnp.eye(n_c, dtype=jnp.float32).reshape((n_c,) + cshape)
    A_c = jax.vmap(coarse_apply)(eye).reshape(n_c, n_c).T
    inv = jnp.linalg.inv(A_c)
    inv = 0.5 * (inv + inv.T)

    # Global per-axis restriction matrices R_d = P_dᵀ [n_c_d, n_f_d].
    R_global = [jnp.asarray(_resize_matrix(grid.shape[d], cshape[d]).T,
                            jnp.float32) for d in range(nd)]
    return inv, R_global, cshape


def _coarse_fn(r_loc, inv, R_mats, cshape, mesh: Mesh):
    """In-shard coarse correction: P A_c⁻¹ Pᵀ r (see _make_coarse_correction)."""
    nd = len(cshape)
    axis_names = tuple(mesh.axis_names[:nd])
    shards = tuple(mesh.shape[a] for a in axis_names) + (1,) * (nd - len(axis_names))

    def local_R(d, n_loc):
        if d < len(axis_names) and shards[d] > 1:
            start = lax.axis_index(axis_names[d]).astype(jnp.int32) * n_loc
        else:
            start = 0
        # Both indices int32 (under enable_x64 a Python 0 would weak-type to
        # int64 and dynamic_slice rejects mixed index widths).
        return lax.dynamic_slice(R_mats[d], (jnp.int32(0), jnp.int32(start)),
                                 (cshape[d], n_loc))

    rc = r_loc
    for d in range(nd):
        R_loc = local_R(d, r_loc.shape[d])
        rc = jnp.moveaxis(
            jnp.tensordot(R_loc, rc, axes=[[1], [d]],
                          precision=jax.lax.Precision.HIGHEST), 0, d)
    if axis_names:
        rc = lax.psum(rc, axis_names)
    zc = jnp.dot(inv, rc.ravel(), precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=rc.dtype).reshape(cshape)
    z = zc
    for d in range(nd):
        R_loc = local_R(d, r_loc.shape[d])
        z = jnp.moveaxis(
            jnp.tensordot(R_loc.T, z, axes=[[1], [d]],
                          precision=jax.lax.Precision.HIGHEST), 0, d)
    return z


def _make_local_precond(config: SolverConfig, weights, coeff_l, b_l, diag_l,
                        inv_c, R_mats, cshape, mesh: Mesh):
    """Per-shard preconditioner used inside shard_map bodies: Jacobi on the
    local diag, or the two-level additive Schwarz (block V-cycle + psum'd
    global coarse correction) — see solve_sharded's docstring."""
    if config.preconditioner == "jacobi":
        inv_diag = jnp.where(diag_l > 0, 1.0 / diag_l, 1.0)
        return lambda r: inv_diag * r
    if config.preconditioner == "multigrid":
        from ..multigrid import make_vcycle_preconditioner
        local_problem = Problem(coeff=coeff_l, b=b_l, diag=diag_l,
                                grid=Grid(b_l.shape), weights=weights)
        block_v = make_vcycle_preconditioner(local_problem, config)
        return lambda r: block_v(r) + _coarse_fn(r, inv_c, R_mats, cshape,
                                                 mesh)
    return None


def solve_sharded(
    problem: Problem,
    mesh: Mesh,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Solve one large sharded problem with the full PCG loop inside
    shard_map (halos over ICI; psum'd inner products).

    The grid's dim d is sharded over mesh axis d; every sharded extent must
    divide evenly. Preconditioners:

    * "none" / "jacobi" — diag is local, trivially sharded.
    * "multigrid" — two-level additive Schwarz: each shard runs a V-cycle on
      its OWN block (no cross-shard communication) PLUS a global coarse-grid
      correction (psum-assembled coarse residual, replicated dense solve) —
      the textbook structure whose conditioning is bounded independent of
      the shard count. The operator itself stays exact via halo exchange, so
      the solve converges to the true global solution; both preconditioner
      parts are SPD.
    """
    if config.preconditioner not in ("none", "jacobi", "multigrid"):
        raise ValueError("sharded solve supports 'none', 'jacobi' or "
                         f"'multigrid' preconditioning, got "
                         f"{config.preconditioner!r}")
    grid = problem.grid
    nd = grid.ndim
    axis_names = mesh.axis_names[:nd]
    for d, name in enumerate(axis_names):
        if grid.shape[d] % mesh.shape[name] != 0:
            raise ValueError(
                f"grid dim {d} ({grid.shape[d]}) not divisible by mesh axis "
                f"{name!r} ({mesh.shape[name]})")

    spec_g = _grid_partition_spec(mesh, nd)
    spec_c = _grid_partition_spec(mesh, nd, lead_dims=1)
    all_names = tuple(axis_names)

    def pdot(a, b):
        return lax.psum(jnp.sum(a * b), all_names)

    use_mg = config.preconditioner == "multigrid"
    if use_mg:
        inv_c, R_mats, cshape = _make_coarse_correction(problem, mesh)
    else:  # placeholders keep the shard_map signature static
        inv_c = jnp.zeros((1, 1), jnp.float32)
        R_mats = [jnp.zeros((1, 1), jnp.float32)] * nd
        cshape = (1,) * nd

    rep = P()  # replicated operands (coarse inverse + transfer matrices)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_c, spec_g, spec_g, spec_g, rep, tuple([rep] * nd)),
        out_specs=(spec_g, P()),
        # check_vma=False: interpret-mode pallas_call inside shard_map trips
        # the vma checker on kernel constants (JAX suggests this workaround);
        # on-TPU kernels declare their vma via out_shape and are unaffected.
        check_vma=False,
    )
    def body(coeff_l, b_l, diag_l, x0_l, inv_c, R_mats):
        apply_fn = make_sharded_apply(grid.shape, problem.weights, mesh,
                                      coeff_l, backend=config.backend)
        precond = _make_local_precond(config, problem.weights, coeff_l, b_l,
                                      diag_l, inv_c, R_mats, cshape, mesh)
        x, info = pcg(apply_fn, b_l, x0_l, precond,
                      tol=config.tol, maxiter=config.maxiter,
                      recompute_every=config.recompute_every,
                      max_restarts=config.max_restarts, dot_fn=pdot)
        return x, info

    if x0 is None:
        x0 = jnp.zeros_like(problem.b)
    return jax.jit(body)(problem.coeff, problem.b, problem.diag, x0,
                         inv_c, tuple(R_mats))


def solve_refined_sharded(
    problem64: Problem,
    mesh: Mesh,
    config: SolverConfig = SolverConfig(),
    x0: Optional[jax.Array] = None,
) -> tuple[jax.Array, SolveInfo]:
    """Sharded mixed-precision solve to a TRUE ≤`tol` relative residual
    (VERDICT r1 item 3 — the honest-1e-6 bar extended to the sharded domain,
    `BASELINE.json:5` + SURVEY.md §5 long-context row).

    Structure mirrors solver.solve_refined, but the WHOLE refinement loop
    runs inside one shard_map: fp32 sharded-PCG inner solves (halo exchange
    + psum dots, same machinery as solve_sharded) wrapped in a float64 outer
    loop whose residual/accumulation use the float64-assembled local blocks
    and psum'd f64 inner products.

    ``problem64`` is a Problem whose leaves were assembled in float64 (e.g.
    `operators.assemble` on f64 inputs under ``jax.enable_x64()``); grid dim
    d is sharded over mesh axis d as in solve_sharded.
    """
    if config.preconditioner not in ("none", "jacobi", "multigrid"):
        raise ValueError("sharded solve supports 'none', 'jacobi' or "
                         f"'multigrid' preconditioning, got "
                         f"{config.preconditioner!r}")
    grid = problem64.grid
    nd = grid.ndim
    axis_names = mesh.axis_names[:nd]
    for d, name in enumerate(axis_names):
        if grid.shape[d] % mesh.shape[name] != 0:
            raise ValueError(
                f"grid dim {d} ({grid.shape[d]}) not divisible by mesh axis "
                f"{name!r} ({mesh.shape[name]})")

    with jax.enable_x64():
        import dataclasses

        p32 = dataclasses.replace(
            problem64,
            coeff=problem64.coeff.astype(jnp.float32),
            b=problem64.b.astype(jnp.float32),
            diag=problem64.diag.astype(jnp.float32))

        spec_g = _grid_partition_spec(mesh, nd)
        spec_c = _grid_partition_spec(mesh, nd, lead_dims=1)
        all_names = tuple(axis_names)

        def pdot(a, b):
            return lax.psum(jnp.sum(a * b), all_names)

        if config.preconditioner == "multigrid":
            inv_c, R_mats, cshape = _make_coarse_correction(p32, mesh)
        else:
            inv_c = jnp.zeros((1, 1), jnp.float32)
            R_mats = [jnp.zeros((1, 1), jnp.float32)] * nd
            cshape = (1,) * nd

        rep = P()
        weights = problem64.weights
        # fp32 inner solves stagnate around ~1e-4 relative (rounding floor).
        floor = max(config.tol, 1e-4)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_c, spec_g, spec_c, spec_g, spec_g, rep,
                      tuple([rep] * nd)),
            out_specs=(spec_g, P()),
            check_vma=False,  # see solve_sharded
        )
        def body(coeff64_l, b64_l, coeff32_l, diag32_l, x0_l, inv_c, R_mats):
            apply64 = make_sharded_apply(grid.shape, weights, mesh, coeff64_l)
            apply32 = make_sharded_apply(grid.shape, weights, mesh, coeff32_l,
                                         backend=config.backend)
            b32_l = b64_l.astype(jnp.float32)
            precond = _make_local_precond(config, weights, coeff32_l, b32_l,
                                          diag32_l, inv_c, R_mats, cshape,
                                          mesh)
            bnorm2 = jnp.maximum(pdot(b64_l, b64_l),
                                 jnp.finfo(jnp.float64).tiny)
            tol2 = config.tol * config.tol * bnorm2

            x = x0_l.astype(jnp.float64)
            r = b64_l - apply64(x)

            def cond(state):
                _, r, k, iters = state
                return (pdot(r, r) > tol2) & (k < config.refine_rounds)

            def refine_body(state):
                x, r, k, iters = state
                rel = jnp.sqrt(pdot(r, r) / bnorm2)
                inner_tol = jnp.clip(0.5 * config.tol / rel, floor, 0.5
                                     ).astype(jnp.float32)
                d32, info = pcg(apply32, r.astype(jnp.float32),
                                precond_fn=precond, tol=inner_tol,
                                maxiter=config.maxiter,
                                recompute_every=config.recompute_every,
                                max_restarts=1, dot_fn=pdot)
                x = x + d32.astype(jnp.float64)
                r = b64_l - apply64(x)
                return x, r, k + 1, iters + info.iterations

            x, r, k, iters = lax.while_loop(
                cond, refine_body, (x, r, jnp.int32(0), jnp.int32(0)))
            rel = jnp.sqrt(pdot(r, r) / bnorm2)
            info = SolveInfo(iterations=iters,
                             rel_residual=rel.astype(jnp.float32),
                             converged=rel <= config.tol)
            return x, info

        if x0 is None:
            x0 = jnp.zeros_like(problem64.b)
        return jax.jit(body)(problem64.coeff, problem64.b, p32.coeff,
                             p32.diag, x0, inv_c, tuple(R_mats))
