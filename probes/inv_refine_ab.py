"""On-chip A/B for the two largest non-iteration headline slices that
`probes/headline_slices.py` measured (round-4 session, dispatch-corrected):

  MG setup 0.202 ms/solve, of which the dense-coarsest `jnp.linalg.inv`
  (LU with pivoting — latency-bound on TPU) is 0.153 ms; refine tier
  0.697 ms, of which only ~0.26 ms is the extra inner iterations.

Arms:
  inv_lu      — jnp.linalg.inv(A) (current production path)
  inv_chol    — cholesky + two triangular solves against I (SPD; no pivot
                search; TRSM is blocked → more MXU-friendly than LU)
  inv_cholsym — cho variant symmetrized like production (0.5*(X+X.T))
  res64       — PreciseProblem.residual64(x) marginal (the peeled exact
                f64-scatter residual; once per refined solve)
  app64d      — PreciseProblem.apply64_delta(d) marginal (per later round)
  inner0      — a _pcg_fused call forced to ~0 iterations (tol=0.99 on an
                almost-converged rhs): per-inner-call overhead floor

Run on the chip (`python probes/inv_refine_ab.py`); `--smoke` runs tiny
chains on CPU.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu.utils import measure_marginal

from _common import cloud as make_circle_cloud  # noqa: E402

SHAPE = (256, 256)
N = 1000


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    # The real coarsest operator family: host-constant S + per-problem
    # lumped data diagonal (strictly positive), n = 256 at the 16^2 coarsest.
    from field_interpolation_tpu import multigrid
    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    pts, nrm = make_circle_cloud(N, SHAPE)
    pts_d, nrm_d = jnp.asarray(pts), jnp.asarray(nrm)
    prob = fi.assemble_sdf(grid, w, pts_d, nrm_d)
    levels = multigrid.build_levels(prob, cfg)
    lvl = levels[-1]
    S = jnp.asarray(multigrid._smoothness_dense_matrix(lvl.shape, lvl.weights),
                    jnp.float32)
    d0 = lvl.data_diag.ravel()
    n = S.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)

    def step_inv_lu(c):
        A = S + jnp.diag(d0 * (1.0 + c * 1e-12))
        inv = jnp.linalg.inv(A)
        inv = 0.5 * (inv + inv.T)
        return c + jnp.sum(inv) * 1e-9

    def chol_inverse(A):
        L = jnp.linalg.cholesky(A)
        Linv = jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True)
        return Linv.T @ Linv  # (L L^T)^-1 = L^-T L^-1, symmetric by form

    def step_inv_chol(c):
        A = S + jnp.diag(d0 * (1.0 + c * 1e-12))
        inv = chol_inverse(A)
        return c + jnp.sum(inv) * 1e-9

    # correctness check before timing anything
    A0 = S + jnp.diag(d0)
    i_lu = jnp.linalg.inv(A0)
    i_ch = chol_inverse(A0)
    err = float(jnp.max(jnp.abs(i_lu - i_ch)) / jnp.max(jnp.abs(i_lu)))
    print(f"chol-vs-lu inverse rel err: {err:.2e}", flush=True)

    # f64 refine glue marginals on the real PreciseProblem
    with jax.enable_x64():
        pp = fi.assemble_precise(grid, w, pts_d, jnp.zeros(N), gradients=nrm_d)
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(grid.shape),
            jnp.float64) * 1e-3

        def step_res64(c):
            r = pp.residual64(x0 * (1.0 + c * 1e-12))
            return c + jnp.sum(r) * 1e-9

        def step_app64d(c):
            r = pp.apply64_delta(x0 * (1.0 + c * 1e-12))
            return c + jnp.sum(r) * 1e-9

        pairs_x64 = [
            ("res64", step_res64, (1, 3) if smoke else (64, 512)),
            ("app64d", step_app64d, (1, 3) if smoke else (64, 512)),
        ]
        res = {}
        for name, step, counts in pairs_x64:
            s, det = measure_marginal(step, jnp.float64(0.0), counts=counts)
            res[name] = s * 1e3
            print(f"{name:9s} {s*1e3:8.3f} ms/step  chains={det['times_s']}",
                  flush=True)

    # per-inner-call overhead floor: solve an already-converged system at a
    # loose tolerance -> ~1 iteration; everything else is fixed per-call cost
    from field_interpolation_tpu import solver
    fused_ops, fused_interpret = solver._fused_solver_ops(prob, cfg)
    xs, _ = fi.solve(prob, fi.SolverConfig(tol=1e-4,
                                           preconditioner="multigrid",
                                           maxiter=2000))
    r_small = (prob.b - prob.apply(xs)).astype(jnp.float32)

    if fused_ops is not None:
        def step_inner0(c):
            d, info = solver._pcg_fused(
                fused_ops, r_small * (1.0 + c * 1e-9), None, tol=0.9,
                maxiter=2000, max_restarts=1, nu=cfg.mg_pre_smooth,
                interpret=fused_interpret,
                wdepth=solver._wdepth(cfg, prob.grid.shape), chunk=1)
            return c + jnp.sum(d) * 1e-9 + info.iterations.astype(
                jnp.float32) * 1e-9
        s, det = measure_marginal(step_inner0, jnp.float32(0.0),
                                  counts=(1, 3) if smoke else (64, 512))
        print(f"inner0    {s*1e3:8.3f} ms/step  chains={det['times_s']}",
              flush=True)
    else:
        print("inner0    skipped (fused path unavailable on this backend)",
              flush=True)

    for name, step, counts in [
        ("inv_lu", step_inv_lu, (1, 3) if smoke else (64, 512)),
        ("inv_chol", step_inv_chol, (1, 3) if smoke else (64, 512)),
    ]:
        s, det = measure_marginal(step, jnp.float32(0.0), counts=counts)
        print(f"{name:9s} {s*1e3:8.3f} ms/step  chains={det['times_s']}",
              flush=True)


if __name__ == "__main__":
    main()
