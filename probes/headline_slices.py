"""Headline-slice decomposition (on-chip): where do the non-iteration
~0.9 ms of the 1.45 ms dispatch-free refined headline go?

Slices, each as a measure_marginal chain (carry-perturbed inputs so XLA
cannot hoist the loop-invariant solve out of the fori_loop):
  asm32     — assemble_sdf only
  setup     — assemble + MG setup (build_levels + smoothing setup + the
              per-solve dense coarsest jnp.linalg.inv — LU is latency-bound
              on TPU, a prime suspect for the non-iteration time)
  inv256    — jnp.linalg.inv of one 256×256 SPD matrix, isolated
  sdf32     — assemble + fp32 MG solve (fused kernels)      [known ~0.56 ms]
  asmP      — assemble_precise only (f64 rows + b64)
  headline  — sdf_from_points_precise (the full refined path)
Derived: fp32 solve = sdf32 - asm32; refine tier = headline - sdf32 - (asmP - asm32);
MG setup = setup - asm32.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu.utils import measure_marginal

SHAPE = (256, 256)
N = 1000


from _common import cloud as make_circle_cloud  # noqa: E402


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    pts, nrm = make_circle_cloud(N, SHAPE)
    pts_d, nrm_d = jnp.asarray(pts), jnp.asarray(nrm)

    def leafsum(x):
        return sum(jnp.sum(l).astype(jnp.float32) for l in
                   jax.tree.leaves(x) if jnp.issubdtype(l.dtype, jnp.floating))

    def perturbed(c):
        # tiny carry-dependent shift: keeps the body loop-variant without
        # changing iteration counts (1e-9 lattice units)
        return pts_d + c * 1e-12, nrm_d

    def step_asm32(c):
        p, n = perturbed(c)
        prob = fi.assemble_sdf(grid, w, p, n)
        return c + leafsum(prob) * 1e-9

    # fp32 tier at 1e-4: plain fp32 CG cannot reach 1e-6 (it floors near
    # 1e-4 and burns safeguard iterations), and the refined path's inner
    # solves run at relaxed tolerances anyway.
    cfg4 = fi.SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000)

    def step_sdf32(c):
        p, n = perturbed(c)
        x, info = fi.sdf_from_points(grid, w, p, n, config=cfg4)
        return c + jnp.sum(x) * 1e-9

    def step_setup(c):
        from field_interpolation_tpu import multigrid
        p, n = perturbed(c)
        prob = fi.assemble_sdf(grid, w, p, n)
        levels = multigrid.build_levels(prob, cfg)
        lump, fine_ddiag, taus, rhos = multigrid.build_smoothing_setup(
            prob, levels, cfg)
        inv = multigrid._coarse_dense_inverse(levels[-1])
        acc = (leafsum(prob) + jnp.sum(inv) + sum(taus) + fine_ddiag.sum())
        return c + acc.astype(jnp.float32) * 1e-9

    # fixed SPD 256x256, carry-perturbed: isolates the inv cost alone
    rngm = np.random.default_rng(1)
    Mh = rngm.standard_normal((256, 256)).astype(np.float32)
    Mspd = jnp.asarray(Mh @ Mh.T + 256 * np.eye(256, dtype=np.float32))

    def step_inv256(c):
        inv = jnp.linalg.inv(Mspd + c * 1e-12)
        return c + jnp.sum(inv) * 1e-9

    def step_asmP(c):
        p, n = perturbed(c)
        pp = fi.assemble_precise(grid, w, p, jnp.zeros(N), gradients=n)
        return c + leafsum(pp) * 1e-9

    def step_headline(c):
        p, n = perturbed(c)
        x, info = fi.sdf_from_points_precise(grid, w, p, n, config=cfg)
        return c + jnp.sum(x).astype(jnp.float32) * 1e-9

    init = jnp.float32(0.0)
    res = {}
    for name, step, counts in [
        ("asm32", step_asm32, (1, 3) if smoke else (64, 512)),
        ("setup", step_setup, (1, 3) if smoke else (64, 512)),
        ("inv256", step_inv256, (1, 3) if smoke else (64, 512)),
        ("asmP", step_asmP, (1, 3) if smoke else (64, 512)),
        ("sdf32", step_sdf32, (1, 3) if smoke else (64, 320)),
        ("headline", step_headline, (1, 3) if smoke else (32, 192)),
    ]:
        s, det = measure_marginal(step, init, counts=counts)
        res[name] = s * 1e3
        print(f"{name:9s} {s*1e3:8.3f} ms/step   chains={det['times_s']}",
              flush=True)
    print(f"\nfp32 solve  = {res['sdf32']-res['asm32']:.3f} ms")
    print(f"MG setup    = {res['setup']-res['asm32']:.3f} ms "
          f"(inv256 alone = {res['inv256']:.3f} ms)")
    print(f"precise-asm extra = {res['asmP']-res['asm32']:.3f} ms")
    print(f"refine tier = {res['headline']-res['sdf32']-(res['asmP']-res['asm32']):.3f} ms")


if __name__ == "__main__":
    main()
