"""Static XLA cost-model decomposition of the refined headline phases.

The tunnel-free half of the attribution story (`utils.xla_cost`): per-phase
flops / bytes / roofline-lower-bound ms from the COMPILED executables'
cost analysis — no device trace, so it runs even while the axon chip
service is down (the round-4 outage motivated it). Numbers are estimates
from whatever backend compiles (pass --cpu to force the host backend);
fusion choices differ across backends, so treat byte counts as approximate
and calibrate against the measured slices from headline_slices.py.

Phases mirror headline_slices.py: fp32 assembly, MG setup (levels +
smoothing setup + dense-coarsest inverse), the isolated 256-node inverse,
precise (f64-row) assembly, the fp32 MG solve @1e-4, and the full refined
headline @TRUE 1e-6.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (256, 256)
N = 1000


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import field_interpolation_tpu as fi
    from _common import cloud as make_circle_cloud
    from field_interpolation_tpu import multigrid
    from field_interpolation_tpu.utils import cost_table, xla_cost

    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    cfg4 = fi.SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000)
    pts, nrm = make_circle_cloud(N, SHAPE)
    pts_d, nrm_d = jnp.asarray(pts), jnp.asarray(nrm)

    def asm32(p, n):
        return fi.assemble_sdf(grid, w, p, n)

    def setup(p, n):
        prob = fi.assemble_sdf(grid, w, p, n)
        levels = multigrid.build_levels(prob, cfg)
        sm = multigrid.build_smoothing_setup(prob, levels, cfg)
        inv = multigrid._coarse_dense_inverse(levels[-1])
        return prob, sm, inv

    rngm = np.random.default_rng(1)
    Mh = rngm.standard_normal((256, 256)).astype(np.float32)
    Mspd = jnp.asarray(Mh @ Mh.T + 256 * np.eye(256, dtype=np.float32))

    def inv256(m):
        return jnp.linalg.inv(m)

    def asm_precise(p, n):
        return fi.assemble_precise(grid, w, p, jnp.zeros(N), gradients=n)

    def sdf32(p, n):
        x, info = fi.sdf_from_points(grid, w, p, n, config=cfg4)
        return x

    def headline(p, n):
        x, info = fi.sdf_from_points_precise(grid, w, p, n, config=cfg)
        return x

    costs = [
        xla_cost(asm32, pts_d, nrm_d, name="asm32 (fp32 assembly)"),
        xla_cost(setup, pts_d, nrm_d, name="setup (asm+levels+inv)"),
        xla_cost(inv256, Mspd, name="inv256 (isolated)"),
        xla_cost(asm_precise, pts_d, nrm_d, name="asmP (f64-row assembly)"),
        xla_cost(sdf32, pts_d, nrm_d, name="sdf32 (asm+solve @1e-4)"),
        xla_cost(headline, pts_d, nrm_d, name="headline (refined @1e-6)"),
    ]
    print(f"backend={jax.default_backend()}  grid={SHAPE}  n={N}")
    print(cost_table(costs))
    print("\nNOTE: flops/bytes are static cost-model counts for the WHOLE "
          "phase at maxiter; while_loop bodies count ONCE per trip bound "
          "only if unrolled — iterative solves therefore undercount. Use "
          "measured slices (headline_slices.py) for wall-time truth; use "
          "this for memory-traffic shape and setup-phase attribution.")


if __name__ == "__main__":
    main()
