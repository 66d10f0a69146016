"""On-chip A/B: fmg_start vs zero start at the config-5 scales (ABA order,
same-session). Run AFTER transfer_ab (one chip probe at a time)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import time
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from _common import cloud


def ab(shape, npts, tol=1e-4):
    grid = fi.Grid(shape)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=tol, preconditioner="multigrid", maxiter=2000)
    pts, nrm = cloud(npts, shape)
    p, n = jnp.asarray(pts), jnp.asarray(nrm)
    # ABA plus recursion depths: zero / fmg / full-FMG depth 2 and 3
    # (the recursion cuts the COARSE iteration bill; fine count unchanged)
    for arm in (False, True, 2, 3, False):

        @jax.jit
        def run(p, n):
            x, info = fi.sdf_from_points(grid, w, p, n, config=cfg,
                                         fmg_start=arm)
            return jnp.sum(x), info.iterations, info.rel_residual

        s, it, rr = run(p, n)
        float(s)  # warmup incl. compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, it, rr = run(p, n)
            float(s)
            ts.append(time.perf_counter() - t0)
        print(f"{shape} @{tol:g} fmg={arm}: {min(ts)*1e3:.0f} ms "
              f"(fine iters={int(it)}, rel={float(rr):.1e})", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    if "--3d-only" not in sys.argv:
        ab((4096, 4096), 100_000)
    if "--2d-only" not in sys.argv:
        ab((256, 256, 256), 100_000)
