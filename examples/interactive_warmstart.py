"""Demo: the reference GUI's interactive loop as a script (SURVEY.md §3.2) —
re-solve while 'dragging a slider' (perturbing the data), warm-started from
the previous solution, with per-frame diagnostics like the GUI readout."""

import sys
import time

import numpy as np
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu.utils import (record_solve, timed_block,
                                           vcycle_applies_per_iteration)


def main():
    grid = fi.Grid((128, 128))
    weights = fi.Weights(model_2=0.3)
    cfg = fi.SolverConfig(tol=1e-4, preconditioner="multigrid")
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, 400)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)

    x = None
    for frame in range(6):
        # 'slider drag': radius grows a little each frame
        radius = 35.0 + 2.0 * frame
        pts = (63.5 + radius * nrm).astype(np.float32)
        with timed_block() as t:
            x, info = fi.sdf_from_points(grid, weights, jnp.asarray(pts),
                                         jnp.asarray(nrm), config=cfg, x0=x)
            x.block_until_ready()
        record_solve(grid, info, t["ms"], preconditioner="multigrid",
                     applies_per_iteration=vcycle_applies_per_iteration(
                         cfg.mg_pre_smooth, cfg.mg_post_smooth),
                     stream=sys.stdout, frame=frame, warm=frame > 0)
    print("OK")


if __name__ == "__main__":
    main()
