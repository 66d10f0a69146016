"""Interactive re-solve loop with reusable setup + warm starts.

The reference GUI re-solves every frame while the user edits the cloud
(SURVEY.md §3.2; `solve_sparse_linear_with_guess`). This example plays N
"frames" of a slowly rotating normal field on a FIXED point cloud three
ways and prints per-frame wall time + iterations:

  cold   — full `sdf_from_points` per frame (assembly + MG setup + solve)
  prep   — `session.Solver`: geometry + multigrid setup built once,
           each frame rebuilds only the right-hand side
  warm   — prep + warm start from the previous frame's field

Run: python examples/interactive_warmstart.py [--frames 20] [--size 256]
(CPU works; on the TPU rig per-frame wall times include the ~33 ms
dispatch round trip — the marginal costs are measured properly by
probes/r5_headline.py.)
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import field_interpolation_tpu as fi  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--points", type=int, default=500)
    ap.add_argument("--precise", action="store_true",
                    help="solve each frame to a TRUE 1e-6 residual")
    args = ap.parse_args()

    shape = (args.size, args.size)
    grid = fi.Grid(shape)
    w = fi.Weights(model_2=0.3)
    tol = 1e-6 if args.precise else 1e-4
    cfg = fi.SolverConfig(tol=tol, preconditioner="multigrid")

    rng = np.random.default_rng(0)
    center = (np.asarray(shape) - 1) / 2
    theta0 = rng.uniform(0, 2 * np.pi, args.points)
    base_n = np.stack([np.cos(theta0), np.sin(theta0)], 1)
    pts = jnp.asarray((center + 0.35 * args.size * base_n
                       + 0.2 * rng.standard_normal((args.points, 2))
                       ).astype(np.float32))
    zeros = jnp.zeros(args.points)

    def frame_normals(k):
        a = 0.03 * k  # slow rotation per frame
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        return jnp.asarray((base_n @ rot.T).astype(np.float32))

    solver = fi.Solver(grid, w, pts, config=cfg, precise=args.precise)

    def run(mode):
        x_prev = None
        total, iters = 0.0, 0
        for k in range(args.frames):
            nrm = frame_normals(k)
            t0 = time.perf_counter()
            if mode == "cold":
                if args.precise:
                    x, info = fi.sdf_from_points_precise(grid, w, pts, nrm,
                                                         config=cfg)
                else:
                    x, info = fi.sdf_from_points(grid, w, pts, nrm,
                                                 config=cfg)
            else:
                x0 = x_prev if mode == "warm" else None
                x, info = solver.solve(zeros, gradients=nrm, x0=x0)
            float(jnp.sum(x.astype(jnp.float32)))  # device fence
            dt = time.perf_counter() - t0
            if k > 0:  # frame 0 pays compile
                total += dt
                iters += int(info.iterations)
            x_prev = x
        f = args.frames - 1
        print(f"{mode:5s}: {total / f * 1e3:7.2f} ms/frame  "
              f"{iters / f:5.1f} iters/frame  (over {f} timed frames)")

    for mode in ("cold", "prep", "warm"):
        run(mode)


if __name__ == "__main__":
    main()
