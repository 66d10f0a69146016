"""Headline benchmark (BASELINE.md): 256² SDF from 1k oriented points to 1e-6
relative residual, ms/field on one TPU chip. Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.

vs_baseline is measured against the driver-set target envelope of 10 ms/field
(`BASELINE.json:5`; the reference publishes no numbers, `BASELINE.json:13`) —
values > 1 mean faster than target. Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_circle_cloud(n, grid_shape, radius_frac=0.35, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    center = (np.asarray(grid_shape, np.float64) - 1.0) / 2.0
    radius = radius_frac * min(grid_shape)
    theta = rng.uniform(0, 2 * np.pi, n)
    normals = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    pts = center + radius * normals + noise * rng.standard_normal((n, 2))
    return pts.astype(np.float32), normals.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    import field_interpolation_tpu as fi
    from field_interpolation_tpu.solver import solve_refined

    dev = jax.devices()[0]
    log(f"device: {dev}")

    grid = fi.Grid((256, 256))
    n_points = 1000
    pts, normals = make_circle_cloud(n_points, grid.shape)
    weights = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)

    pts_d = jax.device_put(jnp.asarray(pts))
    nrm_d = jax.device_put(jnp.asarray(normals))

    def one_solve(p, n):
        return fi.sdf_from_points_precise(grid, weights, p, n, config=cfg)

    # Warmup / compile.
    t0 = time.perf_counter()
    x, info = one_solve(pts_d, nrm_d)
    x.block_until_ready()
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s; "
        f"iters={int(info.iterations)} rel_res={float(info.rel_residual):.2e} "
        f"converged={bool(info.converged)}")

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        x, info = one_solve(pts_d, nrm_d)
    x.block_until_ready()
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{ms:.2f} ms/field ({1e3 / ms:.1f} solves/sec), "
        f"iters={int(info.iterations)} rel_res={float(info.rel_residual):.2e}")

    baseline_ms = 10.0  # driver target envelope, BASELINE.md
    print(json.dumps({
        "metric": "256x256 SDF from 1k oriented points to 1e-6 rel residual",
        "value": round(ms, 3),
        "unit": "ms/field",
        "vs_baseline": round(baseline_ms / ms, 3),
    }))


if __name__ == "__main__":
    main()
