"""Demo: reconstruct the SDF of a noisy circle from oriented points — the
reference's flagship GUI scenario (SURVEY.md §3.2), as a script. Prints the
solve diagnostics and RMSE vs the analytic SDF (the reference GUI's metric)."""

import numpy as np
import jax.numpy as jnp

import field_interpolation_tpu as fi


def make_circle_samples(n, center, radius, noise, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    normals = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    pts = center + radius * normals + noise * rng.standard_normal((n, 2))
    return pts.astype(np.float32), normals.astype(np.float32)


def main():
    grid = fi.Grid((64, 64))
    center = np.array([31.5, 31.5])
    radius = 20.0
    pts, normals = make_circle_samples(200, center, radius, noise=0.3)

    weights = fi.Weights(model_1=0.0, model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid")
    field, info = fi.sdf_from_points_precise(grid, weights, pts, normals, config=cfg)

    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    analytic = np.sqrt((yy - center[0]) ** 2 + (xx - center[1]) ** 2) - radius
    mask = np.abs(analytic) < 5  # compare near the surface like the GUI does
    rmse = float(np.sqrt(np.mean((np.asarray(field) - analytic)[mask] ** 2)))

    print(f"converged={bool(info.converged)} iters={int(info.iterations)} "
          f"rel_residual={float(info.rel_residual):.2e}")
    print(f"RMSE vs analytic SDF (|d|<5 band): {rmse:.3f} lattice units")
    # Zero-level-set sanity: sign changes across the circle boundary.
    row = np.asarray(field)[32]
    crossings = np.sum(np.diff(np.sign(row)) != 0)
    print(f"zero crossings on center row: {crossings} (expect 2)")
    assert bool(info.converged)
    assert rmse < 0.6, rmse
    assert crossings == 2, crossings
    print("OK")


if __name__ == "__main__":
    main()
