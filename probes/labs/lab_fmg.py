"""FMG (nested iteration) initial-guess lab: does solving a coarsened
problem first and prolonging cut total solve cost?  Iteration counts via
the production solver on CPU; wall-time extrapolation uses the measured
per-iteration costs (256²: coarse iters are latency-bound ~0.85x fine;
4096²: bandwidth-bound ~0.25x fine)."""
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np, jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu import multigrid as mg
from field_interpolation_tpu.weights import SolverConfig, Weights


def cloud(n, shape, seed=0):
    rng = np.random.default_rng(seed)
    c = (np.asarray(shape, np.float64) - 1) / 2
    r = 0.35 * min(shape)
    th = rng.uniform(0, 2 * np.pi, n)
    nr = np.stack([np.cos(th), np.sin(th)], 1)
    pts = c + r * nr + 0.2 * rng.standard_normal((n, 2))
    return pts.astype(np.float32), nr.astype(np.float32)


def run(shape, npts, tol, coarse_tols=(None, 3e-2, 1e-2, 3e-3, 1e-3)):
    grid = fi.Grid(shape)
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(npts, shape)
    cfg = SolverConfig(tol=tol, preconditioner="multigrid", maxiter=2000)
    prob = fi.assemble_sdf(grid, w, jnp.asarray(pts), jnp.asarray(nrm))

    # coarse problem: assemble the SAME cloud on the coarsened grid
    # (positions scale with the grid; the reference-faithful way a user
    # would nest). Scale positions by (nc-1)/(n-1) per axis.
    cshape = tuple(max(2, (n + 1) // 2) for n in shape)
    cgrid = fi.Grid(cshape)
    scale = (np.asarray(cshape, np.float64) - 1) / (np.asarray(shape) - 1)
    cpts = (pts * scale).astype(np.float32)
    cprob = fi.assemble_sdf(cgrid, w, jnp.asarray(cpts), jnp.asarray(nrm))
    # SDF values are in lattice units: prolonged coarse SDF must be
    # rescaled by the grid ratio to be a fine-lattice SDF guess.
    inv_scale = float(1.0 / scale.min())

    for ctol in coarse_tols:
        if ctol is None:
            x0 = None
            citers = 0
        else:
            ccfg = SolverConfig(tol=ctol, preconditioner="multigrid",
                                maxiter=2000)
            xc, cinfo = fi.solve(cprob, ccfg)
            citers = int(cinfo.iterations)
            x0 = mg.prolong(xc, shape) * inv_scale
        x, info = fi.solve(prob, cfg, x0=x0)
        fit = int(info.iterations)
        eq_latency = fit + 0.85 * citers     # 256²-like (latency-bound)
        eq_bw = fit + 0.25 * citers          # 4096²-like (bandwidth-bound)
        print(f"{shape} tol={tol:g} coarse_tol={str(ctol):6s}: "
              f"coarse={citers:3d} fine={fit:3d}  "
              f"eq(latency)={eq_latency:5.1f} eq(bw)={eq_bw:5.1f} "
              f"rel={float(info.rel_residual):.1e} conv={bool(info.converged)}",
              flush=True)


if __name__ == "__main__":
    run((256, 256), 1000, 1e-4)
    run((1024, 1024), 20000, 1e-4)
