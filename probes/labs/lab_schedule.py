"""Inner-tolerance schedule lab (CPU, production solver): does a shallower
per-round inner tolerance cut TOTAL inner iterations for the TRUE-1e-6
refined headline? Iteration counts are backend-independent.

Replays the refined outer loop in Python: fp32 inner fi.solve at tol=eta_k,
f64 residual via the exact PreciseProblem machinery.
"""
import sys, os
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses
import numpy as np
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu.weights import SolverConfig, Weights

SHAPE = (256, 256)


def cloud(n, shape, seed=0):
    rng = np.random.default_rng(seed)
    c = (np.asarray(shape, np.float64) - 1) / 2
    r = 0.35 * min(shape)
    th = rng.uniform(0, 2 * np.pi, n)
    nr = np.stack([np.cos(th), np.sin(th)], 1)
    pts = c + r * nr + 0.2 * rng.standard_normal((n, 2))
    return pts.astype(np.float32), nr.astype(np.float32)


def main():
    grid = fi.Grid(SHAPE)
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(1000, SHAPE)
    pp = fi.assemble_precise(grid, w, jnp.asarray(pts),
                             jnp.zeros(1000), gradients=jnp.asarray(nrm))
    p32 = pp.p32
    b64 = np.asarray(pp.b64, np.float64)   # grid-shaped
    bnorm = np.linalg.norm(b64.ravel())
    tol = 1e-6

    def replay(cap, floor=1e-4, label=""):
        """cap: max reduction per round (the 0.5 production cap), i.e.
        inner_tol_k = clip(0.5*tol/rel, floor, cap)."""
        x = np.zeros(SHAPE, np.float64)
        r = b64.copy()
        total, rounds = 0, 0
        for k in range(12):
            rel = np.linalg.norm(r.ravel()) / bnorm
            if rel <= tol:
                break
            eta = float(np.clip(0.5 * tol / rel, floor, cap))
            prob_r = dataclasses.replace(p32, b=jnp.asarray(r, jnp.float32))
            cfg = SolverConfig(tol=eta, preconditioner="multigrid",
                               maxiter=2000, max_restarts=1)
            d, info = fi.solve(prob_r, cfg)
            x = x + np.asarray(d, np.float64).reshape(SHAPE)
            r = np.asarray(pp.residual64(jnp.asarray(x)), np.float64).reshape(SHAPE)
            total += int(info.iterations)
            rounds += 1
        rel = np.linalg.norm(r.ravel()) / bnorm
        print(f"cap={cap:<8g} floor={floor:g} {label:18s} rounds={rounds} "
              f"total_inner_iters={total:3d} final_rel={rel:.2e} "
              f"conv={rel <= tol}", flush=True)
        return total

    replay(0.5, label="(production)")
    for cap in (0.2, 0.1, 0.05, 0.03, 0.01, 3e-3, 1e-3):
        replay(cap)
    # also: deeper floor irrelevant; try floor 3e-4 (stop round-1 earlier)
    for floor in (3e-4, 1e-3, 3e-3):
        replay(0.5, floor=floor, label="(looser floor)")


if __name__ == "__main__":
    main()
