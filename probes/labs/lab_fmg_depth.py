"""Recursive fmg_start (full-FMG) depth lab: per-LEVEL iteration counts of
the nested-iteration pyramid on the headline SDF family, production solver,
CPU backend. The recursion leaves the fine count unchanged (same coarse
tolerance either way) and cuts the COARSE bill — this lab quantifies by how
much, so the on-chip depth arms in probes/fmg_ab.py have predictions.

Cost model: at bandwidth-bound scales a level-l iteration costs ~4^-l of a
fine iteration (2D); the table prints that weighted total per depth.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import dataclasses

import jax.numpy as jnp
import numpy as np

import field_interpolation_tpu as fi
from field_interpolation_tpu.weights import SolverConfig, Weights


def cloud(n, shape, seed=0):
    """Noisy circle/sphere cloud in any dimension."""
    rng = np.random.default_rng(seed)
    D = len(shape)
    c = (np.asarray(shape, np.float64) - 1) / 2
    r = 0.35 * min(shape)
    nr = rng.standard_normal((n, D))
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    pts = c + r * nr + 0.2 * rng.standard_normal((n, D))
    return pts.astype(np.float32), nr.astype(np.float32)


def run(shape, npts, tol):
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(npts, shape)
    cfg = SolverConfig(tol=tol, preconditioner="multigrid", maxiter=2000)

    def solve_level(shape_l, depth, ctol):
        """Solve the cloud at shape_l, warm-started from depth more levels
        below; returns (x, [(shape, iters) coarsest→this])."""
        grid = fi.Grid(shape_l)
        scale = ((np.asarray(shape_l, np.float64) - 1)
                 / (np.asarray(shape, np.float64) - 1))
        p = jnp.asarray((pts * scale).astype(np.float32))
        prob = fi.assemble_sdf(grid, w, p, jnp.asarray(nrm))
        x0, counts = None, []
        cshape = tuple(max(2, (n + 1) // 2) for n in shape_l)
        if depth > 0 and cshape != shape_l:
            xc, counts = solve_level(cshape, depth - 1, ctol)
            from field_interpolation_tpu.multigrid import prolong
            csc = ((np.asarray(cshape, np.float64) - 1)
                   / (np.asarray(shape_l, np.float64) - 1))
            x0 = prolong(xc, shape_l) * float(1.0 / csc.min())
        lcfg = dataclasses.replace(cfg, tol=(tol if shape_l == shape
                                             else ctol))
        x, info = fi.solve(prob, lcfg, x0=x0)
        counts.append((shape_l, int(info.iterations)))
        return x, counts

    for depth in (0, 1, 2, 3):
        _, counts = solve_level(shape, depth, 1e-3)
        # bandwidth-bound cost model: a level-l iteration costs 2^-(D*l)
        # fine-iteration units (2D: 4^-l, 3D: 8^-l)
        f = 0.5 ** len(shape)
        total = sum(it * f ** (len(counts) - 1 - i)
                    for i, it in enumerate(c[1] for c in counts))
        chain = " <- ".join(f"{'x'.join(map(str, s))}:{it}" for (s, it) in
                            [(c[0], c[1]) for c in counts][::-1])
        print(f"{shape} @{tol:g} depth={depth}: {chain}   "
              f"weighted-total={total:.1f} fine-equivalents", flush=True)


if __name__ == "__main__":
    import sys
    if "--3d" in sys.argv:
        run((128, 128, 128), 4_000, 1e-4)
    else:
        run((1024, 1024), 10_000, 1e-4)
