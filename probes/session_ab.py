"""Setup-reuse A/B (same-session, same inputs): K frames of fresh normal
targets on FIXED positions, solved (a) cold — full sdf_from_points_precise
per frame, (b) via session.Solver's prepared path. Both arms consume the
IDENTICAL input stream and report K-difference marginals + iteration
counts, so the delta is exactly the reusable setup (geometry assembly + MG
hierarchy + dense-coarsest factor), not problem hardness.

Run: `python probes/session_ab.py` (chip); `--smoke` for CPU plumbing.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import time
import numpy as np
import jax
import jax.numpy as jnp

import field_interpolation_tpu as fi
from _common import cloud

SHAPE = (256, 256)
N = 1000


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    Ks = (2, 4) if smoke else (64, 256)
    print("device:", jax.devices()[0], flush=True)

    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    pts, _ = cloud(N, SHAPE, seed=0)
    pts_d = jnp.asarray(pts)
    zeros = jnp.zeros(N)

    def normals_stream(K):
        # Fresh unit normals per frame — same hardness class as the
        # headline's fresh clouds, positions held fixed.
        rng = np.random.default_rng(7)
        th = rng.uniform(0, 2 * np.pi, (K, N))
        return jnp.asarray(
            np.stack([np.cos(th), np.sin(th)], -1).astype(np.float32))

    s = fi.Solver(grid, w, pts_d, config=cfg, precise=True)
    from field_interpolation_tpu.session import _resolve_precise
    geo, prep = s._geo, s._prep

    def run_arm(name, body):
        ts = {}
        for K in Ks:
            nrms = normals_stream(K)

            def many(nrms):
                def one(c, n):
                    x, info = body(n)
                    return c + jnp.sum(x.astype(jnp.float32)), (
                        info.iterations, info.rel_residual, info.converged)
                return jax.lax.scan(one, jnp.float32(0), nrms)

            with jax.enable_x64():
                manyj = jax.jit(many)
                out = manyj(nrms)
                float(out[0])
                t0 = time.perf_counter()
                out = manyj(nrms)
                float(out[0])
                ts[K] = time.perf_counter() - t0
            it, rel, conv = out[1]
            print(f"  {name} K={K}: {ts[K]*1e3:.1f} ms  "
                  f"iters<= {int(jnp.max(it))} "
                  f"max rel={float(jnp.max(rel)):.1e} "
                  f"all conv={bool(jnp.all(conv))}", flush=True)
        per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
        print(f"{name:8s} {per*1e3:8.3f} ms/frame (K-difference)", flush=True)
        return per

    cold = run_arm("cold", lambda n: fi.sdf_from_points_precise(
        grid, w, pts_d, n, config=cfg))
    sess = run_arm("session", lambda n: _resolve_precise(
        geo, zeros, n, None, prep, cfg))
    print(f"setup reuse saves {(cold - sess)*1e3:.3f} ms/frame "
          f"({(1 - sess/cold)*100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
