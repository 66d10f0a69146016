"""On-chip A/B: gather vs strided-slice MG transfer evaluation at 4096²
(and 256³). Forces the old gather path by blanking the _strided_bands
cache, so both arms run the identical banded math.

Run one arm at a time is NOT needed — both arms are same-session, chained
K-difference timed (see probes/README.md for the methodology rules).
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu import multigrid as mg
from field_interpolation_tpu.utils import measure_marginal


_REAL_STRIDED_BANDS = mg._strided_bands


def force_gather(on: bool):
    """Swap _strided_bands for a None-returning stub (gather fallback)."""
    mg._strided_bands = (functools.lru_cache(maxsize=None)(lambda *a: None)
                         if on else _REAL_STRIDED_BANDS)


from _common import cloud  # noqa: E402 (N-D: fixes the 256^3 arm)


def transfer_pair_ab(shape=(4096, 4096)):
    """Marginal cost of one restrict+prolong round trip, both arms."""
    coarse = tuple(max(2, (n + 1) // 2) for n in shape)
    restrict = mg.make_restrict(shape, coarse)

    def step(x):
        rc = restrict(x)
        return x + 1e-12 * mg.prolong(rc, shape)

    x0 = jnp.ones(shape, jnp.float32)
    for arm in ("strided", "gather"):
        force_gather(arm == "gather")
        s, _ = measure_marginal(step, x0, counts=(8, 64))
        print(f"{shape} restrict+prolong [{arm}]: {s*1e3:.3f} ms/pair",
              flush=True)
    force_gather(False)


def solve_ab(shape=(4096, 4096), npts=100_000, tol=1e-4):
    """End-to-end assemble+solve at scale, both arms (auto W-cycle)."""
    import time
    grid = fi.Grid(shape)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=tol, preconditioner="multigrid", maxiter=2000)
    pts, nrm = cloud(npts, shape)
    p, n = jnp.asarray(pts), jnp.asarray(nrm)
    for arm in ("strided", "gather", "strided"):   # ABA guards drift
        force_gather(arm == "gather")

        @jax.jit
        def run(p, n):
            x, info = fi.sdf_from_points(grid, w, p, n, config=cfg)
            return jnp.sum(x), info.iterations, info.rel_residual

        s, it, rr = run(p, n)
        float(s)  # warmup incl. compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, it, rr = run(p, n)
            float(s)
            ts.append(time.perf_counter() - t0)
        print(f"{shape} solve@{tol:g} [{arm}]: {min(ts)*1e3:.0f} ms "
              f"(iters={int(it)}, rel={float(rr):.1e})", flush=True)
    force_gather(False)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    transfer_pair_ab((4096, 4096))
    solve_ab((4096, 4096))
    solve_ab((256, 256, 256), npts=100_000)
