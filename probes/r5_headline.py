"""Round-5 on-chip measurements (one probe, one chip process):

1. NEW residual64 / apply64_delta marginals (df-glue rewrite) — compare
   against this round's res64_decomp leg numbers (rows64 0.111 ms,
   scat_exact 0.096, scat_hilo 0.040, smooth* 0.010) and round-4's
   method-level 0.209 / 0.140 ms (cross-day ±10%).
2. Headline marginal (256² SDF to TRUE 1e-6), K-difference over chained
   pipelines — the BENCH_r04 comparator is 1.409 ms/field.
3. session.Solver re-solve marginal (fixed positions, fresh targets each
   step, reused geometry+prep) at tol 1e-6 and 1e-4 — VERDICT r4 item 5
   target: ≤ ~1.0 ms/field for the honest tier.

Run: `python probes/r5_headline.py` (chip); `--smoke` forces CPU.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu.utils import measure_marginal
from _common import cloud

SHAPE = (256, 256)
N = 1000


def glue_marginals(counts):
    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(N, SHAPE)
    with jax.enable_x64():
        pp = fi.assemble_precise(grid, w, jnp.asarray(pts), jnp.zeros(N),
                                 gradients=jnp.asarray(nrm))
        x64 = jnp.asarray(
            np.random.default_rng(0).standard_normal(grid.shape),
            jnp.float64) * 1e-3

        def step_res64(c):
            r = pp.residual64(x64 * (1.0 + c * 1e-12))
            return c + jnp.sum(r) * 1e-9

        def step_app64d(c):
            r = pp.apply64_delta(x64 * (1.0 + c * 1e-12))
            return c + jnp.sum(r) * 1e-9

        for name, step in [("residual64_NEW", step_res64),
                           ("apply64_delta_NEW", step_app64d)]:
            s, det = measure_marginal(step, jnp.float64(0.0), counts=counts)
            print(f"{name:18s} {s*1e3:8.3f} ms/step  chains={det['times_s']}",
                  flush=True)


def headline_marginal(Ks):
    import time
    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=2000)
    rng = np.random.default_rng(3)

    def mk(K):
        ptss, nrms = [], []
        for s in range(K):
            p, n = cloud(N, SHAPE, seed=s)
            ptss.append(p), nrms.append(n)
        return jnp.asarray(np.stack(ptss)), jnp.asarray(np.stack(nrms))

    ts = {}
    for K in Ks:
        ptss, nrms = mk(K)

        @jax.jit
        def many(ptss, nrms):
            def one(carry, pn):
                p, n = pn
                x, info = fi.sdf_from_points_precise(grid, w, p, n,
                                                     config=cfg)
                return carry + jnp.sum(x.astype(jnp.float32)), (
                    info.iterations, info.rel_residual, info.converged)
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))

        out = many(ptss, nrms)
        float(out[0])  # warmup
        t0 = time.perf_counter()
        out = many(ptss, nrms)
        float(out[0])
        ts[K] = time.perf_counter() - t0
        it, rel, conv = out[1]
        print(f"  K={K}: {ts[K]*1e3:.1f} ms  iters<= {int(jnp.max(it))} "
              f"max rel={float(jnp.max(rel)):.1e} "
              f"all conv={bool(jnp.all(conv))}", flush=True)
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"headline_NEW      {per*1e3:8.3f} ms/field (K-difference)",
          flush=True)


def session_marginal(Ks, tol):
    import time
    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg = fi.SolverConfig(tol=tol, preconditioner="multigrid", maxiter=2000)
    pts, nrm = cloud(N, SHAPE)
    precise = tol <= 1e-5
    s = fi.Solver(grid, w, jnp.asarray(pts), config=cfg, precise=precise)
    from field_interpolation_tpu.session import _resolve32, _resolve_precise
    geo, prep = s._geo, s._prep
    zeros = jnp.zeros(N)
    rng = np.random.default_rng(4)

    ts = {}
    for K in Ks:
        # K fresh target sets on the FIXED geometry (the frame loop).
        nrms = jnp.asarray(nrm[None] + 0.02 * rng.standard_normal(
            (K, N, 2)).astype(np.float32))

        def many(nrms):
            def one(carry, n):
                if precise:
                    x, info = _resolve_precise(geo, zeros, n, None, prep, cfg)
                else:
                    x, info = _resolve32(geo, zeros, n, None, prep, cfg)
                return carry + jnp.sum(x.astype(jnp.float32)), (
                    info.iterations, info.converged)
            return jax.lax.scan(one, jnp.float32(0), nrms)

        if precise:
            with jax.enable_x64():
                manyj = jax.jit(many)
                out = manyj(nrms)
                float(out[0])
                t0 = time.perf_counter()
                out = manyj(nrms)
                float(out[0])
                ts[K] = time.perf_counter() - t0
        else:
            manyj = jax.jit(many)
            out = manyj(nrms)
            float(out[0])
            t0 = time.perf_counter()
            out = manyj(nrms)
            float(out[0])
            ts[K] = time.perf_counter() - t0
        it, conv = out[1]
        print(f"  K={K}: {ts[K]*1e3:.1f} ms  iters<= {int(jnp.max(it))} "
              f"all conv={bool(jnp.all(conv))}", flush=True)
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"session_resolve @tol={tol:g}: {per*1e3:8.3f} ms/field "
          f"(K-difference)", flush=True)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    counts = (1, 3) if smoke else (64, 512)
    Ks = (2, 4) if smoke else (64, 256)
    print("device:", jax.devices()[0], flush=True)
    glue_marginals(counts)
    headline_marginal(Ks)
    session_marginal(Ks, 1e-6)
    session_marginal(Ks, 1e-4)


if __name__ == "__main__":
    main()
