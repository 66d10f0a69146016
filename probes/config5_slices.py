"""Config-5-scale slice decomposition (VERDICT r4 missing #4): the same
K-difference methodology as probes/headline_slices.py, at 4096² (and
optionally 256³ with --3d), attributing the @1e-4 and @TRUE-1e-6 wall
times to: fp32 assembly / MG setup / fp32 MG solve / refine tier. Run in
the SAME session as `python bench.py` to reconcile the bench-of-record
numbers with A/B-table numbers (the round-4 466-vs-234 ms spread).

Chains are short (each 4096² solve is hundreds of ms) — Ks=(1,3) puts
~2 solves of work against the ±3 ms dispatch jitter, ample.

Run: `python probes/config5_slices.py [--3d]`; `--smoke` for CPU plumbing
(tiny grid).
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


def make_cloud(shape, n, seed=0):
    rng = np.random.default_rng(seed)
    if len(shape) == 2:
        th = rng.uniform(0, 2 * np.pi, n)
        nrm = np.stack([np.cos(th), np.sin(th)], -1).astype(np.float32)
        c = (np.asarray(shape, np.float64) - 1) / 2
        pts = (c + 0.35 * min(shape) * nrm).astype(np.float32)
    else:
        u = rng.standard_normal((n, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        nrm = u.astype(np.float32)
        c = (np.asarray(shape, np.float64) - 1) / 2
        pts = (c + 0.31 * min(shape) * nrm).astype(np.float32)
    return pts, nrm


def kdiff(label, make_chain, Ks):
    ts = {}
    out = None
    for K in Ks:
        run, args = make_chain(K)
        runj = jax.jit(run)
        out = runj(*args)
        float(out[0])
        t0 = time.perf_counter()
        out = runj(*args)
        float(out[0])
        ts[K] = time.perf_counter() - t0
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"{label:24s} {per*1e3:9.2f} ms/step  chains="
          f"{ {k: round(v, 3) for k, v in ts.items()} }", flush=True)
    return per, out


def decompose(shape, n, smoke):
    grid = fi.Grid(shape)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    cfg4 = fi.SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=500)
    cfg6 = fi.SolverConfig(tol=1e-6, preconditioner="multigrid", maxiter=500)
    Ks = (1, 3) if not smoke else (1, 2)
    print(f"--- {shape}, {n} pts ---", flush=True)

    def stream(K):
        ptss, nrms = [], []
        for s in range(K):
            p, m = make_cloud(shape, n, seed=s)
            ptss.append(p), nrms.append(m)
        return jnp.asarray(np.stack(ptss)), jnp.asarray(np.stack(nrms))

    def chain_asm(K):
        ptss, nrms = stream(K)

        def run(ptss, nrms):
            def one(c, pn):
                prob = fi.assemble_sdf(grid, w, pn[0], pn[1])
                return c + (jnp.sum(prob.b) + jnp.sum(prob.diag)) * 1e-9, 0
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))
        return run, (ptss, nrms)

    def chain_setup(K):
        ptss, nrms = stream(K)
        from field_interpolation_tpu.multigrid import prepare_mg

        def run(ptss, nrms):
            def one(c, pn):
                prob = fi.assemble_sdf(grid, w, pn[0], pn[1])
                prep = prepare_mg(prob, cfg4, want_fused=False)
                acc = sum(jnp.sum(l.diag) * 1e-9 for l in prep.levels)
                if prep.coarse_dense is not None:
                    acc = acc + jnp.sum(prep.coarse_dense) * 1e-9
                return c + acc + jnp.sum(prob.b) * 1e-9, 0
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))
        return run, (ptss, nrms)

    def chain_solve4(K):
        ptss, nrms = stream(K)

        def run(ptss, nrms):
            def one(c, pn):
                x, info = fi.sdf_from_points(grid, w, pn[0], pn[1],
                                             config=cfg4)
                return c + jnp.sum(x) * 1e-9, (info.iterations,
                                               info.converged)
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))
        return run, (ptss, nrms)

    def chain_refined(K):
        ptss, nrms = stream(K)

        def run(ptss, nrms):
            def one(c, pn):
                x, info = fi.sdf_from_points_precise(grid, w, pn[0], pn[1],
                                                     config=cfg6)
                return (c + jnp.sum(x.astype(jnp.float32)) * 1e-9,
                        (info.iterations, info.converged))
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))
        return run, (ptss, nrms)

    t_asm, _ = kdiff("fp32 assembly", chain_asm, Ks)
    t_setup, _ = kdiff("assembly+MG setup", chain_setup, Ks)
    t_s4, out4 = kdiff("full @1e-4", chain_solve4, Ks)
    it4 = int(jnp.max(out4[1][0]))
    t_r6, out6 = kdiff("full @TRUE 1e-6", chain_refined, Ks)
    it6 = int(jnp.max(out6[1][0]))
    print(f"slices: asm {t_asm*1e3:.1f} | setup {(t_setup-t_asm)*1e3:.1f} | "
          f"solve@1e-4 {(t_s4-t_setup)*1e3:.1f} ({it4} iters) | "
          f"refine-extra {(t_r6-t_s4)*1e3:.1f} ({it6} iters total)",
          flush=True)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0], flush=True)
    if smoke:
        decompose((256, 256), 1000, True)
        return
    decompose((4096, 4096), 100_000, False)
    if "--3d" in sys.argv:
        decompose((256, 256, 256), 100_000, False)


if __name__ == "__main__":
    main()
