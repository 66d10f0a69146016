"""On-chip A/B: cell-windowed densify (`constraints._densify_cellwise`) vs
the flat elementwise scatter (`_densify_flat_scatter`) at config-5 scale.

Motivation: probes/config5_slices.py (round 5, same-session) measured fp32
assembly at 97.2 ms of the 271 ms 256³/100k @1e-4 wall (36%) and 29.9 ms at
4096² — dominated by the n·(C²+C) scalar scatter updates (7.2M in 3D). The
cellwise path scatters n row-vector payloads instead and converts
cell→node layout with fused static shifts.

Also checks correctness on-chip (max rel diff vs the flat scatter).

Run: `python probes/assembly_ab.py [--smoke]` (one chip probe at a time).
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu import constraints as cons


def make_cloud(shape, n, seed=0):
    rng = np.random.default_rng(seed)
    D = len(shape)
    pts = rng.uniform(1.0, np.asarray(shape, np.float64) - 2.0,
                      (n, D)).astype(np.float32)
    u = rng.standard_normal((n, D))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    return pts, u.astype(np.float32)


def densify(grid, w, pts, nrm, impl):
    corner_idx, rows, inb = cons.multilinear_corner_data(grid, pts)
    n, R, C = rows.shape
    rw = jnp.where(inb[:, None], 1.0, 0.0) * jnp.concatenate(
        [jnp.full((n, 1), w.data_pos), jnp.full((n, R - 1), w.data_gradient)],
        axis=1)
    tgt = jnp.concatenate([jnp.zeros((n, 1)), nrm], axis=1).astype(jnp.float32)
    Bw = rows * rw[:, :, None]
    M = jnp.einsum("nrc,nrd->ncd", Bw, Bw,
                   precision=jax.lax.Precision.HIGHEST)
    bvec = jnp.einsum("nrc,nr->nc", Bw, tgt * rw,
                      precision=jax.lax.Precision.HIGHEST)
    return impl(grid, corner_idx, M, bvec)


def kdiff(label, grid, w, shape, n, impl, Ks=(1, 3)):
    ts = {}
    for K in Ks:
        ptss, nrms = [], []
        for s in range(K):
            p, m = make_cloud(shape, n, seed=s)
            ptss.append(p), nrms.append(m)
        ptss, nrms = jnp.asarray(np.stack(ptss)), jnp.asarray(np.stack(nrms))

        @jax.jit
        def run(ptss, nrms):
            def one(c, pn):
                coeff, b = densify(grid, w, pn[0], pn[1], impl)
                return c + (jnp.sum(coeff) + jnp.sum(b)) * 1e-9, 0
            return jax.lax.scan(one, jnp.float32(0), (ptss, nrms))

        out = run(ptss, nrms)
        float(out[0])
        t0 = time.perf_counter()
        out = run(ptss, nrms)
        float(out[0])
        ts[K] = time.perf_counter() - t0
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"{label:34s} {per*1e3:9.2f} ms/step  chains="
          f"{ {k: round(v, 3) for k, v in ts.items()} }", flush=True)
    return per


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0], flush=True)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)

    # correctness first (moderate size, on the same backend)
    for shape in [(97, 83), (33, 29, 31)]:
        grid = fi.Grid(shape)
        pts, nrm = make_cloud(shape, 5000, seed=7)
        cb, bb = jax.jit(lambda p, m: densify(
            grid, w, p, m, cons._densify_flat_scatter))(pts, nrm)
        for name, impl in [("cellwise", cons._densify_cellwise),
                           ("sym", cons._densify_flat_scatter_sym)]:
            ca, ba = jax.jit(lambda p, m: densify(grid, w, p, m, impl))(
                pts, nrm)
            rc = float(jnp.max(jnp.abs(ca - cb)) / jnp.max(jnp.abs(cb)))
            rb = float(jnp.max(jnp.abs(ba - bb)) / jnp.max(jnp.abs(bb)))
            print(f"correctness {shape} {name:9s}: coeff rel {rc:.2e}, "
                  f"b rel {rb:.2e}", flush=True)

    cases = ([((256, 256), 1000)] if smoke
             else [((4096, 4096), 100_000), ((256, 256, 256), 100_000)])
    for shape, n in cases:
        grid = fi.Grid(shape)
        kdiff(f"{shape} flat scatter", grid, w, shape, n,
              cons._densify_flat_scatter, Ks=(1, 2) if smoke else (1, 3))
        kdiff(f"{shape} cell-windowed", grid, w, shape, n,
              cons._densify_cellwise, Ks=(1, 2) if smoke else (1, 3))
        kdiff(f"{shape} sym (upper-tri)", grid, w, shape, n,
              cons._densify_flat_scatter_sym, Ks=(1, 2) if smoke else (1, 3))


if __name__ == "__main__":
    main()
