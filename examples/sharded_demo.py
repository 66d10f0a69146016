"""Distributed-solve demo: one grid block-decomposed over a device mesh.

Runs on any machine: if fewer than 8 real devices are present, it requests 8
virtual CPU devices (the same trick the test suite uses), so you can see the
full sharded machinery — ppermute halo exchange, psum inner products, and
distributed multigrid — without a TPU pod. On a real multi-chip mesh the same
code runs with halos over ICI.

    python examples/sharded_demo.py
"""

import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import field_interpolation_tpu as fi
from field_interpolation_tpu.parallel import (shard_problem,
                                              solve_refined_sharded,
                                              solve_sharded)


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--grid", type=int, default=256,
                    help="square grid edge (default 256; the rot test "
                         "passes 128 to keep the 1-core CI budget)")
    ap.add_argument("--n", type=int, default=800, help="number of points")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    g = args.grid
    grid = fi.Grid((g, g))
    weights = fi.Weights(model_2=0.3)

    # Oriented points on a noisy circle.
    theta = rng.uniform(0, 2 * np.pi, args.n)
    normals = np.stack([np.cos(theta), np.sin(theta)], -1).astype(np.float32)
    pts = ((g - 1) / 2.0 + 0.3125 * g * normals
           + 0.2 * rng.standard_normal((args.n, 2))).astype(np.float32)

    problem = fi.assemble_sdf(grid, weights, jnp.asarray(pts),
                              jnp.asarray(normals))
    cfg = fi.SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla")

    # Single-device reference.
    t0 = time.perf_counter()
    x_ref, info_ref = fi.solve(problem, cfg)
    x_ref.block_until_ready()
    print(f"unsharded: iters={int(info_ref.iterations)} "
          f"rel={float(info_ref.rel_residual):.1e} "
          f"({(time.perf_counter()-t0)*1e3:.0f} ms incl. compile)")

    # The same problem over a 2x4 mesh: distributed multigrid keeps the
    # iteration count equal to the unsharded solve by construction.
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("x", "y"))
    sharded = shard_problem(problem, mesh)
    t0 = time.perf_counter()
    x_sh, info_sh = solve_sharded(sharded, mesh, cfg)
    x_sh.block_until_ready()
    print(f"sharded {mesh.devices.shape}: iters={int(info_sh.iterations)} "
          f"rel={float(info_sh.rel_residual):.1e} "
          f"({(time.perf_counter()-t0)*1e3:.0f} ms incl. compile)")

    err = float(jnp.max(jnp.abs(x_sh - x_ref)) / jnp.max(jnp.abs(x_ref)))
    print(f"sharded vs unsharded max rel diff: {err:.1e}")

    # Mixed-precision sharded refinement: TRUE <= 1e-6 residual vs the f64
    # system, with fp32 sharded inner solves. The PreciseProblem carries the
    # matter-free precision protocol (owner-sharded f64 sample rows, one
    # exact-scatter residual, incremental hi/lo updates) — the same tier the
    # single-chip sdf_from_points_precise uses.
    pp = fi.assemble_precise(grid, weights, jnp.asarray(pts),
                             jnp.zeros(len(pts), jnp.float32),
                             gradients=jnp.asarray(normals))
    cfg_r = fi.SolverConfig(tol=1e-6, preconditioner="multigrid",
                            maxiter=2000, backend="xla")
    x_r, info_r = solve_refined_sharded(pp, mesh, cfg_r)
    x_r.block_until_ready()
    print(f"sharded refined: rel={float(info_r.rel_residual):.1e} "
          f"conv={bool(info_r.converged)} (TRUE f64-measured residual)")
    assert bool(info_sh.converged) and bool(info_r.converged)
    assert abs(int(info_sh.iterations) - int(info_ref.iterations)) <= 2
    print("OK")


if __name__ == "__main__":
    main()
