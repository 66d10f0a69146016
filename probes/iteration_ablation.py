"""On-chip decomposition of the fused-PCG iteration at 256^2 (VERDICT r3
item 5): chained ablated kernel variants — launch floors cancel because each
variant is the SAME single kernel with N in-kernel iterations; only the
ablated component differs.

Timing is the chained K-DIFFERENCE (two chain lengths, differenced): a
single-chain reading smears the flat ~33 ms tunnel dispatch over the
iterations as a phantom per-iter cost — the exact trap NOTES_ROUND4.md
item 5 documents (it produced two wrong attributions before being caught).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu.multigrid import build_fused_solver_operands
from field_interpolation_tpu.ops.pallas_stencil import fused_pcg_solve


import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import cloud  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    grid = fi.Grid((256, 256))
    weights = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(1000, grid.shape)
    p = fi.assemble_sdf(grid, weights, jnp.asarray(pts), jnp.asarray(nrm))
    cfg = fi.SolverConfig(preconditioner="multigrid")
    ops = build_fused_solver_operands(p, cfg)
    coeffs, sids, Rs, inv32, lw, cfs = ops
    N, K1, K2 = 50, 10, 50
    tol2 = jnp.zeros((1, 1), jnp.float32)
    budget = jnp.full((1, 1), N, jnp.int32)
    x0 = jnp.zeros(grid.shape, jnp.float32)
    b = p.b

    results = {}
    for wcyc in (False, True):
        for ablate in (None, "no_vcycle", "no_apply", "no_both"):
            if wcyc and ablate not in (None,):
                continue  # W only needs the full variant (vcycle delta)

            def make_chain(K):
                @jax.jit
                def chain(b):
                    def rep(r, _):
                        x, iters, rr = fused_pcg_solve(
                            x0, r, tol2, budget, coeffs, sids, Rs, inv32, lw,
                            3, False, cheb_coefs=cfs,
                            wdepth=99 if wcyc else 0, ablate=ablate)
                        # serialize reps through the iteration-count scalar
                        r2 = b + jnp.float32(iters[0, 0]) * 0.0
                        return r2, iters[0, 0]
                    _, its = jax.lax.scan(rep, b, None, length=K)
                    return its

                return chain

            # K-difference: time both chain lengths, difference out the
            # flat dispatch round trip (best-of-3 each).
            t_at, it_at = {}, {}
            for K in (K1, K2):
                chain = make_chain(K)
                int(jnp.sum(chain(b)))  # warmup + sync
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    tot_it = int(jnp.sum(chain(b)))
                    ts.append(time.perf_counter() - t0)
                t_at[K], it_at[K] = min(ts), tot_it
            per = (t_at[K2] - t_at[K1]) * 1e6 / (it_at[K2] - it_at[K1])
            results[(wcyc, ablate)] = per
            print(f"wcycle={wcyc} ablate={ablate}: {per:.2f} us/iter "
                  f"(chains {t_at[K1]*1e3:.1f}/{t_at[K2]*1e3:.1f} ms, "
                  f"{it_at[K1]}/{it_at[K2]} iters)", flush=True)

    full = results[(False, None)]
    print(f"\ndecomposition (V): full={full:.1f}us  "
          f"vcycle={full - results[(False,'no_vcycle')]:.1f}us  "
          f"apply={full - results[(False,'no_apply')]:.1f}us  "
          f"dots+axpy+loop={results[(False,'no_both')]:.1f}us")
    print(f"W full={results[(True, None)]:.1f}us "
          f"(W vcycle delta vs V: "
          f"{results[(True, None)] - full:.1f}us)")


if __name__ == "__main__":
    main()
