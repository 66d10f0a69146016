"""On-chip smoke for the rank-1 (1D) fused Pallas apply (VERDICT r4 weak #5 /
next-round item 9): `fits_vmem` hard-excludes rank-1, so production 1D always
takes the XLA path. This probe calls `fused_normal_apply(..., ndim=1)`
DIRECTLY on a real 1D problem and either

  (a) compiles + matches problem.apply → evidence to lift the exclusion, or
  (b) fails in Mosaic / mismatches → the exclusion is formally retired with
      the error recorded (NOTES_ROUND5).

Also times the XLA 1D apply so the "1D is trivially fast on XLA" claim gets a
number. Run alone (one chip probe at a time).
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import traceback
import numpy as np
import jax
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu.ops import pallas_stencil as ps


def main():
    print("device:", jax.devices()[0], flush=True)
    n = 4096
    grid = fi.Grid((n,))
    w = fi.Weights(model_2=0.3, data_pos=1.0)
    rng = np.random.default_rng(0)
    pts = rng.uniform(2, n - 3, (256, 1)).astype(np.float32)
    vals = rng.standard_normal(256).astype(np.float32)
    prob = fi.assemble(grid, w, jnp.asarray(pts), jnp.asarray(vals))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ref = jax.jit(prob.apply)(x)
    ref.block_until_ready()

    # XLA 1D apply timing (chained, scalar fence — CLAUDE.md tunnel rule).
    K = 512

    @jax.jit
    def chain(x):
        def body(c, _):
            y = prob.apply(c)
            return y / (1.0 + jnp.float32(1e-30)), None
        y, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(y)

    float(chain(x))
    t0 = time.perf_counter()
    s = float(chain(x))
    dt = time.perf_counter() - t0
    print(f"XLA 1D apply (n={n}): {dt/K*1e6:.1f} us/apply "
          f"(chain of {K}, incl ~33ms dispatch once; sum={s:.3e})", flush=True)

    # The fused rank-1 kernel, bypassing fits_vmem.
    try:
        out = ps.fused_normal_apply(x, prob.coeff, w, 1, interpret=False)
        out.block_until_ready()
        err = float(jnp.max(jnp.abs(out - ref))
                    / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
        print(f"rank-1 fused apply COMPILED; max rel err vs XLA = {err:.2e}",
              flush=True)

        @jax.jit
        def chain_p(x):
            def body(c, _):
                y = ps.fused_normal_apply(c, prob.coeff, w, 1)
                return y / (1.0 + jnp.float32(1e-30)), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(y)

        float(chain_p(x))
        t0 = time.perf_counter()
        s = float(chain_p(x))
        dt = time.perf_counter() - t0
        print(f"fused 1D apply: {dt/K*1e6:.1f} us/apply (sum={s:.3e})",
              flush=True)
    except Exception:
        print("rank-1 fused apply FAILED to compile/run:", flush=True)
        traceback.print_exc()
        print("→ retire the rank-1 Pallas path formally (keep XLA routing).",
              flush=True)


if __name__ == "__main__":
    main()
