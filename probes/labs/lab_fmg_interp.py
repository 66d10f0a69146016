import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu import multigrid as mg
from field_interpolation_tpu.weights import SolverConfig, Weights

for shape, n in [((256, 256), 1000), ((1024, 1024), 20000)]:
    rng = np.random.default_rng(0)
    D = len(shape)
    pos = rng.uniform(1, np.asarray(shape) - 2, size=(n, D)).astype(np.float32)
    t = pos / (np.asarray(shape) - 1)
    vals = (np.sin(2*np.pi*t[:,0]) * np.cos(2*np.pi*2*t[:,1])
            + 0.1*rng.standard_normal(n)).astype(np.float32)
    w = Weights(model_2=0.3, data_pos=1.0)
    grid = fi.Grid(shape)
    cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", maxiter=2000)
    _, cold = fi.interpolate(grid, w, jnp.asarray(pos), jnp.asarray(vals), config=cfg)
    cshape = tuple(max(2, (s+1)//2) for s in shape)
    scale = (np.asarray(cshape, np.float64)-1)/(np.asarray(shape)-1)
    cpos = (pos * scale).astype(np.float32)
    for ctol in (3e-2, 1e-2, 1e-3):
        xc, ci = fi.interpolate(fi.Grid(cshape), w, jnp.asarray(cpos),
                                jnp.asarray(vals),
                                config=SolverConfig(tol=ctol, preconditioner="multigrid"))
        x0 = mg.prolong(xc, shape)   # values: NO rescale
        _, warm = fi.interpolate(grid, w, jnp.asarray(pos), jnp.asarray(vals),
                                 config=cfg, x0=x0)
        print(f"{shape} ctol={ctol:g}: cold={int(cold.iterations)} "
              f"coarse={int(ci.iterations)} fine={int(warm.iterations)} "
              f"conv={bool(warm.converged)}", flush=True)
