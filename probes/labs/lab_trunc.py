"""Truncated hierarchy + ITERATIVE coarsest lab: stop the MG hierarchy at
32 (or 64) per side and solve the coarsest with k Chebyshev/Jacobi sweeps
instead of a dense inverse. Avoids both mg_min_size=32 blockers (in-kernel
dense matvec loop, setup-time inv)."""
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))); import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, scipy.sparse as sp
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu import multigrid
from field_interpolation_tpu.weights import SolverConfig, Weights
from mglab import make_circle_cloud, probe_sparse, pcg, kron_P, Hier

SHAPE = (256, 256)

grid = fi.Grid(SHAPE)
w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
pts, nrm = make_circle_cloud(1000, SHAPE, seed=0)
prob = fi.assemble_sdf(grid, w, jnp.asarray(pts), jnp.asarray(nrm))
cfg = SolverConfig(tol=1e-6, preconditioner="multigrid")
A0 = probe_sparse(prob.apply, SHAPE); A0 = (A0 + A0.T) * 0.5
b = np.asarray(prob.b, np.float64).ravel()

levels = multigrid.build_levels(prob, cfg)
shapes = [SHAPE] + [l.shape for l in levels]
print("full level shapes:", shapes, flush=True)
As = [A0] + [probe_sparse(l.apply, l.shape) for l in levels]
Ps = [kron_P(shapes[i], shapes[i+1]) for i in range(len(shapes)-1)]

class TruncHier(Hier):
    """Hierarchy truncated at `keep` levels; coarsest = k smoothing sweeps
    (from zero), no dense solve."""
    def __init__(self, As, Ps, shapes, keep, ksweeps, smoother="jacobi",
                 **kw):
        super().__init__(As[:keep], Ps[:keep-1], shapes[:keep],
                         smoother=smoother, **kw)
        self.ksweeps = ksweeps
        self.lu = None
    def vcycle(self, r, li=0):
        if li == len(self.As) - 1:
            return self.smooth(li, r, r, self.ksweeps, True)
        z = self.smooth(li, r, r, self.nu, True)
        P = self.Ps[li]
        rc = P.T @ (r - self.As[li] @ z)
        zc = self.vcycle(rc, li + 1)
        z = z + P @ zc
        return self.smooth(li, r, z, self.nu, False)

def run(name, hier):
    M = lambda r: hier.vcycle(r)
    i4 = pcg(A0, b, M, 1e-4); i6 = pcg(A0, b, M, 1e-6)
    print(f"{name:48s} @1e-4={i4:4d}  @1e-6={i6:4d}", flush=True)

run("FULL repo baseline v(3,3)+dense", Hier(As, Ps, shapes))
# find index of 32x32 and 64x64 in shapes
for keep_shape in ((64,64),(32,32),(16,16)):
    if keep_shape in shapes:
        keep = shapes.index(keep_shape) + 1
        for ks in (4, 8, 16, 32):
            for sm in ("jacobi", "chebyshev"):
                run(f"trunc@{keep_shape[0]} {sm} coarsest k={ks}",
                    TruncHier(As, Ps, shapes, keep, ks, smoother=sm))
