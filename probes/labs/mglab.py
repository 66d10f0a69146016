"""MG lab: pure-NumPy/SciPy iteration-count attribution on the REAL 256²
headline problem. Extracts the exact sparse operator by stencil-coloring
probes of the repo's matter-free apply, then A/Bs hierarchy + smoother
variants in f64 PCG. Iteration counts are backend-independent — this tells
us which preconditioner change is worth building on TPU.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu import multigrid
from field_interpolation_tpu.weights import SolverConfig, Weights

SHAPE = (256, 256)
RADIUS = 2  # model_2 -> B^T B radius 2; data radius 1


def make_circle_cloud(n, grid_shape, radius_frac=0.35, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    center = (np.asarray(grid_shape, np.float64) - 1.0) / 2.0
    radius = radius_frac * min(grid_shape)
    theta = rng.uniform(0, 2 * np.pi, n)
    normals = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    pts = center + radius * normals + noise * rng.standard_normal((n, 2))
    return pts.astype(np.float32), normals.astype(np.float32)


def probe_sparse(apply_fn, shape, radius=RADIUS):
    """Exact sparse matrix of a radius-`radius` stencil operator via
    lattice-coloring probes: stride s=2r+1 per axis, s² applies."""
    s = 2 * radius + 1
    n0, n1 = shape
    n = n0 * n1
    rows, cols, vals = [], [], []
    I0, I1 = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    for c0 in range(s):
        for c1 in range(s):
            e = np.zeros(shape, np.float64)
            e[c0::s, c1::s] = 1.0
            y = np.asarray(apply_fn(jnp.asarray(e, jnp.float64)), np.float64)
            # each nonzero y[i] belongs to the unique source within radius
            src0 = np.round((I0 - c0) / s).astype(int) * s + c0
            src1 = np.round((I1 - c1) / s).astype(int) * s + c1
            ok = (np.abs(I0 - src0) <= radius) & (np.abs(I1 - src1) <= radius) \
                 & (src0 >= 0) & (src0 < n0) & (src1 >= 0) & (src1 < n1)
            nz = ok & (y != 0.0)
            rows.append((I0[nz] * n1 + I1[nz]))
            cols.append((src0[nz] * n1 + src1[nz]))
            vals.append(y[nz])
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return A


def kron_P(fine_shape, coarse_shape):
    P0 = multigrid._resize_matrix(fine_shape[0], coarse_shape[0])
    P1 = multigrid._resize_matrix(fine_shape[1], coarse_shape[1])
    return sp.csr_matrix(sp.kron(sp.csr_matrix(P0), sp.csr_matrix(P1)))


class Hier:
    """V-cycle preconditioner from sparse per-level operators."""

    def __init__(self, As, Ps, shapes, smoother="jacobi", nu=3, omega=0.95,
                 cheb_ratio=20.0, cycle="v"):
        self.As, self.Ps, self.shapes = As, Ps, shapes
        self.nu, self.smoother, self.cycle = nu, smoother, cycle
        self.inv_d = []
        self.taus, self.rhos = [], []
        for A in As:
            d = A.diagonal().copy()
            d[d <= 0] = 1.0
            self.inv_d.append(1.0 / d)
            rowabs = np.abs(A).sum(axis=1).A.ravel()
            rho = (rowabs / d).max()
            self.rhos.append(rho)
            self.taus.append(2.0 * omega / rho)
        self.cheb_ratio = cheb_ratio
        self.lu = spla.splu(sp.csc_matrix(As[-1]))

    def cheb_coefs(self, rho, nu):
        if self.smoother == "chebyshev4":
            return [((2.0 * k - 3.0) / (2.0 * k + 1.0),
                     (8.0 * k - 4.0) / ((2.0 * k + 1.0) * rho))
                    for k in range(1, nu + 1)]
        lmax, lmin = rho, rho / self.cheb_ratio
        theta, delta = 0.5 * (lmax + lmin), 0.5 * (lmax - lmin)
        sigma = theta / delta
        out = [(0.0, 1.0 / theta)]
        rho_prev = 1.0 / sigma
        for _ in range(1, nu):
            rho_k = 1.0 / (2.0 * sigma - rho_prev)
            out.append((rho_k * rho_prev, 2.0 * rho_k / delta))
            rho_prev = rho_k
        return out

    def smooth(self, li, r, z, iters, from_zero):
        A, inv_d = self.As[li], self.inv_d[li]
        if iters == 0:
            return np.zeros_like(r) if from_zero else z
        if from_zero:
            z = np.zeros_like(r)
        if self.smoother == "jacobi":
            tau = self.taus[li]
            for _ in range(iters):
                z = z + tau * inv_d * (r - A @ z)
            return z
        cf = self.cheb_coefs(self.rhos[li], iters)
        zp = z
        for k in range(iters):
            az = A @ z
            z, zp = z + cf[k][0] * (z - zp) + cf[k][1] * inv_d * (r - az), z
        return z

    def vcycle(self, r, li=0):
        if li == len(self.As) - 1:
            return self.lu.solve(r)
        z = self.smooth(li, r, r, self.nu, True)
        P = self.Ps[li]
        rc = P.T @ (r - self.As[li] @ z)
        zc = self.vcycle(rc, li + 1)
        if self.cycle == "w" and li + 1 < len(self.As) - 1:
            rc2 = rc - self.As[li + 1] @ zc
            zc = zc + self.vcycle(rc2, li + 1)
        z = z + P @ zc
        return self.smooth(li, r, z, self.nu, False)


def pcg(A, b, M, tol, maxiter=400):
    x = np.zeros_like(b)
    r = b.copy()
    bnorm = np.linalg.norm(b)
    z = M(r)
    p = z.copy()
    rz = r @ z
    for k in range(maxiter):
        if np.linalg.norm(r) <= tol * bnorm:
            return k
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        z = M(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxiter


def main():
    grid = fi.Grid(SHAPE)
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = make_circle_cloud(1000, SHAPE, seed=0)
    prob = fi.assemble_sdf(grid, w, jnp.asarray(pts), jnp.asarray(nrm))
    cfg = SolverConfig(tol=1e-6, preconditioner="multigrid")

    print("probing fine operator...", flush=True)
    A0 = probe_sparse(prob.apply, SHAPE)
    asym = abs(A0 - A0.T).max()
    print("fine asymmetry (fp32 probe):", asym, flush=True)
    A0 = (A0 + A0.T) * 0.5
    b = np.asarray(prob.b, np.float64).ravel()

    levels = multigrid.build_levels(prob, cfg)
    shapes = [SHAPE] + [l.shape for l in levels]
    print("level shapes:", shapes, flush=True)

    # repo hierarchy: probe each level's apply
    As_repo = [A0]
    for lvl in levels:
        As_repo.append(probe_sparse(lvl.apply, lvl.shape))
    Ps = [kron_P(shapes[i], shapes[i + 1]) for i in range(len(shapes) - 1)]

    # exact Galerkin hierarchy: A_{l+1} = P^T A_l P
    As_gal = [A0]
    for P in Ps:
        As_gal.append(sp.csr_matrix(P.T @ As_gal[-1] @ P))

    results = {}

    def run(name, hier):
        M = lambda r: hier.vcycle(r)
        i4 = pcg(A0, b, M, 1e-4)
        i6 = pcg(A0, b, M, 1e-6)
        results[name] = (i4, i6)
        print(f"{name:42s} iters@1e-4={i4:4d}  iters@1e-6={i6:4d}", flush=True)

    run("repo lumped / jacobi v(3,3)", Hier(As_repo, Ps, shapes))
    run("repo lumped / cheb4 v(3,3)",
        Hier(As_repo, Ps, shapes, smoother="chebyshev4"))
    run("galerkin exact / jacobi v(3,3)", Hier(As_gal, Ps, shapes))
    run("galerkin exact / cheb4 v(3,3)",
        Hier(As_gal, Ps, shapes, smoother="chebyshev4"))
    # two-grid: exact coarse solve at 128^2 -> upper bound on everything
    # below level 1
    run("two-grid exact(128^2) / jacobi v(3,3)",
        Hier(As_gal[:2], Ps[:1], shapes[:2]))
    run("two-grid exact / cheb4 v(3,3)",
        Hier(As_gal[:2], Ps[:1], shapes[:2], smoother="chebyshev4"))
    run("two-grid REPO op exact / jacobi v(3,3)",
        Hier(As_repo[:2], Ps[:1], shapes[:2]))
    # three-grid exact at 64^2
    run("three-grid exact(64^2) / jacobi v(3,3)",
        Hier(As_gal[:3], Ps[:2], shapes[:3]))
    run("galerkin exact / jacobi W(3,3)",
        Hier(As_gal, Ps, shapes, cycle="w"))
    run("repo lumped / jacobi v(6,6)", Hier(As_repo, Ps, shapes, nu=6))
    run("galerkin exact / cheb4 v(6,6)",
        Hier(As_gal, Ps, shapes, smoother="chebyshev4", nu=6))

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
