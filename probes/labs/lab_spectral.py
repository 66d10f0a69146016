"""Spectral (Kronecker-sum eigendecomposition) preconditioner lab.

The smoothness normal operator S is an exact Kronecker sum of per-axis 1D
operators: S = A1 (x) I + I (x) A2 (+ w0^2 I).  So (S + sigma*I)^{-1} is
exactly applicable via two dense 256x256 eigenvector transforms + an
elementwise divide -- pure MXU work, no multi-level latency chain.

Question: how many PCG iterations does M = (S + sigma I)^{-1} cost on the
REAL headline problem (256^2 SDF, 1k oriented points) vs the repo MG
V-cycle (~14 @1e-4 / ~26 @1e-6)?
"""
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

import field_interpolation_tpu as fi
from field_interpolation_tpu import explicit
from field_interpolation_tpu.weights import Weights

import sys
from mglab import make_circle_cloud, probe_sparse, pcg

SHAPE = (256, 256)


def axis_operator_1d(n, w):
    """Per-axis 1D smoothness normal operator (orders 1..3, boundary-dropped
    rows), from the explicit oracle on a 1D grid. Excludes order-0 (it is a
    per-node row, added once, not per axis)."""
    g = fi.Grid((n,))
    w1d = Weights(model_0=0.0, model_1=w.model_1, model_2=w.model_2,
                  model_3=w.model_3, data_pos=0.0, data_gradient=0.0)
    eq = explicit.LinearEquation()
    explicit.add_field_constraints(eq, g, w1d)
    A, _ = eq.to_scipy(n)
    AtA = (A.T @ A).toarray()
    return np.asarray(AtA, np.float64)


def main():
    grid = fi.Grid(SHAPE)
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = make_circle_cloud(1000, SHAPE, seed=0)
    prob = fi.assemble_sdf(grid, w, jnp.asarray(pts), jnp.asarray(nrm))

    print("probing fine operator...", flush=True)
    A0 = probe_sparse(prob.apply, SHAPE)
    A0 = (A0 + A0.T) * 0.5
    b = np.asarray(prob.b, np.float64).ravel()

    # 1D axis operator + sanity check of the Kronecker-sum identity on the
    # smoothness-only part: assemble a points-free problem and compare.
    A1 = axis_operator_1d(SHAPE[0], w)
    n = SHAPE[0]
    S_kron = sp.kron(sp.csr_matrix(A1), sp.identity(n)) + \
             sp.kron(sp.identity(n), sp.csr_matrix(A1))
    prob_s = fi.assemble_sdf(grid, w, jnp.zeros((0, 2)), jnp.zeros((0, 2)))
    S_probe = probe_sparse(prob_s.apply, SHAPE)
    err = abs(S_probe - S_kron).max()
    print("kron-sum identity max err:", err, flush=True)

    lam, Q = np.linalg.eigh(A1)
    lam = np.maximum(lam, 0.0)

    # data diagonal (A0 diag minus smoothness diag)
    d_data = A0.diagonal() - S_kron.diagonal()
    d_pos = d_data[d_data > 1e-12]
    print(f"data diag: nnz={d_pos.size}/{d_data.size} mean={d_pos.mean():.4g} "
          f"max={d_pos.max():.4g} mean_all={d_data.mean():.4g}", flush=True)

    L2 = lam[:, None] + lam[None, :]

    def spectral_M(sigma):
        inv = 1.0 / (L2 + sigma)
        def M(r):
            R = r.reshape(SHAPE)
            Z = Q.T @ R @ Q
            Z = Z * inv
            return (Q @ Z @ Q.T).ravel()
        return M

    sigmas = {
        "mean_all": float(d_data.mean()),
        "mean_nnz": float(d_pos.mean()),
        "0.25*mean_all": 0.25 * float(d_data.mean()),
        "4*mean_all": 4.0 * float(d_data.mean()),
        "1e-3": 1e-3,
        "1e-2": 1e-2,
        "1e-1": 1e-1,
    }
    for name, s in sigmas.items():
        M = spectral_M(s)
        i4 = pcg(A0, b, M, 1e-4)
        i6 = pcg(A0, b, M, 1e-6)
        print(f"spectral sigma={name:14s} ({s:.3g})  "
              f"iters@1e-4={i4:4d}  iters@1e-6={i6:4d}", flush=True)




def main2():
    """Two-level: Jacobi smoothing on full A + spectral exact (S+sigma I)^{-1}
    as the same-grid coarse correction. No hierarchy, no transfers."""
    grid = fi.Grid(SHAPE)
    w = Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = make_circle_cloud(1000, SHAPE, seed=0)
    prob = fi.assemble_sdf(grid, w, jnp.asarray(pts), jnp.asarray(nrm))
    A0 = probe_sparse(prob.apply, SHAPE)
    A0 = (A0 + A0.T) * 0.5
    b = np.asarray(prob.b, np.float64).ravel()
    A1 = axis_operator_1d(SHAPE[0], w)
    lam, Q = np.linalg.eigh(A1)
    lam = np.maximum(lam, 0.0)
    L2 = lam[:, None] + lam[None, :]

    d = A0.diagonal().copy()
    d[d <= 0] = 1.0
    invd = 1.0 / d
    rowabs = np.abs(A0).sum(axis=1).A.ravel()
    rho = (rowabs / d).max()
    omega = 0.95
    tau = 2.0 * omega / rho

    def make_M(sigma, nu):
        inv = 1.0 / (L2 + sigma)
        def B(r):
            Z = Q.T @ r.reshape(SHAPE) @ Q
            return (Q @ (Z * inv) @ Q.T).ravel()
        def M(r):
            z = tau * invd * r
            for _ in range(nu - 1):
                z = z + tau * invd * (r - A0 @ z)
            z = z + B(r - A0 @ z)
            for _ in range(nu):
                z = z + tau * invd * (r - A0 @ z)
            return z
        return M

    for sigma in (0.012, 0.048, 0.192, 1e-3):
        for nu in (1, 2, 3):
            M = make_M(sigma, nu)
            i4 = pcg(A0, b, M, 1e-4)
            i6 = pcg(A0, b, M, 1e-6)
            print(f"2lvl spectral sigma={sigma:<7g} nu={nu}  "
                  f"iters@1e-4={i4:4d}  iters@1e-6={i6:4d}", flush=True)

if __name__ == "__main__":
    main2()
