"""Shared probe helpers (kept out of the library: probes are rig tooling)."""
import numpy as np


def cloud(n, shape, radius_frac=0.35, noise=0.2, seed=0):
    """Oriented point cloud on a noisy circle (2-D) / sphere (N-D):
    positions [n, D] in lattice coords + unit normals [n, D]."""
    rng = np.random.default_rng(seed)
    D = len(shape)
    c = (np.asarray(shape, np.float64) - 1.0) / 2.0
    r = radius_frac * min(shape)
    if D == 2:
        th = rng.uniform(0, 2 * np.pi, n)
        nr = np.stack([np.cos(th), np.sin(th)], 1)
    else:
        nr = rng.standard_normal((n, D))
        nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    pts = c + r * nr + noise * rng.standard_normal((n, D))
    return pts.astype(np.float32), nr.astype(np.float32)
