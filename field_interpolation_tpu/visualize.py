"""Field → image helpers (reference L3: the GUI's heatmap + gradient-arrow
rendering, SURVEY.md §1/§2 C11). Host-side NumPy; returns uint8 RGB arrays so
callers can save them with any imaging library (no matplotlib dependency)."""

from __future__ import annotations

import numpy as np


def sdf_colormap(field: np.ndarray, scale: float | None = None) -> np.ndarray:
    """Classic SDF heatmap: blue outside (positive), orange inside (negative),
    white at the surface, with distance banding. Returns [H, W, 3] uint8."""
    f = np.asarray(field, dtype=np.float64)
    if scale is None:
        scale = max(1e-9, np.percentile(np.abs(f), 95))
    t = np.clip(f / scale, -1.0, 1.0)

    outside = np.array([90, 140, 255.0])
    inside = np.array([255, 150, 60.0])
    base = np.where(t[..., None] >= 0, outside, inside)
    # Fade toward white at the zero level set.
    fade = np.abs(t)[..., None]
    rgb = 255.0 * (1 - fade) + base * fade
    # Distance bands (every 0.1 of scale) like the reference demo's rings.
    bands = 0.5 + 0.5 * np.cos(np.abs(t) * 20 * np.pi)
    rgb *= (0.92 + 0.08 * bands[..., None])
    return np.clip(rgb, 0, 255).astype(np.uint8)


def value_colormap(field: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """Simple signed-value heatmap (viridis-free: blue→white→red diverging)."""
    f = np.asarray(field, dtype=np.float64)
    vmin = np.min(f) if vmin is None else vmin
    vmax = np.max(f) if vmax is None else vmax
    mid = 0.5 * (vmin + vmax)
    half = max(1e-9, 0.5 * (vmax - vmin))
    t = np.clip((f - mid) / half, -1, 1)
    neg = np.array([60, 100, 255.0])
    pos = np.array([255, 70, 70.0])
    base = np.where(t[..., None] >= 0, pos, neg)
    rgb = 255.0 * (1 - np.abs(t)[..., None]) + base * np.abs(t)[..., None]
    return np.clip(rgb, 0, 255).astype(np.uint8)


def draw_contour(image: np.ndarray, segments: np.ndarray,
                 color=(0, 0, 0)) -> np.ndarray:
    """Rasterize marching-squares segments onto an image (in lattice coords:
    segment endpoints are (row, col)). Simple line stamping, test/demo aid."""
    img = image.copy()
    H, W = img.shape[:2]
    for a, b in segments:
        n = int(np.ceil(np.hypot(*(b - a)) * 4)) + 1
        for t in np.linspace(0.0, 1.0, n):
            p = a + t * (b - a)
            r, c = int(round(p[0])), int(round(p[1]))
            if 0 <= r < H and 0 <= c < W:
                img[r, c] = color
    return img


def draw_arrows(image: np.ndarray, positions: np.ndarray,
                directions: np.ndarray, length: float = 6.0,
                color=(0, 200, 0)) -> np.ndarray:
    """Rasterize direction arrows at lattice positions — the reference GUI's
    gradient/normal-arrow overlay (SURVEY.md §3.2 'heatmap + arrows +
    contour'). positions/directions are [n, 2] in (row, col) lattice coords;
    each arrow is a `length`-pixel shaft along the (normalized) direction
    plus two short head strokes. Same stamping style as draw_contour."""
    img = image.copy()
    H, W = img.shape[:2]
    pos = np.asarray(positions, np.float64)
    d = np.asarray(directions, np.float64)
    norm = np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    d = d / norm

    def stamp(a, b):
        n = int(np.ceil(np.hypot(*(b - a)) * 4)) + 1
        for t in np.linspace(0.0, 1.0, n):
            p = a + t * (b - a)
            r, c = int(round(p[0])), int(round(p[1]))
            if 0 <= r < H and 0 <= c < W:
                img[r, c] = color

    # 30° head strokes, 40% of the shaft
    ca, sa = np.cos(np.pi * 5 / 6), np.sin(np.pi * 5 / 6)
    for p, u in zip(pos, d):
        tip = p + length * u
        stamp(p, tip)
        left = np.array([ca * u[0] - sa * u[1], sa * u[0] + ca * u[1]])
        right = np.array([ca * u[0] + sa * u[1], -sa * u[0] + ca * u[1]])
        stamp(tip, tip + 0.4 * length * left)
        stamp(tip, tip + 0.4 * length * right)
    return img


def write_ppm(path: str, rgb: np.ndarray) -> None:
    """Save an RGB uint8 image as binary PPM (no imaging deps needed)."""
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(rgb, dtype=np.uint8).tobytes())
