"""Smoothness normal operator as exact composite convolutions.

Reference counterpart: `add_field_constraints` emits per-axis FD rows and Eigen
forms `AᵀA` explicitly (SURVEY.md §2 C3, §3.1). Here `AᵀA` restricted to the
smoothness rows is applied matter-free: per axis and order, rows are all valid
length-L windows of taps ``s``, so ``w² BᵀB x = w² · full_conv(valid_corr(x, s), s)``
— two 1-D shift-and-add passes that are *exact* including the reference's
dropped-row boundary policy (SPEC.md). XLA fuses the shifts; a fused Pallas
kernel provides the roofline path (ops/pallas_stencil.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .weights import Weights

# Stencil taps per smoothness order (SPEC.md table).
STENCIL_TAPS: dict[int, tuple[float, ...]] = {
    0: (1.0,),
    1: (-1.0, 1.0),
    2: (1.0, -2.0, 1.0),
    3: (-1.0, 3.0, -3.0, 1.0),
}


def autocorrelation(taps: tuple[float, ...]) -> np.ndarray:
    """Interior normal-equation stencil: correlate(s, s), length 2L-1."""
    s = np.asarray(taps, dtype=np.float64)
    return np.convolve(s, s[::-1])


def _valid_corr(x: jax.Array, taps: tuple[float, ...], axis: int) -> jax.Array:
    """y[r] = sum_m s[m] * x[r + m] over all fully-inside windows (length n-L+1)."""
    n = x.shape[axis]
    L = len(taps)
    m = n - L + 1
    acc = None
    for k, s in enumerate(taps):
        term = s * lax.slice_in_dim(x, k, k + m, axis=axis)
        acc = term if acc is None else acc + term
    return acc


def _full_conv_t(y: jax.Array, taps: tuple[float, ...], axis: int, n: int) -> jax.Array:
    """z[i] = sum_m s[m] * y[i - m]  (Bᵀ y; output length n)."""
    L = len(taps)
    ndim = y.ndim
    acc = None
    for k, s in enumerate(taps):
        pad = [(0, 0)] * ndim
        pad[axis] = (k, L - 1 - k)
        term = s * jnp.pad(y, pad)
        acc = term if acc is None else acc + term
    return acc


def axis_normal_apply(x: jax.Array, order: int, axis: int) -> jax.Array:
    """(BᵀB)x for one axis/order family of smoothness rows (unweighted)."""
    taps = STENCIL_TAPS[order]
    n = x.shape[axis]
    if n < len(taps):  # no rows fit -> zero operator
        return jnp.zeros_like(x)
    y = _valid_corr(x, taps, axis)
    return _full_conv_t(y, taps, axis, n)


def smoothness_apply(x: jax.Array, weights: Weights, ndim: int | None = None) -> jax.Array:
    """S x = Σ_orders Σ_axes w_k² (BᵀB) x, per SPEC.md.

    ``ndim``: number of trailing grid axes of ``x`` (defaults to ``x.ndim``);
    leading axes are treated as batch.
    """
    if ndim is None:
        ndim = x.ndim
    grid_axes = range(x.ndim - ndim, x.ndim)
    out = jnp.zeros_like(x)
    for order in weights.active_orders():
        w2 = weights.model_weight(order) ** 2
        if order == 0:
            out = out + w2 * x  # emitted once per node, not per axis
            continue
        for ax in grid_axes:
            out = out + w2 * axis_normal_apply(x, order, ax)
    return out


@functools.lru_cache(maxsize=None)
def _axis_diag_1d(order: int, n: int) -> np.ndarray:
    """diag(BᵀB) along one axis: diag_i = Σ_{windows r covering i} s[i-r]²."""
    taps = np.asarray(STENCIL_TAPS[order], dtype=np.float64)
    L = len(taps)
    if n < L:
        return np.zeros(n)
    ones = np.ones(n - L + 1)
    return np.convolve(ones, taps**2)  # length n


def smoothness_diag(shape: tuple[int, ...], weights: Weights,
                    dtype=jnp.float32) -> jax.Array:
    """diag(S) as a grid-shaped array (for the Jacobi preconditioner,
    SURVEY.md §7 PR2)."""
    diag = np.zeros(shape, dtype=np.float64)
    for order in weights.active_orders():
        w2 = weights.model_weight(order) ** 2
        if order == 0:
            diag += w2
            continue
        for ax in range(len(shape)):
            d1 = _axis_diag_1d(order, shape[ax])
            bshape = [1] * len(shape)
            bshape[ax] = shape[ax]
            diag += w2 * d1.reshape(bshape)
    return jnp.asarray(diag, dtype=dtype)


@functools.lru_cache(maxsize=None)
def _axis_rowabs_1d(order: int, n: int) -> np.ndarray:
    """Row absolute sums of the 1-D BᵀB band matrix: rowabs_i = Σ_j |(BᵀB)_ij|.

    Band at offset +d: band_d[i] = Σ_r s_{i-r} s_{i+d-r} over valid windows r,
    i.e. conv(ones(num_rows), t_d) with t_d[m] = s_m s_{m+d}."""
    taps = np.asarray(STENCIL_TAPS[order], dtype=np.float64)
    L = len(taps)
    if n < L:
        return np.zeros(n)
    ones = np.ones(n - L + 1)
    rowabs = np.zeros(n)
    for d in range(L):
        t_d = taps[: L - d] * taps[d:]
        band = np.abs(np.convolve(ones, t_d))          # length n - d
        rowabs[: n - d] += band                         # partner at i + d
        if d > 0:
            rowabs[d:] += band                          # partner at i - d
    return rowabs


def smoothness_row_abs_sum(shape: tuple[int, ...], weights: Weights,
                           dtype=jnp.float32) -> jax.Array:
    """Σ_j |S_ij| per node — a Gershgorin-style bound used to auto-scale the
    multigrid Jacobi damping (ρ(D⁻¹A) ≤ max rowabs/diag)."""
    out = np.zeros(shape, dtype=np.float64)
    for order in weights.active_orders():
        w2 = weights.model_weight(order) ** 2
        if order == 0:
            out += w2
            continue
        for ax in range(len(shape)):
            prof = _axis_rowabs_1d(order, shape[ax])
            bshape = [1] * len(shape)
            bshape[ax] = shape[ax]
            out += w2 * prof.reshape(bshape)
    return jnp.asarray(out, dtype=dtype)


def max_stencil_radius(weights: Weights) -> int:
    """Operator radius per axis = max active order (halo width for sharding)."""
    orders = [k for k in weights.active_orders() if k > 0]
    return max(orders) if orders else 0
