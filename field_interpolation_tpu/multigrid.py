"""Geometric multigrid V-cycle preconditioner.

Generalizes the reference's 2-level coarse-lattice approximate solve
(`solve_sparse_linear_approximate_lattice`, SURVEY.md §2 C9, §3.5) into a full
V-cycle used as an SPD preconditioner for CG (`BASELINE.json:5,10`):

* transfers — endpoint-aligned separable linear prolongation ``P`` built as
  explicit static matrices (tensordot/MXU); the restriction is literally
  ``P.T``, which together with symmetric pre/post damped-Jacobi smoothing
  makes the V-cycle a symmetric positive-definite operator (safe inside CG).
* coarse operators — rediscretized smoothness with energy-matched weight
  scaling ``w_k ← w_k · 2^{(D-2k)/2}`` per coarsening (continuum argument:
  per-axis order-k row energy scales as ``h^{2k-D}``), plus a diagonally
  lumped data term ``diag_c = Pᵀ² diag_f`` (Galerkin diagonal of a diagonal
  matrix: squared interpolation weights).
* coarsest level — a dense inverse precomputed at setup (one small matmul
  per V-cycle), or fixed-count damped Jacobi from a zero guess; both are
  symmetric linear operations, so SPD-ness is preserved.

Everything is static-shape and vmap/shard_map compatible; the level hierarchy
is built at trace time from the static grid shape (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from . import stencils
from .grid import Grid
from .operators import Problem
from .weights import SolverConfig, Weights


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_out: int, n_in: int, square: bool = False) -> np.ndarray:
    """Endpoint-aligned separable linear resample as an explicit [n_out, n_in]
    matrix (static numpy constant). The restriction is literally ``P.T`` — no
    jax.linear_transpose, which breaks inside shard_map (cotangent varying-
    axis mismatch) — and the transfers run as small MXU matmuls.
    ``square=True`` squares the interpolation weights (Galerkin transfer of
    diagonal/lumped quantities)."""
    src = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.clip(np.floor(src).astype(int), 0, n_in - 2)
    t = src - lo
    w0, w1 = 1.0 - t, t
    if square:
        w0, w1 = w0 * w0, w1 * w1
    P = np.zeros((n_out, n_in))
    np.add.at(P, (np.arange(n_out), lo), w0)
    np.add.at(P, (np.arange(n_out), lo + 1), w1)
    P.setflags(write=False)  # lru_cached: a caller mutating the returned
    return P                 # array must fail loudly, not poison the cache


def _apply_axis_matrix(x: jax.Array, P: np.ndarray, axis: int) -> jax.Array:
    """Contract matrix P [n_out, n_in] with x's ``axis``."""
    Pj = jnp.asarray(P, dtype=x.dtype)
    out = jnp.tensordot(Pj, x, axes=[[1], [axis]],
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, 0, axis)


@functools.lru_cache(maxsize=None)
def _resize_bands(n_out: int, n_in: int, transpose: bool, square: bool):
    """Banded form (start [n_out] int32, w [W, n_out]) of the resize matrix
    (its transpose when ``transpose``): row r's nonzeros are w[:, r] at
    columns start[r]..start[r]+W-1 (W ≤ 2 for prolongation rows, ≤ 3 for
    restriction rows). Lets transfers run as W axis gathers + multiply-adds
    — O(N) — instead of dense [n_out, n_in] matmuls, whose HIGHEST-precision
    MXU cost dominates beyond-VMEM V-cycles (measured 6.5 ms for ONE
    4096→2048 restrict+prolong pair vs ~0.5 ms banded)."""
    M = _resize_matrix(n_out, n_in, square=square) if not transpose \
        else _resize_matrix(n_in, n_out, square=square).T
    W = max(int((M[r] != 0).sum()) for r in range(M.shape[0]))
    W = max(W, 1)
    start = np.zeros(M.shape[0], np.int32)
    w = np.zeros((W, M.shape[0]))
    for r in range(M.shape[0]):
        nz = np.nonzero(M[r])[0]
        s = int(nz[0]) if len(nz) else 0
        s = min(s, M.shape[1] - W)
        start[r] = s
        w[:, r] = M[r, s:s + W]
    start.setflags(write=False)
    w.setflags(write=False)
    return start, w


@functools.lru_cache(maxsize=None)
def _strided_bands(n_out: int, n_in: int, transpose: bool, square: bool):
    """Gather-free form of _resize_bands: realign every band to an AFFINE
    start (stride 2 when n_out < n_in, stride 1 per output parity when
    n_out > n_in), zero-padding the weights where a row's true start
    deviates. The endpoint-aligned transfers drift off the pure 2:1
    pattern by at most a row or two across the whole axis (coarsen is
    (n+1)//2), so the realigned width stays ≤ W+2 and the evaluation
    becomes strided lax.slice reads — no gather, the TPU-hostile op the
    banded form paid for (VERDICT r3 weak #3: ~1.8 ms/iteration of XLA
    gathers at 4096²).

    Returns None when the deviation is unexpectedly large (caller falls
    back to the gather path), else:
      stride-2 ("restrict-like"):  ("s2", b, pad_front, len_pad, w')
      parity  ("prolong-like"):    ("par", (b0, b1), pad_front, len_pad,
                                    (w'0, w'1))
    with w' [W', n_rows] aligned so row r reads xpad[a·r + b + pf + t].
    """
    start, w = _resize_bands(n_out, n_in, transpose, square)
    W = w.shape[0]

    def realign(rows_start, rows_w, a_times_r):
        # rows_start [m], rows_w [W, m]; affine index a_times_r[r] + b
        d0 = rows_start - a_times_r
        b = int(d0.min())
        d = d0 - b                       # per-row shift into the wide band
        D = int(d.max())
        if D > 2:                        # unexpectedly non-affine: bail out
            return None
        Wp = W + D
        m = rows_start.shape[0]
        wp = np.zeros((Wp, m))
        for r in range(m):
            wp[d[r]:d[r] + W, r] = rows_w[:, r]
        wp.setflags(write=False)
        return b, wp

    if n_out < n_in:                     # restriction-like: stride 2
        got = realign(start.astype(np.int64), w, 2 * np.arange(n_out))
        if got is None:
            return None
        b, wp = got
        pf = max(0, -b)
        need = 2 * (n_out - 1) + b + wp.shape[0] + pf
        return ("s2", b, pf, max(need, n_in + pf), wp)
    # prolongation-like: split output rows by parity, stride 1 each
    parts, pf_all, need_all = [], 0, n_in
    for p in (0, 1):
        rs = start[p::2].astype(np.int64)
        got = realign(rs, w[:, p::2], np.arange(rs.shape[0]))
        if got is None:
            return None
        b, wp = got
        pf_all = max(pf_all, -b)
        parts.append((b, wp))
    for b, wp in parts:
        need_all = max(need_all, (len(wp[0]) - 1) + b + wp.shape[0])
    return ("par", tuple(p[0] for p in parts), pf_all,
            need_all + pf_all, tuple(p[1] for p in parts))


def _apply_axis_resize(x: jax.Array, n_out: int, n_in: int, axis: int,
                       transpose: bool = False,
                       square: bool = False) -> jax.Array:
    """Banded resize along ``axis`` (same linear map as _apply_axis_matrix
    with the corresponding resize matrix). Evaluated gather-free as strided
    slices of a zero-padded operand (_strided_bands); falls back to W
    jnp.take gathers if the strided realignment doesn't apply."""
    sb = _strided_bands(n_out, n_in, transpose, square)
    xm = jnp.moveaxis(x, axis, 0)
    if sb is not None:
        kind, b, pf, need, wp = sb
        pad_back = need - pf - n_in
        xpad = jnp.pad(xm, [(pf, max(0, pad_back))] + [(0, 0)] * (xm.ndim - 1))
        if kind == "s2":
            bshape = (n_out,) + (1,) * (xm.ndim - 1)
            out = None
            for t in range(wp.shape[0]):
                s0 = b + pf + t
                seg = jax.lax.slice_in_dim(xpad, s0, s0 + 2 * (n_out - 1) + 1,
                                           stride=2, axis=0)
                term = jnp.asarray(wp[t], x.dtype).reshape(bshape) * seg
                out = term if out is None else out + term
            return jnp.moveaxis(out, 0, axis)
        outs = []
        for p in (0, 1):
            bp, wpp = b[p], wp[p]
            m = wpp.shape[1]
            bshape = (m,) + (1,) * (xm.ndim - 1)
            acc = None
            for t in range(wpp.shape[0]):
                s0 = bp + pf + t
                seg = jax.lax.slice_in_dim(xpad, s0, s0 + m, axis=0)
                term = jnp.asarray(wpp[t], x.dtype).reshape(bshape) * seg
                acc = term if acc is None else acc + term
            outs.append(acc)
        m0 = outs[0].shape[0]
        if outs[1].shape[0] < m0:        # odd n_out: pad the short parity
            pad = [(0, m0 - outs[1].shape[0])] + [(0, 0)] * (xm.ndim - 1)
            outs[1] = jnp.pad(outs[1], pad)
        inter = jnp.stack(outs, axis=1).reshape((2 * m0,) + xm.shape[1:])
        return jnp.moveaxis(inter[:n_out], 0, axis)

    start, w = _resize_bands(n_out, n_in, transpose, square)
    W = w.shape[0]
    idx = jnp.asarray(start)
    bshape = (n_out,) + (1,) * (xm.ndim - 1)
    out = None
    for t in range(W):
        rows = jnp.take(xm, jnp.clip(idx + t, 0, n_in - 1), axis=0)
        term = jnp.asarray(w[t], x.dtype).reshape(bshape) * rows
        out = term if out is None else out + term
    return jnp.moveaxis(out, 0, axis)


def prolong(xc: jax.Array, fine_shape: tuple[int, ...]) -> jax.Array:
    """P: coarse grid -> fine grid (trailing ``len(fine_shape)`` axes);
    banded-gather evaluation (see _resize_bands)."""
    base = xc.ndim - len(fine_shape)
    out = xc
    for d, n in enumerate(fine_shape):
        if out.shape[base + d] != n:
            out = _apply_axis_resize(out, n, out.shape[base + d], base + d)
    return out


def make_restrict(fine_shape: tuple[int, ...], coarse_shape: tuple[int, ...],
                  dtype=jnp.float32) -> Callable[[jax.Array], jax.Array]:
    """R = Pᵀ exactly (the transpose of the prolongation matrices);
    banded-gather evaluation (see _resize_bands)."""

    def restrict(rf: jax.Array) -> jax.Array:
        base = rf.ndim - len(fine_shape)
        out = rf
        for d in range(len(fine_shape)):
            n_f, n_c = fine_shape[d], coarse_shape[d]
            if n_f != n_c:
                out = _apply_axis_resize(out, n_c, n_f, base + d,
                                         transpose=True)
        return out

    return restrict


def restrict_diag(diag_f: jax.Array, coarse_shape: tuple[int, ...]) -> jax.Array:
    """Galerkin diagonal transfer: diag_c[j] = Σ_i P_ij² diag_f[i]."""
    base = diag_f.ndim - len(coarse_shape)
    out = diag_f
    for d in range(len(coarse_shape)):
        n_f, n_c = diag_f.shape[base + d], coarse_shape[d]
        if n_f != n_c:
            out = _apply_axis_resize(out, n_c, n_f, base + d,
                                     transpose=True, square=True)
    return out


# ---------------------------------------------------------------------------
# Galerkin (PᵀAP) transfer of the FULL 3^D data stencil (VERDICT r3 item 2a):
# the coarse data term keeps its off-diagonal coupling instead of being
# diagonally lumped. With the endpoint-aligned linear transfers the exact
# triple product of a radius-1 stencil is radius ≤ 2 per axis (the fractional
# alignment drift of non-dyadic grids adds rare |p|=2 entries); those are
# folded inward to keep the 3^D channel form the fused kernels already take
# (row sums preserved), then the folded stencil is re-symmetrized by
# averaging paired entries — the V-cycle preconditioner must stay symmetric.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _galerkin_axis_tensor(n_c: int, n_f: int) -> np.ndarray:
    """[5, n_c, 3, n_f] per-axis triple-product transfer: contracts a fine
    (offset o ∈ {−1,0,1}, node a) stencil axis pair into the coarse
    (offset p ∈ {−2..2}, node j) pair, EXACTLY:
    T[p, j, o, a] = Σ P[a, j]·P[a+o, j+p]. The |p| = 2 entries (endpoint-
    aligned transfers drift off dyadic alignment, widening PᵀAP past
    radius 1) are kept exact here and folded SPD-safely downstream."""
    P = _resize_matrix(n_f, n_c)  # prolongation [n_f, n_c]
    T = np.zeros((5, n_c, 3, n_f))
    for a in range(n_f):
        cols_a = np.nonzero(P[a])[0]
        for oi, o in enumerate((-1, 0, 1)):
            b = a + o
            if b < 0 or b >= n_f:
                continue
            for j in cols_a:
                pa = P[a, j]
                for j2 in np.nonzero(P[b])[0]:
                    p = j2 - j
                    T[p + 2, j, oi, a] += pa * P[b, j2]
    T.setflags(write=False)
    return T


def galerkin_coarse_coeff(coeff: jax.Array, coarse_shape: tuple[int, ...]
                          ) -> jax.Array:
    """Full Galerkin transfer of a [3^D, *fine] data stencil to
    [3^D, *coarse]: per-axis dense (MXU) contractions with the cached
    triple-product transfer matrices give the EXACT PᵀAP as a radius-2
    stencil; the rare |p| = 2 alignment-drift entries are then folded
    SPD-SAFELY — each symmetric pair (j, j+p)/(j+p, j) is dropped and |e|
    added to both row diagonals, i.e. A_fold = PᵀAP + Σ |e|·(e_j ∓ e_{j+p})
    (e_j ∓ e_{j+p})ᵀ ⪰ PᵀAP ≻ 0. (A row-sum-preserving inward fold was
    tried first and made the stencil INDEFINITE — min eig −6e-4 on a 12×10
    probe vs +2.4e-5 exact — which broke CG at 256²-class hierarchies:
    measured 1730 iterations vs 14 at tol 1e-4. Do not refold inward.)
    Preconditioner-only: CG's operator is always the fine one."""
    D = len(coarse_shape)
    fine_shape = coeff.shape[-D:]
    x = coeff.reshape((3,) * D + tuple(fine_shape))
    widths = []
    for d in range(D):
        n_f, n_c = fine_shape[d], coarse_shape[d]
        if n_f == n_c:
            widths.append(3)
            continue
        T = jnp.asarray(_galerkin_axis_tensor(n_c, n_f), x.dtype)
        x = jnp.tensordot(T, x, axes=[[2, 3], [d, D + d]],
                          precision=jax.lax.Precision.HIGHEST)
        x = jnp.moveaxis(x, (0, 1), (d, D + d))
        widths.append(5)
    # Fold the wide channels: |p_d| ≤ 1 everywhere → keep; any |p_d| = 2 →
    # row-diagonal compensation (see docstring).
    import itertools
    out = {}
    center_extra = None
    for idx in itertools.product(*[range(w) for w in widths]):
        p = tuple(i - w // 2 for i, w in zip(idx, widths))
        ch = x[idx]
        if all(abs(c) <= 1 for c in p):
            out[p] = ch
        else:
            a = jnp.abs(ch)
            center_extra = a if center_extra is None else center_extra + a
    from .constraints import offset_list
    offsets = offset_list(D)
    chans = []
    for ci in range(3 ** D):
        p = tuple(int(v) for v in offsets[ci])
        ch = out[p]
        if center_extra is not None and p == (0,) * D:
            ch = ch + center_extra
        chans.append(ch)
    return jnp.stack(chans)


def chebyshev_coefs(rho: jax.Array, nu: int, config) -> jax.Array:
    """[nu, 2] Chebyshev smoothing schedule on D⁻¹A.

    Uniform d-update recurrence (d₀ = 0):
        d ← c1_k·d + c2_k·D⁻¹(r − A z);  z ← z + d
    Row 0 has c1 unused (d₀ = 0), so the first step needs no special
    casing. Same polynomial for pre- and post-smoothing ⇒ the smoother is a
    fixed symmetric linear operator and the V-cycle stays SPD (the Jacobi
    argument, with p(D⁻¹A)D⁻¹ symmetric for any fixed polynomial p).

    mg_smoother="chebyshev": 1st-kind polynomial equi-oscillating on
    [ρ̂/mg_cheb_ratio, ρ̂]. "chebyshev4": 4th-kind polynomial on (0, ρ̂] —
    no λmin estimate needed, the standard modern MG smoothing choice
    (Lottes, "Optimal polynomial smoothers"; MFEM/hypre kind-4):
        c1_k = (2k−3)/(2k+1), c2_k = (8k−4)/((2k+1)·ρ̂), k = 1..ν."""
    if nu <= 0:
        return jnp.zeros((0, 2), jnp.float32)
    if config.mg_smoother == "chebyshev4":
        rows = []
        for k in range(1, nu + 1):
            rows.append(jnp.stack([
                jnp.full_like(rho, (2.0 * k - 3.0) / (2.0 * k + 1.0)),
                (8.0 * k - 4.0) / ((2.0 * k + 1.0) * rho)]))
        return jnp.stack(rows).astype(jnp.float32)
    lmax = rho
    lmin = rho / config.mg_cheb_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rows = [jnp.stack([jnp.zeros_like(theta), 1.0 / theta])]
    rho_prev = 1.0 / sigma
    for _ in range(1, nu):
        rho_k = 1.0 / (2.0 * sigma - rho_prev)
        rows.append(jnp.stack([rho_k * rho_prev, 2.0 * rho_k / delta]))
        rho_prev = rho_k
    return jnp.stack(rows).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _smoothness_dense_matrix(shape: tuple[int, ...], weights: Weights) -> np.ndarray:
    """Dense matrix of the smoothness normal operator on a (small) grid —
    problem-INDEPENDENT, so the coarsest-level operator assembles as
    ``S_const + diag(data_diag)`` instead of ``n_c`` traced operator applies
    per problem (the applies were a measurable per-field setup cost when
    solves are pipelined over distinct problems)."""
    n = math.prod(shape)
    S = np.zeros((n, n))
    for order in weights.active_orders():
        w2 = weights.model_weight(order) ** 2
        if order == 0:
            S += w2 * np.eye(n)
            continue
        for ax, m in enumerate(shape):
            taps = stencils.STENCIL_TAPS[order]
            L = len(taps)
            if m < L:
                continue
            B = np.zeros((m - L + 1, m))
            for r in range(m - L + 1):
                B[r, r:r + L] = taps
            S_ax = B.T @ B
            mats = [np.eye(shape[d]) if d != ax else S_ax
                    for d in range(len(shape))]
            K = mats[0]
            for M in mats[1:]:
                K = np.kron(K, M)
            S += w2 * K
    S.setflags(write=False)
    return S


def _dense_data_matrix(data_coeff: jax.Array, shape: tuple[int, ...]
                       ) -> jax.Array:
    """Dense [n, n] matrix of a 3^D-channel data stencil: A[i, i+o] =
    coeff[o, i]. Per channel the flattened offset is a fixed diagonal, and
    the entries that would wrap across a row/plane boundary are exactly the
    (zero) out-of-grid coefficients, so eye-diagonal placement is exact —
    no scatter (flat ~0.35 ms/scatter on this backend, CLAUDE.md)."""
    from .constraints import offset_list
    ndim = len(shape)
    n = math.prod(shape)
    strides = [1] * ndim
    for d in range(ndim - 2, -1, -1):
        strides[d] = strides[d + 1] * shape[d + 1]
    offsets = offset_list(ndim)
    flat = data_coeff.reshape(3 ** ndim, n)
    A = jnp.zeros((n, n), flat.dtype)
    for ci in range(offsets.shape[0]):
        k = int(sum(int(offsets[ci][d]) * strides[d] for d in range(ndim)))
        A = A + flat[ci][:, None] * jnp.eye(n, k=k, dtype=flat.dtype)
    return A


def _coarse_dense_inverse(lvl: "_Level") -> jax.Array:
    """Exact symmetric inverse of the coarsest operator: host-constant
    smoothness matrix + the per-problem data term (lumped diagonal, or the
    full Galerkin stencil densified via eye-diagonals).

    The operator is SPD, so the inverse is formed as L⁻ᵀL⁻¹ from a Cholesky
    factor + one blocked triangular solve — no pivot search. Symmetric in
    exact arithmetic, but XLA's matmul is not bitwise symmetric (measured
    1.5e-5 (i,j)/(j,i) gap), so the 0.5·(X+Xᵀ) repair is RETAINED — CG needs
    an exactly symmetric preconditioner. Measured 0.069 ms vs 0.156 ms for
    jnp.linalg.inv (LU, latency-bound) at n=256 on v5e
    (probes/inv_refine_ab.py) — this is per-PROBLEM setup cost on the
    refined-headline path, so the 2.3× matters."""
    S = jnp.asarray(_smoothness_dense_matrix(lvl.shape, lvl.weights),
                    lvl.diag.dtype)
    if lvl.data_coeff is not None:
        A_c = S + _dense_data_matrix(lvl.data_coeff, lvl.shape)
    else:
        A_c = S + jnp.diag(lvl.data_diag.ravel())
    # float32 matmul precision for the whole factorization: cholesky and
    # triangular_solve use matmuls INTERNALLY whose TPU default is bf16
    # passes — a less accurate coarse inverse stays SPD (CG still converges)
    # but silently costs extra iterations, and the suite never runs on the
    # TPU backend to catch it (ADVICE r4).
    with jax.default_matmul_precision("float32"):
        L = jnp.linalg.cholesky(A_c)
        Linv = jax.lax.linalg.triangular_solve(
            L, jnp.eye(A_c.shape[0], dtype=A_c.dtype), left_side=True,
            lower=True)
    # (L Lᵀ)⁻¹ = L⁻ᵀ L⁻¹ — symmetric in exact arithmetic, but XLA's matmul
    # does not evaluate the (i,j)/(j,i) pairs identically (measured 1.5e-5
    # gap on CPU), so keep the exact-symmetry repair: CG needs a symmetric
    # preconditioner. HIGHEST: the TPU default would run this bf16
    # (CLAUDE.md preconditioner-matmul invariant).
    inv = jnp.matmul(Linv.T, Linv, precision=jax.lax.Precision.HIGHEST)
    return 0.5 * (inv + inv.T)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Level:
    """One multigrid level (setup object, captured as constants — or, as a
    registered pytree, carried inside a prepared-setup MGPrep across the jit
    boundary so repeated solves skip the hierarchy build)."""

    data_diag: jax.Array      # diagonal of the data term [*shape]
    diag: jax.Array           # diag of this level's operator [*shape]
    shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    weights: Weights = dataclasses.field(metadata=dict(static=True))
    # Full 3^D-channel Galerkin data stencil (mg_coarse_data="galerkin");
    # None = diagonally-lumped data term (data_diag).
    data_coeff: jax.Array | None = None

    def apply(self, x: jax.Array) -> jax.Array:
        s = stencils.smoothness_apply(x, self.weights, len(self.shape))
        if self.data_coeff is not None:
            from .constraints import data_apply
            return s + data_apply(x, self.data_coeff, len(self.shape))
        return s + self.data_diag * x


def _coarsen_weights(weights: Weights, ndim: int) -> Weights:
    factors = tuple(2.0 ** ((ndim - 2 * k) / 2.0) for k in range(4))
    return weights.scaled_model(factors)


@functools.lru_cache(maxsize=None)
def level_shapes(fine_shape: tuple[int, ...],
                 mg_min_size: int, mg_coarse_solver: str) -> tuple:
    """Shapes of the coarse hierarchy below ``fine_shape`` (shape-only view
    of build_levels — lets callers size the coarsest level without a
    Problem, e.g. batch.solve_batch's dense-coarsest memory gate)."""
    shapes = []
    shape = fine_shape

    def needs_coarsening(shape):
        if min(shape) > mg_min_size:
            return True
        # With the dense coarsest solver, keep coarsening until the inverse
        # is cheap: jnp.linalg.inv is per-problem setup cost, and LU of 4096
        # nodes (3D 16³) measures ~55 ms on v5e — more than the whole solve.
        # 1024 nodes keeps 2D at 16² (256 nodes) and pushes 3D to 8³ (512).
        return mg_coarse_solver == "dense" and math.prod(shape) > 1024

    while needs_coarsening(shape):
        coarse = Grid(shape).coarsen()
        if coarse.shape == shape:
            break
        shapes.append(coarse.shape)
        shape = coarse.shape
    return tuple(shapes)


def build_levels(problem: Problem, config: SolverConfig) -> list[_Level]:
    """Static level hierarchy below the fine problem (level 0 IS the problem)."""
    levels: list[_Level] = []
    grid = problem.grid
    weights = problem.weights
    from .constraints import data_diag as _data_diag
    galerkin = config.mg_coarse_data == "galerkin"
    ddiag = _data_diag(problem.coeff, grid.ndim)
    dcoeff = problem.coeff if galerkin else None

    for coarse_shape in level_shapes(grid.shape, config.mg_min_size,
                                     config.mg_coarse_solver):
        weights = _coarsen_weights(weights, grid.ndim)
        if galerkin:
            dcoeff = galerkin_coarse_coeff(dcoeff, coarse_shape)
            ddiag = _data_diag(dcoeff, grid.ndim)
        else:
            ddiag = restrict_diag(ddiag, coarse_shape)
        diag = stencils.smoothness_diag(coarse_shape, weights).astype(ddiag.dtype) + ddiag
        levels.append(_Level(shape=coarse_shape, weights=weights,
                             data_diag=ddiag, diag=diag, data_coeff=dcoeff))
    return levels


def _rho_bound(row_abs: jax.Array, diag: jax.Array) -> jax.Array:
    """Gershgorin bound on ρ(D⁻¹A): max_i (Σ_j |A_ij|) / A_ii."""
    safe = jnp.where(diag > 0, diag, 1.0)
    return jnp.max(row_abs / safe)


def build_smoothing_setup(problem: Problem, levels: list, config) -> tuple:
    """(lump, fine_ddiag, taus, rhos): the fine-level lumping decision, the
    per-level Gershgorin damping steps τ_l = 2·mg_omega/ρ̂(D_l⁻¹A_l), and the
    raw bounds ρ̂_l themselves (the Chebyshev smoother's λmax estimate).

    The ONE implementation shared by the XLA V-cycle
    (make_vcycle_preconditioner), the fused-kernel operands
    (build_fused_solver_operands), and the distributed sharded multigrid
    (parallel.sharded._make_mg_plan) — the sharded ≡ unsharded
    iteration-count contract depends on these staying identical."""
    from .constraints import data_diag as _data_diag
    ndim = problem.grid.ndim
    lump = config.mg_fine_operator == "lumped"
    if config.mg_fine_operator == "auto":
        from .ops.pallas_stencil import fits_vmem
        lump = ndim >= 3 and not fits_vmem(problem.grid.shape)
    fine_ddiag = _data_diag(problem.coeff, ndim)
    base = stencils.smoothness_row_abs_sum(problem.grid.shape,
                                           problem.weights,
                                           problem.diag.dtype)
    if lump:
        fine_rowabs = base + fine_ddiag
    else:
        fine_rowabs = base + jnp.sum(jnp.abs(problem.coeff),
                                     axis=-(ndim + 1))
    rhos = [_rho_bound(fine_rowabs, problem.diag)]
    for lvl in levels:
        rowabs = stencils.smoothness_row_abs_sum(lvl.shape, lvl.weights,
                                                 lvl.diag.dtype)
        if lvl.data_coeff is not None:
            rowabs = rowabs + jnp.sum(jnp.abs(lvl.data_coeff), axis=0)
        else:
            rowabs = rowabs + lvl.data_diag
        rhos.append(_rho_bound(rowabs, lvl.diag))
    taus = [2.0 * config.mg_omega / r for r in rhos]
    return lump, fine_ddiag, taus, rhos


def _fused_vcycle_operands(problem, levels, taus, fine_inv_diag, inv_diags,
                           coarse_dense, config, rhos):
    """Materialize the per-level operands the fused 2D V-cycle/CG kernels
    take: (coeffs, sids, Rs per-axis restriction matrices, inv32 dense
    coarsest inverse, level Weights, cheb coefficient schedules or None).
    coeffs[l] is the full [3^D, *shape] data stencil (fine level always;
    coarse levels under mg_coarse_data="galerkin") or the bare [*shape]
    diagonal — the kernels tell them apart by rank. Jacobi: sids =
    τ_l·D⁻¹, cfs=None; Chebyshev: sids = D⁻¹ unscaled, cfs[l] = [ν, 2]
    schedules. None if the working set exceeds the VMEM budget."""
    ndim = problem.grid.ndim
    cheb = config.mg_smoother.startswith("chebyshev")
    shapes_all = [problem.grid.shape] + [l.shape for l in levels]
    coeffs = [problem.coeff.astype(jnp.float32)]
    inv_all = [fine_inv_diag] + list(inv_diags)
    lw = [problem.weights]
    for lvl in levels:
        if lvl.data_coeff is not None:
            coeffs.append(lvl.data_coeff.astype(jnp.float32))
        else:
            coeffs.append(lvl.data_diag.astype(jnp.float32))
        lw.append(lvl.weights)
    if cheb:
        sids = [d.astype(jnp.float32) for d in inv_all]
        cfs = [chebyshev_coefs(r, config.mg_pre_smooth, config)
               for r in rhos]
    else:
        sids = [(t * d).astype(jnp.float32) for t, d in zip(taus, inv_all)]
        cfs = None
    Rs = []
    for i in range(len(shapes_all) - 1):
        for d in range(ndim):
            Rs.append(jnp.asarray(
                _resize_matrix(shapes_all[i][d], shapes_all[i + 1][d]).T,
                jnp.float32))
    inv32 = coarse_dense.astype(jnp.float32)
    # Chebyshev adds one z_prev scratch per level (~1 fine-array's worth).
    vmem_est = (sum(c.size for c in coeffs) + inv32.size
                + (4 if cheb else 3) * problem.grid.num_nodes) * 4
    if vmem_est > 12 * 1024 * 1024:
        return None
    return coeffs, sids, Rs, inv32, lw, cfs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGPrep:
    """Reusable multigrid setup, computed ONCE by ``solver.prepare`` and
    passed back into repeated solves (the reference GUI's interactive
    re-solve loop, SURVEY.md §3.2 / VERDICT r4 weak #4): the level
    hierarchy, Gershgorin smoothing steps, dense-coarsest factor, and the
    fused-kernel operands — together ~0.2 ms of per-solve setup at 256²
    (probes/headline_slices.py) that repeated solves with fixed positions
    and weights need not re-pay. A registered pytree: arrays cross the jit
    boundary as inputs; ``shape``/``weights``/``sig`` are static metadata
    so a stale prep (different geometry, weights, or MG config) fails the
    trace-time compatibility check in solver.solve instead of silently
    corrupting the preconditioner."""

    levels: tuple             # of _Level (pytree)
    fine_ddiag: jax.Array
    taus: tuple               # per-level damped-Jacobi steps (scalars)
    rhos: tuple               # per-level Gershgorin bounds (scalars)
    coarse_dense: jax.Array | None
    fused: tuple | None       # (coeffs, sids, Rs, inv32, cfs) arrays
    lump: bool = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    weights: Weights = dataclasses.field(metadata=dict(static=True))
    sig: tuple = dataclasses.field(metadata=dict(static=True))


def setup_signature(config: SolverConfig) -> tuple:
    """The SolverConfig subset a prepared setup depends on — tol/maxiter &
    co. may vary freely between solves sharing one MGPrep; these may not."""
    return (config.preconditioner, config.backend, config.mg_pre_smooth,
            config.mg_post_smooth, config.mg_smoother, config.mg_cheb_ratio,
            config.mg_coarse_data, config.mg_coarse_solver,
            config.mg_coarse_iters, config.mg_omega,
            config.mg_fine_operator, config.mg_min_size)


def prepare_mg(problem: Problem, config: SolverConfig,
               want_fused: bool = True) -> MGPrep:
    """Build the reusable setup (see MGPrep). Trace inside jit — the caller
    (solver.prepare) wraps this so the hierarchy/factorization run as one
    compiled graph instead of per-op dispatches through the TPU tunnel."""
    levels = build_levels(problem, config)
    lump, fine_ddiag, taus, rhos = build_smoothing_setup(problem, levels,
                                                         config)
    coarse_dense = None
    if config.mg_coarse_solver == "dense":
        if levels and math.prod(levels[-1].shape) <= 4096:
            coarse_dense = _coarse_dense_inverse(levels[-1])
        elif not levels and math.prod(problem.grid.shape) <= 4096:
            # Degenerate hierarchy (grid at/below the coarsening floor):
            # the reusable piece is the dense inverse of the FINE operator.
            from .constraints import data_diag as _data_diag
            lvl0 = _Level(shape=problem.grid.shape, weights=problem.weights,
                          data_diag=_data_diag(problem.coeff,
                                               problem.grid.ndim),
                          diag=problem.diag, data_coeff=problem.coeff)
            coarse_dense = _coarse_dense_inverse(lvl0)
    fused = None
    if want_fused:
        ops = build_fused_solver_operands(problem, config)
        if ops is not None:
            coeffs, sids, Rs, inv32, _lw, cfs = ops
            fused = (tuple(coeffs), tuple(sids), tuple(Rs), inv32,
                     None if cfs is None else tuple(cfs))
    return MGPrep(levels=tuple(levels), fine_ddiag=fine_ddiag,
                  taus=tuple(taus), rhos=tuple(rhos),
                  coarse_dense=coarse_dense, fused=fused, lump=lump,
                  shape=problem.grid.shape, weights=problem.weights,
                  sig=setup_signature(config))


def build_fused_solver_operands(problem: Problem, config: SolverConfig,
                                prep: MGPrep | None = None):
    """Setup for the fully-fused 2D PCG path (solver._pcg_fused): the
    same level operands as the fused V-cycle, or None when the problem shape
    or config rules the fused path out. ``prep`` (an MGPrep from the same
    problem/config) short-circuits the build — the operands then enter the
    caller's jit as INPUTS rather than recomputed graph."""
    if prep is not None:
        if prep.fused is None:
            return None
        coeffs, sids, Rs, inv32, cfs = prep.fused
        lw = [problem.weights] + [l.weights for l in prep.levels]
        return (list(coeffs), list(sids), list(Rs), inv32, lw,
                None if cfs is None else list(cfs))
    if (problem.grid.ndim != 2
            or config.preconditioner != "multigrid"
            or config.mg_coarse_solver != "dense"
            or config.mg_pre_smooth != config.mg_post_smooth
            or problem.diag.dtype != jnp.float32):
        return None
    from .ops.pallas_stencil import fits_vmem
    if not fits_vmem(problem.grid.shape):
        return None
    levels = build_levels(problem, config)
    if not levels:
        return None
    if math.prod(levels[-1].shape) > 4096:
        return None
    if not all(fits_vmem(l.shape) for l in levels):
        return None
    fine_inv_diag = jnp.where(problem.diag > 0, 1.0 / problem.diag, 1.0)
    inv_diags = [jnp.where(l.diag > 0, 1.0 / l.diag, 1.0) for l in levels]
    lump, _, taus, rhos = build_smoothing_setup(problem, levels, config)
    if lump:
        return None  # fused kernels smooth with the full data stencil
    coarse_dense = _coarse_dense_inverse(levels[-1])
    return _fused_vcycle_operands(problem, levels, taus, fine_inv_diag,
                                  inv_diags, coarse_dense, config, rhos)


def resolve_wdepth(config: SolverConfig, fine_shape: tuple[int, ...]) -> int:
    """Doubled-transition count for the W-cycle (0 = plain V), resolving
    mg_cycle="auto" by the measured regime split (round-4 on-chip A/Bs):

    * whole-VMEM grids (the fused in-kernel V-cycle path): coarse-level
      visits are LATENCY-bound (~1.85 µs each in-kernel), and every W
      variant measured slower than V at 256² despite a 1.8x iteration cut
      → "v".
    * beyond-VMEM grids (XLA-level cycles, striped kernels): coarse levels
      are bandwidth-bound and cost ~4⁻ˡ of the fine level, so the W's
      extra visits are nearly free while its iteration cut is whole —
      measured 4096²: 359→234 ms @1e-4, 982→666 ms @TRUE 1e-6; 256³:
      343→262 ms → "w" (full depth).
    """
    cycle = config.mg_cycle
    if cycle == "auto":
        from .ops.pallas_stencil import fits_vmem
        cycle = "v" if fits_vmem(fine_shape) else "w"
    return config.mg_wcycle_depth if cycle == "w" else 0


def make_vcycle_preconditioner(problem: Problem, config: SolverConfig,
                               apply_fn=None, pallas_smooth=False,
                               pallas_interpret=False,
                               prep: MGPrep | None = None):
    """Returns z = M⁻¹ r — one symmetric V-cycle on the normal operator.

    ``apply_fn`` overrides the fine-level operator apply (e.g. the fused
    Pallas kernel). ``pallas_smooth`` runs each level's ν Jacobi sweeps as a
    single VMEM-resident fused kernel (ops.pallas_stencil.fused_smooth) —
    the dominant launch-overhead cost of the V-cycle at bench sizes.
    ``prep`` (an MGPrep built by prepare_mg for the SAME problem/config)
    supplies the hierarchy/damping/coarse factor as jit INPUTS instead of
    recomputed graph — the reusable-setup path for repeated solves."""
    levels = list(prep.levels) if prep is not None else build_levels(problem,
                                                                     config)
    nu = config.mg_pre_smooth
    ndim = problem.grid.ndim

    if (not levels and config.mg_coarse_solver == "dense"
            and math.prod(problem.grid.shape) <= 4096):
        # Degenerate hierarchy: the grid is already at/below the coarsening
        # floor, so the whole problem IS the coarsest level — solve it
        # exactly with the dense inverse of the FINE operator (full data
        # stencil, not lumped). Mathematically the perfect preconditioner
        # (PCG converges in O(1) iterations); it also sidesteps a
        # pathological XLA CPU compile of the previous fallback (32
        # unrolled composite-conv smoothing sweeps measured a 250 s
        # compile at 2² — hit by deep fmg_start recursion). The "jacobi"
        # coarse solver keeps the smoothing fallback below.
        if prep is not None and prep.coarse_dense is not None:
            inv0 = prep.coarse_dense
        else:
            from .constraints import data_diag as _data_diag
            lvl0 = _Level(shape=problem.grid.shape, weights=problem.weights,
                          data_diag=_data_diag(problem.coeff, ndim),
                          diag=problem.diag, data_coeff=problem.coeff)
            inv0 = _coarse_dense_inverse(lvl0)

        def dense_pc(r):
            z = jnp.dot(inv0, r.ravel(),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=r.dtype)
            return z.reshape(r.shape)
        return dense_pc

    # Fine-level operator for smoothing + restricted residual: exact, or
    # diagonally-lumped data term (see SolverConfig.mg_fine_operator). Auto
    # lumps when the coeff tensor exceeds the VMEM budget — exactly the
    # regime where dragging 3^D channels through HBM per sweep dominates.
    # (The caller's fused apply_fn still reads all 3^D channels per sweep,
    # so beyond-VMEM 3D problems lump regardless of it. 2D stays exact:
    # there the fused striped kernel's one 9-channel pass already beats the
    # ~12 unfused XLA shift passes a lumped smoothing sweep costs — measured
    # 4096²: lumped 1091 ms/41 iters vs exact 726 ms/26 iters, while 3D 128³
    # went 88 → 53 ms from lumping away the 27-channel traffic.)
    # Lumping rule + damped-Jacobi steps: damped Jacobi diverges unless
    # τ·ρ(D⁻¹A) < 2, and for biharmonic-heavy operators ρ(D⁻¹A) ≈ 2.7 — a
    # fixed τ=0.8 blows up. build_smoothing_setup auto-scales each level's
    # damping so τ·ρ ≤ 2·mg_omega (< 2) from closed-form row-abs sums, and
    # is SHARED with the fused and sharded paths.
    if prep is not None:
        lump, fine_ddiag = prep.lump, prep.fine_ddiag
        taus, rhos = list(prep.taus), list(prep.rhos)
    else:
        lump, fine_ddiag, taus, rhos = build_smoothing_setup(problem, levels,
                                                             config)
    if lump:
        def fine_apply(x):
            return (stencils.smoothness_apply(x, problem.weights, ndim)
                    + fine_ddiag * x)
    else:
        fine_apply = problem.apply if apply_fn is None else apply_fn

    fine_inv_diag = jnp.where(problem.diag > 0, 1.0 / problem.diag, 1.0)
    inv_diags = [jnp.where(l.diag > 0, 1.0 / l.diag, 1.0) for l in levels]

    cheb = config.mg_smoother.startswith("chebyshev")
    _cf_cache: dict = {}

    def _cf(li: int, iters: int):
        key = (li, iters)
        if key not in _cf_cache:
            _cf_cache[key] = chebyshev_coefs(rhos[li], iters, config)
        return _cf_cache[key]

    def smooth(apply_fn, inv_diag, li, r, z, iters):
        if cheb:
            # Uniform Chebyshev recurrence in iterate-difference form:
            # z⁺ = z + c1_k·(z − z_prev) + c2_k·D⁻¹(r − A z). The k=0 row is
            # (0, 1/θ), so no special first step (see chebyshev_coefs).
            cf = _cf(li, iters)
            zp = z
            for k in range(iters):
                az = apply_fn(z)
                z, zp = (z + cf[k, 0] * (z - zp)
                         + cf[k, 1] * inv_diag * (r - az)), z
            return z
        tau = taus[li]
        for _ in range(iters):
            z = z + tau * inv_diag * (r - apply_fn(z))
        return z

    # Optional fused Pallas smoothing: per level, the data term is either the
    # full 3^D-channel tensor (fine, exact) or a bare diagonal array (coarse
    # levels and the lumped fine smoother) + τ·D⁻¹ folded together.
    smoothers = None
    if pallas_smooth:
        from .ops.pallas_stencil import (fits_vmem, fused_smooth,
                                         fused_smooth_striped,
                                         fused_smooth_tiled,
                                         fused_sweep_striped_diag,
                                         fused_sweep_striped2_3d,
                                         pick_stripe_smooth,
                                         pick_stripe_sweep_diag,
                                         pick_stripe2_3d_sweep,
                                         pick_tile_smooth)
        from .stencils import max_stencil_radius

        def _persweep_smoother(kernel_fn, coeff_diag, sid, weights_l, tile,
                               li):
            """Per-sweep fused smoothing for beyond-VMEM DIAG levels (3D
            lumped fine + all large diag coarse levels): each XLA sweep
            there is ~15-18 separate shift passes over the full arrays —
            the dominant 256³ V-cycle cost and a measurable slice of the
            4096² one. One fused striped kernel per sweep is near the
            traffic floor for a 1-channel data term (see
            fused_sweep_striped2_3d). Chebyshev rides the SAME kernel:
            with sid = D⁻¹ unscaled, K(z) − z = D⁻¹(r − A z) feeds the
            d-update recurrence as two cheap XLA axpys per sweep."""
            c32 = coeff_diag.astype(jnp.float32)
            s32 = sid.astype(jnp.float32)

            def sm_jacobi(r, z, sweeps, from_zero):
                if from_zero:
                    z = s32 * r  # apply(0) == 0
                    sweeps = sweeps - 1
                for _ in range(sweeps):
                    z = kernel_fn(r, z, c32, s32, weights_l, tile,
                                  interpret=pallas_interpret)
                return z

            def sm_cheb(r, z, sweeps, from_zero):
                cf = _cf(li, sweeps)
                if from_zero:
                    zp = jnp.zeros_like(r)
                    z = cf[0, 1] * (s32 * r)  # apply(0) == 0
                    start = 1
                else:
                    zp = z
                    start = 0
                for k in range(start, sweeps):
                    dinv_res = kernel_fn(r, z, c32, s32, weights_l, tile,
                                         interpret=pallas_interpret) - z
                    z, zp = (z + cf[k, 0] * (z - zp)
                             + cf[k, 1] * dinv_res), z
                return z

            return sm_cheb if cheb else sm_jacobi
        smoothers = []
        for li in range(len(levels) + 1):
            if li == 0:
                shape_l = problem.grid.shape
                diag_l = lump  # lumped fine smoother: diagonal data term
                coeff_l = fine_ddiag if lump else problem.coeff
                weights_l = problem.weights
                inv_d = fine_inv_diag
            else:
                lvl = levels[li - 1]
                shape_l = lvl.shape
                diag_l = lvl.data_coeff is None
                coeff_l = lvl.data_diag if diag_l else lvl.data_coeff
                weights_l = lvl.weights
                inv_d = inv_diags[li - 1]
            # Chebyshev folds its per-sweep scalars via the SMEM schedule /
            # wrapper algebra, so the kernels get D⁻¹ UNSCALED there.
            sid = inv_d if cheb else taus[li] * inv_d

            def _mk_cheb_kw(li=li):
                if not cheb:
                    return {}
                nus = {config.mg_pre_smooth, config.mg_post_smooth}
                return {"cheb_coefs": {n: _cf(li, n) for n in nus if n > 0}}

            if not fits_vmem(shape_l, diag_data=diag_l):
                # Beyond-VMEM full-data levels (2D fine; 2D galerkin coarse):
                # multi-sweep striped smoother — the 9-channel coeff block is
                # read once per smoothing phase instead of once per sweep.
                # DIAG levels (3D lumped fine, large coarse): per-sweep
                # striped kernels.
                T = T2 = T3 = None
                if ndim == 2 and not diag_l:
                    rad = max(max_stencil_radius(weights_l), 1)
                    nu_max = max(config.mg_pre_smooth, config.mg_post_smooth)
                    T = pick_stripe_smooth(shape_l, rad, nu_max)
                    if T is None:
                        # 4096-wide grids: the full-width striped footprint
                        # exceeds VMEM; tile BOTH axes (VERDICT r2 item 6).
                        T2 = pick_tile_smooth(shape_l, rad, nu_max)
                elif ndim == 3 and diag_l:
                    T3 = pick_stripe2_3d_sweep(shape_l)
                elif ndim == 2 and diag_l:
                    T3 = pick_stripe_sweep_diag(shape_l)
                if T3 is not None:
                    kfn = (fused_sweep_striped2_3d if ndim == 3
                           else fused_sweep_striped_diag)
                    smoothers.append(_persweep_smoother(kfn, coeff_l, sid,
                                                        weights_l, T3, li))
                elif T is not None:
                    smoothers.append(functools.partial(
                        fused_smooth_striped,
                        coeff=coeff_l.astype(jnp.float32),
                        scaled_inv_diag=sid.astype(jnp.float32),
                        weights=weights_l, stripe=T,
                        interpret=pallas_interpret, **_mk_cheb_kw()))
                elif T2 is not None:
                    smoothers.append(functools.partial(
                        fused_smooth_tiled,
                        coeff=coeff_l.astype(jnp.float32),
                        scaled_inv_diag=sid.astype(jnp.float32),
                        weights=weights_l, tiles=T2,
                        interpret=pallas_interpret, **_mk_cheb_kw()))
                else:
                    smoothers.append(None)  # fall back to XLA sweeps
                continue
            smoothers.append(functools.partial(
                fused_smooth, coeff=coeff_l.astype(jnp.float32),
                scaled_inv_diag=sid.astype(jnp.float32), weights=weights_l,
                ndim=ndim, interpret=pallas_interpret, diag_data=diag_l,
                **_mk_cheb_kw()))

    # Coarsest-level solver. "dense": materialize the coarsest operator by
    # applying it to the identity basis ONCE at setup, invert, and each
    # V-cycle's coarse solve becomes a single small matmul (exact and SPD;
    # replaces ~mg_coarse_iters dispatch-bound Jacobi sweeps).
    coarse_dense = None
    if config.mg_coarse_solver == "dense" and levels:
        lvl = levels[-1]
        if math.prod(lvl.shape) <= 4096:
            coarse_dense = (prep.coarse_dense if prep is not None
                            else _coarse_dense_inverse(lvl))

    # Whole-V-cycle Pallas kernel (2D, VMEM-fit, dense coarsest, symmetric
    # smoothing): replaces ~40 small XLA ops per preconditioner application
    # with ONE kernel — everything (all levels, transfers, the dense solve)
    # stays in VMEM.
    if (pallas_smooth and ndim == 2 and coarse_dense is not None
            and smoothers is not None and all(s is not None for s in smoothers)
            and config.mg_pre_smooth == config.mg_post_smooth):
        if prep is not None:
            ops = build_fused_solver_operands(problem, config, prep)
        else:
            ops = _fused_vcycle_operands(problem, levels, taus, fine_inv_diag,
                                         inv_diags, coarse_dense, config,
                                         rhos)
        if ops is not None:
            from .ops.pallas_stencil import fused_vcycle_2d, fused_wcycle_2d
            coeffs, sids, Rs, inv32, lw, cfs = ops
            fused_wdepth = resolve_wdepth(config, problem.grid.shape)
            if fused_wdepth > 0:
                return lambda r: fused_wcycle_2d(
                    r, coeffs, sids, Rs, inv32, lw, config.mg_pre_smooth,
                    interpret=pallas_interpret, cheb_coefs=cfs,
                    wdepth=fused_wdepth)
            return lambda r: fused_vcycle_2d(
                r, coeffs, sids, Rs, inv32, lw, config.mg_pre_smooth,
                config.mg_post_smooth, interpret=pallas_interpret,
                cheb_coefs=cfs)

    def level_smooth(level_idx, apply_fn, inv_diag, r, z, iters, from_zero):
        # iters == 0 means NO smoothing: zeros from a zero guess, z
        # untouched otherwise — guarded HERE so every fused smoother
        # agrees with the XLA path (the fused kernels' from_zero step
        # z = τD⁻¹r counts as the first sweep, which would otherwise turn
        # "0 sweeps" into one implicit sweep; code-review finding).
        if iters == 0:
            return jnp.zeros_like(r) if from_zero else z
        sm = smoothers[level_idx] if smoothers is not None else None
        if sm is not None:
            return sm(r, z, sweeps=iters, from_zero=from_zero)
        if from_zero:
            z = jnp.zeros_like(r)
        return smooth(apply_fn, inv_diag, level_idx, r, z, iters)

    wdepth_r = resolve_wdepth(config, problem.grid.shape)
    wcycle = wdepth_r > 0

    def vcycle(r, level_idx):
        if level_idx == 0:
            apply_fn, inv_diag = fine_apply, fine_inv_diag
            shape = problem.grid.shape
        else:
            lvl = levels[level_idx - 1]
            apply_fn, inv_diag = lvl.apply, inv_diags[level_idx - 1]
            shape = lvl.shape

        if level_idx == len(levels):  # coarsest
            if coarse_dense is not None:
                z = jnp.dot(coarse_dense, r.ravel(),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=r.dtype)
                return z.reshape(r.shape)
            return level_smooth(level_idx, apply_fn, inv_diag, r, r,
                                config.mg_coarse_iters, True)

        z = level_smooth(level_idx, apply_fn, inv_diag, r, r, nu, True)
        coarse_shape = levels[level_idx].shape
        restrict = make_restrict(shape, coarse_shape, r.dtype)
        rc = restrict(r - apply_fn(z))
        zc = vcycle(rc, level_idx + 1)
        if (wcycle and level_idx + 1 < len(levels)
                and level_idx < wdepth_r):
            # Second recursive visit on the residual the first leaves
            # (skipped when the child is the exactly-solved coarsest —
            # a second exact solve of a zero residual is a no-op). The
            # composed child solve 2B − BAB is symmetric, so the W-cycle
            # remains a valid SPD CG preconditioner (see SolverConfig).
            rc2 = rc - levels[level_idx].apply(zc)
            zc = zc + vcycle(rc2, level_idx + 1)
        z = z + prolong(zc, shape)
        return level_smooth(level_idx, apply_fn, inv_diag, r, z,
                            config.mg_post_smooth, False)

    return lambda r: vcycle(r, 0)
