"""Vectorized scattered-data constraint assembly.

Reference counterparts: `add_value_constraint` / `add_gradient_constraint`
(SURVEY.md §2 C4/C5, §3.3) loop per sample in C++, appending 2^D-entry triplet
rows. Here the whole sample batch is processed at once (`BASELINE.json:5`
"vectorized constraint-assembly layer"):

1. `multilinear_corner_data` computes, for all samples in one shot, the flat
   corner indices `[n, 2^D]` and the per-row coefficient vectors (one value
   row + D gradient rows) of shape `[n, R, 2^D]`.
2. `densify_data_term` scatter-adds each sample's weighted `2^D × 2^D`
   normal-equation block into a dense spatially-varying 3^D-point stencil
   `coeff[3^D, *grid]` (channel-major; grid dims stay minor for TPU tiling)
   plus the RHS grid `Aᵀb`. This happens ONCE at assembly;
   the CG hot loop then applies the data term as 3^D shifted multiply-adds
   with no scatter (SURVEY.md §7 "hard parts" #3 — the scatter-add problem is
   moved off the hot path entirely).

All functions are jit/vmap friendly: static shapes, out-of-bounds samples and
padding rows are handled by zeroing their weights (SPEC.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .weights import Weights


@functools.lru_cache(maxsize=None)
def corner_bits(ndim: int) -> np.ndarray:
    """[2^D, D] array of corner bit patterns; bit d of corner c is bits[c, d]."""
    c = np.arange(1 << ndim)[:, None]
    return ((c >> np.arange(ndim)[None, :]) & 1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _offset_channels(ndim: int) -> np.ndarray:
    """[2^D, 2^D] channel index into the 3^D offset box for corner pair (c, d):
    offset = bits[d] - bits[c] ∈ {-1,0,1}^D, channel = C-order index of
    offset+1 in a (3,)*D box."""
    bits = corner_bits(ndim)
    off = bits[None, :, :] - bits[:, None, :] + 1  # [C, C, D] in {0,1,2}
    chan = np.zeros(off.shape[:2], dtype=np.int32)
    for d in range(ndim):
        chan = chan * 3 + off[:, :, d]
    return chan


@functools.lru_cache(maxsize=None)
def offset_list(ndim: int) -> np.ndarray:
    """[3^D, D] the C-ordered offsets of the data-stencil box, in {-1,0,1}."""
    grids = np.meshgrid(*([np.arange(-1, 2)] * ndim), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


def _cell_frac(grid: Grid, positions: jax.Array):
    """(cell [n,D] int32, frac [n,D], in_bounds [n]) for all samples.

    Every op here is EXACT in fp32 for lattice coordinates (comparisons,
    clip, floor, and ``safe_pos - cell`` — a Sterbenz-exact subtraction for
    any grid extent < 2^24), so the fp32 result cast to float64 equals the
    float64-computed result bit for bit (multilinear_rows_f64 relies on
    this to keep the f64-emulated tail minimal)."""
    shape = jnp.asarray(grid.shape, dtype=positions.dtype)
    finite = jnp.isfinite(positions)
    in_bounds = jnp.all(finite & (positions >= 0.0) & (positions <= shape - 1.0),
                        axis=-1)
    # Replace non-finite coordinates before any arithmetic: a NaN position
    # would otherwise poison the scatter (0-weight × NaN-coefficient = NaN).
    safe_pos = jnp.clip(jnp.where(finite, positions, 0.0), 0.0, shape - 1.0)
    cell = jnp.clip(jnp.floor(safe_pos).astype(jnp.int32),
                    0, jnp.asarray(grid.shape, jnp.int32) - 2)  # [n, D]
    frac = safe_pos - cell.astype(positions.dtype)  # [n, D] in [0, 1]
    return cell, frac, in_bounds


def _corner_rows(grid: Grid, cell: jax.Array, frac: jax.Array):
    """(corner_idx [n,C] int32, row_coeffs [n,1+D,C] in frac's dtype):
    the multilinear value row + D gradient rows (SPEC.md conventions)."""
    D = grid.ndim
    strides = jnp.asarray(grid.strides, dtype=jnp.int32)
    bits = jnp.asarray(corner_bits(D))  # [C, D]

    # Flat node index of each corner: (cell + bits) · strides.
    corner_coords = cell[:, None, :] + bits[None, :, :]         # [n, C, D]
    corner_idx = jnp.sum(corner_coords * strides, axis=-1)      # [n, C]

    # Per-axis 1-D weights at each corner: bits ? frac : 1-frac.
    w1d = jnp.where(bits[None, :, :] == 1, frac[:, None, :],
                    1.0 - frac[:, None, :])                     # [n, C, D]
    value_row = jnp.prod(w1d, axis=-1)                          # [n, C]

    # Gradient row for axis a: sign_a(c) * prod_{d != a} w1d.
    # prod_{d != a} = value_row / w1d[..., a] is unstable at 0; recompute via
    # masked product instead.
    grad_rows = []
    for a in range(D):
        mask = jnp.asarray([d != a for d in range(D)])
        partial = jnp.prod(jnp.where(mask[None, None, :], w1d, 1.0), axis=-1)
        sign = jnp.where(bits[None, :, a] == 1, 1.0, -1.0)
        grad_rows.append(sign * partial)                        # [n, C]
    row_coeffs = jnp.stack([value_row, *grad_rows], axis=1)     # [n, 1+D, C]
    return corner_idx, row_coeffs.astype(frac.dtype)


def multilinear_corner_data(grid: Grid, positions: jax.Array):
    """Per-sample cell/corner geometry for all samples at once.

    positions: [n, D] continuous lattice coordinates.

    Returns (corner_idx [n, C] int32 flat node indices,
             row_coeffs [n, 1+D, C] (positions' dtype) — value then D gradient rows,
             in_bounds [n] bool).
    Row coefficient conventions per SPEC.md (exact multilinear partials).
    """
    cell, frac, in_bounds = _cell_frac(grid, positions)
    corner_idx, row_coeffs = _corner_rows(grid, cell, frac)
    return corner_idx, row_coeffs, in_bounds


def multilinear_rows_f64(grid: Grid, positions: jax.Array):
    """float64 corner rows from FP32 positions with a minimal f64 tail.

    Identical values to ``multilinear_corner_data(grid, positions.astype(
    jnp.float64))`` — the fp32 prefix (_cell_frac) is exact, so only the
    corner-weight products need float64 — but ~3x cheaper on TPU, where
    every software-emulated f64 op costs several fused fp32 passes
    (measured: 0.32 -> ~0.1 ms of the 256² precise-assembly time).
    Requires x64 enabled. Returns (corner_idx, row_coeffs64, in_bounds)."""
    cell, frac32, in_bounds = _cell_frac(grid, positions)
    corner_idx, row_coeffs = _corner_rows(grid, cell,
                                          frac32.astype(jnp.float64))
    return corner_idx, row_coeffs, in_bounds


def _densify_matmul_2d(grid: Grid, corner_idx, M, bvec):
    """Scatter-free densify for 2D fp32 problems: the scatter-add is a sum of
    rank-1 node updates, i.e. coeff[chan] = Σ_s OHrow_sᵀ v_s OHcol_s — one
    one-hot MXU matmul per corner instead of a scatter op (which costs a
    FLAT ~0.5-1 ms on this backend regardless of payload; the matmuls are
    ~1.3 GMAC at 256²/1k samples ≈ tens of µs). Channel assignment is a
    compile-time constant, so the combine is static adds.

    Cost scales as n_samples × num_nodes — the caller gates on that product
    (large grids keep the scatter, whose flat cost is then amortized).
    """
    n0, n1 = grid.shape
    C = grid.num_corners
    chan = _offset_channels(2)                         # [C, C] numpy
    row = corner_idx // n1                             # [n, C]
    col = corner_idx % n1
    dtype = M.dtype
    oh_r = (row[..., None] == jnp.arange(n0, dtype=row.dtype)).astype(dtype)
    oh_c = (col[..., None] == jnp.arange(n1, dtype=col.dtype)).astype(dtype)

    # Per corner c: [n0, n] @ [n, (C+1)·n1] — the C normal-block channels for
    # this corner plus the RHS plane ride in one matmul.
    vals = jnp.concatenate([M, bvec[:, :, None]], axis=2)     # [n, C, C+1]
    rhs = vals[:, :, :, None] * oh_c[:, :, None, :]           # [n, C, C+1, n1]
    planes = jnp.einsum("ncr,ncki->ckri", oh_r, rhs,
                        precision=jax.lax.Precision.HIGHEST)  # [C, C+1, n0, n1]

    coeff = jnp.zeros((3**2, n0, n1), dtype=dtype)
    for c in range(C):
        for d in range(C):
            coeff = coeff.at[int(chan[c, d])].add(planes[c, d])  # static idx
    b = jnp.sum(planes[:, C], axis=0)
    return coeff, b


def _densify_cellwise(grid: Grid, corner_idx, M, bvec):
    """Cell-windowed densify: ONE scatter of n row-vector payloads instead
    of n·(C²+C) scalar updates.

    MEASURED NULL on v5e (probes/assembly_ab.py, round 5): 33.7 vs 27.1 ms
    at 4096²/100k (+24%) and 88.9 vs 87.2 ms at 256³ (wash) against the
    flat scatter — the windowed scatter's (T+C)-wide minor dim pads to the
    128-lane tile, so the saved update count is paid back in streamed
    bytes. Kept as the probe's subject and as the record of the attempt;
    production fp32 uses `_densify_flat_scatter_sym` instead (same
    update-count insight, no layout penalty).

    The flat elementwise scatter's cost on this backend scales with the
    UPDATE COUNT (measured: 97 ms of the 271 ms 256³/100k-pt config-5 wall,
    probes/config5_slices.py, round 5) — 7.2M scalar adds in 3D. But every
    one of a sample's C²+C contributions lands inside its own cell, so the
    whole per-sample normal block can ride as one contiguous window:
    scatter [n, T+C] rows (T = C(C+1)/2 — M is symmetric, only the upper
    triangle travels) into a [num_nodes, T+C] cell-block array indexed by
    the base corner, then convert cell layout → the channel-major node
    stencil with C² static pad-shifts, which XLA fuses into one
    bandwidth-bound pass. 3D cost: ~100k windowed updates + ~3 GB of
    streaming traffic instead of 7.2M scalar updates.
    """
    D = grid.ndim
    C = grid.num_corners
    n = M.shape[0]
    dtype = M.dtype
    bits = corner_bits(D)                               # [C, D] numpy
    chan = _offset_channels(D)                          # [C, C] numpy
    iu = np.triu_indices(C)
    T = len(iu[0])

    upd = jnp.concatenate([M[:, iu[0], iu[1]], bvec], axis=1)   # [n, T+C]
    cells = jnp.zeros((grid.num_nodes, T + C), dtype)
    cells = cells.at[corner_idx[:, 0]].add(upd)         # one windowed scatter

    # plane(c,d) at base node j contributes to node i = j + bits[c] on
    # channel chan[c,d]; symmetric pairs reuse the same plane transposed.
    per_chan: list[list[jax.Array]] = [[] for _ in range(3**D)]
    for k in range(T):
        c, d = int(iu[0][k]), int(iu[1][k])
        p = cells[:, k].reshape(grid.shape)
        per_chan[int(chan[c, d])].append(_shift(p, -bits[c], D))
        if c != d:
            per_chan[int(chan[d, c])].append(_shift(p, -bits[d], D))
    coeff = jnp.stack([sum(ps) if ps else jnp.zeros(grid.shape, dtype)
                       for ps in per_chan])
    b = sum(_shift(cells[:, T + c].reshape(grid.shape), -bits[c], D)
            for c in range(C))
    return coeff, b


def scatter_corners_matmul(grid: Grid, corner_idx: jax.Array,
                           values: jax.Array) -> jax.Array:
    """Scatter-free corner accumulation (2D and 3D grids):
    out[i, rest] = Σ_{s,c: corner_idx[s,c]=(i,rest)} values[s,c], computed as
    one one-hot MXU matmul per corner (see _densify_matmul_2d for the cost
    argument): the flat node index splits into a leading-axis row and a
    flattened-remaining-axes column, so the same [n, n0] × [n, rest] one-hot
    pair covers any rank. ``values`` must be fp32 (the MXU accumulates in
    fp32). Gate via use_matmul_scatter — in 3D the [n, n1·n2] column one-hot
    is the memory cost that bounds applicability."""
    import math
    n0 = grid.shape[0]
    rest = math.prod(grid.shape[1:])
    C = grid.num_corners
    row = corner_idx // rest
    col = corner_idx % rest
    dt = values.dtype
    out = jnp.zeros((n0, rest), dt)
    for c in range(C):
        oh_r = (row[:, c, None] == jnp.arange(n0, dtype=row.dtype)).astype(dt)
        oh_c = (col[:, c, None] == jnp.arange(rest, dtype=col.dtype)).astype(dt)
        rhs = values[:, c, None] * oh_c
        out = out + jax.lax.dot_general(
            oh_r, rhs, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    return out.reshape(grid.shape)


def scatter_corners_matmul_2d(grid: Grid, corner_idx: jax.Array,
                              values: jax.Array) -> jax.Array:
    """Backward-compatible 2D alias of scatter_corners_matmul."""
    return scatter_corners_matmul(grid, corner_idx, values)


def scatter_corners_hilo(grid: Grid, corner_idx: jax.Array,
                         values64: jax.Array) -> jax.Array:
    """float64 corner scatter via a double-float (hi/lo fp32) matmul pair —
    the f64 XLA scatter costs ~0.5 ms FLAT on this backend and dominates
    both the precise assembly and every f64 refinement apply. Splitting
    v = hi + lo (exact) and scatter-accumulating each part in fp32 bounds
    the result's error by the fp32 accumulation of the partial sums
    (~1e-7 relative — an order below the 1e-6 honesty bar; the exact-f64
    scatter path remains for 3D/large problems)."""
    hi = values64.astype(jnp.float32)
    lo = (values64 - hi).astype(jnp.float32)
    out_hi = scatter_corners_matmul(grid, corner_idx, hi)
    out_lo = scatter_corners_matmul(grid, corner_idx, lo)
    return out_hi.astype(values64.dtype) + out_lo.astype(values64.dtype)


def scatter_corners_hilo_2d(grid: Grid, corner_idx: jax.Array,
                            values64: jax.Array) -> jax.Array:
    """Backward-compatible 2D alias of scatter_corners_hilo."""
    return scatter_corners_hilo(grid, corner_idx, values64)


def scatter_corners_exact(grid: Grid, corner_idx: jax.Array,
                          values64: jax.Array) -> jax.Array:
    """EXACT float64 corner scatter built from fp32 one-hot MXU matmuls.

    The f64 XLA scatter costs ~0.35 ms FLAT on this backend — it dominated
    the refined solve's one exact residual evaluation (PreciseProblem.
    residual64). The hi/lo matmul scatter is fast but its fp32 ACCUMULATION
    error (~2⁻²⁴ of the summed magnitudes) breaks the 8-digit residual
    protocol. This routine removes the accumulation error entirely:

    split each value onto a sequence of power-of-two integer grids, coarse
    to fine. Pass p scatters q_p = round(rem / g_p) — integers bounded so
    that every NODE SUM stays below 2²⁴ (|q_p| ≤ 2^b with b chosen from the
    total addend count), which makes the fp32 matmul accumulation EXACT
    (sums of small integers; TPU's bf16x3 HIGHEST-precision passes represent
    the operands exactly). Each pass captures b more mantissa bits of the
    remainder; ceil(54/b) passes cover all 53 float64 bits, so the result
    equals the sequential f64 scatter to ≤2⁻⁵⁴ relative — at ~the cost of a
    few hi/lo scatters (measured ~0.35 → ~0.05 ms at 256²/1k samples).
    """
    n_addends = values64.shape[0] * values64.shape[1]
    if n_addends == 0:           # empty cloud: nothing to scatter
        return jnp.zeros(grid.shape, jnp.float64)
    # Per-pass bit budget: node sums of ≤ n_addends integers of 2^b stay
    # below 2^23. Degenerate budgets (≥ 2^22 addends — tiny grids with huge
    # sample counts can pass the use_matmul_scatter flop gate) fall back to
    # the plain exact f64 scatter rather than crash or lose bits.
    b = 23 - max(1, int(np.ceil(np.log2(n_addends))))
    if b < 6:
        return (jnp.zeros((grid.num_nodes,), jnp.float64)
                .at[corner_idx].add(values64).reshape(grid.shape))
    passes = int(np.ceil(54.0 / b))
    # Global power-of-two grid from the magnitude ceiling (no data-dependent
    # host sync: scale from the running max, a traced scalar).
    m = jnp.max(jnp.abs(values64))
    e = jnp.ceil(jnp.log2(jnp.maximum(m, jnp.finfo(jnp.float64).tiny)))
    g = jnp.exp2(e - b)          # coarsest grid: |round(v/g)| ≤ 2^b
    out = jnp.zeros(grid.shape, jnp.float64)
    rem = values64
    for _ in range(passes):
        q = jnp.round(rem / g)
        rem = rem - q * g
        s = scatter_corners_matmul(grid, corner_idx, q.astype(jnp.float32))
        out = out + s.astype(jnp.float64) * g
        g = g * jnp.exp2(jnp.float64(-b))
    return out


def scatter_corners_exact_2d(grid: Grid, corner_idx: jax.Array,
                             values64: jax.Array) -> jax.Array:
    """Backward-compatible 2D alias of scatter_corners_exact."""
    return scatter_corners_exact(grid, corner_idx, values64)


def use_matmul_scatter(grid: Grid, n: int) -> bool:
    """The one-hot matmul costs n·num_nodes MACs per corner — a win over the
    flat ~0.35-1 ms scatter only below this gate. 2D and 3D; in 3D the
    [n, n1·n2] column one-hot adds a transient-memory gate (~64 MB), so
    large 3D problems keep the flat scatter, whose fixed cost is then
    amortized over the much larger per-apply work anyway (VERDICT r2
    item 7 — the exact integer-grid protocol now covers gated 3D)."""
    if grid.ndim not in (2, 3):
        return False
    if n * grid.num_nodes > 200_000_000:
        return False
    if grid.ndim == 2:
        return True  # 2D behavior unchanged: the flop gate alone
    import math
    rest = math.prod(grid.shape[1:])
    return n * rest * 4 <= 64 * 1024 * 1024


def densify_data_term(
    grid: Grid,
    corner_idx: jax.Array,      # [n, C]
    row_coeffs: jax.Array,      # [n, R, C]  (R rows per sample)
    row_weights: jax.Array,     # [n, R]     (already includes in-bounds mask)
    row_targets: jax.Array,     # [n, R]
):
    """Scatter the data rows' normal-equation contributions into dense form.

    Returns (coeff [3^D, *grid], b [*grid]) with
      (DᵀWD x)_i = Σ_o coeff[o, i] · x_{i+o}     and   b = Dᵀ W t.
    Channel-major layout keeps the grid dims minor — the layout the TPU
    tiles (8, 128) over; channel-minor would waste 93% of each vector
    register in the Pallas kernel.
    """
    D = grid.ndim
    C = grid.num_corners
    Bw = row_coeffs * row_weights[:, :, None]          # weighted rows [n, R, C]
    tw = row_targets * row_weights                     # weighted targets [n, R]

    # Per-sample normal block M = Σ_r Bw[r]ᵀ Bw[r]  -> [n, C, C].
    # HIGHEST precision: TPU einsum defaults to bf16 MXU passes, which would
    # corrupt the assembled operator at the 1e-3 level.
    M = jnp.einsum("nrc,nrd->ncd", Bw, Bw, precision=jax.lax.Precision.HIGHEST)
    bvec = jnp.einsum("nrc,nr->nc", Bw, tw,
                      precision=jax.lax.Precision.HIGHEST)  # [n, C]

    n = corner_idx.shape[0]
    # 2D fp32 problems below the flop gate take the scatter-free matmul path.
    if (D == 2 and row_coeffs.dtype == jnp.float32
            and n * grid.num_nodes <= 200_000_000):
        return _densify_matmul_2d(grid, corner_idx, M, bvec)
    # Every other fp32 problem (3D, and 2D past the matmul flop gate) takes
    # the symmetry-halved scatter: the backend's scatter cost is
    # ∝ scalar-update count (~12-13 ns/update at config-5 scale, measured at
    # BOTH 4096² and 256³ — probes/assembly_ab.py), so scattering only the
    # upper triangle of the symmetric normal block (C(C+1)/2 + C updates
    # instead of C² + C) cuts the dominant assembly cost ~1.6×; the mirror
    # channels are reconstructed by exact plane shifts.
    # f64 assembly keeps the full flat scatter (not a hot path; preserves
    # the historical accumulation order the exact-tier tests pin).
    if row_coeffs.dtype == jnp.float32:
        return _densify_flat_scatter_sym(grid, corner_idx, M, bvec)
    return _densify_flat_scatter(grid, corner_idx, M, bvec)


def _densify_flat_scatter_sym(grid: Grid, corner_idx, M, bvec):
    """Flat scatter of the UPPER-TRIANGLE channels only + mirror-shift
    reconstruction.

    Every off-diagonal pair (c, d) contributes the same value M[c,d]=M[d,c]
    twice: at node j₀+bits[c] on the offset-o channel (o = bits[d]-bits[c])
    and at node j₀+bits[d] on the offset-(−o) channel. Summing over all
    samples, the mirror identity  A₋ₒ[k] = Aₒ[k−o]  therefore holds EXACTLY
    (it is the same multiset of values, relocated) — including at grid
    boundaries, where zero-padding supplies exactly the vanishing terms.
    So only channels with chan ≤ center (o ⪰ 0 lexicographically) are
    scattered — C(C+1)/2 entries per sample plus C for b — and the
    (3^D−1)/2 mirror channels are pure shifted copies (channel mirror is
    3^D−1−chan). Bandwidth cost of the copies: ~2 planes·(3^D−1)/2, ≈2-3 ms
    at 256³ vs the ~30 ms of scatter it removes."""
    D = grid.ndim
    C = grid.num_corners
    n = corner_idx.shape[0]
    dtype = M.dtype
    N = grid.num_nodes
    chan_np = _offset_channels(D)                      # [C, C] numpy
    center = (3**D - 1) // 2
    keep = np.argwhere(chan_np <= center)              # [P, 2] static
    pc, pd = keep[:, 0], keep[:, 1]
    P = len(pc)                                        # C(C+1)/2

    chans = jnp.asarray(chan_np[pc, pd])[None, :]      # [1, P]
    idx = corner_idx[:, pc]                            # [n, P]
    flat_idx = jnp.concatenate(
        [(chans * N + idx).reshape(-1),
         (center + 1) * N + corner_idx.reshape(-1)])
    updates = jnp.concatenate([M[:, pc, pd].reshape(-1), bvec.reshape(-1)])
    out = jnp.zeros(((center + 2) * N,), dtype=dtype).at[flat_idx].add(updates)
    planes = out.reshape((center + 2,) + grid.shape)
    b = planes[center + 1]

    offs = offset_list(D)                              # [3^D, D]
    mirrors = [_shift(planes[3**D - 1 - q], -offs[3**D - 1 - q], D)
               for q in range(center + 1, 3**D)]
    coeff = jnp.concatenate([planes[:center + 1], jnp.stack(mirrors)])
    return coeff, b


def _densify_flat_scatter(grid: Grid, corner_idx, M, bvec):
    """Elementwise-scatter densify (the f64 assembly path; also the
    reference implementation the fp32 cell-windowed path is probed
    against — probes/assembly_ab.py)."""
    D = grid.ndim
    C = grid.num_corners
    n = corner_idx.shape[0]
    chan = jnp.asarray(_offset_channels(D))            # [C, C]
    idx_cc = jnp.broadcast_to(corner_idx[:, :, None], (n, C, C))
    chan_cc = jnp.broadcast_to(chan[None, :, :], (n, C, C))

    # ONE fused scatter for coeff and b: on the TPU backend a scatter costs
    # ~0.5-1 ms FLAT regardless of payload (measured, NOTES_ROUND1.md), so
    # two scatter ops would double the assembly's dominant cost. b rides
    # along as channel 3^D of a (3^D + 1)-plane target.
    dtype = M.dtype
    N = grid.num_nodes
    flat_idx = jnp.concatenate(
        [(chan_cc * N + idx_cc).reshape(-1), (3**D) * N + corner_idx.reshape(-1)])
    updates = jnp.concatenate([M.reshape(-1), bvec.reshape(-1)])
    out = jnp.zeros(((3**D + 1) * N,), dtype=dtype).at[flat_idx].add(updates)
    coeff = out[:3**D * N].reshape((3**D,) + grid.shape)
    b = out[3**D * N:].reshape(grid.shape)
    return coeff, b


def _shift(x: jax.Array, offset, ndim: int) -> jax.Array:
    """result[i] = x[i + offset] with zeros outside; grid axes are trailing."""
    base = x.ndim - ndim
    pads = [(0, 0)] * x.ndim
    slices = [slice(None)] * x.ndim
    for d, o in enumerate(offset):
        o = int(o)
        ax = base + d
        if o > 0:
            pads[ax] = (0, o)
            slices[ax] = slice(o, None)
        elif o < 0:
            pads[ax] = (-o, 0)
            slices[ax] = slice(None, o)
    return jnp.pad(x[tuple(slices)], pads)


def data_apply(x: jax.Array, coeff: jax.Array, ndim: int) -> jax.Array:
    """(DᵀWD) x via the densified varying stencil: Σ_o coeff[..., o] x_{i+o}.

    x: [..., *grid]; coeff: [..., 3^D, *grid]. Pure shifts — fuses on TPU.
    """
    offsets = offset_list(ndim)
    out = jnp.zeros_like(x)
    grid_sl = (slice(None),) * ndim
    for o_idx in range(offsets.shape[0]):
        c = coeff[(Ellipsis, o_idx) + grid_sl]
        out = out + c * _shift(x, offsets[o_idx], ndim)
    return out


def data_diag(coeff: jax.Array, ndim: int) -> jax.Array:
    """diag(DᵀWD) = the center channel of the densified stencil."""
    center = (3**ndim) // 2
    return coeff[(Ellipsis, center) + (slice(None),) * ndim]


def sample_row_weights(
    weights: Weights,
    in_bounds: jax.Array,          # [n]
    point_weights: jax.Array,      # [n]
    ndim: int,
    with_gradient: bool,
) -> jax.Array:
    """Per-row weights [n, R]: value row scaled by data_pos, gradient rows by
    data_gradient; out-of-bounds or padded (weight-0) samples contribute
    nothing (SPEC.md)."""
    wp = jnp.where(in_bounds, point_weights, 0.0)
    cols = [wp * weights.data_pos]
    g = weights.data_gradient if with_gradient else 0.0
    for _ in range(ndim):
        cols.append(wp * g)
    return jnp.stack(cols, axis=1).astype(point_weights.dtype)
