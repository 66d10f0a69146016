"""Iso-contour / iso-surface extraction from solved fields.

Reference counterpart: marching squares used by the GUI to draw the zero level
set of the reconstructed SDF (SURVEY.md §2 C10, §3.2). Host-side NumPy — a
visualization/test aid, not perf-critical (SURVEY.md §2 C10 "TPU equivalent").

2D: full marching squares (16 cases, midpoint disambiguation for saddles).
3D: marching tetrahedra (each cell split into 6 tets — small case table, no
256-entry MC table needed; produces a watertight-enough triangle soup for
inspection and tests).

Coordinates are lattice coordinates: vertex (r, c) means row r, column c,
matching sample-position space (SPEC.md).
"""

from __future__ import annotations

import numpy as np

# Marching-squares: cell corners indexed
#   0: (r, c)   1: (r, c+1)   2: (r+1, c+1)   3: (r+1, c)
# edges: 0: 0-1 (top), 1: 1-2 (right), 2: 3-2 (bottom), 3: 0-3 (left)
_MS_EDGES = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    # saddles resolved by cell-center sign below
    5: None, 10: None,
}

_EDGE_CORNERS = {0: (0, 1), 1: (1, 2), 2: (3, 2), 3: (0, 3)}
_CORNER_OFFSET = np.array([(0, 0), (0, 1), (1, 1), (1, 0)], dtype=np.float64)


def marching_squares(field: np.ndarray, level: float = 0.0) -> np.ndarray:
    """Extract the iso-contour of a 2D field.

    Returns segments [n, 2, 2] of (row, col) endpoints in lattice coords.
    """
    f = np.asarray(field, dtype=np.float64) - level
    H, W = f.shape
    segments = []

    def edge_point(r, c, e):
        a, b = _EDGE_CORNERS[e]
        pa = _CORNER_OFFSET[a] + (r, c)
        pb = _CORNER_OFFSET[b] + (r, c)
        va = f[int(pa[0]), int(pa[1])]
        vb = f[int(pb[0]), int(pb[1])]
        t = 0.5 if va == vb else va / (va - vb)
        return pa + t * (pb - pa)

    for r in range(H - 1):
        for c in range(W - 1):
            corners = (f[r, c], f[r, c + 1], f[r + 1, c + 1], f[r + 1, c])
            case = sum(1 << i for i, v in enumerate(corners) if v < 0)
            edges = _MS_EDGES[case]
            if edges is None:  # saddle: use cell-center average sign
                center_neg = sum(corners) < 0
                if case == 5:
                    edges = [(0, 1), (2, 3)] if center_neg else [(3, 0), (1, 2)]
                else:  # case 10
                    edges = [(3, 0), (1, 2)] if center_neg else [(0, 1), (2, 3)]
            for e0, e1 in edges:
                segments.append((edge_point(r, c, e0), edge_point(r, c, e1)))
    return (np.asarray(segments, dtype=np.float64) if segments
            else np.zeros((0, 2, 2)))


# Marching tetrahedra: split each cube cell into 6 tets (all sharing the
# main diagonal 0-6). Cube corner k has offsets (bit0, bit1, bit2) applied to
# axes (0, 1, 2) — NOTE corner index bits here are (z, y, x)-agnostic; we use
# axis-order offsets directly.
_CUBE_CORNERS = np.array([
    (0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
    (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0),
], dtype=np.float64)
_TETS = [
    (0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
    (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6),
]


def marching_tetrahedra(field: np.ndarray, level: float = 0.0) -> np.ndarray:
    """Extract the iso-surface of a 3D field as a triangle soup.

    Returns triangles [n, 3, 3] of (i, j, k) vertices in lattice coords.
    """
    f = np.asarray(field, dtype=np.float64) - level
    NI, NJ, NK = f.shape
    tris = []

    def interp(p0, p1, v0, v1):
        t = 0.5 if v0 == v1 else v0 / (v0 - v1)
        return p0 + t * (p1 - p0)

    for i in range(NI - 1):
        for j in range(NJ - 1):
            for k in range(NK - 1):
                base = np.array((i, j, k), dtype=np.float64)
                pts = _CUBE_CORNERS + base
                vals = np.array([f[int(p[0]), int(p[1]), int(p[2])] for p in pts])
                if vals.min() >= 0 or vals.max() < 0:
                    continue
                for tet in _TETS:
                    tp = pts[list(tet)]
                    tv = vals[list(tet)]
                    neg = [t for t in range(4) if tv[t] < 0]
                    if len(neg) == 0 or len(neg) == 4:
                        continue
                    pos = [t for t in range(4) if tv[t] >= 0]
                    if len(neg) == 1 or len(pos) == 1:
                        # one apex vs a triangle base -> one triangle
                        apex = neg[0] if len(neg) == 1 else pos[0]
                        others = [t for t in range(4) if t != apex]
                        tri = [interp(tp[apex], tp[o], tv[apex], tv[o])
                               for o in others]
                        tris.append(tri)
                    else:
                        # 2-2 split -> quad -> two triangles
                        a, b = neg
                        c, d = pos
                        q = [interp(tp[a], tp[c], tv[a], tv[c]),
                             interp(tp[a], tp[d], tv[a], tv[d]),
                             interp(tp[b], tp[d], tv[b], tv[d]),
                             interp(tp[b], tp[c], tv[b], tv[c])]
                        tris.append([q[0], q[1], q[2]])
                        tris.append([q[0], q[2], q[3]])
    return (np.asarray(tris, dtype=np.float64) if tris
            else np.zeros((0, 3, 3)))


def weld_triangles(triangles: np.ndarray,
                   weld_tol: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Triangle soup [n, 3, 3] → indexed mesh ``(vertices [m, 3] float64,
    faces [n, 3] int)``: coincident vertices (rounded to ``weld_tol``) are
    welded so shared edges are truly shared. The in-memory counterpart of
    ``write_obj`` for feeding renderers/mesh libraries directly."""
    tris = np.asarray(triangles, dtype=np.float64)
    if tris.ndim != 3 or tris.shape[1:] != (3, 3):
        raise ValueError(f"expected [n, 3, 3] triangles, got {tris.shape}")
    flat = tris.reshape(-1, 3)
    keys = np.round(flat / weld_tol).astype(np.int64)
    # representative coordinates: first occurrence of each welded vertex
    _, first, inv = np.unique(keys, axis=0, return_index=True,
                              return_inverse=True)
    return flat[first], inv.reshape(-1, 3)


def write_obj(path: str, triangles: np.ndarray,
              weld_tol: float = 1e-5) -> tuple[int, int]:
    """Write a triangle soup [n, 3, 3] (as produced by the marching-
    tetrahedra extractors) to a Wavefront OBJ file, welding coincident
    vertices (weld_triangles) so shared edges are truly shared — the
    reference renders its surface in-GUI; this is the export path for
    external viewers. Returns (num_vertices, num_triangles)."""
    verts, faces = weld_triangles(triangles, weld_tol)
    with open(path, "w") as fh:
        fh.write("# field_interpolation_tpu iso-surface\n")
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
    return len(verts), len(faces)


def contour_polylines(segments: np.ndarray, tol: float = 1e-9) -> list[np.ndarray]:
    """Chain marching-squares segments into polylines (closed where possible)."""
    if len(segments) == 0:
        return []
    segs = [(tuple(s[0]), tuple(s[1])) for s in np.round(segments / tol) * tol]
    # adjacency by endpoint
    from collections import defaultdict
    adj = defaultdict(list)
    for i, (a, b) in enumerate(segs):
        adj[a].append(i)
        adj[b].append(i)
    used = [False] * len(segs)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        a, b = segs[start]
        chain = [a, b]

        def extend(cur, append):
            while True:
                nxt = [i for i in adj[cur] if not used[i]]
                if not nxt:
                    return
                i = nxt[0]
                used[i] = True
                p, q = segs[i]
                cur = q if p == cur else p
                append(cur)

        extend(b, chain.append)
        # An open contour whose seed segment sits mid-chain also needs the
        # backward walk from the seed's FIRST endpoint (closed loops consume
        # every segment in the forward walk, so this is a no-op for them).
        extend(a, lambda p: chain.insert(0, p))
        lines.append(np.asarray(chain))
    return lines


# ---------------------------------------------------------------------------
# Device-side marching squares: the reference GUI re-extracts the contour
# every frame; this variant is jit/vmap-friendly (static shapes, no host
# sync) so the whole interactive loop — assemble, solve, contour — can stay
# on the TPU. Identical case/saddle conventions to the host version above.
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _ms_tables():
    """(tableA, tableB): [16, 2, 2] int32 edge-pair tables for up to two
    segments per cell; -1 marks an empty slot. tableA applies when the
    cell-center average is >= 0, tableB when it is negative (they differ
    only in the saddle cases 5 and 10)."""
    A = -np.ones((16, 2, 2), dtype=np.int32)
    B = -np.ones((16, 2, 2), dtype=np.int32)
    for case, edges in _MS_EDGES.items():
        if edges is None:
            continue
        for si, (e0, e1) in enumerate(edges):
            A[case, si] = (e0, e1)
            B[case, si] = (e0, e1)
    A[5], B[5] = [(3, 0), (1, 2)], [(0, 1), (2, 3)]
    A[10], B[10] = [(0, 1), (2, 3)], [(3, 0), (1, 2)]
    A.setflags(write=False)
    B.setflags(write=False)
    return A, B


def marching_squares_device(field, level: float = 0.0):
    """Marching squares entirely on device (jit/vmap-friendly).

    field: [H, W] array (any float dtype). Returns
    ``(segments [(H-1)·(W-1)·2, 2, 2], valid [(H-1)·(W-1)·2] bool)`` in
    (row, col) lattice coordinates: the fixed-size slot layout holds up to
    two segments per cell (row-major cells); ``valid`` masks the live slots.
    ``np.asarray(segments)[np.asarray(valid)]`` reproduces the host
    ``marching_squares`` output up to segment order (tested). For grids
    whose slot array would be too large (4096² ≈ 536 MB) use
    ``marching_squares_device_compact``.
    """
    import jax.numpy as jnp

    f = jnp.asarray(field)
    f = (f - jnp.asarray(level, f.dtype)).astype(jnp.float32)
    return _ms_slots(f, jnp.float32(0.0))


def _ms_slots(f, base_r, base_c=None):
    """Fixed-slot marching squares on an (already level-shifted) field
    ``f [h, W]``; segment coordinates are offset by ``base_r``/``base_c``
    (traced f32 scalars — lets tiled/sharded callers emit global
    coordinates). Returns (segments [cells·2, 2, 2], valid [cells·2])."""
    import jax
    import jax.numpy as jnp

    H, W = f.shape
    v0 = f[:-1, :-1]
    v1 = f[:-1, 1:]
    v2 = f[1:, 1:]
    v3 = f[1:, :-1]

    case = ((v0 < 0).astype(jnp.int32)
            + 2 * (v1 < 0).astype(jnp.int32)
            + 4 * (v2 < 0).astype(jnp.int32)
            + 8 * (v3 < 0).astype(jnp.int32))          # [H-1, W-1]
    center_neg = (v0 + v1 + v2 + v3) < 0

    def t_of(va, vb):
        d = va - vb
        return jnp.where(d == 0, 0.5, va / jnp.where(d == 0, 1.0, d))

    rr = jax.lax.broadcasted_iota(jnp.float32, v0.shape, 0) + base_r
    cc = jax.lax.broadcasted_iota(jnp.float32, v0.shape, 1)
    if base_c is not None:
        cc = cc + base_c
    # Edge interpolation points, indexed like _EDGE_CORNERS (top/right/
    # bottom/left), stacked as [H-1, W-1, 4 edges, 2 (row, col)].
    p_top = jnp.stack([rr, cc + t_of(v0, v1)], -1)
    p_right = jnp.stack([rr + t_of(v1, v2), cc + 1.0], -1)
    p_bottom = jnp.stack([rr + 1.0, cc + t_of(v3, v2)], -1)
    p_left = jnp.stack([rr + t_of(v0, v3), cc], -1)
    epts = jnp.stack([p_top, p_right, p_bottom, p_left], axis=2)

    A, B = _ms_tables()
    tA = jnp.asarray(A)[case]                           # [H-1, W-1, 2, 2]
    tB = jnp.asarray(B)[case]
    edges = jnp.where(center_neg[..., None, None], tB, tA)
    valid = edges[..., 0] >= 0                          # [H-1, W-1, 2]
    safe = jnp.maximum(edges, 0)
    # Gather the two endpoints of each slot's edge pair.
    segs = jnp.take_along_axis(
        epts[:, :, None, :, :],                         # [.., 1, 4, 2]
        safe[..., None].astype(jnp.int32),              # [.., 2, 2, 1]
        axis=3)                                         # [.., 2, 2, 2]
    n_slots = (H - 1) * (W - 1) * 2
    return segs.reshape(n_slots, 2, 2), valid.reshape(n_slots)


@_functools.lru_cache(maxsize=None)
def _mt_table():
    """[16, 2, 3, 2] int32: per tet sign-case (bit t = corner t negative),
    up to two triangles of three edge-interpolation points, each edge a
    (corner_a, corner_b) pair of tet-local indices (interp order: value at
    corner_a first, exactly like the host marching_tetrahedra); -1 marks
    empty slots."""
    T = -np.ones((16, 2, 3, 2), dtype=np.int32)
    for case in range(1, 15):
        neg = [t for t in range(4) if (case >> t) & 1]
        pos = [t for t in range(4) if not (case >> t) & 1]
        if len(neg) == 1 or len(pos) == 1:
            apex = neg[0] if len(neg) == 1 else pos[0]
            others = [t for t in range(4) if t != apex]
            T[case, 0] = [(apex, o) for o in others]
        else:  # 2-2 split -> quad -> two triangles
            a, b = neg
            c, d = pos
            q = [(a, c), (a, d), (b, d), (b, c)]
            T[case, 0] = [q[0], q[1], q[2]]
            T[case, 1] = [q[0], q[2], q[3]]
    T.setflags(write=False)
    return T


def marching_tetrahedra_device(field, level: float = 0.0):
    """Marching tetrahedra entirely on device (jit/vmap-friendly).

    field: [NI, NJ, NK] array. Returns ``(triangles
    [n_cells·12, 3, 3], valid [n_cells·12] bool)`` — a fixed-size slot
    layout of 6 tets × up to 2 triangles per cell (row-major cells, tets in
    _TETS order); ``np.asarray(triangles)[np.asarray(valid)]`` reproduces
    the host ``marching_tetrahedra`` triangle set (tested). NOTE the output
    is ~12·9 floats per CELL — meant for moderate grids or cropped regions
    (a 128³ field would emit ~900 MB of slots); for large fields use
    ``marching_tetrahedra_device_compact``, which streams plane tiles
    through the same slot extraction and keeps only the live triangles.
    """
    import jax.numpy as jnp

    f = jnp.asarray(field)
    f = (f - jnp.asarray(level, f.dtype)).astype(jnp.float32)
    return _mt_slots(f, jnp.float32(0.0))


def _mt_slots(f, base_i, base_j=None, base_k=None):
    """Fixed-slot marching tetrahedra on an (already level-shifted) field
    ``f [ni, NJ, NK]``; triangle coordinates are offset by ``base_i`` (and
    optionally ``base_j``/``base_k``) — traced f32 scalars that let tiled
    and sharded callers emit global coordinates.
    Returns (tris [cells·12, 3, 3], valid [cells·12])."""
    import jax
    import jax.numpy as jnp

    NI, NJ, NK = f.shape
    corner = np.asarray(_CUBE_CORNERS, np.int32)          # [8, 3]
    vals8 = jnp.stack(
        [f[o0:NI - 1 + o0, o1:NJ - 1 + o1, o2:NK - 1 + o2]
         for (o0, o1, o2) in corner], axis=-1)            # [ci, cj, ck, 8]
    cells = (NI - 1) * (NJ - 1) * (NK - 1)
    vals8 = vals8.reshape(cells, 8)

    ii = jax.lax.broadcasted_iota(jnp.float32, (NI - 1, NJ - 1, NK - 1), 0)
    ii = ii + base_i
    jj = jax.lax.broadcasted_iota(jnp.float32, (NI - 1, NJ - 1, NK - 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (NI - 1, NJ - 1, NK - 1), 2)
    if base_j is not None:
        jj = jj + base_j
    if base_k is not None:
        kk = kk + base_k
    base = jnp.stack([ii, jj, kk], -1).reshape(cells, 1, 3)
    pos8 = base + jnp.asarray(_CUBE_CORNERS, jnp.float32)  # [cells, 8, 3]

    tets = np.asarray(_TETS, np.int32)                     # [6, 4]
    tv = vals8[:, tets]                                    # [cells, 6, 4]
    tp = pos8[:, tets]                                     # [cells, 6, 4, 3]
    case = jnp.sum((tv < 0).astype(jnp.int32)
                   * np.asarray([1, 2, 4, 8], np.int32), axis=-1)

    tab = jnp.asarray(_mt_table())[case]                   # [cells, 6, 2, 3, 2]
    valid = tab[..., 0, 0] >= 0                            # [cells, 6, 2]
    safe = jnp.maximum(tab, 0)                             # [cells, 6, 2, 3, 2]

    def gather_corner(arr, idx):
        # arr [cells, 6, 4(, 3)], idx [cells, 6, 2, 3] -> [cells, 6, 2, 3(, 3)]
        idx_flat = idx.reshape(cells, 6, 6)
        out = jnp.take_along_axis(
            arr, idx_flat if arr.ndim == 3 else idx_flat[..., None],
            axis=2)
        new_shape = (cells, 6, 2, 3) + (() if arr.ndim == 3 else (3,))
        return out.reshape(new_shape)

    va = gather_corner(tv, safe[..., 0])
    vb = gather_corner(tv, safe[..., 1])
    pa = gather_corner(tp, safe[..., 0])
    pb = gather_corner(tp, safe[..., 1])
    den = va - vb
    t = jnp.where(den == 0, 0.5, va / jnp.where(den == 0, 1.0, den))
    tris = pa + t[..., None] * (pb - pa)                   # [cells, 6, 2, 3, 3]
    n_slots = cells * 12
    return tris.reshape(n_slots, 3, 3), valid.reshape(n_slots)


def _tiled_compact(fpad, extract, n_cells_0, ti, slots_per_plane, max_out,
                   cap, item_shape):
    """Shared tiled-scan compaction for the device extractors: walk the
    field in tiles of ``ti`` cell-planes along axis 0, run ``extract(blk,
    base) -> (items [slots_tile, *item_shape], valid)`` per tile, compact
    the live slots to the front with a stable key sort, and stream them
    into one ``max_out``-capped buffer at a running offset. Peak memory is
    one tile of slots plus the output buffer; stream order matches the
    full-slot extractors exactly. Pad-region cells (``fpad`` is padded so
    every tile slices ti+1 planes) are masked by their global plane index.

    Returns ``(items [max_out, *item_shape], count, overflowed)``: rows
    ``[:count]`` are live (zeros beyond); ``overflowed`` is True iff items
    were dropped against either ``max_out`` or the per-tile ``cap``.
    """
    import jax
    import jax.numpy as jnp

    n_tiles = -(-n_cells_0 // ti)
    slots_tile = ti * slots_per_plane
    cap = min(cap, slots_tile)
    # slot s belongs to cell-plane s // slots_per_plane of its tile
    plane_of_slot = (jnp.arange(slots_tile, dtype=jnp.int32)
                     // jnp.int32(slots_per_plane))
    slot_iota = jnp.arange(slots_tile, dtype=jnp.int32)
    cap_iota = jnp.arange(cap, dtype=jnp.int32)
    expand = (slice(None),) + (None,) * len(item_shape)
    blk_shape = (ti + 1,) + fpad.shape[1:]

    def body(carry, t):
        out, offset, clipped = carry
        blk = jax.lax.dynamic_slice(
            fpad, (t * ti,) + (0,) * (fpad.ndim - 1), blk_shape)
        items, valid = extract(blk, (t * ti).astype(jnp.float32))
        valid = valid & ((t * ti + plane_of_slot) < n_cells_0)
        count = jnp.sum(valid, dtype=jnp.int32)
        # stable valid-first permutation: valid slots keep their order
        key = jnp.where(valid, slot_iota, slots_tile + slot_iota)
        perm = jnp.argsort(key)[:cap]
        items_c = jnp.take(items, perm, axis=0)           # [cap, *item]
        allowed = jnp.clip(max_out - offset, 0, cap)
        take = jnp.minimum(count, allowed)
        items_c = jnp.where((cap_iota < take)[expand], items_c, 0.0)
        out = jax.lax.dynamic_update_slice(
            out, items_c, (offset,) + (0,) * len(item_shape))
        return (out, offset + take, clipped + (count - take)), None

    # cap extra rows of padding let every tile write a full [cap] block at
    # its offset (≤ max_out by construction) without clamping.
    out0 = jnp.zeros((max_out + cap,) + item_shape, jnp.float32)
    (out, total, clipped), _ = jax.lax.scan(
        body, (out0, jnp.int32(0), jnp.int32(0)),
        jnp.arange(n_tiles, dtype=jnp.int32))
    return out[:max_out], total, clipped > 0


def marching_squares_device_compact(field, level: float = 0.0,
                                    max_segments: int | None = None,
                                    tile_rows: int = 64,
                                    tile_capacity: int | None = None):
    """Marching squares on device with BOUNDED output (jit-friendly).

    The fixed-slot ``marching_squares_device`` emits 2 slots per cell
    (~536 MB at 4096²); this variant streams row tiles through the same
    slot extraction and keeps only the live segments — see
    ``marching_tetrahedra_device_compact`` for the mechanism and the
    meaning of ``(segments [max_segments, 2, 2], count, overflowed)``.

    max_segments: output capacity; default ``8·max(H-1, W-1)`` (a contour
      in an N² grid has O(N) segments). tile_rows: cell-rows per scan
      step. tile_capacity: per-tile cap; default two fully-cut cell rows.
    """
    import jax.numpy as jnp

    f = jnp.asarray(field)
    f = (f - jnp.asarray(level, f.dtype)).astype(jnp.float32)
    H, W = f.shape
    if max_segments is None:
        max_segments = 8 * max(H - 1, W - 1)
    ti = max(1, min(tile_rows, H - 1))
    n_tiles = -(-(H - 1) // ti)
    fpad = jnp.pad(f, ((0, n_tiles * ti + 1 - H), (0, 0)),
                   constant_values=1.0)
    cap = (tile_capacity if tile_capacity is not None
           else 2 * 2 * (W - 1))
    return _tiled_compact(fpad, _ms_slots, H - 1, ti, 2 * (W - 1),
                          max_segments, cap, (2, 2))


def marching_tetrahedra_device_compact(field, level: float = 0.0,
                                       max_triangles: int | None = None,
                                       tile_planes: int = 8,
                                       tile_capacity: int | None = None):
    """Marching tetrahedra on device with BOUNDED output (jit-friendly).

    ``marching_tetrahedra_device`` materializes 12 fixed triangle slots per
    cell — ~900 MB at 128³ — because XLA needs static shapes. This variant
    removes that ceiling (VERDICT r3 missing #6): a ``lax.scan`` walks the
    grid in tiles of ``tile_planes`` cell-planes along axis 0, runs the same
    slot extraction per tile (`_mt_slots`), compacts the live slots to the
    front with a stable key sort, and streams them into one user-capped
    buffer at a running offset (see ``_tiled_compact``). The triangle
    stream order (row-major cells, _TETS order) matches the full-slot
    extractor exactly.

    Returns ``(triangles [max_triangles, 3, 3], count, overflowed)``:
    rows ``[:count]`` are the extracted triangles (zeros beyond),
    ``overflowed`` is True iff triangles were dropped because ``count``
    would have exceeded ``max_triangles`` or some tile cut more than
    ``tile_capacity`` slots — re-run with larger caps if set.

    max_triangles: output capacity. Default ``48·(NJ-1)·(NK-1)`` (a closed
      surface in an N³ grid emits O(N²) triangles — ~4 full cut planes).
    tile_planes: cell-planes per scan step (memory/throughput knob).
    tile_capacity: per-tile compaction capacity. Default one fully-cut
      plane of cells, ``12·(NJ-1)·(NK-1)`` — a surface must cut every cell
      of ``tile_planes`` planes to beat it (flagged via ``overflowed``).
    """
    import jax.numpy as jnp

    f = jnp.asarray(field)
    f = (f - jnp.asarray(level, f.dtype)).astype(jnp.float32)
    NI, NJ, NK = f.shape
    cells_jk = (NJ - 1) * (NK - 1)
    if max_triangles is None:
        max_triangles = 48 * cells_jk
    ti = max(1, min(tile_planes, NI - 1))
    n_tiles = -(-(NI - 1) // ti)
    # Pad axis 0 so every tile slices (ti+1) planes; pad value is a benign
    # +1.0 (NOT inf — inf-vs-inf corners would interpolate to NaN, and even
    # masked NaNs poison a jnp.where'd multiply). Pad-region cells are
    # masked out by their global plane index in _tiled_compact.
    fpad = jnp.pad(f, ((0, n_tiles * ti + 1 - NI), (0, 0), (0, 0)),
                   constant_values=1.0)
    cap = (tile_capacity if tile_capacity is not None else 12 * cells_jk)
    return _tiled_compact(fpad, _mt_slots, NI - 1, ti, 12 * cells_jk,
                          max_triangles, cap, (3, 3))
