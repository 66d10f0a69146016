"""Sharded iso-contour extraction: marching squares inside shard_map.

The reference GUI re-extracts the contour every frame (SURVEY.md §3.2); for
fields that live sharded over a device mesh (`parallel.solve_sharded`) this
keeps the extraction on-mesh too — each shard marches its OWN cells after a
one-node halo exchange with its +row/+col neighbors, so cells straddling
shard seams are extracted exactly once, by their owner, with no gather of
the global field. Output coordinates are global lattice coordinates, the
same conventions as `contour.marching_squares_device` (slot layout, saddle
rules), which the parity test pins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..contour import _ms_slots, _mt_slots


def marching_squares_sharded(field, mesh: Mesh, level: float = 0.0,
                             max_segments_per_shard: int | None = None):
    """Marching squares on a mesh-sharded 2D field, entirely inside
    shard_map (grid dim d sharded over mesh axis d, like solve_sharded).

    Each shard extracts the cells whose lower-left node it owns: a one-node
    halo (next shard's first row / first column / corner node, via
    ``ppermute``) completes the seam cells, and cells outside the global
    grid (edge shards' halo garbage) are masked by their global index. Live
    slots are compacted to the front of a fixed per-shard buffer.

    Returns ``(segments [mx, my, cap, 2, 2], counts [mx, my], overflowed)``
    in global (row, col) lattice coordinates: shard (a, b)'s rows
    ``[:counts[a, b]]`` are its live segments (zeros beyond);
    ``overflowed`` is True iff some shard cut more than ``cap`` slots
    (raise ``max_segments_per_shard`` and re-run). The union over shards
    equals the unsharded device extraction's live set (tested).
    """
    H, W = field.shape
    names = mesh.axis_names[:2]
    mx, my = mesh.shape[names[0]], mesh.shape[names[1]]
    for d, (n, m) in enumerate(((H, mx), (W, my))):
        if n % m != 0:
            raise ValueError(f"grid dim {d} ({n}) not divisible by mesh "
                             f"axis {names[d]!r} ({m})")
    h, w = H // mx, W // my
    cap = (max_segments_per_shard if max_segments_per_shard is not None
           else 8 * max(h, w))
    n_slots = h * w * 2  # ext block (h+1, w+1) -> (h, w) cells, 2 slots each
    slot_cell = jnp.arange(n_slots, dtype=jnp.int32) // 2
    slot_r = slot_cell // w
    slot_c = slot_cell % w
    cap_iota = jnp.arange(cap, dtype=jnp.int32)

    def recv_next(x, name, m):
        """Each shard receives x from its +1 neighbor along ``name``
        (zeros at the last shard — masked as out-of-grid below)."""
        if m == 1:
            return jnp.zeros_like(x)
        return lax.ppermute(x, name, [(i + 1, i) for i in range(m - 1)])

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(*names),
        out_specs=(P(*names, None, None, None), P(*names), P(*names)),
        check_vma=False,
    )
    def body(f):
        ix = lax.axis_index(names[0])
        iy = lax.axis_index(names[1])
        row_n = recv_next(f[0:1, :], names[0], mx)          # [1, w]
        col_n = recv_next(f[:, 0:1], names[1], my)          # [h, 1]
        # corner node (next, next): route the neighbor's [0, 0] along y
        # first, then x — arrives as block (ix+1, iy+1)'s origin.
        c1 = recv_next(f[0:1, 0:1], names[1], my)
        c2 = recv_next(c1, names[0], mx)                    # [1, 1]
        ext = jnp.concatenate(
            [jnp.concatenate([f, col_n], axis=1),
             jnp.concatenate([row_n, c2], axis=1)], axis=0)  # [h+1, w+1]
        ext = ext - jnp.asarray(level, ext.dtype)
        segs, valid = _ms_slots(ext.astype(jnp.float32),
                                (ix * h).astype(jnp.float32),
                                (iy * w).astype(jnp.float32))
        valid = (valid & ((ix * h + slot_r) < (H - 1))
                 & ((iy * w + slot_c) < (W - 1)))
        count = jnp.sum(valid, dtype=jnp.int32)
        key = jnp.where(valid, jnp.arange(n_slots, dtype=jnp.int32),
                        n_slots + jnp.arange(n_slots, dtype=jnp.int32))
        perm = jnp.argsort(key)[:cap]
        out = jnp.take(segs, perm, axis=0)                  # [cap, 2, 2]
        take = jnp.minimum(count, cap)
        out = jnp.where((cap_iota < take)[:, None, None], out, 0.0)
        return (out[None, None], take[None, None],
                (count - take)[None, None])

    segs, counts, clipped = body(field)
    return segs, counts, jnp.any(clipped > 0)


def marching_tetrahedra_sharded(field, mesh: Mesh, level: float = 0.0,
                                max_triangles_per_shard: int | None = None):
    """Marching tetrahedra on a mesh-sharded 3D field, entirely inside
    shard_map — the 3D analog of ``marching_squares_sharded`` (grid dim d
    sharded over mesh axis d, like solve_sharded).

    The one-node halo here is three neighbor FACES, three EDGES, and the
    far CORNER node, each fetched by routing the owner's origin slab one
    ``ppermute`` hop per flagged axis; seam cells are then marched exactly
    once, by their owner, and out-of-grid cells (edge shards' halo
    garbage) are masked by global index.

    Returns ``(triangles [m0, m1, m2, cap, 3, 3], counts [m0, m1, m2],
    overflowed)`` in global (i, j, k) lattice coordinates; shard
    ``(a, b, c)``'s rows ``[:counts[a, b, c]]`` are live (zeros beyond),
    and ``overflowed`` is True iff some shard cut more than ``cap`` slots.
    """
    NI, NJ, NK = field.shape
    names = mesh.axis_names[:3]
    sizes = tuple(mesh.shape[n] for n in names)
    for d, (n, m) in enumerate(zip((NI, NJ, NK), sizes)):
        if n % m != 0:
            raise ValueError(f"grid dim {d} ({n}) not divisible by mesh "
                             f"axis {names[d]!r} ({m})")
    h, w, dd = NI // sizes[0], NJ // sizes[1], NK // sizes[2]
    cap = (max_triangles_per_shard if max_triangles_per_shard is not None
           else 48 * max(h * w, h * dd, w * dd))
    n_slots = h * w * dd * 12
    slot_cell = jnp.arange(n_slots, dtype=jnp.int32) // 12
    slot_i = slot_cell // (w * dd)
    slot_j = (slot_cell // dd) % w
    slot_k = slot_cell % dd
    cap_iota = jnp.arange(cap, dtype=jnp.int32)

    def recv_next(x, name, m):
        if m == 1:
            return jnp.zeros_like(x)
        return lax.ppermute(x, name, [(i + 1, i) for i in range(m - 1)])

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(*names),
        out_specs=(P(*names, None, None, None), P(*names), P(*names)),
        check_vma=False,
    )
    def body(f):
        idx = [lax.axis_index(n) for n in names]

        def fetch(flags):
            """Origin slab of the (+flags) neighbor block: slice the local
            origin along each flagged axis, then route one hop per flagged
            axis (already-routed data keeps composing)."""
            sl = tuple(slice(0, 1) if fl else slice(None) for fl in flags)
            out = f[sl]
            for name, m, fl in zip(names, sizes, flags):
                if fl:
                    out = recv_next(out, name, m)
            return out

        bottom = jnp.concatenate(
            [jnp.concatenate([f, fetch((0, 0, 1))], axis=2),
             jnp.concatenate([fetch((0, 1, 0)), fetch((0, 1, 1))], axis=2)],
            axis=1)                                    # [h, w+1, d+1]
        top = jnp.concatenate(
            [jnp.concatenate([fetch((1, 0, 0)), fetch((1, 0, 1))], axis=2),
             jnp.concatenate([fetch((1, 1, 0)), fetch((1, 1, 1))], axis=2)],
            axis=1)                                    # [1, w+1, d+1]
        ext = jnp.concatenate([bottom, top], axis=0)   # [h+1, w+1, d+1]
        ext = ext - jnp.asarray(level, ext.dtype)
        tris, valid = _mt_slots(ext.astype(jnp.float32),
                                (idx[0] * h).astype(jnp.float32),
                                (idx[1] * w).astype(jnp.float32),
                                (idx[2] * dd).astype(jnp.float32))
        valid = (valid & ((idx[0] * h + slot_i) < (NI - 1))
                 & ((idx[1] * w + slot_j) < (NJ - 1))
                 & ((idx[2] * dd + slot_k) < (NK - 1)))
        count = jnp.sum(valid, dtype=jnp.int32)
        key = jnp.where(valid, jnp.arange(n_slots, dtype=jnp.int32),
                        n_slots + jnp.arange(n_slots, dtype=jnp.int32))
        perm = jnp.argsort(key)[:cap]
        out = jnp.take(tris, perm, axis=0)             # [cap, 3, 3]
        take = jnp.minimum(count, cap)
        out = jnp.where((cap_iota < take)[:, None, None], out, 0.0)
        return (out[None, None, None], take[None, None, None],
                (count - take)[None, None, None])

    tris, counts, clipped = body(field)
    return tris, counts, jnp.any(clipped > 0)
