"""Unit tests for multilinear corner weights & row coefficients (SURVEY.md §4:
'multilinear weight values at cell corners/centers (exact rationals)')."""

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid
from field_interpolation_tpu.constraints import multilinear_corner_data


def test_corner_weights_at_node_2d():
    grid = Grid((5, 7))
    # Exactly at node (2, 3): all weight on that corner.
    pos = jnp.array([[2.0, 3.0]])
    idx, rows, inb = multilinear_corner_data(grid, pos)
    value_row = np.asarray(rows[0, 0])
    np.testing.assert_allclose(value_row.sum(), 1.0, rtol=1e-6)
    hot = np.flatnonzero(np.abs(value_row) > 1e-9)
    assert len(hot) == 1
    assert int(idx[0, hot[0]]) == 2 * 7 + 3
    assert bool(inb[0])


def test_corner_weights_cell_center_2d():
    grid = Grid((4, 4))
    pos = jnp.array([[1.5, 2.5]])
    _, rows, _ = multilinear_corner_data(grid, pos)
    np.testing.assert_allclose(np.asarray(rows[0, 0]), 0.25, rtol=1e-6)


def test_corner_weights_sum_to_one(rng):
    grid = Grid((6, 5, 4))
    pos = jnp.asarray(rng.uniform(0, 3, size=(50, 3)))
    _, rows, inb = multilinear_corner_data(grid, pos)
    np.testing.assert_allclose(np.asarray(rows[:, 0, :]).sum(-1), 1.0, rtol=1e-5)
    assert bool(jnp.all(inb))


def test_gradient_rows_are_interp_partials(rng):
    """Gradient row coefficients == d/dp of the value-row interpolation."""
    grid = Grid((8, 8))
    pos = jnp.asarray(rng.uniform(0.1, 6.9, size=(20, 2)))
    field = rng.standard_normal(grid.shape).astype(np.float32)
    idx, rows, _ = multilinear_corner_data(grid, pos)
    corner_vals = field.ravel()[np.asarray(idx)]                 # [n, 4]
    grad = np.einsum("nrc,nc->nr", np.asarray(rows[:, 1:, :]), corner_vals)

    eps = 1e-4
    for a in range(2):
        dp = np.zeros(2)
        dp[a] = eps
        _, r_plus, _ = multilinear_corner_data(grid, pos + dp)
        _, r_minus, _ = multilinear_corner_data(grid, pos - dp)
        v_plus = np.einsum("nc,nc->n", np.asarray(r_plus[:, 0, :]), corner_vals)
        v_minus = np.einsum("nc,nc->n", np.asarray(r_minus[:, 0, :]), corner_vals)
        fd = (v_plus - v_minus) / (2 * eps)
        np.testing.assert_allclose(grad[:, a], fd, atol=1e-2)


def test_out_of_bounds_flagged():
    grid = Grid((4, 4))
    pos = jnp.array([[-0.5, 1.0], [1.0, 3.5], [3.0, 3.0], [0.0, 0.0]])
    _, _, inb = multilinear_corner_data(grid, pos)
    assert list(np.asarray(inb)) == [False, False, True, True]


def test_nonfinite_positions_dropped():
    """NaN/Inf sample positions must act like out-of-bounds samples (dropped),
    not poison the scatter (found via runtime probing: 0·NaN = NaN)."""
    grid = Grid((4, 4))
    pos = jnp.array([[np.nan, 1.0], [np.inf, 1.0], [1.0, -np.inf], [1.0, 1.0]])
    idx, rows, inb = multilinear_corner_data(grid, pos)
    assert list(np.asarray(inb)) == [False, False, False, True]
    assert bool(jnp.all(jnp.isfinite(rows)))


def test_exact_matmul_scatter_matches_f64_scatter(rng):
    """scatter_corners_exact_2d: the integer-grid matmul passes must match
    the sequential float64 scatter to ~2^-50 relative — including adversarial
    magnitude spreads (the hi/lo scatter it replaces floors at ~3e-7)."""
    import jax

    from field_interpolation_tpu import constraints as cons
    from field_interpolation_tpu.grid import Grid
    grid = Grid((24, 40))
    n = 500
    with jax.enable_x64():
        idx = jnp.asarray(
            rng.integers(0, grid.num_nodes, size=(n, 4)), jnp.int32)
        # wide magnitude spread + cancellation
        v = jnp.asarray(rng.standard_normal((n, 4))
                        * 10.0 ** rng.uniform(-8, 8, (n, 4)), jnp.float64)
        want = jnp.zeros((grid.num_nodes,), jnp.float64
                         ).at[idx].add(v).reshape(grid.shape)
        got = cons.scatter_corners_exact_2d(grid, idx, v)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(v)))
        assert err <= 2.0 ** -48 * scale, (err, scale)


def test_exact_matmul_scatter_degenerate_bit_budget(rng):
    """Regression (code review): huge addend counts that still pass the
    use_matmul_scatter flop gate must fall back to the plain f64 scatter
    instead of crashing (b=0 -> ZeroDivisionError) or silently zeroing."""
    import jax

    from field_interpolation_tpu import constraints as cons
    from field_interpolation_tpu.grid import Grid
    grid = Grid((4, 8))
    n = 2_000_000  # n_addends = 8e6 -> per-pass bit budget < 6
    with jax.enable_x64():
        idx = jnp.asarray(rng.integers(0, grid.num_nodes, size=(n, 4)),
                          jnp.int32)
        v = jnp.asarray(rng.standard_normal((n, 4)), jnp.float64)
        want = jnp.zeros((grid.num_nodes,), jnp.float64
                         ).at[idx].add(v).reshape(grid.shape)
        got = cons.scatter_corners_exact_2d(grid, idx, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)


def test_exact_matmul_scatter_3d_matches_f64_scatter(rng):
    """VERDICT r2 item 7: the integer-grid exact scatter generalizes to 3D
    (leading-axis rows x flattened-rest columns). Bit-parity vs the
    sequential float64 scatter at a gated size."""
    import jax

    from field_interpolation_tpu import constraints as cons
    from field_interpolation_tpu.grid import Grid
    grid = Grid((24, 16, 40))
    n = 800
    assert cons.use_matmul_scatter(grid, n)
    with jax.enable_x64():
        idx = jnp.asarray(
            rng.integers(0, grid.num_nodes, size=(n, 8)), jnp.int32)
        v = jnp.asarray(rng.standard_normal((n, 8))
                        * 10.0 ** rng.uniform(-8, 8, (n, 8)), jnp.float64)
        want = jnp.zeros((grid.num_nodes,), jnp.float64
                         ).at[idx].add(v).reshape(grid.shape)
        got = cons.scatter_corners_exact(grid, idx, v)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(v)))
        assert err <= 2.0 ** -48 * scale, (err, scale)


def test_matmul_scatter_gates():
    """use_matmul_scatter: 3D allowed only under BOTH the flop gate and the
    one-hot transient-memory gate; large 3D keeps the flat scatter."""
    from field_interpolation_tpu import constraints as cons
    from field_interpolation_tpu.grid import Grid
    assert cons.use_matmul_scatter(Grid((256, 256)), 1000)
    assert cons.use_matmul_scatter(Grid((24, 16, 40)), 800)
    assert not cons.use_matmul_scatter(Grid((128, 128, 128)), 4000)
    assert not cons.use_matmul_scatter(Grid((64,)), 10)


def test_sample_field_exact_on_multilinear_fields():
    """sample_field/sample_field_gradient reproduce any per-cell multilinear
    function exactly (the interpolation basis is multilinear), clamp
    out-of-bounds positions, and return NaN for non-finite ones; the
    gradient equals jax.jacfwd of sample_field w.r.t. position (interior
    points — the interpolant is piecewise-multilinear)."""
    import jax
    import jax.numpy as jnp

    import field_interpolation_tpu as fi
    from field_interpolation_tpu import sample_field, sample_field_gradient

    # 2D globally-affine field: exact everywhere, gradient constant
    g = fi.Grid((8, 9))
    rr, cc = np.mgrid[0:8, 0:9].astype(np.float32)
    f = jnp.asarray(3.0 * rr - 2.0 * cc + 1.0)
    pts = jnp.asarray([[2.5, 3.25], [0.0, 0.0], [7.0, 8.0],
                       [np.nan, 1.0], [100.0, 2.0]], jnp.float32)
    v = np.asarray(sample_field(g, f, pts))
    want = [3 * 2.5 - 2 * 3.25 + 1, 1.0, 3 * 7 - 2 * 8 + 1,
            np.nan, 3 * 7 - 2 * 2 + 1]  # OOB row clamps to r=7
    np.testing.assert_allclose(v, want, rtol=1e-6)
    gr = np.asarray(sample_field_gradient(g, f, pts))
    np.testing.assert_allclose(gr[[0, 1, 2, 4]],
                               [[3.0, -2.0]] * 4, rtol=1e-6)
    assert np.all(np.isnan(gr[3]))

    # 3D random field: gradient matches jax.jacfwd at interior points
    rng = np.random.default_rng(0)
    g3 = fi.Grid((5, 6, 7))
    f3 = jnp.asarray(rng.standard_normal((5, 6, 7)).astype(np.float32))
    p3 = jnp.asarray(rng.uniform(0.6, 3.4, (12, 3)).astype(np.float32))
    got = np.asarray(sample_field_gradient(g3, f3, p3))
    jac = jax.vmap(jax.jacfwd(
        lambda p: sample_field(g3, f3, p[None])[0]))(p3)
    np.testing.assert_allclose(got, np.asarray(jac), atol=1e-5)


def test_sample_field_reads_back_constraints():
    """Data-dominant interpolation: sampling the solved field at the
    constraint positions reproduces the constrained values (the reference
    GUI's readout loop, through the public API)."""
    import jax.numpy as jnp

    import field_interpolation_tpu as fi

    rng = np.random.default_rng(1)
    grid = fi.Grid((24, 24))
    pts = jnp.asarray(rng.uniform(2, 21, (40, 2)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal(40).astype(np.float32))
    field, info = fi.interpolate(
        grid, fi.Weights(data_pos=30.0, model_2=0.01), pts, vals,
        config=fi.SolverConfig(tol=1e-5, preconditioner="multigrid",
                               backend="xla", maxiter=2000))
    assert bool(info.converged)
    got = np.asarray(fi.sample_field(grid, field, pts))
    np.testing.assert_allclose(got, np.asarray(vals), atol=5e-2)


def test_densify_scatter_variants_agree():
    """The three fp32 densify scatter implementations — flat (reference),
    symmetry-halved (production, `_densify_flat_scatter_sym`), and
    cell-windowed (probed alternative) — produce the same (coeff, b).
    The sym path must be BIT-EXACT vs the flat scatter (same values, same
    per-channel accumulation structure; mirror channels are relocated
    copies). Clouds include out-of-bounds points (zero row weights) and
    boundary-cell points so the mirror-shift zero-padding edge is hit."""
    import jax

    from field_interpolation_tpu import constraints as cons

    rng = np.random.default_rng(11)
    for shape in [(13, 9), (7, 6, 5), (19,)]:
        grid = Grid(shape)
        D = len(shape)
        n = 600
        pts = rng.uniform(0.0, np.asarray(shape, np.float64) - 1.0,
                          (n, D)).astype(np.float32)
        pts[:40] += 1e4  # out of bounds
        corner_idx, rows, inb = multilinear_corner_data(
            grid, jnp.asarray(pts))
        R = rows.shape[1]
        rw = (jnp.where(inb[:, None], 1.0, 0.0)
              * jnp.asarray(rng.uniform(0.2, 2.0, (n, R)).astype(np.float32)))
        Bw = rows * rw[:, :, None]
        M = jnp.einsum("nrc,nrd->ncd", Bw, Bw)
        bvec = jnp.einsum(
            "nrc,nr->nc", Bw,
            jnp.asarray(rng.standard_normal((n, R)).astype(np.float32)) * rw)
        c_flat, b_flat = jax.jit(cons._densify_flat_scatter,
                                 static_argnums=0)(grid, corner_idx, M, bvec)
        c_sym, b_sym = jax.jit(cons._densify_flat_scatter_sym,
                               static_argnums=0)(grid, corner_idx, M, bvec)
        np.testing.assert_array_equal(np.asarray(c_sym), np.asarray(c_flat))
        np.testing.assert_array_equal(np.asarray(b_sym), np.asarray(b_flat))
        c_cw, b_cw = jax.jit(cons._densify_cellwise,
                             static_argnums=0)(grid, corner_idx, M, bvec)
        scale = float(jnp.max(jnp.abs(c_flat)))
        np.testing.assert_allclose(np.asarray(c_cw), np.asarray(c_flat),
                                   atol=3e-6 * scale)
        np.testing.assert_allclose(np.asarray(b_cw), np.asarray(b_flat),
                                   atol=3e-6 * float(jnp.max(jnp.abs(b_flat))
                                                     + 1e-30))
