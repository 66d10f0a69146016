"""Tests for the auxiliary subsystems: Pallas kernel (interpret mode),
observability records, visualization helpers, checkpoint/resume."""

import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from field_interpolation_tpu import Grid, SolverConfig, Weights, solve
from field_interpolation_tpu.operators import assemble


def _problem(rng, shape, D, n=50, weights=None):
    w = weights or Weights(model_0=0.05, model_1=0.1, model_2=0.7, model_3=0.2)
    pos = rng.uniform(0, np.asarray(shape) - 1, (n, D)).astype(np.float32)
    grads = rng.standard_normal((n, D)).astype(np.float32)
    return w, assemble(Grid(shape), w, jnp.asarray(pos),
                       jnp.zeros(n, jnp.float32), gradients=jnp.asarray(grads))


@pytest.mark.parametrize("shape", [(64, 64), (48, 80), (16, 20, 12)])
def test_pallas_kernel_matches_xla(rng, shape):
    """The fused Pallas apply must equal the XLA apply (interpret mode on
    CPU; the real-TPU compile is exercised by bench.py)."""
    from field_interpolation_tpu.ops import fused_normal_apply
    D = len(shape)
    w, p = _problem(rng, shape, D)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = fused_normal_apply(x, p.coeff, w, D, interpret=True)
    want = p.apply(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_solve_record(rng):
    from field_interpolation_tpu.utils import record_solve, timed_block
    w, p = _problem(rng, (32, 32), 2)
    with timed_block() as t:
        x, info = solve(p, SolverConfig(tol=1e-3))
        x.block_until_ready()
    buf = io.StringIO()
    rec = record_solve(p.grid, info, t["ms"], stream=buf, tag="unit")
    assert rec.converged and rec.iterations > 0 and rec.wall_ms > 0
    assert rec.achieved_gbps is not None
    line = buf.getvalue()
    assert '"grid_shape": [32, 32]' in line and '"tag": "unit"' in line


def test_visualize_helpers(tmp_path):
    from field_interpolation_tpu.contour import marching_squares
    from field_interpolation_tpu.visualize import (
        draw_contour, sdf_colormap, value_colormap, write_ppm)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    sdf = np.sqrt((yy - 15.5) ** 2 + (xx - 15.5) ** 2) - 8.0
    img = sdf_colormap(sdf)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # inside (orange-ish: R>B) vs outside (blue-ish: B>R)
    assert img[15, 15, 0] > img[15, 15, 2]
    assert img[0, 0, 2] > img[0, 0, 0]
    img2 = draw_contour(img, marching_squares(sdf))
    p = tmp_path / "sdf.ppm"
    write_ppm(str(p), img2)
    assert p.read_bytes().startswith(b"P6\n32 32\n255\n")
    v = value_colormap(sdf)
    assert v.shape == (32, 32, 3)


def test_draw_arrows():
    from field_interpolation_tpu.visualize import draw_arrows
    img = np.zeros((32, 32, 3), np.uint8)
    pos = np.array([[16.0, 16.0], [4.0, 4.0]])
    dirs = np.array([[0.0, 1.0], [1.0, 0.0]])  # (row, col): right / down
    out = draw_arrows(img, pos, dirs, length=6.0, color=(0, 200, 0))
    assert out.shape == img.shape and img.sum() == 0  # input untouched
    # shaft pixels along each direction are stamped
    assert (out[16, 17:22] == (0, 200, 0)).all()
    assert (out[5:10, 4] == (0, 200, 0)).all()
    # arrowhead strokes exist (more green pixels than two bare shafts)
    assert (out[..., 1] == 200).sum() > 14
    # degenerate zero-direction arrow must not crash (normalization guard)
    draw_arrows(img, np.array([[8.0, 8.0]]), np.array([[0.0, 0.0]]))


def test_checkpoint_roundtrip(rng, tmp_path):
    from field_interpolation_tpu.checkpoint import load_state, save_state
    w, p = _problem(rng, (24, 24), 2)
    x, info = solve(p, SolverConfig(tol=1e-3))
    path = str(tmp_path / "state.npz")
    save_state(path, x, p.grid, w, iteration=int(info.iterations))
    x2, grid2, w2, extra = load_state(path)
    np.testing.assert_array_equal(x2, np.asarray(x))
    assert grid2 == p.grid and w2 == w
    assert extra["iteration"] == int(info.iterations)
    # Resume = warm start: 0 further iterations needed.
    _, info2 = solve(p, SolverConfig(tol=1e-3), x0=jnp.asarray(x2))
    assert int(info2.iterations) == 0


def test_pallas_backend_end_to_end(rng):
    """solve(backend='pallas') must match solve(backend='xla') through the
    full MG-PCG pipeline (interpret mode on CPU)."""
    w, p = _problem(rng, (32, 32), 2, weights=Weights(model_2=0.3))
    cfg_x = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="xla")
    cfg_p = SolverConfig(tol=1e-4, preconditioner="multigrid", backend="pallas")
    xx, ix = solve(p, cfg_x)
    xp, ip = solve(p, cfg_p)
    assert bool(ip.converged)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xx),
                               atol=1e-3 * np.abs(np.asarray(xx)).max())


@pytest.mark.parametrize("shape,D", [((64, 48), 2), ((24, 16, 12), 3)])
def test_striped_pallas_kernel_matches_xla(rng, shape, D):
    """The striped (multi-block, halo-block) kernel must equal the XLA apply,
    including at block seams and global edges (interpret mode)."""
    from field_interpolation_tpu.ops.pallas_stencil import (
        fused_normal_apply_striped)
    w, p = _problem(rng, shape, D)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = fused_normal_apply_striped(x, p.coeff, w, D, 16 if D == 2 else 8,
                                     interpret=True)
    want = p.apply(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_vcycle_solve_matches_xla(rng):
    """solve(backend='pallas') with the whole-V-cycle kernels must converge
    identically to the XLA path (interpret mode; also covers non-square
    grids and the down/up kernel split)."""
    from field_interpolation_tpu import sdf_from_points
    theta = rng.uniform(0, 2 * np.pi, 80)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (np.array([23.5, 31.5]) + 14 * nrm).astype(np.float32)
    grid = Grid((48, 64))
    w = Weights(model_2=0.3)
    outs = {}
    for bk in ("pallas", "xla"):
        cfg = SolverConfig(tol=1e-4, preconditioner="multigrid", backend=bk)
        x, info = sdf_from_points(grid, w, jnp.asarray(pts), jnp.asarray(nrm),
                                  config=cfg)
        assert bool(info.converged), bk
        outs[bk] = np.asarray(x)
    np.testing.assert_allclose(outs["pallas"], outs["xla"],
                               atol=1e-3 * np.abs(outs["xla"]).max())


def test_validate_problem(rng):
    from field_interpolation_tpu.operators import validate_problem
    w, p = _problem(rng, (16, 16), 2)
    assert validate_problem(p) == []
    import dataclasses
    bad = dataclasses.replace(p, b=p.b.at[0, 0].set(np.nan))
    assert any("non-finite" in m for m in validate_problem(bad))


def test_two_axis_striped_3d_matches_xla(rng):
    """The 2-axis striped 3D kernel (256³-class fallback) must equal the XLA
    apply including tile seams in both axes (interpret mode)."""
    from field_interpolation_tpu.ops.pallas_stencil import (
        fused_normal_apply_striped2_3d)
    shape = (16, 24, 20)
    w, p = _problem(rng, shape, 3, weights=Weights(model_0=0.05, model_1=0.1,
                                                   model_2=0.7))
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = fused_normal_apply_striped2_3d(x, p.coeff, w, (4, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(p.apply(x)),
                               atol=1e-4)


def test_measure_marginal():
    """The chained K-difference timer: positive marginal, correct chain
    semantics (the long chain's final carry really applied step K2 times),
    and input validation."""
    import jax.numpy as jnp
    import pytest

    from field_interpolation_tpu.utils import measure_marginal

    # counting carry verifies chain semantics; the matmul makes the
    # per-step work large enough to dominate host timing noise
    a = jnp.eye(256) * 1.001

    def step(c):
        m, k = c
        return (a @ m * (1.0 / 1.001), k + 1.0)

    per, details = measure_marginal(step, (jnp.ones((256, 256)), jnp.float32(0)),
                                    counts=(2, 64))
    assert per > 0
    np.testing.assert_allclose(np.asarray(details["final_carry"][1]), 64.0)
    assert details["times_s"][64] > 0 and details["times_s"][2] > 0

    with pytest.raises(ValueError):
        measure_marginal(step, jnp.zeros(3), counts=(64, 8))


def test_xla_cost_static_attribution():
    """xla_cost reads XLA's compiled cost model (no device trace — the
    profiler hangs through the axon tunnel, so this static route is the
    per-phase attribution that always works): exact matmul flop count,
    sane byte counts, roofline lower bound, and the table formatter."""
    import jax.numpy as jnp

    from field_interpolation_tpu.utils import cost_table, xla_cost

    n = 128

    def matmul(a, b):
        return a @ b

    c = xla_cost(matmul, jnp.ones((n, n)), jnp.ones((n, n)),
                 name="matmul", chip="v5e")
    assert c.flops == 2.0 * n**3                   # XLA counts 2nm k exactly
    # at least the two inputs + output must cross memory
    assert c.bytes_accessed >= 3 * n * n * 4
    assert c.est_ms == max(c.est_ms_bw, c.est_ms_flops) > 0
    assert c.arithmetic_intensity > 1.0

    def transcendental(x):
        return jnp.sin(x)

    t = xla_cost(transcendental, jnp.ones((n,)), name="sin")
    assert t.transcendentals >= n

    table = cost_table([c, t])
    assert "matmul" in table and "sin" in table and "TOTAL" in table
    # TOTAL row sums the flops column
    assert f"{(c.flops + t.flops) / 1e9:.3f}" in table.splitlines()[-1]


def test_xla_cost_on_solver_phase():
    """The attribution route applies to real library phases: a whole jitted
    SDF solve lowers, compiles, and reports nonzero flops + bytes."""
    import jax

    from field_interpolation_tpu import Grid, SolverConfig, Weights
    from field_interpolation_tpu.sdf import sdf_from_points
    from field_interpolation_tpu.utils import xla_cost

    grid = Grid((24, 24))
    rng = np.random.default_rng(0)
    th = rng.uniform(0, 2 * np.pi, 32)
    pos = jnp.asarray(np.stack([11.5 + 8 * np.cos(th),
                                11.5 + 8 * np.sin(th)], -1),
                      dtype=jnp.float32)
    nrm = jnp.asarray(np.stack([np.cos(th), np.sin(th)], -1),
                      dtype=jnp.float32)
    cfg = SolverConfig(preconditioner="multigrid", maxiter=8)

    def phase(p, nv):
        x, info = sdf_from_points(grid, Weights(), p, nv, config=cfg)
        return x

    c = xla_cost(phase, pos, nrm, name="sdf-solve")
    assert c.flops > 0 and c.bytes_accessed > 0 and c.est_ms > 0
