"""Round-4 multigrid options: Galerkin coarse data stencils + Chebyshev
smoothing (VERDICT r3 item 2). Reference behavior baseline: the reference's
coarse-lattice approximate solve (SURVEY.md §2 C9) — these options only change
the PRECONDITIONER; every solve below is checked against the same operator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from field_interpolation_tpu import constraints as cons
from field_interpolation_tpu import multigrid, operators, solver
from field_interpolation_tpu.grid import Grid
from field_interpolation_tpu.weights import SolverConfig, Weights


def _problem_2d(shape=(48, 40), n=600, seed=0, gradients=True):
    rng = np.random.default_rng(seed)
    g = Grid(shape)
    pos = jnp.asarray(
        rng.uniform(0, min(shape) - 1.001, size=(n, 2)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    grads = (jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
             if gradients else None)
    return operators.assemble(g, Weights(model_2=1.0), pos, vals, grads)


def _dense_from_stencil(C, shape):
    """[n, n] dense matrix from a [3^D, *shape] channel stencil."""
    offs = cons.offset_list(len(shape))
    n0, n1 = shape
    M = np.zeros((n0 * n1, n0 * n1))
    for ci in range(offs.shape[0]):
        o = offs[ci]
        for i0 in range(n0):
            for i1 in range(n1):
                j0, j1 = i0 + o[0], i1 + o[1]
                if 0 <= j0 < n0 and 0 <= j1 < n1:
                    M[i0 * n1 + i1, j0 * n1 + j1] += C[ci, i0, i1]
    return M


class TestGalerkinStencil:
    def test_matches_dense_triple_product_and_stays_spd(self):
        """galerkin_coarse_coeff == PᵀAP densely, up to the SPD-safe fold of
        the |p|=2 alignment-drift entries (the folded operator must dominate
        the exact one: A_fold − PᵀAP ⪰ 0)."""
        prob = _problem_2d(shape=(12, 10), n=150, seed=1, gradients=False)
        coeff = np.asarray(prob.coeff, np.float64)
        coarse = Grid((12, 10)).coarsen().shape
        A = _dense_from_stencil(coeff, (12, 10))
        P = np.kron(multigrid._resize_matrix(12, coarse[0]),
                    multigrid._resize_matrix(10, coarse[1]))
        C_exact = P.T @ A @ P
        Cg = np.asarray(multigrid.galerkin_coarse_coeff(
            jnp.asarray(coeff), coarse))
        Cd = _dense_from_stencil(Cg, coarse)
        scale = np.abs(C_exact).max()
        assert np.abs(Cd - Cd.T).max() < 1e-6 * scale          # symmetric
        diff_eigs = np.linalg.eigvalsh(Cd - C_exact)
        assert diff_eigs.min() > -1e-6 * scale                 # fold is PSD
        # The fold only touches diagonals + drops |p|=2 entries: off-diagonal
        # radius-1 channels agree with the exact product up to fp32 roundoff
        # (the transfer contractions run in the coeff dtype — fp32 here).
        offs = cons.offset_list(2)
        for ci in range(9):
            o = offs[ci]
            if (o[0], o[1]) == (0, 0):
                continue
            for i0 in range(coarse[0]):
                for i1 in range(coarse[1]):
                    j0, j1 = i0 + o[0], i1 + o[1]
                    if 0 <= j0 < coarse[0] and 0 <= j1 < coarse[1]:
                        r, c = i0 * coarse[1] + i1, j0 * coarse[1] + j1
                        assert abs(Cd[r, c] - C_exact[r, c]) < 1e-7 * scale

    def test_identity_when_axis_not_coarsened(self):
        """Axes whose extent does not change pass channels through."""
        prob = _problem_2d(shape=(12, 10), n=80, seed=2, gradients=False)
        same = multigrid.galerkin_coarse_coeff(prob.coeff, (12, 10))
        np.testing.assert_allclose(np.asarray(same), np.asarray(prob.coeff),
                                   rtol=0, atol=0)

    def test_build_levels_galerkin_diag_consistency(self):
        prob = _problem_2d()
        cfg = SolverConfig(mg_coarse_data="galerkin")
        levels = multigrid.build_levels(prob, cfg)
        assert levels, "expected at least one coarse level"
        for lvl in levels:
            assert lvl.data_coeff is not None
            center = np.asarray(lvl.data_coeff)[9 // 2]
            np.testing.assert_allclose(np.asarray(lvl.data_diag), center,
                                       rtol=1e-6)
            assert (center >= -1e-6 * max(center.max(), 1e-30)).all()


class TestChebyshevCoefs:
    def test_first_kind_is_scaled_chebyshev_polynomial(self):
        """The recurrence's error polynomial p(λ) = Π-form must equal the
        shifted-scaled Chebyshev minimax polynomial on [λmin, λmax]:
        p(λ) = T_ν(σ(λ)) / T_ν(σ(0)), evaluated by simulating the smoother
        on a 1-point 'operator' A = λ."""
        rho = jnp.float32(2.5)
        nu = 4
        cfg = SolverConfig(mg_smoother="chebyshev", mg_cheb_ratio=20.0)
        cf = np.asarray(multigrid.chebyshev_coefs(rho, nu, cfg))
        lmax, lmin = 2.5, 2.5 / 20.0
        for lam in np.linspace(lmin, lmax, 7):
            # simulate: z=0, D=1, r=1  ->  error propagation 1 - lam*q(lam)
            z, zp = 0.0, 0.0
            for k in range(nu):
                az = lam * z
                z, zp = z + cf[k, 0] * (z - zp) + cf[k, 1] * (1.0 - az), z
            err = 1.0 - lam * z
            t = (lmax + lmin - 2 * lam) / (lmax - lmin)
            t0 = (lmax + lmin) / (lmax - lmin)
            cheb = np.cos(nu * np.arccos(np.clip(t, -1, 1)))
            expect = cheb / np.cosh(nu * np.arccosh(t0))
            assert abs(err - expect) < 1e-5, (lam, err, expect)

    def test_fourth_kind_damps_upper_spectrum(self):
        """Kind-4 error polynomial: p(0) = 1 and |p(λ)| ≤ W-bound small on
        the upper spectrum (sanity: ≤ 0.35 on [ρ/4, ρ] for ν=3)."""
        rho = jnp.float32(3.0)
        cfg = SolverConfig(mg_smoother="chebyshev4")
        cf = np.asarray(multigrid.chebyshev_coefs(rho, 3, cfg))

        def err_poly(lam):
            z, zp = 0.0, 0.0
            for k in range(3):
                az = lam * z
                z, zp = z + cf[k, 0] * (z - zp) + cf[k, 1] * (1.0 - az), z
            return 1.0 - lam * z

        assert abs(err_poly(1e-9) - 1.0) < 1e-6
        for lam in np.linspace(3.0 / 4.0, 3.0, 9):
            assert abs(err_poly(lam)) < 0.35

    def test_zero_sweeps_empty_schedule(self):
        cfg = SolverConfig(mg_smoother="chebyshev4")
        assert multigrid.chebyshev_coefs(jnp.float32(1.0), 0, cfg).shape == (0, 2)


def _solve_and_check(prob, cfg, x_ref):
    x, info = solver.solve(prob, cfg)
    assert bool(info.converged), cfg
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=5e-3)
    return int(info.iterations)


class TestSolveWithOptions:
    @pytest.mark.parametrize("sm,cd", [
        ("chebyshev", "lumped"),
        ("chebyshev4", "lumped"),
        ("jacobi", "galerkin"),
        ("chebyshev4", "galerkin"),
    ])
    def test_solution_matches_jacobi_lumped(self, sm, cd):
        """Every smoother/coarse-data combination preconditions the SAME
        operator: solutions agree with the baseline config's."""
        prob = _problem_2d()
        base = SolverConfig(tol=1e-5, preconditioner="multigrid",
                            backend="xla")
        x_ref, info = solver.solve(prob, base)
        assert bool(info.converged)
        cfg = SolverConfig(tol=1e-5, preconditioner="multigrid",
                           backend="xla", mg_smoother=sm, mg_coarse_data=cd)
        _solve_and_check(prob, cfg, np.asarray(x_ref))

    @pytest.mark.parametrize("sm,cd", [
        ("chebyshev4", "lumped"),
        ("chebyshev4", "galerkin"),
        ("jacobi", "galerkin"),
    ])
    def test_fused_interpret_path_matches_xla(self, sm, cd):
        """The fully-fused PCG path (forced Pallas, interpret mode on CPU)
        must run the new options' kernels and agree with the XLA path."""
        prob = _problem_2d()
        cfg_x = SolverConfig(tol=1e-5, preconditioner="multigrid",
                             backend="xla", mg_smoother=sm,
                             mg_coarse_data=cd)
        cfg_p = SolverConfig(tol=1e-5, preconditioner="multigrid",
                             backend="pallas", mg_smoother=sm,
                             mg_coarse_data=cd)
        ops = multigrid.build_fused_solver_operands(prob, cfg_p)
        assert ops is not None, "fused path must engage for this problem"
        x_x, info_x = solver.solve(prob, cfg_x)
        x_p, info_p = solver.solve(prob, cfg_p)
        assert bool(info_x.converged) and bool(info_p.converged)
        np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                                   atol=5e-3)

    def test_cheb_zero_pre_post_smooth_matches_jacobi(self):
        """ν=0 never runs the smoother, so the chebyshev V-cycle must equal
        the jacobi one bit-for-bit (convergence is NOT expected from the
        rank-deficient smoother-free cycle — see
        test_zero_smoothing_sweeps_backend_parity)."""
        prob = _problem_2d()
        r = jnp.asarray(
            np.random.default_rng(9).standard_normal(prob.grid.shape),
            jnp.float32)
        zs = []
        for sm in ("jacobi", "chebyshev4"):
            cfg = SolverConfig(preconditioner="multigrid", mg_smoother=sm,
                               mg_pre_smooth=0, mg_post_smooth=0)
            zs.append(multigrid.make_vcycle_preconditioner(prob, cfg)(r))
        np.testing.assert_allclose(np.asarray(zs[1]), np.asarray(zs[0]),
                                   rtol=0, atol=0)


class TestWCycle:
    """mg_cycle="w" (VERDICT r3 item 2 follow-on): the round-4 sparse-oracle
    lab measured the 256² headline PCG at 15/25 iterations (1e-4/1e-6) with
    the V-cycle vs 8/13 with the W-cycle on the SAME hierarchy — the
    recursion shape, not the smoother or coarse operators, was the limiter.
    These tests pin (a) the iteration win, (b) preconditioner symmetry
    (CG validity), (c) XLA/fused-kernel equality, (d) solution parity."""

    @pytest.mark.slow
    def test_wcycle_cuts_iterations(self):
        """On the headline problem family (SDF from an oriented circle
        cloud) the W-cycle cut is large: measured 14 -> 8 iterations at
        256²/1e-4 on this exact problem (CPU backend, round 4). Random
        scattered-data problems (_problem_2d) do NOT show the win — the
        V-cycle loss this repairs is smoothness-dominated."""
        rng = np.random.default_rng(11)
        g = Grid((256, 256))
        theta = rng.uniform(0, 2 * np.pi, 1000)
        nrm = np.stack([np.cos(theta), np.sin(theta)], 1)
        pts = 127.5 + 89.6 * nrm + 0.2 * rng.standard_normal((1000, 2))
        prob = operators.assemble(
            g, Weights(model_2=0.3), jnp.asarray(pts, jnp.float32),
            jnp.zeros(1000, jnp.float32), jnp.asarray(nrm, jnp.float32))
        iters = {}
        for cyc in ("v", "w"):
            cfg = SolverConfig(tol=1e-4, preconditioner="multigrid",
                               backend="xla", mg_cycle=cyc)
            x, info = solver.solve(prob, cfg)
            assert bool(info.converged)
            iters[cyc] = int(info.iterations)
        # measured 14 vs 8; demand at least a 25% cut
        assert iters["w"] <= 0.75 * iters["v"], iters

    def test_wcycle_preconditioner_is_symmetric(self):
        prob = _problem_2d(shape=(48, 40), n=400, seed=12)
        cfg = SolverConfig(preconditioner="multigrid", mg_cycle="w")
        M = multigrid.make_vcycle_preconditioner(prob, cfg)
        rng = np.random.default_rng(13)
        u = jnp.asarray(rng.standard_normal(prob.grid.shape), jnp.float32)
        v = jnp.asarray(rng.standard_normal(prob.grid.shape), jnp.float32)
        uMv = float(jnp.vdot(u, M(v)))
        vMu = float(jnp.vdot(v, M(u)))
        assert abs(uMv - vMu) < 1e-4 * max(abs(uMv), 1e-30), (uMv, vMu)

    @pytest.mark.parametrize("sm", ["jacobi", "chebyshev4"])
    def test_fused_wcycle_kernel_matches_xla(self, sm):
        """fused_wcycle_2d (one Pallas kernel, in-kernel coarsest dense
        solve) against the plain-XLA W-cycle recursion."""
        prob = _problem_2d(shape=(48, 40), n=400, seed=14)
        cfg = SolverConfig(preconditioner="multigrid", mg_cycle="w",
                           mg_smoother=sm)
        r = jnp.asarray(
            np.random.default_rng(15).standard_normal(prob.grid.shape),
            jnp.float32)
        z_x = multigrid.make_vcycle_preconditioner(prob, cfg)(r)
        z_p = multigrid.make_vcycle_preconditioner(
            prob, cfg, pallas_smooth=True, pallas_interpret=True)(r)
        scale = float(jnp.max(jnp.abs(z_x)))
        np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                                   rtol=0, atol=3e-5 * max(scale, 1e-30))

    def test_solve_pallas_wcycle_matches_xla(self):
        """backend="pallas" routes through fused_pcg_solve with the
        in-kernel W-cycle; solutions must agree with the XLA W path."""
        prob = _problem_2d()
        cfg_x = SolverConfig(tol=1e-5, preconditioner="multigrid",
                             backend="xla", mg_cycle="w")
        cfg_p = SolverConfig(tol=1e-5, preconditioner="multigrid",
                             backend="pallas", mg_cycle="w")
        x_x, info_x = solver.solve(prob, cfg_x)
        x_p, info_p = solver.solve(prob, cfg_p)
        assert bool(info_x.converged) and bool(info_p.converged)
        np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                                   atol=5e-3)

    def test_refined_wcycle_true_1e6(self):
        """solve_refined with mg_cycle="w": the honest tier keeps its TRUE
        f64-verified residual with the W-cycle inner solves."""
        from field_interpolation_tpu.sdf import assemble_precise
        from field_interpolation_tpu.solver import solve_refined
        rng = np.random.default_rng(16)
        g = Grid((64, 64))
        pos = jnp.asarray(rng.uniform(0, 62.99, size=(500, 2)), jnp.float32)
        nrm = rng.standard_normal((500, 2))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        pp = assemble_precise(g, Weights(model_2=0.3), pos,
                              jnp.zeros(500, jnp.float32),
                              gradients=jnp.asarray(nrm, jnp.float32))
        cfg = SolverConfig(tol=1e-6, preconditioner="multigrid",
                           backend="xla", mg_cycle="w")
        x, info = solve_refined(pp, cfg)
        assert bool(info.converged)
        with jax.enable_x64():
            r = pp.residual64(x)
            rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
        assert rel <= 1.1e-6, rel


class TestFusedSmootherKernels:
    """Interpret-mode equality of the Chebyshev fused smoothing kernels vs
    the plain-XLA recurrence (whole-VMEM + striped + tiled variants)."""

    def _xla_cheb(self, r, z, coeff, inv_d, cf, weights, sweeps, from_zero,
                  ndim=2):
        def apply_fn(v):
            from field_interpolation_tpu import stencils
            return (stencils.smoothness_apply(v, weights, ndim)
                    + cons.data_apply(v, coeff, ndim))

        if from_zero:
            z = jnp.zeros_like(r)
        zp = z
        for k in range(sweeps):
            az = apply_fn(z)
            z, zp = (z + cf[k, 0] * (z - zp)
                     + cf[k, 1] * inv_d * (r - az)), z
        return z

    @pytest.mark.parametrize("from_zero", [True, False])
    def test_fused_smooth_cheb_matches_xla(self, from_zero):
        from field_interpolation_tpu.ops.pallas_stencil import fused_smooth
        prob = _problem_2d(shape=(32, 24), n=200, seed=3)
        rng = np.random.default_rng(4)
        r = jnp.asarray(rng.normal(size=(32, 24)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(32, 24)), jnp.float32)
        inv_d = jnp.where(prob.diag > 0, 1.0 / prob.diag, 1.0)
        cfg = SolverConfig(mg_smoother="chebyshev4")
        cf = multigrid.chebyshev_coefs(jnp.float32(2.0), 3, cfg)
        got = fused_smooth(r, z, prob.coeff, inv_d, prob.weights, 2,
                           sweeps=3, from_zero=from_zero, interpret=True,
                           cheb_coefs={3: cf})
        want = self._xla_cheb(r, z, prob.coeff, inv_d, cf, prob.weights, 3,
                              from_zero)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("from_zero", [True, False])
    def test_fused_smooth_striped_cheb_matches_xla(self, from_zero):
        from field_interpolation_tpu.ops.pallas_stencil import (
            fused_smooth_striped, pick_stripe_smooth)
        prob = _problem_2d(shape=(64, 40), n=500, seed=5)
        rng = np.random.default_rng(6)
        r = jnp.asarray(rng.normal(size=(64, 40)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(64, 40)), jnp.float32)
        inv_d = jnp.where(prob.diag > 0, 1.0 / prob.diag, 1.0)
        cfg = SolverConfig(mg_smoother="chebyshev4")
        cf = multigrid.chebyshev_coefs(jnp.float32(2.0), 3, cfg)
        T = pick_stripe_smooth((64, 40), 2, 3)
        assert T is not None
        got = fused_smooth_striped(r, z, prob.coeff, inv_d, prob.weights,
                                   sweeps=3, stripe=T, from_zero=from_zero,
                                   interpret=True, cheb_coefs={3: cf})
        want = self._xla_cheb(r, z, prob.coeff, inv_d, cf, prob.weights, 3,
                              from_zero)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("from_zero", [True, False])
    def test_fused_smooth_tiled_cheb_matches_xla(self, from_zero):
        from field_interpolation_tpu.ops.pallas_stencil import (
            fused_smooth_tiled)
        prob = _problem_2d(shape=(64, 256), n=800, seed=7)
        rng = np.random.default_rng(8)
        r = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
        inv_d = jnp.where(prob.diag > 0, 1.0 / prob.diag, 1.0)
        cfg = SolverConfig(mg_smoother="chebyshev4")
        cf = multigrid.chebyshev_coefs(jnp.float32(2.0), 3, cfg)
        got = fused_smooth_tiled(r, z, prob.coeff, inv_d, prob.weights,
                                 sweeps=3, tiles=(8, 128),
                                 from_zero=from_zero, interpret=True,
                                 cheb_coefs={3: cf})
        want = self._xla_cheb(r, z, prob.coeff, inv_d, cf, prob.weights, 3,
                              from_zero)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestWCycleDepth:
    """mg_wcycle_depth (the on-chip-measured fix: full-W visit growth is
    latency-bound and costs more than its iteration cut; depth=2 keeps the
    whole cut at ~linear visits — see SolverConfig.mg_cycle notes)."""

    @pytest.mark.parametrize("depth", [1, 2])
    def test_fused_depth_matches_xla(self, depth):
        prob = _problem_2d(shape=(48, 40), n=400, seed=17)
        cfg = SolverConfig(preconditioner="multigrid", mg_cycle="w",
                           mg_wcycle_depth=depth)
        r = jnp.asarray(
            np.random.default_rng(18).standard_normal(prob.grid.shape),
            jnp.float32)
        z_x = multigrid.make_vcycle_preconditioner(prob, cfg)(r)
        z_p = multigrid.make_vcycle_preconditioner(
            prob, cfg, pallas_smooth=True, pallas_interpret=True)(r)
        scale = float(jnp.max(jnp.abs(z_x)))
        np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                                   rtol=0, atol=3e-5 * max(scale, 1e-30))

    def test_depth_zero_is_vcycle(self):
        """depth=0 degenerates to the plain V even with mg_cycle='w'."""
        prob = _problem_2d(shape=(48, 40), n=400, seed=19)
        r = jnp.asarray(
            np.random.default_rng(20).standard_normal(prob.grid.shape),
            jnp.float32)
        zs = []
        for cfg in (SolverConfig(preconditioner="multigrid", mg_cycle="v"),
                    SolverConfig(preconditioner="multigrid", mg_cycle="w",
                                 mg_wcycle_depth=0)):
            zs.append(multigrid.make_vcycle_preconditioner(prob, cfg)(r))
        np.testing.assert_allclose(np.asarray(zs[1]), np.asarray(zs[0]),
                                   rtol=0, atol=0)

    @pytest.mark.slow
    def test_depth2_keeps_iteration_cut(self):
        """The headline-family iteration cut survives depth=2 (measured:
        V 14, W-full 8, W-depth2 8 at 256^2/1e-4 — this pins the smaller
        48x40 problem's depth-2 count at <= its full-W count + 1)."""
        prob = _problem_2d(shape=(96, 80), n=900, seed=11)
        iters = {}
        for depth in (2, 99):
            cfg = SolverConfig(tol=1e-6, preconditioner="multigrid",
                               backend="xla", mg_cycle="w",
                               mg_wcycle_depth=depth)
            x, info = solver.solve(prob, cfg)
            assert bool(info.converged)
            iters[depth] = int(info.iterations)
        assert iters[2] <= iters[99] + 1, iters


class TestPcgChunk:
    """pcg_chunk (round 4): the in-kernel while-loop TRIP floor is ~17-21 us
    on v5e even with an empty body, so the fused solver runs `chunk` CG
    iterations straight-line per trip. Semantics: same solution (the extra
    <=chunk-1 post-tolerance iterations only polish), true-residual
    convergence kept, count reflects executed iterations."""

    def test_chunked_solve_matches_unchunked(self):
        prob = _problem_2d()
        sols, its = {}, {}
        for ch in (1, 3):
            cfg = SolverConfig(tol=1e-5, preconditioner="multigrid",
                               backend="pallas", pcg_chunk=ch)
            x, info = solver.solve(prob, cfg)
            assert bool(info.converged)
            sols[ch], its[ch] = np.asarray(x), int(info.iterations)
        np.testing.assert_allclose(sols[3], sols[1], atol=5e-3)
        # chunked runs the same iterations rounded up to a trip boundary
        # (plus possibly one fewer safeguard segment)
        assert its[3] <= its[1] + 3, its

    @pytest.mark.slow
    def test_chunked_refined_true_1e6(self):
        from field_interpolation_tpu.sdf import assemble_precise
        from field_interpolation_tpu.solver import solve_refined
        rng = np.random.default_rng(23)
        g = Grid((64, 64))
        pos = jnp.asarray(rng.uniform(0, 62.99, size=(300, 2)), jnp.float32)
        vals = jnp.asarray(rng.standard_normal(300), jnp.float32)
        pp = assemble_precise(g, Weights(model_2=0.3), pos, vals)
        cfg = SolverConfig(tol=1e-6, preconditioner="multigrid",
                           backend="pallas", pcg_chunk=4)
        x, info = solve_refined(pp, cfg)
        assert bool(info.converged)
        with jax.enable_x64():
            r = pp.residual64(x)
            rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(pp.b64 * pp.b64)))
        assert rel <= 1.1e-6, rel


class TestAutoCycle:
    """mg_cycle="auto" resolves V for whole-VMEM grids (in-kernel coarse
    visits are latency-bound) and W for beyond-VMEM grids (bandwidth-bound
    coarse levels; measured 4096² 359→234 ms) — see multigrid.resolve_wdepth."""

    def test_resolution_by_regime(self):
        from field_interpolation_tpu.ops.pallas_stencil import fits_vmem
        cfg = SolverConfig()  # default mg_cycle="auto"
        assert fits_vmem((256, 256))
        assert multigrid.resolve_wdepth(cfg, (256, 256)) == 0
        assert not fits_vmem((4096, 4096))
        assert multigrid.resolve_wdepth(cfg, (4096, 4096)) == cfg.mg_wcycle_depth
        assert not fits_vmem((256, 256, 256))
        assert multigrid.resolve_wdepth(cfg, (256, 256, 256)) > 0
        # explicit settings override the regime
        assert multigrid.resolve_wdepth(
            SolverConfig(mg_cycle="v"), (4096, 4096)) == 0
        assert multigrid.resolve_wdepth(
            SolverConfig(mg_cycle="w", mg_wcycle_depth=2), (64, 64)) == 2

    def test_auto_equals_v_on_small_grid(self):
        prob = _problem_2d()
        r = jnp.asarray(
            np.random.default_rng(29).standard_normal(prob.grid.shape),
            jnp.float32)
        za = multigrid.make_vcycle_preconditioner(
            prob, SolverConfig(preconditioner="multigrid"))(r)
        zv = multigrid.make_vcycle_preconditioner(
            prob, SolverConfig(preconditioner="multigrid", mg_cycle="v"))(r)
        np.testing.assert_allclose(np.asarray(za), np.asarray(zv),
                                   rtol=0, atol=0)


def test_transfer_strided_equals_dense():
    """The gather-free strided transfer evaluation is EXACTLY the banded/
    dense resize map, for every production direction and the odd/even
    hierarchy sizes (coarsen = (n+1)//2), plus the unused transposed-
    prolongation direction via its documented gather fallback."""
    import numpy as np
    import jax.numpy as jnp
    from field_interpolation_tpu import multigrid as mg

    rng = np.random.default_rng(3)
    for n in (256, 255, 96, 81, 17, 5):
        nc = max(2, (n + 1) // 2)
        for n_out, n_in, transpose in [(n, nc, False),   # prolong
                                       (nc, n, True),    # restrict
                                       (nc, n, False),   # direct resize down
                                       (n, nc, True)]:   # fallback direction
            for square in (False, True):
                M = (mg._resize_matrix(n_out, n_in, square=square)
                     if not transpose
                     else mg._resize_matrix(n_in, n_out, square=square).T)
                x = rng.standard_normal((n_in, 3)).astype(np.float32)
                got = np.asarray(mg._apply_axis_resize(
                    jnp.asarray(x), n_out, n_in, 0,
                    transpose=transpose, square=square))
                np.testing.assert_allclose(got, M @ x, atol=1e-5,
                                           err_msg=f"{n_out}<-{n_in} "
                                           f"T={transpose} sq={square}")
    # production directions actually take the strided path (not fallback)
    assert mg._strided_bands(256, 128, False, False) is not None
    assert mg._strided_bands(128, 256, True, False) is not None


def test_degenerate_hierarchy_dense_fine_inverse():
    """Grids at/below the coarsening floor build an EMPTY level hierarchy;
    the multigrid preconditioner must then be the exact dense inverse of
    the FINE operator — PCG converges in O(1) iterations — rather than the
    old 32-sweep smoothing fallback (which at 2² triggered a pathological
    ~250 s XLA-CPU compile, hit by deep fmg_start recursion)."""
    import numpy as np
    import jax.numpy as jnp
    from field_interpolation_tpu import Grid, SolverConfig, Weights, solve
    from field_interpolation_tpu import multigrid as mg
    from field_interpolation_tpu.sdf import assemble_sdf

    rng = np.random.default_rng(7)
    theta = rng.uniform(0, 2 * np.pi, 64)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    for n in (16, 5):
        c = (n - 1) / 2.0
        pts = (c + 0.62 * c * nrm).astype(np.float32)
        grid = Grid((n, n))
        prob = assemble_sdf(grid, Weights(model_2=0.3), jnp.asarray(pts),
                            jnp.asarray(nrm))
        assert mg.build_levels(prob, SolverConfig()) == []
        cfg = SolverConfig(tol=1e-4, preconditioner="multigrid")
        x, info = solve(prob, cfg)
        assert bool(info.converged)
        assert int(info.iterations) <= 2          # exact-inverse preconditioner
        # the real contract: TRUE relative residual of the returned field
        # (field-vs-field comparisons are meaningless here — the weakly
        # constrained far field makes the operator near-singular, so two
        # converged solves can differ by O(0.1) while both satisfy tol)
        r = prob.b - prob.apply(x)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(prob.b))
        assert rel <= 2e-4
        # the explicit iterative-coarsest escape hatch still works
        cfg_j = SolverConfig(tol=1e-4, preconditioner="multigrid",
                             mg_coarse_solver="jacobi")
        xj, infoj = solve(prob, cfg_j)
        assert bool(infoj.converged)
        rj = prob.b - prob.apply(xj)
        assert float(jnp.linalg.norm(rj) / jnp.linalg.norm(prob.b)) <= 2e-4
