"""Decompose the refined-tier f64 glue that probes/inv_refine_ab.py sized
(res64 0.209 ms, app64d 0.140 ms on v5e, dispatch-corrected): which
COMPONENT dominates each, so the round attacks the right one.

PreciseProblem.residual64 = smoothness_apply(f64 x)          [smooth64]
                          + gather + two [n,R,C] f64 einsums [rows64]
                          + exact integer-grid f64 scatter   [scat_exact]
PreciseProblem.apply64_delta = 2x fp32 smoothness on hi/lo   [smooth_hilo]
                             + the same two f64 einsums      [rows64]
                             + hi/lo fp32 matmul scatter     [scat_hilo]

Extra arms measure the candidate replacements:
  rows_df    — the two einsums in hi/lo-f32 double-float style (3 fp32
               einsums for B x, 3 for Bᵀy; drops the lo·lo term)
  smooth_hilo_x — smoothness of a FULL-SIZE f64 x via exact hi+lo fp32
               split (residual64 candidate: error ~2⁻²⁴·‖S‖·‖x‖, fixed)

Run on the chip (`python probes/res64_decomp.py`); `--smoke` on CPU.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import field_interpolation_tpu as fi
from field_interpolation_tpu import constraints as cons
from field_interpolation_tpu import stencils
from field_interpolation_tpu.utils import measure_marginal

from _common import cloud  # noqa: E402

SHAPE = (256, 256)
N = 1000
HI = jax.lax.Precision.HIGHEST


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    counts = (1, 3) if smoke else (64, 512)

    grid = fi.Grid(SHAPE)
    w = fi.Weights(model_2=0.3, data_pos=1.0, data_gradient=1.0)
    pts, nrm = cloud(N, SHAPE)
    pts_d, nrm_d = jnp.asarray(pts), jnp.asarray(nrm)

    with jax.enable_x64():
        pp = fi.assemble_precise(grid, w, pts_d, jnp.zeros(N),
                                 gradients=nrm_d)
        x64 = jnp.asarray(
            np.random.default_rng(0).standard_normal(grid.shape),
            jnp.float64) * 1e-3
        rows64, cidx, tw64 = pp.rows64, pp.corner_idx, pp.tw64
        rows_hi = rows64.astype(jnp.float32)
        rows_lo = (rows64 - rows_hi).astype(jnp.float32)
        contrib0 = pp._row_contrib(tw64 - pp._rows_apply(x64))

        def step_smooth64(c):
            s = stencils.smoothness_apply(x64 * (1.0 + c * 1e-12), w, 2)
            return c + jnp.sum(s) * 1e-9

        def step_rows64(c):
            x = x64 * (1.0 + c * 1e-12)
            y = pp._rows_apply(x)
            out = pp._row_contrib(y)
            return c + jnp.sum(out) * 1e-9

        def step_rows_df(c):
            x = x64 * (1.0 + c * 1e-12)
            xh = x.astype(jnp.float32)
            xl = (x - xh).astype(jnp.float32)
            ch = xh.reshape(-1)[cidx]
            cl = xl.reshape(-1)[cidx]
            # B x ≈ Rh·xh + Rh·xl + Rl·xh (fp32 products, f64 accumulate)
            y = (jnp.einsum("nrc,nc->nr", rows_hi, ch,
                            precision=HI).astype(jnp.float64)
                 + jnp.einsum("nrc,nc->nr", rows_hi, cl,
                              precision=HI).astype(jnp.float64)
                 + jnp.einsum("nrc,nc->nr", rows_lo, ch,
                              precision=HI).astype(jnp.float64))
            yh = y.astype(jnp.float32)
            yl = (y - yh).astype(jnp.float32)
            out = (jnp.einsum("nrc,nr->nc", rows_hi, yh,
                              precision=HI).astype(jnp.float64)
                   + jnp.einsum("nrc,nr->nc", rows_hi, yl,
                                precision=HI).astype(jnp.float64)
                   + jnp.einsum("nrc,nr->nc", rows_lo, yh,
                                precision=HI).astype(jnp.float64))
            return c + jnp.sum(out) * 1e-9

        def step_scat_exact(c):
            out = cons.scatter_corners_exact(
                grid, cidx, contrib0 * (1.0 + c * 1e-12))
            return c + jnp.sum(out) * 1e-9

        def step_scat_hilo(c):
            out = cons.scatter_corners_hilo(
                grid, cidx, contrib0 * (1.0 + c * 1e-12))
            return c + jnp.sum(out) * 1e-9

        def step_smooth_hilo_x(c):
            x = x64 * (1.0 + c * 1e-12)
            xh = x.astype(jnp.float32)
            xl = (x - xh).astype(jnp.float32)
            s = (stencils.smoothness_apply(xh, w, 2).astype(jnp.float64)
                 + stencils.smoothness_apply(xl, w, 2).astype(jnp.float64))
            return c + jnp.sum(s) * 1e-9

        # accuracy of the two candidate replacements vs the f64 truth
        y64 = pp._rows_apply(x64)
        xh = x64.astype(jnp.float32)
        xl = (x64 - xh).astype(jnp.float32)
        ch, cl = xh.reshape(-1)[cidx], xl.reshape(-1)[cidx]
        y_df = (jnp.einsum("nrc,nc->nr", rows_hi, ch,
                           precision=HI).astype(jnp.float64)
                + jnp.einsum("nrc,nc->nr", rows_hi, cl,
                             precision=HI).astype(jnp.float64)
                + jnp.einsum("nrc,nc->nr", rows_lo, ch,
                             precision=HI).astype(jnp.float64))
        err_rows = float(jnp.max(jnp.abs(y_df - y64))
                         / jnp.maximum(jnp.max(jnp.abs(y64)), 1e-30))
        s64 = stencils.smoothness_apply(x64, w, 2)
        s_hl = (stencils.smoothness_apply(xh, w, 2).astype(jnp.float64)
                + stencils.smoothness_apply(xl, w, 2).astype(jnp.float64))
        err_sm = float(jnp.max(jnp.abs(s_hl - s64))
                       / jnp.maximum(jnp.max(jnp.abs(s64)), 1e-30))
        print(f"rows_df rel err vs f64: {err_rows:.2e}; "
              f"smooth_hilo_x rel err: {err_sm:.2e}", flush=True)

        for name, step in [
            ("smooth64", step_smooth64),
            ("smooth_hilo_x", step_smooth_hilo_x),
            ("rows64", step_rows64),
            ("rows_df", step_rows_df),
            ("scat_exact", step_scat_exact),
            ("scat_hilo", step_scat_hilo),
        ]:
            s, det = measure_marginal(step, jnp.float64(0.0), counts=counts)
            print(f"{name:14s} {s*1e3:8.3f} ms/step  chains={det['times_s']}",
                  flush=True)


if __name__ == "__main__":
    main()
