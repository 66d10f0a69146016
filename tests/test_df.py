"""Double-float (two-fp32) arithmetic tests: each op must be far more
accurate than fp32 (~2^-24) and close to the f64 oracle (~2^-48 target),
under jit and vmap (the TPU refined-solve outer loop is the consumer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from field_interpolation_tpu import df as dfm


def _mk(rng, n=4096, scale=1.0):
    x64 = rng.standard_normal(n) * scale
    with jax.enable_x64():
        d = dfm.df_from_f64(jnp.asarray(x64, jnp.float64))
    return x64, d


def _rel(err, ref):
    return abs(err) / max(abs(ref), 1e-300)


def test_from_f64_roundtrip_error(rng):
    x64, d = _mk(rng)
    back = np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)
    rel = np.abs(back - x64) / np.maximum(np.abs(x64), 1e-30)
    assert rel.max() < 2e-14  # two-fp32 split: ~2^-48 + f64 rounding


def test_add_much_better_than_f32(rng):
    x64, dx = _mk(rng)
    y64, dy = _mk(rng, scale=1e-3)  # scale mismatch: f32 add loses badly
    s = jax.jit(dfm.df_add)(dx, dy)
    ref = x64 + y64
    got = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-13
    f32rel = np.abs((x64.astype(np.float32) + y64.astype(np.float32))
                    .astype(np.float64) - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-4 * max(f32rel.max(), 1e-30)


def test_mul_accuracy(rng):
    x64, dx = _mk(rng)
    y64, dy = _mk(rng)
    p = jax.jit(dfm.df_mul)(dx, dy)
    ref = x64 * y64
    got = np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-13


def test_two_prod_exact():
    """TwoProd must be EXACT for fp32 inputs: p + e == a*b in f64."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = jax.jit(dfm._two_prod)(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, ref)


def test_dot_vs_f64_oracle(rng):
    """The compensated dot must track the f64 dot to ~1e-12 relative even
    on a cancellation-heavy input where plain f32 loses everything."""
    n = 65536
    x64 = rng.standard_normal(n)
    y64 = rng.standard_normal(n)
    with jax.enable_x64():
        dx = dfm.df_from_f64(jnp.asarray(x64))
        dy = dfm.df_from_f64(jnp.asarray(y64))
    d = jax.jit(dfm.df_dot)(dx, dy)
    ref = float(np.dot(x64, y64))
    got = float(np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64))
    assert _rel(got - ref, ref) < 1e-11
    f32 = float(np.dot(x64.astype(np.float32), y64.astype(np.float32)))
    assert _rel(got - ref, ref) < 1e-3 * max(_rel(f32 - ref, ref), 1e-30)


def test_sum_cancellation(rng):
    """Σ of pairs (x, -x + tiny) — f32 sums drown `tiny`, df must not."""
    n = 8192
    x = rng.standard_normal(n)
    tiny = rng.standard_normal(n) * 1e-9
    vals = np.concatenate([x, -x + tiny])
    rng.shuffle(vals)
    with jax.enable_x64():
        d = dfm.df_from_f64(jnp.asarray(vals))
    s = jax.jit(dfm.df_sum)(d)
    ref = float(np.sum(vals.astype(np.longdouble)))
    got = float(np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64))
    assert abs(got - ref) < 1e-6 * abs(ref) + 1e-12


def test_axpy_under_vmap(rng):
    B, n = 8, 512
    x64 = rng.standard_normal((B, n))
    y64 = rng.standard_normal((B, n))
    a64 = rng.standard_normal(B)
    with jax.enable_x64():
        dx = dfm.df_from_f64(jnp.asarray(x64))
        dy = dfm.df_from_f64(jnp.asarray(y64))
        da = dfm.df_from_f64(jnp.asarray(a64))

    def one(a_hi, a_lo, xh, xl, yh, yl):
        r = dfm.df_axpy(dfm.DF(a_hi, a_lo), dfm.DF(xh, xl), dfm.DF(yh, yl))
        return r.hi, r.lo

    rh, rl = jax.vmap(one)(da.hi, da.lo, dx.hi, dx.lo, dy.hi, dy.lo)
    ref = y64 + a64[:, None] * x64
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    # relative to the OPERAND scale (ref itself crosses zero elementwise)
    scale = np.abs(y64) + np.abs(a64[:, None] * x64)
    assert (np.abs(got - ref) / np.maximum(scale, 1e-30)).max() < 1e-12


def test_mul_split_vs_f64_oracle(rng):
    a64, _ = _mk(rng, n=2048)
    b64, _ = _mk(rng, n=2048, scale=3.7)
    with jax.enable_x64():
        ah, al = dfm.df_split_f64(jnp.asarray(a64, jnp.float64))
        bh, bl = dfm.df_split_f64(jnp.asarray(b64, jnp.float64))
        p = dfm.df_mul_split(ah, al, bh, bl)
        got = np.asarray(dfm.df_to_f64(p), np.float64)
    ref = a64 * b64
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-13


def test_sum_axis_compensated(rng):
    # Sum along a small axis with heavy cancellation: plain fp32 floors at
    # ~2^-24, the compensated chain must stay ~2^-48-class.
    x64 = rng.standard_normal((512, 8))
    x64[:, 4:] = -x64[:, :4] * (1 + 1e-9)  # near-cancelling pairs
    with jax.enable_x64():
        hi, lo = dfm.df_split_f64(jnp.asarray(x64, jnp.float64))
        s = dfm.df_sum_axis(dfm.DF(hi, lo), axis=1)
        got = np.asarray(dfm.df_to_f64(s), np.float64)
    ref = x64.sum(axis=1)
    scale = np.abs(x64).sum(axis=1)  # error is relative to the ADDEND sizes
    assert np.max(np.abs(got - ref) / scale) < 1e-13


def test_precise_rows_df_match_f64_oracle(rng):
    """PreciseProblem's double-float row apply/contrib (the residual64 hot
    path on TPU) must match the straight f64 einsum oracle to ~2^-40 —
    the plain 3-einsum hi/lo variant floors at ~1e-7 (fp32 accumulation)
    and would break the 2% report-vs-oracle honesty bar."""
    import field_interpolation_tpu as fi
    grid = fi.Grid((24, 17))
    w = fi.Weights(model_2=0.3)
    n = 200
    pos = rng.uniform(0, 1, (n, 2)) * (np.array(grid.shape) - 1)
    nrm = rng.standard_normal((n, 2))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    with jax.enable_x64():
        pp = fi.assemble_precise(grid, w, jnp.asarray(pos, jnp.float32),
                                 jnp.zeros(n), gradients=jnp.asarray(
                                     nrm, jnp.float32))
        x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float64)
        y_df = np.asarray(pp._rows_apply_df(x), np.float64)
        y_64 = np.asarray(pp._rows_apply(x), np.float64)
        yres = pp.tw64 - pp._rows_apply(x)
        c_df = np.asarray(pp._row_contrib_df(yres), np.float64)
        c_64 = np.asarray(pp._row_contrib(yres), np.float64)
    for got, ref in ((y_df, y_64), (c_df, c_64)):
        scale = max(np.abs(ref).max(), 1e-30)
        assert np.max(np.abs(got - ref)) / scale < 1e-12
