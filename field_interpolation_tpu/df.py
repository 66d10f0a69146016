"""Double-float (two-fp32) arithmetic: ~2⁻⁴⁸ relative accuracy from pairs of
float32, built from error-free transformations (Knuth two-sum, Dekker split
two-prod — no FMA dependence, so it lowers to plain VPU ops on TPU).

Why: TPU has no native float64 — XLA software-emulates it with a general
IEEE-faithful double-double pass that costs several fused fp32 ops PER
SCALAR OP (measured: the f64 outer loop is ~60% of the batched TRUE-1e-6
tier's cost, NOTES_ROUND3.md candidate 5). The refined-solve outer loop
(solver.solve_refined) needs ~1e-9 relative accuracy in its residual/state
updates — far below fp32's 6e-8 but far above what full IEEE f64 provides.
A double-float carries ~48 bits of significand: enough margin for the
honesty bar (tol=1e-6 with the 2% report-vs-oracle test) at a fraction of
the emulation cost, because we only pay for the ops we use.

Representation: (hi, lo) with hi = fl(hi + lo) (non-overlapping), both
float32. All functions are shape-polymorphic elementwise jnp ops, safe
inside jit/vmap/scan. Precision notes per function; `df_dot` upgrades the
accumulation as well (pairwise f32 sums would lose the low parts).

Reference: the classic double-double recipes (Dekker 1971, Knuth TAOCP
v2, Hida-Li-Bailey QD); this is the float32 instantiation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Dekker splitter for binary32: 2^ceil(24/2) + 1 (python float, NOT a
# module-level jnp constant — see _split).
_SPLIT = float((1 << 12) + 1)


class DF(NamedTuple):
    """A double-float array: value ≈ hi + lo, |lo| ≤ ulp(hi)/2."""

    hi: jax.Array
    lo: jax.Array


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    """Dekker FastTwoSum — requires |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a == hi + lo with hi, lo having ≤12 significand bits."""
    t = jnp.float32(_SPLIT) * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA; 17 flops)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_from_f32(x) -> DF:
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def df_from_f64(x) -> DF:
    """Exact split of a float64 array (requires x64 enabled at trace time)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(a: DF):
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def df_add(a: DF, b: DF) -> DF:
    """Full double-float add (Knuth-style, ~2⁻⁴⁸ relative)."""
    s, e = _two_sum(a.hi, b.hi)
    t, f = _two_sum(a.lo, b.lo)
    e = e + t
    s, e = _fast_two_sum(s, e)
    e = e + f
    return DF(*_fast_two_sum(s, e))


def df_add_f32(a: DF, b) -> DF:
    s, e = _two_sum(a.hi, jnp.asarray(b, jnp.float32))
    e = e + a.lo
    return DF(*_fast_two_sum(s, e))


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_mul(a: DF, b: DF) -> DF:
    """Double-float multiply (~2⁻⁴⁸): TwoProd of the his + cross terms."""
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return DF(*_fast_two_sum(p, e))


def df_mul_f32(a: DF, b) -> DF:
    b = jnp.asarray(b, jnp.float32)
    p, e = _two_prod(a.hi, b)
    e = e + a.lo * b
    return DF(*_fast_two_sum(p, e))


def df_axpy(alpha: DF, x: DF, y: DF) -> DF:
    """y + alpha * x in double-float."""
    return df_add(y, df_mul(alpha, x))


def df_sum(a: DF) -> DF:
    """Double-float sum over ALL elements: a fully-vectorized binary TREE
    of df_adds (log₂n levels, each one elementwise df_add over half the
    remaining elements — ~40n VPU flops total, no sequential scan). Error
    ~log₂(n)·2⁻⁴⁸ relative — a plain f32 jnp.sum would floor at ~2⁻²⁴ and
    silently drop the lo parts."""
    hi = a.hi.reshape(-1)
    lo = a.lo.reshape(-1)
    n = hi.size
    m = 1
    while m < n:
        m *= 2
    hi = jnp.pad(hi, (0, m - n))
    lo = jnp.pad(lo, (0, m - n))
    cur = DF(hi, lo)
    while m > 1:
        m //= 2
        cur = df_add(DF(cur.hi[:m], cur.lo[:m]),
                     DF(cur.hi[m:], cur.lo[m:]))
    return DF(cur.hi[0], cur.lo[0])


def df_mul_split(ah, al, bh, bl) -> DF:
    """Elementwise product of two EXACTLY-split f64 values a = ah + al,
    b = bh + bl (both parts fp32): TwoProd of the his + all three cross
    terms. Error ≤ ~2⁻⁴⁸ relative — the only rounding is in the fp32 cross
    products and the compensated accumulation, an order 2⁻²⁴ below each
    term's own magnitude."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh + al * bl)
    return DF(*_fast_two_sum(p, e))


def df_sum_axis(a: DF, axis: int) -> DF:
    """Compensated sum of a DF array along ONE (small, static) axis: a
    python chain of df_adds — fully vectorized over the remaining axes, so
    XLA fuses the whole chain into one elementwise kernel. Error
    ~len·2⁻⁴⁸ relative; meant for the tiny corner/row axes (C = 2^D ≤ 8,
    R = 1+D ≤ 4) where a tree buys nothing."""
    hi = jnp.moveaxis(a.hi, axis, 0)
    lo = jnp.moveaxis(a.lo, axis, 0)
    acc = DF(hi[0], lo[0])
    for k in range(1, hi.shape[0]):
        acc = df_add(acc, DF(hi[k], lo[k]))
    return acc


def df_split_f64(x) -> tuple[jax.Array, jax.Array]:
    """EXACT hi/lo fp32 split of a float64 array (requires x64 at trace
    time): x == hi + lo with hi = fl32(x). The split itself is error-free;
    only |lo| ≤ ulp32(hi)/2 is dropped by consumers that ignore it."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def df_dot(a: DF, b: DF) -> DF:
    """⟨a, b⟩ in double-float: exact elementwise TwoProd + cross terms,
    then the compensated reduction of df_sum."""
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return df_sum(DF(p, e))
