"""Observability: per-solve structured records, timing, roofline accounting.

Reference counterpart: the GUI's on-screen wall-time/RMSE readouts and emilib
timers (SURVEY.md §5 "Tracing / profiling" and "Metrics / logging" rows). The
rebuild emits structured per-solve records — iterations, relative residual,
wall time, achieved GB/s vs the HBM roofline — as Python objects and optional
JSON lines, suitable for the benchmark harness and production logging.

For deep profiling: `jax.profiler.trace` HANGS through the axon remote-TPU
tunnel (measured, round 3) — the working in-kernel attribution route is
timing chained ABLATED kernel variants (`ops.pallas_stencil.fused_pcg_solve
(ablate=...)`; see NOTES_ROUND4.md for the measured 256² decomposition), and
the methodology rule that every chained measurement carries the flat ~33 ms
dispatch round trip ONCE — difference it out or it reads as a phantom
per-iteration cost. This module covers the always-on lightweight layer.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import math
import time
from typing import Optional, TextIO

from ..grid import Grid
from ..weights import Weights

# Per-chip HBM bandwidth (GB/s) for roofline accounting. The bench rig is a
# TPU v5e (819 GB/s); v5p is 2765 GB/s.
HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0, "v4": 1228.0}


def roofline_bytes_per_apply(grid: Grid, dtype_bytes: int = 4) -> int:
    """Minimum HBM traffic for one normal-operator apply: read x, read the
    3^D data-coefficient channels, write the result (smoothness taps are
    compile-time constants)."""
    n = grid.num_nodes
    channels = 3 ** grid.ndim
    return n * dtype_bytes * (1 + channels + 1)


def vcycle_applies_per_iteration(nu_pre: int = 3, nu_post: int = 3) -> float:
    """Fine-apply-equivalents per MG-PCG iteration for record_solve's traffic
    model: the from-zero first pre-smooth sweep performs NO operator apply
    (z = τD⁻¹r), so a V-cycle does (nu_pre − 1) smoothing applies down,
    one residual apply for the restriction, and nu_post applies up, plus
    one CG operator apply outside; coarse levels add a geometric tail
    (≤ 1/4 + 1/16 + … = 1/3 of the fine work in 2D, counted on the
    smoothing+restriction part). Transfers are ignored (banded gathers,
    ~O(N) but far below an apply), so this is still a mild lower bound —
    the honest default for MG call sites instead of 1.0."""
    return (nu_pre + nu_post) * (4.0 / 3.0) + 1.0


@dataclasses.dataclass
class SolveRecord:
    """One solve's diagnostics (the structured version of the GUI readout)."""

    grid_shape: tuple[int, ...]
    iterations: int
    rel_residual: float
    converged: bool
    wall_ms: float
    solver: str = "pcg"
    preconditioner: str = "jacobi"
    achieved_gbps: Optional[float] = None
    roofline_frac: Optional[float] = None
    extra: dict = dataclasses.field(default_factory=dict)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["grid_shape"] = list(self.grid_shape)
        return json.dumps(d)


@contextlib.contextmanager
def timed_block():
    """Context manager yielding a dict that receives {'ms': wall_ms} on exit."""
    out = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["ms"] = (time.perf_counter() - t0) * 1e3


def measure_marginal(step, init, counts: tuple[int, int] = (32, 160)):
    """Marginal wall seconds per application of ``step``, by the chained
    K-difference method — the one timing route that is reliable on a
    remote-dispatch rig (and harmless on a local one):

    * ``block_until_ready`` does NOT reliably sync through a dispatch
      tunnel, so each measurement forces a SCALAR readback;
    * every dispatch carries a flat host↔device round trip (~33 ms on the
      axon rig) ONCE — timing two chains of different lengths and
      differencing cancels it (naive single-chain timing smears it over K
      as a phantom per-step cost; see NOTES_ROUND4.md item 5 for the
      wrong attributions that trap produced before this was systematized).

    step: carry → carry, jit-traceable with static shapes.
    init: initial carry (pytree of arrays).
    counts: the two chain lengths (K1 < K2). Pick them so the work
      difference dwarfs the rig's dispatch jitter (±3 ms on axon).

    Returns ``(seconds_per_step, details)`` where details holds the raw
    chain timings and the final carry of the long chain (so callers can
    check the chained computation stayed well-formed)."""
    import jax
    import jax.numpy as jnp

    K1, K2 = counts
    if not 0 <= K1 < K2:
        raise ValueError(f"counts must satisfy 0 <= K1 < K2, got {counts}")

    def chain(K):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, K, lambda i, c: step(c), c)
        return run

    def sync(c):
        # scalar readback of every leaf: the only reliable fence
        return sum(float(jnp.sum(leaf)) for leaf in jax.tree.leaves(c))

    times = {}
    final = None
    for K in (K1, K2):
        run = chain(K)
        out = run(init)
        sync(out)                      # warmup incl. compile
        t0 = time.perf_counter()
        out = run(init)
        sync(out)
        times[K] = time.perf_counter() - t0
        if K == K2:
            final = out
    per = (times[K2] - times[K1]) / (K2 - K1)
    return per, {"times_s": times, "counts": (K1, K2), "final_carry": final}


# Per-chip MXU peak (TFLOP/s, bf16 systolic peak — fp32 work runs at a
# fraction of this; treat flop-side estimates as optimistic lower bounds).
PEAK_TFLOPS = {"v5e": 197.0, "v5p": 459.0, "v4": 275.0}


@dataclasses.dataclass(frozen=True)
class PhaseCost:
    """Static XLA cost-model attribution for one compiled computation."""

    name: str
    flops: float
    bytes_accessed: float
    transcendentals: float
    temp_bytes: int            # scratch the executable allocates
    est_ms_bw: float           # bytes_accessed / HBM bandwidth
    est_ms_flops: float        # flops / MXU peak
    est_ms: float              # roofline lower bound: max of the two

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / self.bytes_accessed if self.bytes_accessed else 0.0


def xla_cost(fn, *example_args, name: str = "", chip: str = "v5e") -> PhaseCost:
    """Static per-phase attribution from XLA's compiled cost model — the
    tunnel-free complement to `measure_marginal`: `jax.profiler` HANGS
    through the axon remote-TPU tunnel (NOTES_ROUND3/4), but
    ``jit(fn).lower(args).compile().cost_analysis()`` needs no device trace
    at all, so phase-level flops/bytes decompositions work on any backend,
    any time. Estimates use the `chip` roofline constants; counts come from
    the CURRENT default backend's compilation (fusion choices differ across
    backends — treat cross-backend byte counts as approximate).

    fn: jit-traceable callable (already-jitted is fine).
    Returns a PhaseCost; `est_ms` is the roofline LOWER bound
    max(bytes/BW, flops/peak) — measured time above it is latency/overhead.
    """
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):       # older jax: one dict per executable
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    trans = float(ca.get("transcendentals", 0.0))
    try:
        temp = int(compiled.memory_analysis().temp_size_in_bytes)
    except Exception:                        # pragma: no cover - backend quirk
        temp = 0
    bw = HBM_GBPS.get(chip, HBM_GBPS["v5e"]) * 1e9
    pk = PEAK_TFLOPS.get(chip, PEAK_TFLOPS["v5e"]) * 1e12
    ms_bw = byts / bw * 1e3
    ms_fl = flops / pk * 1e3
    return PhaseCost(name=name, flops=flops, bytes_accessed=byts,
                     transcendentals=trans, temp_bytes=temp,
                     est_ms_bw=ms_bw, est_ms_flops=ms_fl,
                     est_ms=max(ms_bw, ms_fl))


def cost_table(costs) -> str:
    """Fixed-width table of PhaseCosts (+ a TOTAL row) for human reading."""
    rows = list(costs)
    total = PhaseCost(
        name="TOTAL",
        flops=sum(c.flops for c in rows),
        bytes_accessed=sum(c.bytes_accessed for c in rows),
        transcendentals=sum(c.transcendentals for c in rows),
        temp_bytes=max((c.temp_bytes for c in rows), default=0),
        est_ms_bw=sum(c.est_ms_bw for c in rows),
        est_ms_flops=sum(c.est_ms_flops for c in rows),
        est_ms=sum(c.est_ms for c in rows),
    )
    hdr = (f"{'phase':<28} {'GFLOP':>9} {'MB moved':>10} "
           f"{'AI':>7} {'est ms (roofline)':>18}")
    lines = [hdr, "-" * len(hdr)]
    for c in rows + [total]:
        lines.append(
            f"{c.name:<28} {c.flops / 1e9:>9.3f} "
            f"{c.bytes_accessed / 1e6:>10.3f} "
            f"{c.arithmetic_intensity:>7.2f} {c.est_ms:>18.4f}")
    return "\n".join(lines)


def record_solve(grid: Grid, info, wall_ms: float, *,
                 preconditioner: str = "jacobi", solver: str = "pcg",
                 chip: str = "v5e", stream: Optional[TextIO] = None,
                 applies_per_iteration: float = 1.0,
                 **extra) -> SolveRecord:
    """Build (and optionally emit as a JSON line) a SolveRecord from a
    SolveInfo + measured wall time; estimates achieved bandwidth from the
    iteration count and the per-apply roofline bytes.

    The traffic model counts ``applies_per_iteration`` fine-grid operator
    applies per CG iteration and NOTHING else. The default (1.0) is only
    right for unpreconditioned/Jacobi CG; a multigrid V-cycle performs
    several fine-level applies plus coarse-level work and transfers, so with
    the default the estimate UNDERSTATES traffic (and hence achieved GB/s).
    Pass e.g. ``applies_per_iteration=2 * (pre + post) + 2`` for a V-cycle,
    or treat `achieved_gbps`/`roofline_frac` as lower bounds."""
    iters = int(info.iterations)
    gbps = None
    frac = None
    if wall_ms > 0 and iters > 0:
        moved = roofline_bytes_per_apply(grid) * iters * applies_per_iteration
        gbps = moved / (wall_ms * 1e-3) / 1e9
        peak = HBM_GBPS.get(chip)
        frac = gbps / peak if peak else None
    rec = SolveRecord(
        grid_shape=grid.shape,
        iterations=iters,
        rel_residual=float(info.rel_residual),
        converged=bool(info.converged),
        wall_ms=wall_ms,
        solver=solver,
        preconditioner=preconditioner,
        achieved_gbps=gbps,
        roofline_frac=frac,
        extra=extra,
    )
    if stream is not None:
        print(rec.to_json(), file=stream, flush=True)
    return rec
