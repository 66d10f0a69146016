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
