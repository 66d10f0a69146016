from .observe import (
    SolveRecord,
    measure_marginal,
    roofline_bytes_per_apply,
    record_solve,
    timed_block,
    vcycle_applies_per_iteration,
)

__all__ = [
    "SolveRecord",
    "measure_marginal",
    "roofline_bytes_per_apply",
    "record_solve",
    "timed_block",
    "vcycle_applies_per_iteration",
]
