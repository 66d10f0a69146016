from .observe import (
    PhaseCost,
    SolveRecord,
    cost_table,
    measure_marginal,
    record_solve,
    roofline_bytes_per_apply,
    timed_block,
    vcycle_applies_per_iteration,
    xla_cost,
)

__all__ = [
    "PhaseCost",
    "SolveRecord",
    "cost_table",
    "measure_marginal",
    "record_solve",
    "roofline_bytes_per_apply",
    "timed_block",
    "vcycle_applies_per_iteration",
    "xla_cost",
]
