from .observe import (
    SolveRecord,
    roofline_bytes_per_apply,
    record_solve,
    timed_block,
)

__all__ = [
    "SolveRecord",
    "roofline_bytes_per_apply",
    "record_solve",
    "timed_block",
]
