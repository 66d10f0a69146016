"""TPU-native scattered-data field interpolation.

A from-scratch JAX/Pallas rebuild of the capability surface of
`emilk/field_interpolation` (see SURVEY.md): interpolate scattered
value/gradient samples onto dense 1/2/3-D lattices with finite-difference
smoothness priors by solving sparse linear least-squares — most notably
signed-distance-field reconstruction from oriented point clouds — as a
matrix-free normal-equations PCG on TPU (`BASELINE.json:5`).
"""

from .grid import Grid, grid_2d, grid_3d
from .weights import SolverConfig, Weights
from .operators import Problem, assemble
from .solver import SolveInfo, pcg, prepare, solve, solve_refined
from .diff import solve_implicit
from .session import Solver
from .sdf import (
    PreciseProblem,
    assemble_interpolation,
    assemble_precise,
    assemble_sdf,
    interpolate,
    interpolate_precise,
    sample_field,
    sample_field_gradient,
    sdf_from_points,
    sdf_from_points_precise,
)

__version__ = "0.1.0"

__all__ = [
    "Grid",
    "grid_2d",
    "grid_3d",
    "Weights",
    "SolverConfig",
    "Problem",
    "assemble",
    "SolveInfo",
    "pcg",
    "prepare",
    "solve",
    "Solver",
    "solve_refined",
    "solve_implicit",
    "assemble_sdf",
    "assemble_interpolation",
    "assemble_precise",
    "sdf_from_points",
    "sdf_from_points_precise",
    "interpolate",
    "interpolate_precise",
    "sample_field",
    "sample_field_gradient",
    "PreciseProblem",
]
