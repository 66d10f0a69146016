from .contour import marching_squares_sharded
from .sharded import shard_problem, solve_refined_sharded, solve_sharded

__all__ = ["marching_squares_sharded", "shard_problem",
           "solve_refined_sharded", "solve_sharded"]
