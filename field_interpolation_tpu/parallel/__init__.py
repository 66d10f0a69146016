from .sharded import shard_problem, solve_refined_sharded, solve_sharded

__all__ = ["shard_problem", "solve_refined_sharded", "solve_sharded"]
