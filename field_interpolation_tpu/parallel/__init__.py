from .sharded import shard_problem, solve_sharded

__all__ = ["shard_problem", "solve_sharded"]
