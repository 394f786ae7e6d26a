from okvis2_tpu.parallel.sharded_ba import (
    make_mesh,
    shard_problem_by_landmark,
    solve_full_graph_sharded,
)

__all__ = [
    "make_mesh",
    "shard_problem_by_landmark",
    "solve_full_graph_sharded",
]
