from deepaco_tpu.ops.two_opt import (
    batched_nls,
    batched_two_opt,
    heuristic_dist,
    two_opt,
    two_opt_once,
)

__all__ = [
    "batched_nls",
    "batched_two_opt",
    "heuristic_dist",
    "two_opt",
    "two_opt_once",
]
