from deepaco_tpu.aco.engine import Rollout, RolloutSpec, greedy_rollout, rollout
from deepaco_tpu.aco.runner import (
    ACO,
    ACOConfig,
    SearchState,
    aco_iteration,
    init_search,
    run_anytime,
)

__all__ = [
    "ACO",
    "ACOConfig",
    "Rollout",
    "RolloutSpec",
    "SearchState",
    "aco_iteration",
    "greedy_rollout",
    "init_search",
    "rollout",
    "run_anytime",
]
