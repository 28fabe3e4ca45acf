from deepaco_tpu.train.config import (
    ACOSettings,
    EvalConfig,
    ModelConfig,
    ProblemConfig,
    TrainConfig,
)
from deepaco_tpu.train.reinforce import (
    TrainState,
    init_train_state,
    make_tsp_train_step,
    reinforce_loss,
    train_tsp,
)

__all__ = [
    "ACOSettings",
    "EvalConfig",
    "ModelConfig",
    "ProblemConfig",
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "make_tsp_train_step",
    "reinforce_loss",
    "train_tsp",
]
