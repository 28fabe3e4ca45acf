from deepaco_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_tsp_train_step,
    shard_colony_search,
)

__all__ = ["make_mesh", "make_sharded_tsp_train_step", "shard_colony_search"]
