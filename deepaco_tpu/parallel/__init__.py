from deepaco_tpu.parallel.gnn_shard import (
    edges_per_second_bench,
    sharded_embnet_forward,
)
from deepaco_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_tsp_train_step,
    shard_colony_search,
)

__all__ = [
    "edges_per_second_bench",
    "make_mesh",
    "make_sharded_tsp_train_step",
    "shard_colony_search",
    "sharded_embnet_forward",
]
