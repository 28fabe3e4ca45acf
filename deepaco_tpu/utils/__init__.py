from deepaco_tpu.utils.datasets import (
    distance_matrix,
    load_pt_tensor,
    load_tsp_dataset,
    uniform_coords,
)

__all__ = [
    "distance_matrix",
    "load_pt_tensor",
    "load_tsp_dataset",
    "uniform_coords",
]
