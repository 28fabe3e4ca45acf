from deepaco_tpu.core.graph import (
    SparseGraph,
    gather_from_dense,
    knn_graph,
    scatter_to_dense,
    sparse_distance_matrix,
)

__all__ = [
    "SparseGraph",
    "gather_from_dense",
    "knn_graph",
    "scatter_to_dense",
    "sparse_distance_matrix",
]
