from deepaco_tpu.ls.hgs import (
    multiple_swap_star,
    solve_cvrp,
    neural_swapstar,
    path_to_routes,
    routes_to_path,
    swapstar,
)

__all__ = [
    "multiple_swap_star",
    "solve_cvrp",
    "neural_swapstar",
    "path_to_routes",
    "routes_to_path",
    "swapstar",
]
