from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec

__all__ = ["tour_cost", "tsp_spec"]
