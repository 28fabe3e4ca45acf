from deepaco_tpu.eval.anytime import evaluate_tsp, tsp_instance_curve

__all__ = ["evaluate_tsp", "tsp_instance_curve"]
