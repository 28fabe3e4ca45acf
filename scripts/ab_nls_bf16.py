"""A/B: Pallas NLS (bf16 perturbation metric) vs XLA f32 NLS (VERDICT r3 #6).

PARITY.md documents that the on-chip NLS kernel rounds the perturbation
metric to bfloat16, so perturbation-phase move sequences can diverge from an
f32 trajectory. This quantifies the protocol-level effect: the tsp_nls
anytime protocol (48 ants, T=1..10, pretrained checkpoints) on the first 20
golden instances at n=100 and n=500, same seeds, Pallas vs XLA LS.

Run from the repo root: python scripts/ab_nls_bf16.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_cell(n, pallas: bool):
    os.environ["DEEPACO_PALLAS_LS"] = "1" if pallas else "0"
    import jax
    import jax.numpy as jnp

    from deepaco_tpu.aco.runner import ACOConfig
    from deepaco_tpu.eval.anytime import evaluate_tsp
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils.datasets import load_tsp_dataset

    coords = jnp.asarray(load_tsp_dataset(n, "test")[:20], jnp.float32)
    variables = load_reference_checkpoint(
        f"/root/reference/pretrained/tsp_nls/tsp{n}.pt")
    model = Net(dual_heads=False)
    t0 = time.time()
    means, _ = evaluate_tsp(coords, model=model, variables=variables,
                            k_sparse=n // 10, cfg=ACOConfig(n_ants=48),
                            t_values=tuple(range(1, 11)), seed=0, ls="nls")
    out = float(np.asarray(means)[-1])
    jax.clear_caches()
    return out, time.time() - t0


def main():
    report = {}
    for n in (100, 500):
        c_pal, t_pal = run_cell(n, True)
        c_xla, t_xla = run_cell(n, False)
        report[f"tsp_nls{n}"] = {
            "pallas_bf16_cost_t10": round(c_pal, 4),
            "xla_f32_cost_t10": round(c_xla, 4),
            "delta_pct": round(100.0 * (c_pal - c_xla) / c_xla, 4),
            "pallas_wall_s": round(t_pal, 1),
            "xla_wall_s": round(t_xla, 1),
        }
        print(json.dumps({f"tsp_nls{n}": report[f"tsp_nls{n}"]}), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
