"""A/B: tsp500 protocol cost with bf16 whole-net GNN vs fp32 per-layer path.

Same seeds, full 100-instance golden set, T=10. Run from repo root.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def run(mode):
    os.environ["DEEPACO_FAST_GNN"] = mode
    from deepaco_tpu.aco.runner import ACOConfig
    import deepaco_tpu.eval.anytime as anytime
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils.datasets import load_tsp_dataset

    coords = jax.device_put(
        jnp.asarray(load_tsp_dataset(500, "test")[:100], jnp.float32))
    model = Net(dual_heads=True)
    variables = jax.device_put(
        load_reference_checkpoint("/root/reference/pretrained/tsp/tsp500.pt"))
    cfg = ACOConfig(n_ants=20)
    fn = anytime._eval_neural
    out = fn(model, cfg, 50, 10, variables, coords, jax.random.PRNGKey(0))
    np.asarray(out)  # settle
    t0 = time.perf_counter()
    curves = np.asarray(fn(model, cfg, 50, 10, variables, coords,
                           jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    # distinct jit cache keys per mode: _eval_neural is jitted on statics
    # only, but the branch is chosen at trace time from the env var -> clear
    jax.clear_caches()
    return float(np.mean(curves[:, -1])), dt


def main():
    c_fast, t_fast = run("auto")
    c_ref, t_ref = run("0")
    print(f"bf16 fast GNN : cost@T10 = {c_fast:.4f}  wall {t_fast:.3f}s")
    print(f"fp32 per-layer: cost@T10 = {c_ref:.4f}  wall {t_ref:.3f}s")
    print(f"delta = {100.0*(c_fast-c_ref)/c_ref:+.4f}%")


if __name__ == "__main__":
    main()
