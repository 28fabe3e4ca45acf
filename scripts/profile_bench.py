#!/usr/bin/env python
"""Phase profile of the headline bench: GNN forward vs ACO sweep.

Times three jitted programs on the real TPU over the same 100 golden TSP500
instances: (a) GNN heuristic matrices only, (b) one ACO iteration, (c) the
full T=10 anytime sweep. The deltas localize the next optimization target.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

N_NODE, K_SPARSE, N_ANTS, B = 500, 50, 20, 100
CKPT = "/root/reference/pretrained/tsp/tsp500.pt"


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import functools
    import jax.numpy as jnp
    from deepaco_tpu.aco.runner import ACOConfig
    from deepaco_tpu.eval.anytime import _eval_neural
    from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils.datasets import distance_matrix, load_tsp_dataset

    coords = jax.device_put(
        jnp.asarray(load_tsp_dataset(N_NODE, "test")[:B], jnp.float32))
    model = Net(dual_heads=True)
    variables = jax.device_put(load_reference_checkpoint(CKPT))
    cfg = ACOConfig(n_ants=N_ANTS)
    key = jax.device_put(jax.random.PRNGKey(0))

    @jax.jit
    def gnn_only(coords_batch):
        def per_instance(c):
            dist = distance_matrix(c)
            g = knn_graph(c, dist, K_SPARSE)
            _, heu = model.apply(variables, g, train=False)
            return scatter_to_dense(g, heu).sum()
        return jax.vmap(per_instance)(coords_batch).sum()

    def timeit(label, fn, *args, reps=3):
        np.asarray(fn(*args))  # compile
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:24s} {dt*1e3:9.1f} ms")
        return dt

    sweep = lambda t: functools.partial(_eval_neural, model, cfg, K_SPARSE, t)
    t_gnn = timeit("gnn+heu only", gnn_only, coords)
    t_1 = timeit("sweep T=1", sweep(1), variables, coords, key)
    t_10 = timeit("sweep T=10", sweep(10), variables, coords, key)
    per_iter = (t_10 - t_1) / 9
    print(f"{'per ACO iteration':24s} {per_iter*1e3:9.1f} ms")
    print(f"{'sweep minus gnn T=10':24s} {(t_10 - t_gnn)*1e3:9.1f} ms")
    tours = B * 10 * N_ANTS
    print(f"tours/s T=10: {tours / t_10:,.0f}")


if __name__ == "__main__":
    main()
