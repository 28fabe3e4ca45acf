#!/usr/bin/env python
"""Island-model colony scaling (VERDICT r4 #4: record the scaling artifact).

Runs multi_colony_tsp_search (parallel/mesh.py) with 1..D colonies on the
same TSP instance, same per-colony iteration budget and seeds, and reports
the globally-best cost after each sync round plus wall time. On the virtual
CPU mesh the QUALITY benefit of more colonies is real signal (independent
pheromone restarts + best-tour migration); the wall numbers only measure
collective overhead, since all virtual devices share one CPU.

Usage: python scripts/colony_bench.py [n] [--cpu-mesh]
"""
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in _sys.argv[1:] if not a.startswith("--")]
    cpu_mesh = "--cpu-mesh" in _sys.argv
    n = int(args[0]) if args else 200

    if cpu_mesh:
        flags = _os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from deepaco_tpu.aco.runner import ACOConfig
    from deepaco_tpu.core.graph import sparse_distance_matrix
    from deepaco_tpu.parallel.mesh import multi_colony_tsp_search
    from deepaco_tpu.utils.datasets import distance_matrix

    coords = jax.random.uniform(jax.random.PRNGKey(0), (n, 2), jnp.float32)
    dist = distance_matrix(coords)
    heu = 1.0 / sparse_distance_matrix(dist, max(n // 10, 5))
    cfg = ACOConfig(n_ants=20)
    devices = np.asarray(jax.devices())

    out = {"backend": jax.default_backend(), "n": n, "colonies": {}}
    d = 1
    while d <= devices.size:
        mesh = Mesh(devices[:d].reshape(d), axis_names=("instance",))
        run = lambda: multi_colony_tsp_search(
            mesh, heu, dist, cfg, jax.random.PRNGKey(7),
            n_rounds=10, sync_every=5)
        curve = np.asarray(run())      # compile + run
        t0 = time.time()
        curve = np.asarray(run())
        dt = time.time() - t0
        out["colonies"][str(d)] = {
            "best_cost_t50": round(float(curve[-1]), 4),
            "best_cost_t10": round(float(curve[1]), 4),
            "wall_s": round(dt, 2),
        }
        d *= 2
    print(json.dumps(out))


if __name__ == "__main__":
    main()
