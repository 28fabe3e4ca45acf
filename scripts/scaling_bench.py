#!/usr/bin/env python
"""Edges/s scaling harness (BASELINE north star: >=80% efficiency 1->N).

Runs the edge-partitioned GNN forward (parallel/gnn_shard.py) on meshes of
1..D devices and reports edges/s and parallel efficiency.

Modes:
  --cpu-mesh   force the 8-device virtual CPU backend (the sitecustomize in
               this environment pins JAX to the TPU plugin, so plain
               JAX_PLATFORMS=cpu is ignored; jax.config wins) — validates
               the sharding machinery and measures a relative efficiency
               curve.
  (default)    whatever backend JAX picks — on the dev TPU that is ONE
               chip, giving the absolute single-chip edges/s anchor.

Usage: python scripts/scaling_bench.py [n] [k] [--cpu-mesh]
"""
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in _sys.argv[1:] if not a.startswith("--")]
    cpu_mesh = "--cpu-mesh" in _sys.argv
    n = int(args[0]) if args else 1024
    k = int(args[1]) if len(args) > 1 else 16

    if cpu_mesh:
        flags = _os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from deepaco_tpu.core.graph import knn_graph
    from deepaco_tpu.models.gnn import EmbNet
    from deepaco_tpu.parallel.gnn_shard import edges_per_second_bench
    from deepaco_tpu.utils.datasets import distance_matrix

    devices = np.asarray(jax.devices())
    coords = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    g = knn_graph(coords, distance_matrix(coords), k)
    model = EmbNet()
    variables = model.init(jax.random.PRNGKey(1), g, train=False)

    results = {}
    d = 1
    while d <= devices.size:
        if n % d == 0:
            mesh = Mesh(devices[:d].reshape(d), axis_names=("instance",))
            eps = edges_per_second_bench(
                variables["params"], variables["batch_stats"],
                g.x, g.nbr, g.edge, mesh)
            results[d] = eps
        d *= 2
    base = results.get(1)
    out = {"backend": jax.default_backend(), "n": n, "k": k,
           "meshes": {str(d): {
               "edges_per_s": round(v, 1),
               "efficiency": round(v / (base * d), 3) if base else None}
               for d, v in results.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
