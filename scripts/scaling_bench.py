#!/usr/bin/env python
"""Edges/s scaling harness (BASELINE north star: >=80% efficiency 1->N).

Runs the edge-partitioned GNN forward (parallel/gnn_shard.py) on meshes of
1..D devices and reports edges/s and parallel efficiency. On the virtual CPU
mesh this validates the machinery; on a real multi-chip slice the same code
measures ICI scaling.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_bench.py [n] [k]
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepaco_tpu.core.graph import knn_graph
from deepaco_tpu.models.gnn import EmbNet
from deepaco_tpu.parallel.gnn_shard import edges_per_second_bench
from deepaco_tpu.utils.datasets import distance_matrix


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
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
    out = {str(d): {"edges_per_s": round(v, 1),
                    "efficiency": round(v / (base * d), 3) if base else None}
           for d, v in results.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
