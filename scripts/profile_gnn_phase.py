"""Breakdown of the bench GNN phase (VERDICT r3 #1: 0.16% MFU).

Times each stage of the TSP500 headline GNN pipeline separately on the TPU
with a scalar-reduction probe (relay-safe). Run from the repo root:
    python scripts/profile_gnn_phase.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint
from deepaco_tpu.utils.datasets import distance_matrix, load_tsp_dataset

N, K, B = 500, 50, 100
CKPT = "/root/reference/pretrained/tsp/tsp500.pt"


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    coords = jax.device_put(
        jnp.asarray(load_tsp_dataset(N, "test")[:B], jnp.float32))
    variables = jax.device_put(load_reference_checkpoint(CKPT))
    net_fused = Net(dual_heads=True)
    net_xla = Net(dual_heads=True, use_pallas=False)

    @jax.jit
    def graph_only(cb):
        def per(c):
            dist = distance_matrix(c)
            g = knn_graph(c, dist, K)
            return jnp.sum(g.edge) + jnp.sum(g.nbr) + jnp.sum(dist)
        return jnp.sum(jax.vmap(per)(cb))

    def gnn_probe(model):
        @jax.jit
        def probe(cb):
            def per(c):
                dist = distance_matrix(c)
                g = knn_graph(c, dist, K)
                out = model.apply(variables, g, train=False)
                return jnp.sum(out[1]) + jnp.sum(dist)
            return jnp.sum(jax.vmap(per)(cb))
        return probe

    @jax.jit
    def full_probe(cb):
        def per(c):
            dist = distance_matrix(c)
            g = knn_graph(c, dist, K)
            out = net_fused.apply(variables, g, train=False)
            return jnp.sum(scatter_to_dense(g, out[1]) + 1e-10) + jnp.sum(dist)
        return jnp.sum(jax.vmap(per)(cb))

    @jax.jit
    def scatter_probe(cb):
        def per(c):
            dist = distance_matrix(c)
            g = knn_graph(c, dist, K)
            return jnp.sum(scatter_to_dense(g, g.edge[..., 0]))
        return jnp.sum(jax.vmap(per)(cb))

    out = {}
    out["graph_build_s"] = timed(graph_only, coords)
    out["graph+scatter_s"] = timed(scatter_probe, coords)
    out["graph+gnn_fused_s"] = timed(gnn_probe(net_fused), coords)
    out["graph+gnn_xla_s"] = timed(gnn_probe(net_xla), coords)
    out["full_fused_s"] = timed(full_probe, coords)
    for k, v in out.items():
        print(f"{k:24s} {v*1000:9.2f} ms")


if __name__ == "__main__":
    main()
