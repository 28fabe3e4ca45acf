#!/usr/bin/env python
"""Telemetry for the sparse [N, K] TSP path (deepaco_tpu.aco.large_tsp).

Measures, at bench scale (default n=2000, K=n/10), the two documented
approximations of the sparse engine vs the dense reference semantics:

  * uniform-fallback rate — fraction of ant-steps where the current city's
    whole k-NN neighborhood was already visited and the sweep sampled
    uniformly over the remaining unvisited set;
  * dropped-deposit fraction — fraction of constructed tour edges (u, v)
    with v not in u's k-NN list, whose pheromone deposit is dropped.

Also runs a small sparse-vs-dense A/B: the same instances through the dense
batched engine (full [N, N] score/pheromone state) to anchor solution
quality. Usage: python scripts/fallback_rate.py [n] [T]
"""
import os
import sys
import time

import numpy as np

# runnable as documented (`python scripts/fallback_rate.py`) without
# PYTHONPATH (which breaks the axon TPU registration in this environment)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    t_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = max(n // 10, 3)
    n_inst, n_ants = 4, 20

    import jax
    import jax.numpy as jnp

    from deepaco_tpu.aco.large_tsp import (
        classic_knn_heuristic, deposit_knn, knn_support, sweep_construct_knn,
        tour_cost_coords)
    from deepaco_tpu.aco.runner import ACOConfig

    cfg = ACOConfig(n_ants=n_ants)
    rng_np = np.random.default_rng(1234)
    coords_all = jnp.asarray(rng_np.random((n_inst, n, 2), np.float32))

    @jax.jit
    def sweep_stats(coords, rng):
        """T sparse ACO iterations with fallback + off-support-edge counts."""
        nbr = knn_support(coords, k)
        heu = classic_knn_heuristic(coords, nbr)
        log_heu = cfg.beta * jnp.log(jnp.maximum(heu, 1e-30))
        tau0 = jnp.ones((n, k), jnp.float32)

        def body(carry, key):
            tau, best = carry
            score = (cfg.alpha * jnp.log(jnp.maximum(tau, 1e-30))
                     + log_heu).astype(jnp.bfloat16)
            k_start, k_sweep = jax.random.split(key)
            start = jax.random.randint(k_start, (n_ants,), 0, n)
            paths, n_fb = sweep_construct_knn(score, nbr, start, k_sweep,
                                              with_stats=True)
            costs = tour_cost_coords(coords, paths)
            best = jnp.minimum(best, jnp.min(costs))
            # off-support edges = deposits the sparse update drops
            u, v = paths, jnp.roll(paths, -1, axis=0)
            on = jnp.any(nbr[u] == v[..., None], axis=-1)
            n_off = jnp.sum(1 - on.astype(jnp.int32))
            tau = deposit_knn(tau * cfg.decay, nbr, paths, cfg.q / costs,
                              cfg.symmetric)
            return (tau, best), (n_fb, n_off, best)

        (_, best), (fbs, offs, curve) = jax.lax.scan(
            body, (tau0, jnp.asarray(jnp.inf)),
            jax.random.split(rng, t_iters))
        return fbs, offs, curve

    t0 = time.time()
    fbs, offs, curves = [], [], []
    for i in range(n_inst):
        f, o, c = jax.block_until_ready(
            sweep_stats(coords_all[i], jax.random.PRNGKey(i)))
        fbs.append(np.asarray(f)); offs.append(np.asarray(o))
        curves.append(np.asarray(c))
    ant_steps = n_ants * (n - 1)
    tour_edges = n_ants * n
    fb_rate = float(np.mean(fbs)) / ant_steps
    off_rate = float(np.mean(offs)) / tour_edges
    sparse_best = float(np.mean([c[-1] for c in curves]))
    print(f"n={n} K={k} ants={n_ants} T={t_iters} inst={n_inst} "
          f"({time.time()-t0:.1f}s)")
    print(f"uniform-fallback rate: {fb_rate:.4%} of ant-steps")
    print(f"dropped-deposit rate:  {off_rate:.4%} of tour edges")
    print(f"sparse mean best cost: {sparse_best:.3f}")

    # ---- dense A/B on the same instances (full [N, N] state) --------------
    from deepaco_tpu.aco.batched_tsp import run_anytime_batched
    from deepaco_tpu.utils.datasets import distance_matrix

    t0 = time.time()
    dist = jax.vmap(distance_matrix)(coords_all)
    heu_d = 1.0 / jnp.maximum(dist, 1e-12)
    curve = run_anytime_batched(heu_d, dist, cfg, jax.random.PRNGKey(7),
                                t_iters)
    dense_best = float(np.mean(np.asarray(curve)[:, -1]))
    print(f"dense  mean best cost: {dense_best:.3f} "
          f"({time.time()-t0:.1f}s)  gap sparse-vs-dense: "
          f"{(sparse_best - dense_best) / dense_best:+.2%}")
    import json
    print(json.dumps({"n": n, "k": k, "fallback_rate": fb_rate,
                      "dropped_deposit_rate": off_rate,
                      "sparse_best": sparse_best,
                      "dense_best": dense_best}))


if __name__ == "__main__":
    main()
