#!/usr/bin/env python
"""Measure how often the sparse sweep's dense fallback fires at bench scale,
and per-phase cost of one ACO iteration (construct vs pheromone update)."""
import time

import numpy as np

N, K, A, B, T = 500, 50, 20, 100, 10
CKPT = "/root/reference/pretrained/tsp/tsp500.pt"


def main():
    import functools
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from deepaco_tpu.aco.runner import ACOConfig, init_search, search_update
    from deepaco_tpu.aco.sparse_tsp import sweep_construct
    from deepaco_tpu.aco.problems.tsp import tour_cost
    from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.models.torch_compat import load_reference_checkpoint
    from deepaco_tpu.utils.datasets import distance_matrix, load_tsp_dataset

    coords = jax.device_put(
        jnp.asarray(load_tsp_dataset(N, "test")[:B], jnp.float32))
    model = Net(dual_heads=True)
    variables = jax.device_put(load_reference_checkpoint(CKPT))
    cfg = ACOConfig(n_ants=A)

    @jax.jit
    def prep(coords_batch):
        def per(c):
            dist = distance_matrix(c)
            g = knn_graph(c, dist, K)
            _, heu = model.apply(variables, g, train=False)
            return scatter_to_dense(g, heu) + 1e-10, dist, g.nbr
        return jax.vmap(per)(coords_batch)

    heu, dist, nbr = jax.block_until_ready(prep(coords))
    log_heu = jnp.log(jnp.maximum(heu, 1e-30))

    @jax.jit
    def iters_with_counts(rng):
        state = jax.vmap(lambda _: init_search(N, N - 1, cfg))(jnp.arange(B))
        def body(state, key):
            score_d = jnp.log(jnp.maximum(state.phe.tau, 1e-30)) + log_heu
            score_s = jnp.take_along_axis(score_d, nbr, axis=-1)
            k1, k2 = jax.random.split(key)
            start = jax.random.randint(k1, (B, A), 0, N)
            paths, nd = sweep_construct(score_d, score_s, nbr, start, k2,
                                        count_dense=True)
            costs = jax.vmap(tour_cost)(dist, paths)
            state = jax.vmap(
                functools.partial(search_update, cfg))(state, paths, costs)
            return state, (nd, state.best_cost.mean())
        _, (nds, bc) = jax.lax.scan(body, state,
                                    jax.random.split(rng, T))
        return nds, bc

    nds, bc = iters_with_counts(jax.random.PRNGKey(0))
    print("dense steps per iteration (of", N - 1, "):", np.asarray(nds))
    print("mean best cost curve:", np.round(np.asarray(bc), 3))

    # --- phase timing: construct-only vs update-only --------------------
    score_d = jnp.log(jnp.ones_like(heu)) + log_heu
    score_s = jnp.take_along_axis(score_d, nbr, axis=-1)
    start = jnp.zeros((B, A), jnp.int32)

    @jax.jit
    def construct_only(rng):
        keys = jax.random.split(rng, T)
        def body(c, k):
            paths = sweep_construct(score_d, score_s, nbr, start, k)
            return c + paths[0, 0, 0], c
        c, _ = jax.lax.scan(body, jnp.int32(0), keys)
        return c

    state0 = jax.vmap(lambda _: init_search(N, N - 1, cfg))(jnp.arange(B))
    paths0 = jnp.tile(jax.random.permutation(
        jax.random.PRNGKey(1), N)[None, :, None], (B, 1, A)).astype(jnp.int32)
    costs0 = jax.vmap(tour_cost)(dist, paths0)

    @jax.jit
    def update_only(rng):
        def body(state, k):
            state = jax.vmap(functools.partial(search_update, cfg))(
                state, paths0, costs0 + k[0].astype(jnp.float32) * 0)
            return state, state.best_cost[0]
        st, _ = jax.lax.scan(body, state0, jax.random.split(rng, T))
        return st.phe.tau.sum()

    @jax.jit
    def score_refresh_only(rng):
        def body(tau, k):
            sd = jnp.log(jnp.maximum(tau, 1e-30)) + log_heu
            ss = jnp.take_along_axis(sd, nbr, axis=-1)
            return tau * 0.999 + ss.mean() * 0, sd[0, 0, 0]
        tau, _ = jax.lax.scan(body, jnp.ones_like(heu),
                              jax.random.split(rng, T))
        return tau.sum()

    def timeit(label, fn, reps=3):
        np.asarray(fn(jax.random.PRNGKey(2)))
        t0 = time.perf_counter()
        for r in range(reps):
            np.asarray(fn(jax.random.PRNGKey(3 + r)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:28s} {dt*1e3:8.1f} ms total, {dt/T*1e3:7.1f} ms/iter")

    timeit("construct only (sparse+fb)", construct_only)
    timeit("pheromone update only", update_only)
    timeit("score refresh only", score_refresh_only)


if __name__ == "__main__":
    main()
