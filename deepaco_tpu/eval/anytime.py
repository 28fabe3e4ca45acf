"""Anytime-quality evaluation protocol.

The reference protocol (tsp/test.ipynb cell 1; cvrp/test.py:41-52): per
instance, build the heuristic (neural or classic ``sparsify``), then run ACO
with a *persistent* pheromone state, reporting the mean best-so-far cost at
cumulative T ∈ {1,10,20,30,40,50,100}. Here the full T_max iterations run as
one jitted scan per instance (capturing the whole curve), vmapped over the
instance batch — the dataset sweep is a single device program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.runner import ACOConfig, init_search, run_anytime
from deepaco_tpu.aco.batched_tsp import run_anytime_batched
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec
from deepaco_tpu.core.graph import knn_graph, scatter_to_dense, sparse_distance_matrix
from deepaco_tpu.utils.datasets import distance_matrix


def tsp_instance_curve(heu, dist, cfg: ACOConfig, rng, t_max: int):
    """Best-so-far cost after each of ``t_max`` iterations for one instance."""
    n = dist.shape[0]
    spec_factory = lambda tau: tsp_spec(tau, heu, cfg.n_ants,
                                        alpha=cfg.alpha, beta=cfg.beta)
    cost_fn = functools.partial(tour_cost, dist)
    state = init_search(n, n - 1, cfg)
    _, curve = run_anytime(spec_factory, cost_fn, cfg, state, rng, t_max)
    return curve


def batched_tsp_heuristic(model, variables, coords_batch, k_sparse: int):
    """Batched graph build + GNN heuristic for the TSP protocol.

    Returns ``(heu [B, N, N], dist [B, N, N])``. On TPU the GNN forward
    rides the whole-net fused kernel (:mod:`deepaco_tpu.ops.fused_gnn`,
    bfloat16 gathers, ~5x the per-layer path at the TSP500 bench shape);
    ``DEEPACO_FAST_GNN=0|f32`` overrides."""
    from deepaco_tpu.ops.fused_gnn import (dense_heuristic_supported,
                                           fast_inference_mode,
                                           net_apply_fast,
                                           tsp_dense_heuristic)

    n = coords_batch.shape[1]
    cdt = fast_inference_mode(model, n, k_sparse)
    if cdt is not None and dense_heuristic_supported(n, k_sparse,
                                                    model.units):
        # fully fused: k-NN selection, 12 layers, head and dense scatter in
        # one kernel — the only XLA work is the distance matrix itself
        dist = jax.vmap(distance_matrix)(coords_batch)
        heu = tsp_dense_heuristic(
            variables, coords_batch, dist, k_sparse, depth=model.depth,
            units=model.units, node_update=model.node_update,
            compute_dtype=cdt)
        return heu, dist

    def build(coords):
        dist = distance_matrix(coords)
        return knn_graph(coords, dist, k_sparse), dist

    g, dist = jax.vmap(build)(coords_batch)
    if cdt is not None:
        heu_vec = net_apply_fast(model, variables, g.x, g.nbr, g.edge, cdt)
        heu = jax.vmap(scatter_to_dense)(g, heu_vec) + 1e-10
    else:
        def per_instance(gi):
            out = model.apply(variables, gi, train=False)
            heu_vec = out[1] if isinstance(out, tuple) else out
            return scatter_to_dense(gi, heu_vec) + 1e-10

        heu = jax.vmap(per_instance)(g)
    return heu, dist


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _eval_neural(model, cfg: ACOConfig, k_sparse: int, t_max: int,
                 variables, coords_batch, rng):
    """Neural anytime sweep on the batched dense runner (whole dataset =
    one scan; hoisted log-heuristic; bfloat16 sampling — see
    :mod:`deepaco_tpu.aco.batched_tsp`)."""
    heu, dist = batched_tsp_heuristic(model, variables, coords_batch,
                                      k_sparse)
    return run_anytime_batched(heu, dist, cfg, rng, t_max)


def _eval_ls(model, cfg: ACOConfig, k_sparse: int, t_max: int,
             ls: str, variables, coords_batch, rng,
             b_chunk: int | None = None):
    """The tsp_nls anytime protocol (tsp_nls/test.py:17-56), batched.

    The sweep is CHUNKED over instances and iterations — each device program
    is one ACO iteration for a block of instances, with the search state
    carried on the host side. One monolithic program (whole set × T with the
    Pallas descent per iteration) runs for minutes and trips the TPU worker's
    watchdog.
    """
    import numpy as np

    from deepaco_tpu.aco.batched_tsp import _batched_init
    from deepaco_tpu.core.builders import tsp_nls_graph

    b, n, _ = coords_batch.shape
    if b_chunk is None:
        # ~512 LS descents per dispatch: a few seconds of device time at any
        # n (the grid serializes descents on the core), below the watchdog
        b_chunk = int(max(1, min(b, 512 // max(cfg.n_ants, 1))))

    from deepaco_tpu.ops.fused_gnn import (dense_heuristic_supported,
                                           fast_inference_mode,
                                           net_apply_fast,
                                           tsp_dense_heuristic)

    @jax.jit
    def heu_fn(coords):
        bsz = coords.shape[0]
        cdt = None if model is None else fast_inference_mode(model, n,
                                                             k_sparse)
        # NLS cells are LS-dominated (GNN runs once per sweep), so take the
        # exact-parity f32 kernel: the tsp_nls checkpoints are measurably
        # bf16-sensitive (max sigmoid drift 0.62 vs 0.06 for vanilla tsp)
        if cdt is not None:
            cdt = jnp.float32
        if cdt is not None and dense_heuristic_supported(n, k_sparse,
                                                         model.units):
            dist = jax.vmap(distance_matrix)(coords)
            # tsp_nls node feature: one-hot start node 0
            # (tsp_nls/utils.py:37-45)
            x = jnp.zeros((bsz, n, 1), jnp.float32).at[:, 0, 0].set(1.0)
            heu = tsp_dense_heuristic(
                variables, x, dist, k_sparse, depth=model.depth,
                units=model.units, node_update=model.node_update,
                compute_dtype=cdt)
            return heu, dist

        def build(c):
            dist = distance_matrix(c)
            if model is None:
                return 1.0 / sparse_distance_matrix(dist, k_sparse), dist
            return tsp_nls_graph(c, dist, k_sparse, start_node=0), dist

        g, dist = jax.vmap(build)(coords)
        if model is None:
            return g, dist
        if cdt is not None:
            heu_vec = net_apply_fast(model, variables, g.x, g.nbr, g.edge,
                                     cdt)
            return jax.vmap(scatter_to_dense)(g, heu_vec) + 1e-10, dist

        def per_instance(gi):
            out = model.apply(variables, gi, train=False)
            heu_vec = out[1] if isinstance(out, tuple) else out
            return scatter_to_dense(gi, heu_vec) + 1e-10

        return jax.vmap(per_instance)(g), dist

    @jax.jit
    def step_fn(state, heu, dist, coords, key):
        return run_anytime_batched(heu, dist, cfg, key, 1, coords=coords,
                                   ls=ls, state=state, return_state=True)

    curves = np.zeros((b, t_max), np.float32)
    for s in range(0, b, b_chunk):
        chunk = coords_batch[s:s + b_chunk]
        real = chunk.shape[0]
        if real < b_chunk:     # pad to the jitted shape; sliced off below
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[:1], b_chunk - real, axis=0)])
        heu, dist = heu_fn(chunk)
        state = _batched_init(b_chunk, n, cfg)
        for t in range(t_max):
            key = jax.random.fold_in(rng, s * t_max + t)
            state, cur = step_fn(state, heu, dist, chunk, key)
            curves[s:s + real, t] = np.asarray(cur)[:real, 0]
    return jnp.asarray(curves)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _eval_classic(cfg: ACOConfig, k_sparse: int, t_max: int,
                  coords_batch, rng):
    def per_instance(coords):
        dist = distance_matrix(coords)
        return 1.0 / sparse_distance_matrix(dist, k_sparse), dist

    heu, dist = jax.vmap(per_instance)(coords_batch)
    return run_anytime_batched(heu, dist, cfg, rng, t_max)


def evaluate_tsp(coords_batch, *, model=None, variables=None,
                 k_sparse: int, cfg: ACOConfig | None = None,
                 t_values=(1, 10, 20, 30, 40, 50, 100), seed: int = 0,
                 ls: str | None = None):
    """Anytime sweep over a dataset.

    Returns ``[len(t_values)]`` mean best-so-far costs (the reference's
    reported table) plus the full ``[B, t_max]`` curves.
    ``model=None`` runs the classic-ACO A/B baseline (sparsified 1/d
    heuristic, reference tsp/test.ipynb cells 5-6). ``ls`` in
    {"2opt", "nls"} runs the tsp_nls protocol (local search on every ant,
    start-node-feature graph when neural).
    """
    cfg = cfg or ACOConfig()
    coords_batch = jnp.asarray(coords_batch, jnp.float32)
    t_max = int(max(t_values))
    rng = jax.random.PRNGKey(seed)
    if ls is not None:
        curves = _eval_ls(model, cfg, k_sparse, t_max, ls, variables,
                          coords_batch, rng)
    elif model is None:
        curves = _eval_classic(cfg, k_sparse, t_max, coords_batch, rng)
    else:
        curves = _eval_neural(model, cfg, k_sparse, t_max, variables,
                              coords_batch, rng)
    idx = jnp.asarray([t - 1 for t in t_values])
    return jnp.mean(curves[:, idx], axis=0), curves
