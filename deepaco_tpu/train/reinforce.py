"""REINFORCE training for neural-heuristic ACO (TSP family).

The reference loss (tsp/train.ipynb cell 1; tsp_nls/train.py:15-44):
``loss = sum((costs - mean(costs)).detach() * sum_t log_probs) / n_ants``
averaged over the instance micro-batch, AdamW + grad-clip 3.0 (+ cosine
schedule for the NLS CLIs). Here the whole step — instance generation, GNN
forward, rollout, advantage, gradient — is ONE jitted function, vmapped over
the instance batch, so the TPU sees a single fused program per step.

The NLS-shaped advantage ``W*(ls - mean_ls) + (1-W)*(raw - mean_raw)`` with
W=0.95 (tsp_nls/train.py:33-35) is supported via an optional local-search hook
applied to sampled paths before the advantage is formed.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec
from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
from deepaco_tpu.train.config import ProblemConfig
from deepaco_tpu.utils.datasets import distance_matrix, uniform_coords


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(cfg: ProblemConfig, total_steps: int) -> optax.GradientTransformation:
    if cfg.train.cosine_schedule:
        lr = optax.cosine_decay_schedule(cfg.train.lr, total_steps)
    else:
        lr = cfg.train.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(lr, weight_decay=cfg.train.weight_decay),
    )


def init_train_state(model, cfg: ProblemConfig, rng: jax.Array,
                     nls_graph: bool = False) -> TrainState:
    coords = uniform_coords(rng, cfg.n_nodes)
    dist = distance_matrix(coords)
    if nls_graph:
        from deepaco_tpu.core.builders import tsp_nls_graph

        g = tsp_nls_graph(coords, dist, cfg.k_sparse, start_node=0)
    else:
        g = knn_graph(coords, dist, cfg.k_sparse)
    variables = model.init(rng, g, train=False)
    tx = make_optimizer(cfg, cfg.train.epochs * cfg.train.steps_per_epoch)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32))


def tsp_heuristic(model, params, batch_stats, coords, *, k_sparse, eps,
                  train: bool, nls_graph: bool = False):
    """GNN forward → dense heuristic matrix + (dist, updated stats).

    ``nls_graph`` uses the start-node one-hot feature graph of the NLS
    pipelines (tsp_nls/utils.py:37-44) instead of coordinate features."""
    dist = distance_matrix(coords)
    if nls_graph:
        from deepaco_tpu.core.builders import tsp_nls_graph

        g = tsp_nls_graph(coords, dist, k_sparse, start_node=0)
    else:
        g = knn_graph(coords, dist, k_sparse)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, upd = model.apply(variables, g, train=True,
                               mutable=["batch_stats"])
        new_stats = upd["batch_stats"]
    else:
        out = model.apply(variables, g, train=False)
        new_stats = batch_stats
    heu_vec = out[1] if isinstance(out, tuple) else out
    heu = scatter_to_dense(g, heu_vec) + eps
    return heu, dist, new_stats


def reinforce_loss(costs, log_probs, n_ants, *, ls_costs=None, w: float = 0.95):
    """Mean-baseline REINFORCE; optionally the NLS-shaped advantage."""
    adv = costs - jnp.mean(costs)
    if ls_costs is not None:
        adv = w * (ls_costs - jnp.mean(ls_costs)) + (1.0 - w) * adv
    return jnp.sum(jax.lax.stop_gradient(adv) * jnp.sum(log_probs, axis=0)) / n_ants


def nls_local_search(t_nls: int = 10, t_p: int = 20):
    """Training-time NLS hook: 2-opt budget n//4 (tsp_nls/aco.py:227),
    perturbing on the learned-heuristic metric. When coordinates are
    available on a TPU backend the whole-descent Pallas kernel
    (ops/pallas_two_opt.py) runs the search in VMEM."""
    from deepaco_tpu.ops.two_opt import batched_nls, heuristic_dist

    def fn(dist, heu, paths, coords=None):
        maxt = max(dist.shape[0] // 4, 1)
        if coords is not None and jax.default_backend() == "tpu":
            from deepaco_tpu.ops.pallas_two_opt import (
                batched_nls_euclid, pallas_ls_supported)

            if pallas_ls_supported(dist.shape[0]):
                tours = batched_nls_euclid(coords, heuristic_dist(heu),
                                           paths.T, maxt, t_nls, t_p,
                                           force_tiled=dist.shape[0] >= 1000)
                return tour_cost(dist, tours.T)
        tours = batched_nls(dist, heuristic_dist(heu), paths.T, maxt,
                            t_nls, t_p)
        return tour_cost(dist, tours.T)

    return fn


def make_tsp_train_step(model, cfg: ProblemConfig,
                        local_search: Callable | None = None,
                        nls_w: float = 0.95):
    """Build the jitted TSP train step: (state, rng) -> (state, mean_cost).

    ``local_search(dist, heu, paths, coords=...) -> improved_costs`` enables
    the NLS-shaped advantage (tsp_nls/train.py:33-35).
    """
    tx = make_optimizer(cfg, cfg.train.epochs * cfg.train.steps_per_epoch)
    a = cfg.aco
    fixed_start = 0 if local_search is not None else None

    def per_instance(params, batch_stats, key):
        k_inst, k_roll = jax.random.split(key)
        coords = uniform_coords(k_inst, cfg.n_nodes)
        heu, dist, new_stats = tsp_heuristic(
            model, params, batch_stats, coords,
            k_sparse=cfg.k_sparse, eps=cfg.train.eps, train=True,
            nls_graph=local_search is not None)
        spec = tsp_spec(jnp.ones_like(heu), heu, a.n_ants, fixed_start)
        ro = rollout(spec, k_roll, alpha=a.alpha, beta=a.beta,
                     require_prob=True)
        costs = tour_cost(dist, ro.paths)
        ls_costs = None
        if local_search is not None:
            # stop_gradient on the INPUTS: LS is reward shaping only
            # (tsp_nls/train.py:33-35), and the Pallas descent kernel has no
            # autodiff rule — keep it entirely off the linearization path.
            ls_costs = local_search(dist, jax.lax.stop_gradient(heu),
                                    ro.paths, coords=coords)
        loss = reinforce_loss(costs, ro.log_probs, a.n_ants,
                              ls_costs=ls_costs, w=nls_w)
        mon = jnp.mean(costs if ls_costs is None else ls_costs)
        return loss, new_stats, mon

    @jax.jit
    def train_step(state: TrainState, rng: jax.Array):
        keys = jax.random.split(rng, cfg.train.batch_size)

        def loss_fn(params):
            losses, stats, mons = jax.vmap(
                per_instance, in_axes=(None, None, 0))(
                    params, state.batch_stats, keys)
            stats = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), stats)
            return jnp.mean(losses), (stats, jnp.mean(mons))

        (_, (new_stats, mean_cost)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), mean_cost

    return train_step


def train_tsp(model, cfg: ProblemConfig, *, local_search=None,
              progress: Callable | None = None) -> TrainState:
    """Full training driver (reference tsp/train.ipynb cell 3 envelope)."""
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = init_train_state(model, cfg, rng,
                             nls_graph=local_search is not None)
    step_fn = make_tsp_train_step(model, cfg, local_search=local_search)
    for epoch in range(cfg.train.epochs):
        for s in range(cfg.train.steps_per_epoch):
            rng, key = jax.random.split(rng)
            state, cost = step_fn(state, key)
        if progress is not None:
            progress(epoch, float(cost))
    return state
