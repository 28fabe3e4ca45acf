"""Specialized trainers: RCPSP, MKP PH_items (transformer), CVRP-NLS.

These three pipelines fall outside the generic family trainer:
* RCPSP's loss is scaled by 1/n with grad-clip 1.0 (rcpsp/train.ipynb cell 1)
  and its graph needs host-side precedence-closure analysis;
* MKP PH_items uses the transformer model over ``[n, 6]`` tokens with a
  vector pheromone (mkp_transformer/train.py:14-30);
* CVRP-NLS computes its advantage from *host-side* native local-search costs
  (cvrp_nls/train.py:14-55) — the gradient re-walks the recorded actions with
  :func:`deepaco_tpu.aco.engine.path_log_probs` (teacher forcing), so the
  jitted backward pass never depends on host state.
"""
from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepaco_tpu.aco.engine import path_log_probs, rollout
from deepaco_tpu.aco.problems.cvrp import cvrp_spec, route_cost
from deepaco_tpu.aco.problems.mkp import extend_mkp, mkp_items_spec, mkp_objective
from deepaco_tpu.aco.problems.rcpsp import RCPSPConfig, makespans, rcpsp_spec
from deepaco_tpu.core import builders
from deepaco_tpu.core.graph import scatter_to_dense
from deepaco_tpu.core.rcpsp import RCPSPData
from deepaco_tpu.models.transformer import TransformerModel
from deepaco_tpu.train.reinforce import TrainState


# ------------------------------------------------------------------ RCPSP --
def make_rcpsp_train_step(model, tx, aco_cfg: RCPSPConfig | None = None):
    """(state, data, graph, rng) -> (state, mean_makespan).

    One jit entry per (n, t_max) bucket — pad ``t_max`` when building
    instances so a whole PSPLIB subset shares one compilation.
    """
    aco_cfg = aco_cfg or RCPSPConfig(n_ants=10)

    @jax.jit
    def step(state: TrainState, data: RCPSPData, x, nbr, edge, mask, rng):
        from deepaco_tpu.models.gnn import EdgeBlock

        def loss_fn(params):
            g = (x, (EdgeBlock(src=None, nbr=nbr, edge=edge, mask=mask),))
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, upd = model.apply(variables, g, train=True,
                                   mutable=["batch_stats"])
            heu_vec = (out[1] if isinstance(out, tuple) else out)[0]
            heu = heu_vec * mask + 1e-10      # reference reshape + EPS
            tau = jnp.ones_like(heu)
            spec = rcpsp_spec(tau, heu, data, aco_cfg)
            ro = rollout(spec, rng, require_prob=True)
            costs = makespans(data, ro.paths)
            adv = jax.lax.stop_gradient(costs - jnp.mean(costs))
            n = heu.shape[0]
            # REINFORCE / n_ants, scaled 1/n (rcpsp/train.ipynb cell 1)
            loss = jnp.sum(adv * jnp.sum(ro.log_probs, axis=0)) \
                / aco_cfg.n_ants / n
            return loss, (upd["batch_stats"], jnp.mean(costs))

        (_, (stats, mon)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, stats, opt_state, state.step + 1), mon

    return step


def rcpsp_graph_arrays(data: RCPSPData):
    """Host-side graph build → arrays for the jitted step."""
    x, (block,) = builders.rcpsp_graph(data)
    return x, block.nbr, block.edge, block.mask


def train_rcpsp(instances, *, epochs: int = 5, steps_per_epoch: int = 20,
                n_ants: int = 10, lr: float = 3e-4, grad_clip: float = 1.0,
                seed: int = 0, progress: Callable | None = None):
    """RCPSP training loop over a list of RCPSPData (same n / t_max bucket)."""
    from deepaco_tpu.models.gnn import Net

    model = Net(pad_feats=5)
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adamw(lr))
    g0 = rcpsp_graph_arrays(instances[0])
    variables = model.init(jax.random.PRNGKey(seed),
                           (g0[0], (_block(*g0[1:]),)), train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_rcpsp_train_step(model, tx, RCPSPConfig(n_ants=n_ants))
    graphs = [rcpsp_graph_arrays(d) for d in instances]
    rng = jax.random.PRNGKey(seed + 1)
    rs = np.random.default_rng(seed)
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            i = int(rs.integers(len(instances)))
            rng, key = jax.random.split(rng)
            state, cost = step_fn(state, instances[i], *graphs[i], key)
        if progress is not None:
            progress(epoch, float(cost))
    return model, state


def _block(nbr, edge, mask):
    from deepaco_tpu.models.gnn import EdgeBlock

    return EdgeBlock(src=None, nbr=nbr, edge=edge, mask=mask)


# ------------------------------------------------- MKP PH_items trainer ----
def make_mkp_items_train_step(model: TransformerModel, tx, n_ants: int = 20):
    """(state, prize, weight, rng) -> (state, mean_obj)
    (mkp_transformer/train.py:14-30; src = [price, weights] tokens)."""

    @jax.jit
    def step(state: TrainState, prize, weight, rng):
        def loss_fn(params):
            src = jnp.concatenate([prize[:, None], weight], axis=1)
            heu = model.apply({"params": params}, src) + 1e-10
            prize_e, weight_e, heu_e = extend_mkp(prize, weight, heu_vec=heu)
            tau = jnp.ones_like(heu_e)
            cap = jnp.asarray(1.0, jnp.float32)
            spec = mkp_items_spec(tau, heu_e, weight_e, cap, n_ants)
            ro = rollout(spec, rng, require_prob=True)
            objs = mkp_objective(prize_e, ro.paths)
            adv = jax.lax.stop_gradient(jnp.mean(objs) - objs)  # maximize
            return jnp.sum(adv * jnp.sum(ro.log_probs, axis=0)) / n_ants, \
                jnp.mean(objs)

        (_, mon), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.batch_stats, opt_state,
                          state.step + 1), mon

    return step


# ------------------------------------------------------ CVRP-NLS trainer ---
def make_cvrp_nls_train_fns(model, tx, *, k_sparse: int = 5,
                            n_ants: int = 20, eps: float = 1e-5):
    """Returns (sample_fn, grad_fn) for the host-LS training loop.

    sample_fn (jit): params -> heuristic + sampled paths (+ raw costs);
    grad_fn  (jit): params + recorded paths + LS advantage -> update.
    The advantage is formed on host from the native SWAP* costs, exactly the
    reference's LS-only advantage (cvrp_nls/train.py:37-42).
    """

    def _heu(params, batch_stats, demand, dist):
        g = builders.cvrp_nls_graph(demand, dist, k=k_sparse)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          g, train=False)
        outs = out[1] if isinstance(out, tuple) else out
        x, blocks = g
        n = dist.shape[0]
        heu = jnp.zeros((n, n))
        for b, h in zip(blocks, outs):
            src = jnp.arange(n) if b.src is None else b.src
            rows = jnp.broadcast_to(src[:, None], b.nbr.shape)
            heu = heu.at[rows, b.nbr].set(h)
        return heu + eps

    @jax.jit
    def sample_fn(params, batch_stats, demand, dist, rng):
        heu = _heu(params, batch_stats, demand, dist)
        tau = jnp.ones_like(heu)
        spec = cvrp_spec(tau, heu, demand, 1.0, n_ants)
        ro = rollout(spec, rng, require_prob=False)
        return heu, ro.paths, route_cost(dist, ro.paths)

    @jax.jit
    def grad_fn(state: TrainState, demand, dist, paths, adv):
        def loss_fn(params):
            heu = _heu(params, state.batch_stats, demand, dist)
            tau = jnp.ones_like(heu)
            spec = cvrp_spec(tau, heu, demand, 1.0, n_ants)
            logp = path_log_probs(spec, paths)
            return jnp.sum(adv * jnp.sum(logp, axis=0)) / n_ants

        grads = jax.grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.batch_stats, opt_state,
                          state.step + 1)

    return sample_fn, grad_fn


def cvrp_nls_train_step(state: TrainState, sample_fn, grad_fn, demand, dist,
                        rng, *, ls_count: int | None = None):
    """One full CVRP-NLS step: device sample → host SWAP* → device grad."""
    from deepaco_tpu.ls import hgs

    demand_j = jnp.asarray(demand)
    dist_j = jnp.asarray(dist)
    heu, paths, raw_costs = sample_fn(state.params, state.batch_stats,
                                      demand_j, dist_j, rng)
    n = dist_j.shape[0]
    count = ls_count or max(n - 1, 50)
    heu_np = np.asarray(heu)
    heu_dist = 1.0 / (heu_np / heu_np.max(-1, keepdims=True) + 1e-5)
    improved = hgs.multiple_swap_star(
        np.asarray(demand_j, np.float64), np.asarray(dist_j, np.float64),
        np.asarray(paths), count=count, heu_dist=heu_dist)
    ls_costs = np.asarray(route_cost(dist_j, jnp.asarray(improved)))
    adv = jnp.asarray(ls_costs - ls_costs.mean(), jnp.float32)
    state = grad_fn(state, demand_j, dist_j, jnp.asarray(paths), adv)
    return state, float(ls_costs.mean()), float(np.asarray(raw_costs).mean())


CVRP_NLS_CAPACITY = {1: 10, 20: 30, 50: 40, 100: 50, 400: 150,
                     1000: 200, 2000: 300}   # cvrp_nls/utils.py:5-10


def train_cvrp_nls(n_nodes: int, *, epochs: int = 5, steps_per_epoch: int = 20,
                   lr: float = 1e-4, n_ants: int = 20, k_sparse: int = 5,
                   seed: int = 0, ls_count: int | None = None,
                   progress: Callable | None = None):
    """Full CVRP-NLS training driver (reference cvrp_nls/train.py:67-151
    envelope): per step, generate one instance, sample on device, refine all
    ants with the native SWAP* engine, REINFORCE on the LS costs only.
    Returns (model, TrainState)."""
    from deepaco_tpu.models.gnn import Net

    cap = [v for k, v in sorted(CVRP_NLS_CAPACITY.items()) if k <= n_nodes][-1]
    rng_np = np.random.default_rng(seed)

    def gen_instance():
        coords = rng_np.random((n_nodes + 1, 2)).astype(np.float32)
        dist = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
        np.fill_diagonal(dist, 1e-10)
        demand = np.concatenate(
            [[0.0], rng_np.integers(1, 10, n_nodes)]).astype(np.float32) / cap
        return demand, dist.astype(np.float32)

    model = Net()
    demand0, dist0 = gen_instance()
    g = builders.cvrp_nls_graph(jnp.asarray(demand0), jnp.asarray(dist0),
                                k=k_sparse)
    variables = model.init(jax.random.PRNGKey(seed), g, train=False)
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adamw(lr))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    sample_fn, grad_fn = make_cvrp_nls_train_fns(
        model, tx, k_sparse=k_sparse, n_ants=n_ants)
    key = jax.random.PRNGKey(seed)
    ls_cost = float("nan")
    for ep in range(epochs):
        for _ in range(steps_per_epoch):
            demand, dist = gen_instance()
            key, k2 = jax.random.split(key)
            state, ls_cost, _ = cvrp_nls_train_step(
                state, sample_fn, grad_fn, demand, dist, k2,
                ls_count=ls_count)
        if progress is not None:
            progress(ep, ls_cost)
    return model, state
