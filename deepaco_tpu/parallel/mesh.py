"""Device-mesh parallelism: instance x ant sharding for training and search.

The reference is strictly single-process/single-device (SURVEY §2.3 — no
torch.distributed anywhere). The TPU-native scaling story is green-field:

* mesh axes ``("instance", "ant")`` — instances are the data-parallel axis,
  ants/colonies shard within an instance (every construction-step op is
  elementwise over the ant axis, so sharding ``[A, N]`` tensors over ``ant``
  needs no communication until cost reduction / pheromone deposit, which XLA
  turns into psum/all-gathers over ICI),
* gradients reduce over instances automatically (jit inserts the psum when the
  loss averages over the sharded axis),
* colony search: each device's ants deposit into a replicated pheromone via
  scatter-add + psum; global best-tour argmin is an all-reduce.

Everything is written against an abstract ``jax.sharding.Mesh``, so it runs
identically on an N-chip slice or the 8-device virtual CPU test mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec
from deepaco_tpu.train.config import ProblemConfig
from deepaco_tpu.train.reinforce import (
    TrainState,
    make_optimizer,
    reinforce_loss,
    tsp_heuristic,
)
from deepaco_tpu.utils.datasets import uniform_coords


def make_mesh(n_instance: int | None = None, n_ant: int = 1,
              devices=None) -> Mesh:
    """Build an ``(instance, ant)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_instance is None:
        n_instance = devices.size // n_ant
    grid = devices.reshape(n_instance, n_ant)
    return Mesh(grid, axis_names=("instance", "ant"))


def make_sharded_tsp_train_step(model, cfg: ProblemConfig, mesh: Mesh):
    """Data/ant-parallel TSP train step over a mesh.

    The per-step instance keys are sharded over the ``instance`` axis; the
    per-instance ant batch is shard-constrained over ``ant``; parameters stay
    replicated and the gradient mean contracts the sharded axis (XLA inserts
    the cross-device psum).
    """
    tx = make_optimizer(cfg, cfg.train.epochs * cfg.train.steps_per_epoch)
    a = cfg.aco
    inst_sharding = NamedSharding(mesh, P("instance"))
    repl = NamedSharding(mesh, P())

    def per_instance(params, batch_stats, key):
        k_inst, k_roll = jax.random.split(key)
        coords = uniform_coords(k_inst, cfg.n_nodes)
        heu, dist, new_stats = tsp_heuristic(
            model, params, batch_stats, coords,
            k_sparse=cfg.k_sparse, eps=cfg.train.eps, train=True)
        spec = tsp_spec(jnp.ones_like(heu), heu, a.n_ants)
        ro = rollout(spec, k_roll, alpha=a.alpha, beta=a.beta,
                     require_prob=True)
        # ants shard over the mesh "ant" axis (ants are independent until the
        # baseline mean, which psums over the axis)
        log_probs = jax.lax.with_sharding_constraint(
            ro.log_probs, NamedSharding(mesh, P(None, "ant")))
        costs = tour_cost(dist, ro.paths)
        loss = reinforce_loss(costs, log_probs, a.n_ants)
        return loss, new_stats, jnp.mean(costs)

    @functools.partial(jax.jit,
                       in_shardings=(repl, inst_sharding),
                       out_shardings=(repl, repl))
    def train_step(state: TrainState, keys: jax.Array):
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
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), mean_cost

    return train_step


def shard_colony_search(mesh: Mesh):
    """Sharding helpers for multi-device anytime search: instances over the
    ``instance`` axis (each device runs whole colonies; the mean-cost
    reduction is the only collective)."""
    return {
        "instances": NamedSharding(mesh, P("instance")),
        "replicated": NamedSharding(mesh, P()),
    }


def multi_colony_tsp_search(mesh: Mesh, heuristic, distances,
                            cfg, rng, *, n_rounds: int, sync_every: int,
                            axis: str = "instance",
                            migrate_weight: float = 1.0,
                            blend: float = 0.0):
    """Island-model ACO over the device mesh (SURVEY §5's colony sharding).

    One colony per device along ``axis``: each runs ``sync_every`` independent
    ACO iterations on its own pheromone (device-local RNG stream), then the
    colonies synchronize over ICI —

    * **best-tour migration**: ``all_gather`` of per-colony bests, global
      argmin, and an elitist deposit of the global best tour into every
      colony's pheromone (weight ``migrate_weight / cost``);
    * optional **pheromone blending**: ``tau <- (1-blend)*tau +
      blend*pmean(tau)`` mixes the colony matrices (an allreduce over ICI).

    ``migrate_weight=0, blend=0`` degrades to fully independent colonies
    (global best is still tracked — pure parallel restarts). Returns the
    globally-best cost after each round, ``[n_rounds]`` (replicated).
    """
    from jax.experimental.shard_map import shard_map

    from deepaco_tpu.aco import pheromone as ph
    from deepaco_tpu.aco.runner import init_search, run_anytime

    n = distances.shape[0]
    repl = P()

    def colony_fn(heu, dist, key):
        from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec

        spec_factory = lambda tau: tsp_spec(tau, heu, cfg.n_ants, None,
                                            alpha=cfg.alpha, beta=cfg.beta)
        cost_fn = functools.partial(tour_cost, dist)
        # device-local RNG stream: fold in the colony index
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        state = init_search(n, n - 1, cfg)

        def round_body(state, k):
            state, _ = run_anytime(spec_factory, cost_fn, cfg, state, k,
                                   sync_every)
            costs = jax.lax.all_gather(state.best_cost, axis)
            paths = jax.lax.all_gather(state.best_path, axis)
            gi = jnp.argmin(costs)
            gcost, gpath = costs[gi], paths[gi]
            tau = state.phe.tau
            if migrate_weight > 0.0:
                tau = ph.deposit(tau, gpath[:, None],
                                 jnp.atleast_1d(migrate_weight / gcost))
            if blend > 0.0:
                tau = (1.0 - blend) * tau + blend * jax.lax.pmean(tau, axis)
            phe = state.phe._replace(tau=tau)
            if cfg.min_max:
                # re-assert the MAX-MIN invariant after the migration deposit
                # / blend (otherwise tau can transiently exceed tau_max)
                phe = ph.min_max_clamp(phe, cfg.tau_min)
            state = state._replace(phe=phe,
                                   best_cost=gcost, best_path=gpath)
            return state, gcost

        keys = jax.random.split(key, n_rounds)
        _, curve = jax.lax.scan(round_body, state, keys)
        return curve

    fn = shard_map(colony_fn, mesh=mesh,
                   in_specs=(repl, repl, repl), out_specs=repl,
                   check_rep=False)
    return jax.jit(fn)(jnp.asarray(heuristic, jnp.float32),
                       jnp.asarray(distances, jnp.float32), rng)
