"""Generic train/eval drivers over the problem-family registry.

ONE REINFORCE trainer and ONE anytime evaluator replace the reference's 13
per-problem ``train.py``/``test.py`` drivers (SURVEY §2.1 #21-22). Both are
fully jitted: the per-step program (graph build → GNN forward → rollout →
advantage → gradient) is one XLA computation vmapped over the instance
micro-batch; evaluation scans all T iterations on-device and vmaps over the
dataset.
"""
from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco.runner import init_search, run_anytime
from deepaco_tpu.families import Family, get_family
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.train.config import ProblemConfig
from deepaco_tpu.train.reinforce import TrainState, make_optimizer


def family_model(family: Family) -> Net:
    if family.model_ctor is not None:
        return family.model_ctor(**dict(family.model_kwargs))
    return Net(**dict(family.model_kwargs))


def gen_batch(family: Family, rng: np.random.Generator, n: int,
              batch_size: int) -> dict:
    """Host-side instance batch: dict of stacked arrays [B, ...]."""
    insts = [family.gen(rng, n) for _ in range(batch_size)]
    return {k: np.stack([np.asarray(i[k]) for i in insts])
            for k in insts[0]}


def _forward_heu(family, model, params, batch_stats, inst, k_sparse, train):
    """graph → GNN → heuristic matrix (+ updated batch stats)."""
    if family.forward is not None:
        return family.forward(model, {"params": params,
                                      "batch_stats": batch_stats},
                              inst, k_sparse, train)
    g = family.graph(inst, k_sparse)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, upd = model.apply(variables, g, train=True,
                               mutable=["batch_stats"])
        new_stats = upd["batch_stats"]
    else:
        out = model.apply(variables, g, train=False)
        new_stats = batch_stats
    out = out[1] if isinstance(out, tuple) else out
    return family.heu_matrix(g, out, inst), new_stats


def make_family_train_step(family: Family, model: Net, cfg: ProblemConfig):
    """Jitted REINFORCE step over a stacked instance batch.

    Loss per instance: ``sum(sign * (costs - mean) * sum_t logp) / n_ants``
    with sign flipped for maximization (mkp/train.py:29). RCPSP-style loss
    scaling can be layered via cfg (see rcpsp driver).
    """
    tx = make_optimizer(cfg, cfg.train.epochs * cfg.train.steps_per_epoch)
    a = cfg.aco
    sign = -1.0 if family.aco.maximize else 1.0

    def per_instance(params, batch_stats, inst, key):
        # full-precision matmuls for the REINFORCE step: the reference
        # trains in fp32, and TPU-default bf16 gradients diverge on the
        # bf16-sensitive node-update-disabled nets (smtwtp100: val WORSENED
        # 65->73 over 5 epochs on TPU while the identical fp32 CPU run
        # converged 163->66 in 60 steps). Kernels that pin an explicit
        # precision (the fused Pallas VJP) are unaffected.
        with jax.default_matmul_precision("highest"):
            inst = family.prepare(inst)
            heu, new_stats = _forward_heu(
                family, model, params, batch_stats, inst, cfg.k_sparse, True)
            tau = jnp.ones_like(heu)
            spec = family.spec(tau, heu, inst, a.n_ants)
            ro = rollout(spec, key, alpha=family.aco.alpha,
                         beta=family.aco.beta, require_prob=True)
            costs = family.cost(ro.paths, inst)
            adv = jax.lax.stop_gradient(sign * (costs - jnp.mean(costs)))
            loss = jnp.sum(adv * jnp.sum(ro.log_probs, axis=0)) / a.n_ants
        return loss, new_stats, jnp.mean(costs)

    @jax.jit
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, b)

        def loss_fn(params):
            losses, stats, mons = jax.vmap(
                per_instance, in_axes=(None, None, 0, 0))(
                    params, state.batch_stats, batch, keys)
            stats = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0),
                                           stats)
            return jnp.mean(losses), (stats, jnp.mean(mons))

        (_, (new_stats, mean_cost)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), mean_cost

    return train_step


def init_family_state(family: Family, model: Net, cfg: ProblemConfig,
                      rng_np: np.random.Generator) -> TrainState:
    inst = {k: jnp.asarray(v)
            for k, v in family.gen(rng_np, cfg.n_nodes).items()}
    if family.model_init is not None:
        variables = family.model_init(model, jax.random.PRNGKey(cfg.train.seed),
                                      family.prepare(inst), cfg.k_sparse)
    else:
        g = family.graph(family.prepare(inst), cfg.k_sparse)
        variables = model.init(jax.random.PRNGKey(cfg.train.seed), g,
                               train=False)
    tx = make_optimizer(cfg, cfg.train.epochs * cfg.train.steps_per_epoch)
    return TrainState(params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32))


def train_family(family_name: str, cfg: ProblemConfig,
                 progress: Callable | None = None,
                 val_instances: int = 0, val_t: int = 10,
                 ckpt_path: str | None = None,
                 logger=None) -> TrainState:
    """Full training driver for any registered family.

    ``val_instances > 0`` enables the reference's per-epoch validation +
    best/last checkpoint selection (tsp_nls/train.py:99-122): a fixed
    held-out batch (separate RNG stream) is swept with the anytime protocol
    at ``t=val_t`` after every epoch; the best-so-far epoch is written to
    ``<stem>-best.msgpack`` and every epoch to ``<stem>-last.msgpack``.
    ``logger``: optional ``utils.metrics.MetricsLogger`` — emits
    ``train_epoch`` / ``val`` events to the JSONL stream.
    """
    family = get_family(family_name)
    model = family_model(family)
    rng_np = np.random.default_rng(cfg.train.seed)
    state = init_family_state(family, model, cfg, rng_np)
    step_fn = make_family_train_step(family, model, cfg)
    rng = jax.random.PRNGKey(cfg.train.seed + 1)

    val_batch = None
    if val_instances > 0:
        # held-out stream, disjoint from training by construction
        val_batch = gen_batch(family, np.random.default_rng(cfg.train.seed
                                                            + 777_777),
                              cfg.n_nodes, val_instances)
    best_val = np.inf
    sign = -1.0 if family.aco.maximize else 1.0

    def _validate(st):
        means, _ = evaluate_family(
            family_name, val_batch, n_nodes=cfg.n_nodes,
            variables={"params": st.params, "batch_stats": st.batch_stats},
            k_sparse=cfg.k_sparse, n_ants=cfg.aco.n_ants,
            t_values=(val_t,), seed=cfg.train.seed)
        return float(np.asarray(means)[0])

    for epoch in range(cfg.train.epochs):
        for _ in range(cfg.train.steps_per_epoch):
            batch = gen_batch(family, rng_np, cfg.n_nodes,
                              cfg.train.batch_size)
            rng, key = jax.random.split(rng)
            state, cost = step_fn(state, batch, key)
        if logger is not None:
            logger.log("train_epoch", epoch=epoch, mean_cost=float(cost))
        if val_batch is not None:
            val = _validate(state)
            if logger is not None:
                logger.log("val", epoch=epoch, t=val_t, mean_best=val)
            if ckpt_path is not None:
                from deepaco_tpu.utils.checkpoint import save_checkpoint

                stem = ckpt_path[:-len(".msgpack")] \
                    if ckpt_path.endswith(".msgpack") else ckpt_path
                save_checkpoint(f"{stem}-last.msgpack", state)
                if sign * val < best_val:
                    best_val = sign * val
                    save_checkpoint(f"{stem}-best.msgpack", state)
            if progress is not None:
                progress(epoch, float(cost), val)
                continue
        if progress is not None:
            progress(epoch, float(cost))
    return state


# ------------------------------------------------------------- evaluation --
@functools.lru_cache(maxsize=None)
def _family_with_ants(family_name: str, n_ants: int) -> Family:
    """Cached so repeated evaluate_family calls hit the same jit cache entry
    (Family is hashed by object identity in jit static args)."""
    family = get_family(family_name)
    return family._replace(aco=family.aco._replace(n_ants=n_ants))



@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _eval_family(family: Family, model, k_sparse: int, t_max: int,
                 n_nodes: int, variables, batch: dict, rng: jax.Array):
    n_states, horizon = family.horizon_states(n_nodes)

    def per_instance(inst, key):
        inst = family.prepare(inst)
        if model is None:
            heu = family.classic_heu(inst, k_sparse)
        else:
            heu, _ = _forward_heu(
                family, model, variables["params"],
                variables.get("batch_stats", {}), inst, k_sparse, False)
        spec_factory = lambda tau: family.spec(tau, heu, inst,
                                               family.aco.n_ants)
        cost_fn = lambda paths: family.cost(paths, inst)
        state = init_search(n_states, horizon, family.aco)
        if family.aco.vector_pheromone:
            # PH_items: per-item vector pheromone (mkp_transformer/aco.py:44)
            tau0 = jnp.ones((n_states,), jnp.float32)
            if family.aco.min_max:
                tau0 = tau0 * family.aco.tau_min
            state = state._replace(phe=state.phe._replace(tau=tau0))
        _, curve = run_anytime(spec_factory, cost_fn, family.aco, state,
                               key, t_max, **family.extras(inst))
        return curve

    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(per_instance)(batch, keys)


def evaluate_family(family_name: str, batch: dict, *, n_nodes: int,
                    variables=None, k_sparse: int | None = None,
                    n_ants: int = 20,
                    t_values=(1, 10, 20, 30, 40, 50, 100), seed: int = 0,
                    mesh=None, b_chunk: int | None = None):
    """Anytime protocol over a dataset batch for any family.

    ``variables=None`` runs the classic-ACO A/B baseline. Returns
    (mean best-so-far at each t, full [B, t_max] curves).

    ``mesh``: a ``jax.sharding.Mesh`` with an ``"instance"`` axis — the batch
    shards across devices (colony sharding: each device sweeps its share of
    instances end-to-end; the only cross-device op is the final mean).

    ``b_chunk``: evaluate instances in blocks of this size, one device
    program per block (the TPU worker watchdog kills multi-minute programs;
    100 instances x T=100 at n=500 is one otherwise). Defaults to the whole
    batch below n=500, else blocks of ~10k ant-rollouts.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    family = _family_with_ants(family_name, n_ants)
    if k_sparse is None:
        k_sparse = family.k_sparse(n_nodes)
    model = None if variables is None else family_model(family)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if mesh is not None:
        sharding = NamedSharding(mesh, P("instance"))
        batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        if variables is not None:
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
    t_max = int(max(t_values))
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b_chunk is None:
        # ~15M ant-construction-steps per device program (~60-90s at n=500):
        # multi-minute programs trip the TPU worker watchdog and crash the
        # relay worker (measured: 100 instances x T=100 x 20 ants at n=500
        # in one program -> UNAVAILABLE worker crash). The budget counts the
        # family's ROLLOUT HORIZON, not n_nodes — CVRP's horizon is 2n, so
        # an n_nodes-based budget ran ~2x over and still crashed the worker.
        _, horizon = family.horizon_states(n_nodes)
        # Chunk whenever the whole batch would exceed the budget — no
        # size-threshold gate (tsp500's horizon is n-1=499, which a
        # `horizon < 500` gate let through unchunked at ~100M ant-steps).
        b_chunk = b if mesh is not None else \
            min(b, max(1, 15_000_000 // max(n_ants * t_max * horizon, 1)))
    if b_chunk >= b:
        curves = _eval_family(family, model, k_sparse, t_max, n_nodes,
                              variables, batch, jax.random.PRNGKey(seed))
    else:
        blocks = []
        for s in range(0, b, b_chunk):
            chunk = {k: v[s:s + b_chunk] for k, v in batch.items()}
            real = jax.tree_util.tree_leaves(chunk)[0].shape[0]
            if real < b_chunk:   # pad to the jitted shape; sliced off below
                chunk = {k: jnp.concatenate(
                    [v, jnp.repeat(v[:1], b_chunk - real, axis=0)])
                    for k, v in chunk.items()}
            cur = _eval_family(family, model, k_sparse, t_max, n_nodes,
                               variables, chunk,
                               jax.random.fold_in(jax.random.PRNGKey(seed), s))
            blocks.append(np.asarray(cur)[:real])
        curves = jnp.asarray(np.concatenate(blocks, axis=0))
    idx = jnp.asarray([t - 1 for t in t_values])
    return jnp.mean(curves[:, idx], axis=0), curves
