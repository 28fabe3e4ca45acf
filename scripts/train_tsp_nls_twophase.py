#!/usr/bin/env python
"""Two-phase TSP-NLS trainer: sample+LS with no grad, then teacher-forced
REINFORCE (engine.path_log_probs) — the cvrp_nls trainer's structure
(train/special.py) applied to TSP-NLS.

Exists to unblock n=1000: the one-phase trainer traces the NLS kernel
inside value_and_grad, where the whole-descent kernel's scoped VMEM
overflows at npad=1024 (results/train_tsp_nls1000.log). Here the LS runs
in a plain no-grad jit (the same vmap-over-batch program the inference
path uses at n=1000), and the grad pass replays the sampled paths through
``path_log_probs`` — no Pallas kernel anywhere near the autodiff graph.
Advantage = 0.95*(ls - mean_ls) + 0.05*(raw - mean_raw)
(tsp_nls/train.py:33-35); AdamW + cosine + clip 3.0, lr 6e-4.

Usage: python scripts/train_tsp_nls_twophase.py [epochs] [n_nodes]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from deepaco_tpu.aco.engine import path_log_probs, rollout  # noqa: E402
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec  # noqa: E402
from deepaco_tpu.models.gnn import Net  # noqa: E402
from deepaco_tpu.ops.pallas_two_opt import batched_nls_euclid  # noqa: E402
from deepaco_tpu.ops.two_opt import heuristic_dist  # noqa: E402
from deepaco_tpu.train.config import (ACOSettings, ProblemConfig,  # noqa: E402
                                      TrainConfig)
from deepaco_tpu.train.reinforce import (TrainState,  # noqa: E402
                                         init_train_state, make_optimizer,
                                         tsp_heuristic)
from deepaco_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from deepaco_tpu.utils.compcache import enable  # noqa: E402
from deepaco_tpu.utils.datasets import uniform_coords  # noqa: E402

W = 0.95


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    enable()
    jax.config.update("jax_default_prng_impl", "rbg")
    batch, n_ants, steps = 20, 30, 20
    cfg = ProblemConfig(
        name="tsp_nls", n_nodes=n, k_sparse=n // 10,
        aco=ACOSettings(n_ants=n_ants),
        train=TrainConfig(lr=6e-4, epochs=epochs, steps_per_epoch=steps,
                          batch_size=batch, cosine_schedule=True, seed=0))
    model = Net()
    tx = make_optimizer(cfg, epochs * steps)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0),
                             nls_graph=True)

    @jax.jit
    def sample_fn(params, batch_stats, keys):
        def per_inst(key):
            k_inst, k_roll = jax.random.split(key)
            coords = uniform_coords(k_inst, n)
            heu, dist, _ = tsp_heuristic(
                model, params, batch_stats, coords, k_sparse=cfg.k_sparse,
                eps=cfg.train.eps, train=False, nls_graph=True)
            spec = tsp_spec(jnp.ones_like(heu), heu, n_ants, 0)
            ro = rollout(spec, k_roll, alpha=1.0, beta=1.0,
                         require_prob=False)
            raw = tour_cost(dist, ro.paths)
            return coords, dist, heuristic_dist(heu), ro.paths, raw
        coords_b, dist_b, hd_b, paths_b, raw_b = jax.vmap(per_inst)(keys)
        # LS via lax.map, NOT vmap: the whole-matrix NLS kernel's scoped
        # VMEM overflows at npad=1024 under a batch vmap (18.5 vs 16 MB) but
        # fits per instance — the same program the inference facade runs
        tours_b = jax.lax.map(
            lambda args: batched_nls_euclid(args[0], args[1], args[2],
                                            max(n // 4, 1), 10, 20),
            (coords_b, hd_b, jnp.swapaxes(paths_b, 1, 2)))
        ls_b = jax.vmap(tour_cost)(dist_b, jnp.swapaxes(tours_b, 1, 2))
        adv_b = (W * (ls_b - jnp.mean(ls_b, axis=1, keepdims=True))
                 + (1.0 - W) * (raw_b - jnp.mean(raw_b, axis=1,
                                                 keepdims=True)))
        return coords_b, paths_b, adv_b, jnp.mean(ls_b)

    @jax.jit
    def grad_fn(state: TrainState, coords_b, paths_b, adv_b):
        def loss_fn(params):
            def per_inst(coords, paths, adv):
                heu, _, new_stats = tsp_heuristic(
                    model, params, state.batch_stats, coords,
                    k_sparse=cfg.k_sparse, eps=cfg.train.eps, train=True,
                    nls_graph=True)
                spec = tsp_spec(jnp.ones_like(heu), heu, n_ants, 0)
                logp = path_log_probs(spec, paths)
                loss = jnp.sum(jax.lax.stop_gradient(adv)
                               * jnp.sum(logp, axis=0)) / n_ants
                return loss, new_stats
            losses, stats = jax.vmap(per_inst)(coords_b, paths_b, adv_b)
            stats = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0),
                                           stats)
            return jnp.mean(losses), stats
        (_, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1)

    out_dir = os.environ.get("DEEPACO_CKPT_DIR", "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    out = f"{out_dir}/tsp_nls{n}_selftrained.msgpack"
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    for ep in range(1, epochs + 1):
        ls_means = []
        for _ in range(steps):
            rng, k = jax.random.split(rng)
            keys = jax.random.split(k, batch)
            coords_b, paths_b, adv_b, lsm = sample_fn(
                state.params, state.batch_stats, keys)
            state = grad_fn(state, coords_b, paths_b, adv_b)
            ls_means.append(float(lsm))
        save_checkpoint(out.replace(".msgpack", "-last.msgpack"), state)
        print(f"epoch {ep}: mean LS cost {np.mean(ls_means):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    save_checkpoint(out, state)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
