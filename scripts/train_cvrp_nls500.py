#!/usr/bin/env python
"""Self-train CVRP-NLS at n=500 inside the reference envelope
(cvrp_nls/train.py defaults: lr 1e-4, 30 ants, 20 steps/epoch; epochs via
argv, reference default 50). Saves a ``-last`` snapshot every epoch so a
wall-clock cut still leaves a usable checkpoint.

Usage: python scripts/train_cvrp_nls500.py [epochs] [n_nodes]
"""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from deepaco_tpu.train.special import (cvrp_nls_train_step,  # noqa: E402
                                       make_cvrp_nls_train_fns)
from deepaco_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from deepaco_tpu.utils.compcache import enable  # noqa: E402


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    enable()
    import jax.numpy as jnp  # noqa: F401
    import optax
    from deepaco_tpu.core import builders
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.train.reinforce import TrainState
    from deepaco_tpu.train.special import CVRP_NLS_CAPACITY

    k_sparse, n_ants, lr, steps = 5, 30, 1e-4, 20
    cap = [v for k, v in sorted(CVRP_NLS_CAPACITY.items()) if k <= n][-1]
    rng_np = np.random.default_rng(0)

    def gen_instance():
        coords = rng_np.random((n + 1, 2)).astype(np.float32)
        dist = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
        np.fill_diagonal(dist, 1e-10)
        demand = np.concatenate(
            [[0.0], rng_np.integers(1, 10, n)]).astype(np.float32) / cap
        return demand, dist.astype(np.float32)

    model = Net()
    demand0, dist0 = gen_instance()
    g = builders.cvrp_nls_graph(jnp.asarray(demand0), jnp.asarray(dist0),
                                k=k_sparse)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adamw(lr))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    sample_fn, grad_fn = make_cvrp_nls_train_fns(
        model, tx, k_sparse=k_sparse, n_ants=n_ants)
    key = jax.random.PRNGKey(0)
    out = f"checkpoints/cvrp_nls{n}_selftrained.msgpack"
    t0 = time.time()
    for ep in range(epochs):
        costs = []
        for _ in range(steps):
            demand, dist = gen_instance()
            key, k2 = jax.random.split(key)
            state, ls_cost, _ = cvrp_nls_train_step(
                state, sample_fn, grad_fn, demand, dist, k2)
            costs.append(float(ls_cost))
        save_checkpoint(out.replace(".msgpack", "-last.msgpack"), state)
        print(f"epoch {ep}: mean LS cost {np.mean(costs):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    save_checkpoint(out, state)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
