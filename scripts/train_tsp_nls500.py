#!/usr/bin/env python
"""Self-train TSP-NLS at n=500 inside the reference envelope
(tsp_nls/train.py:138-141 defaults: lr 6e-4 cosine, 30 ants, batch 20,
20 steps/epoch, 20 epochs, grad-clip 3.0, NLS-shaped advantage W=0.95).

Adds what the reference's driver has and train_tsp lacks: per-epoch
validation on the golden val split (NLS anytime, tsp_nls/train.py:84-92)
with -best/-last checkpointing (tsp_nls/train.py:118-122), so a multi-hour
run survives interruption and the committed weights are val-selected.

Usage: python scripts/train_tsp_nls500.py [epochs] [n_nodes]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from deepaco_tpu.aco.runner import ACOConfig  # noqa: E402
from deepaco_tpu.eval.anytime import evaluate_tsp  # noqa: E402
from deepaco_tpu.models.gnn import Net  # noqa: E402
from deepaco_tpu.train.config import (ACOSettings, ProblemConfig,  # noqa: E402
                                      TrainConfig)
from deepaco_tpu.train.reinforce import (init_train_state,  # noqa: E402
                                         make_tsp_train_step,
                                         nls_local_search)
from deepaco_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from deepaco_tpu.utils.compcache import enable as enable_cache  # noqa: E402


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    enable_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = ProblemConfig(
        name="tsp_nls", n_nodes=n, k_sparse=n // 10,
        aco=ACOSettings(n_ants=30),
        train=TrainConfig(lr=6e-4, epochs=epochs, steps_per_epoch=20,
                          batch_size=20, cosine_schedule=True, seed=0))
    model = Net()
    try:
        from deepaco_tpu.utils.datasets import load_tsp_dataset

        val_coords = load_tsp_dataset(n, "val")[:5]
    except Exception:
        val_coords = np.random.default_rng(123).random((5, n, 2), np.float32)
    val_t = (1, 3)

    def validate(variables):
        means, _ = evaluate_tsp(val_coords, model=model, variables=variables,
                                k_sparse=cfg.k_sparse,
                                cfg=ACOConfig(n_ants=30), t_values=val_t,
                                seed=0, ls="nls")
        return [float(v) for v in np.asarray(means)]

    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, nls_graph=True)
    step_fn = make_tsp_train_step(model, cfg,
                                  local_search=nls_local_search())
    out_dir = os.environ.get("DEEPACO_CKPT_DIR", "checkpoints")
    out = f"{out_dir}/tsp_nls{n}_selftrained.msgpack"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    stats = validate({"params": state.params,
                      "batch_stats": state.batch_stats})
    best = tuple(reversed(stats))
    print(f"epoch 0 (init): val@T={val_t} {stats} "
          f"({time.time() - t0:.0f}s)", flush=True)
    for epoch in range(1, cfg.train.epochs + 1):
        te = time.time()
        for _ in range(cfg.train.steps_per_epoch):
            rng, key = jax.random.split(rng)
            state, cost = step_fn(state, key)
        cost = float(cost)
        stats = validate({"params": state.params,
                          "batch_stats": state.batch_stats})
        cur = tuple(reversed(stats))
        save_checkpoint(out.replace(".msgpack", "-last.msgpack"), state)
        mark = ""
        if cur <= best:
            best = cur
            save_checkpoint(out, state)
            mark = "  <- best"
        print(f"epoch {epoch}: train {cost:.4f}, val@T={val_t} {stats} "
              f"({time.time() - te:.0f}s epoch, "
              f"{time.time() - t0:.0f}s total){mark}", flush=True)
    print(f"done; best checkpoint at {out}")


if __name__ == "__main__":
    main()
