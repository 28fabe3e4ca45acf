#!/usr/bin/env python
"""RCPSP j30 seed sweep (VERDICT r4 #4): train S seeds inside the reference
envelope (rcpsp/train.ipynb: 20 ants, 100 epochs x 32 steps), select on the
20-instance train-split validation set (never the test split), then report
the winner's full 100-instance test-split protocol number.

Usage: python scripts/rcpsp_seed_sweep.py seed1 [seed2 ...]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from deepaco_tpu.core.rcpsp import load_psplib  # noqa: E402
from deepaco_tpu.eval.rcpsp import evaluate_rcpsp  # noqa: E402
from deepaco_tpu.train.special import train_rcpsp  # noqa: E402
from deepaco_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from deepaco_tpu.utils.compcache import enable  # noqa: E402

ARCHIVE = "/root/reference/data/rcpsp/psplib.tar.gz"


def main():
    enable()
    seeds = [int(s) for s in sys.argv[1:]] or [2, 3, 4]
    train_insts = load_psplib(ARCHIVE, "j30rcp", split="train")
    horizon = max(d.t_max for d in train_insts)
    train_insts = [d._replace(t_max=horizon) for d in train_insts]
    val_insts = train_insts[:20]
    results = {}
    for seed in seeds:
        t0 = time.time()
        _, state = train_rcpsp(
            train_insts, epochs=100, steps_per_epoch=32, n_ants=20,
            lr=3e-4, seed=seed,
            progress=lambda ep, c: (
                print(f"seed {seed} epoch {ep}: {c:.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
                if ep % 20 == 0 else None))
        path = f"checkpoints/rcpsp30_seed{seed}.msgpack"
        save_checkpoint(path, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        means, _ = evaluate_rcpsp(val_insts, variables, t_values=(1, 10, 100))
        v = float(np.asarray(means)[-1])
        results[seed] = v
        print(f"seed {seed}: val@T=100 {v:.3f} ({time.time() - t0:.0f}s)",
              flush=True)
    best = min(results, key=results.get)
    print(f"val winner: seed {best} ({results[best]:.3f}); "
          f"test-split protocol:", flush=True)
    from deepaco_tpu.utils.checkpoint import load_checkpoint
    from deepaco_tpu.train.special import train_rcpsp as _t  # noqa: F401

    test_insts = load_psplib(ARCHIVE, "j30rcp", split="test")
    h2 = max(d.t_max for d in test_insts)
    test_insts = [d._replace(t_max=h2) for d in test_insts]
    import flax.serialization as ser  # noqa: F401

    # reuse the state from the winning seed (still in scope if last; else
    # reload via the template of the final state)
    if best == seeds[-1]:
        win_vars = variables
    else:
        win_state = load_checkpoint(f"checkpoints/rcpsp30_seed{best}.msgpack",
                                    state)
        win_vars = {"params": win_state.params,
                    "batch_stats": win_state.batch_stats}
    means, _ = evaluate_rcpsp(test_insts, win_vars)
    means = [round(float(v), 3) for v in np.asarray(means)]
    print(json.dumps({"winner_seed": best, "val": results,
                      "test_means_T1_10_20_30_40_50_100": means}))


if __name__ == "__main__":
    main()
