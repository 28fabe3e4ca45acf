#!/usr/bin/env python
"""CVRP-NLS anytime protocol (reference cvrp_nls/test.py:80-96): pretrained
checkpoint heuristic, CVRPNLSACO with native SWAP* top-k refine in the run
loop, mean best-so-far at cumulative T; every solution route-validated.

Usage: python scripts/eval_cvrp_nls.py [n_nodes] [limit] [t values...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepaco_tpu.aco.problems.cvrp_nls import CVRPNLSACO  # noqa: E402
from deepaco_tpu.core.builders import cvrp_nls_graph  # noqa: E402
from deepaco_tpu.aco.problems.cvrp import validate_routes  # noqa: E402
from deepaco_tpu.models.gnn import Net  # noqa: E402
from deepaco_tpu.models.torch_compat import load_reference_checkpoint  # noqa: E402
from deepaco_tpu.utils import golden  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ts = [int(v) for v in sys.argv[3:]] or [1, 2, 3, 5, 10]
    k = 5  # cvrp_nls customer-kNN width (cvrp_nls/utils.py:35)
    ds = golden.GOLDEN["cvrp_nls"](n)
    b = min(limit, ds["coords"].shape[0])
    model = Net()
    variables = load_reference_checkpoint(
        f"/root/reference/pretrained/cvrp_nls/cvrp{n}.pt")

    @jax.jit
    def heu_fn(coords, dist, demand):
        g = cvrp_nls_graph(demand, dist, k=k)
        out = model.apply(variables, g, train=False)
        outs = out[1] if isinstance(out, tuple) else out
        _, blocks = g
        nn = dist.shape[0]
        heu = jnp.zeros((nn, nn))
        for blk, h in zip(blocks, outs):
            src = jnp.arange(nn) if blk.src is None else blk.src
            rows = jnp.broadcast_to(src[:, None], blk.nbr.shape)
            heu = heu.at[rows, blk.nbr].set(h)
        return heu + 1e-10

    curves = []
    t0 = time.time()
    for i in range(b):
        ti = time.time()
        dist = jnp.asarray(ds["dist"][i], jnp.float32)
        demand = jnp.asarray(ds["demand"][i], jnp.float32)
        heu = heu_fn(jnp.asarray(ds["coords"][i], jnp.float32), dist, demand)
        aco = CVRPNLSACO(dist, demand, capacity=1.0, n_ants=20,
                         heuristic=heu, seed=i)
        curve, done = [], 0
        for t in ts:
            aco.run(t - done)
            done = t
            curve.append(float(aco.lowest_cost))
        best = jnp.asarray(aco.state.best_path)[:, None]
        assert bool(validate_routes(best, demand, 1.0)[0])
        curves.append(curve)
        print(f"inst {i}: {time.time()-ti:.1f}s", flush=True)
    means = np.mean(np.asarray(curves), axis=0)
    dur = time.time() - t0
    for t, v in zip(ts, means):
        print(f"T={t}, average cost is {v:.6f}.")
    print(json.dumps({"problem": "cvrp_nls", "n": n, "instances": b,
                      "t_aco": ts, "means": means.tolist(),
                      "duration_s": dur}))


if __name__ == "__main__":
    main()
