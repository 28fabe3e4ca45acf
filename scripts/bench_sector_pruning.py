#!/usr/bin/env python
"""A/B the native LS's polar-sector SWAP* pruning (VERDICT r2 weak #5).

The round-2 addition (cvrp_ls.cpp route_sector/sectors_overlap, re-derived
from the published HGS idea, reference LocalSearch.cpp:485-627 +
CircleSector.h) prunes SWAP* to route pairs whose depot-polar sectors
overlap. ``coords=None`` in the binding disables it (the engine then falls
back to pair-version memos only), giving a clean A/B on identical inputs.

Pure host benchmark (no TPU): golden CVRP-NLS instances, initial solutions
from a greedy sweep construction, one ``count``-capped improve call per
instance. Prints per-scale wall time and final costs for both arms.

Usage: python scripts/bench_sector_pruning.py [scales...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from deepaco_tpu.ls.hgs import swapstar  # noqa: E402
from deepaco_tpu.utils import golden  # noqa: E402


def route_cost(dist, routes):
    c = 0.0
    for r in routes:
        prev = 0
        for v in r:
            c += dist[prev, int(v)]
            prev = int(v)
        c += dist[prev, 0]
    return c


def sweep_routes(coords, demands, capacity):
    """Polar-angle sweep construction: sort customers by angle, cut routes
    at capacity — a standard CVRP seed solution."""
    n = coords.shape[0]
    ang = np.arctan2(coords[1:, 1] - coords[0, 1], coords[1:, 0] - coords[0, 0])
    order = np.argsort(ang) + 1
    routes, cur, load = [], [], 0.0
    for v in order:
        if load + demands[v] > capacity and cur:
            routes.append(np.asarray(cur, np.int64))
            cur, load = [], 0.0
        cur.append(int(v))
        load += demands[v]
    if cur:
        routes.append(np.asarray(cur, np.int64))
    return routes


def main():
    scales = [int(s) for s in sys.argv[1:]] or [100, 500, 1000, 2000]
    n_inst = 5
    count = 10000
    out = {}
    for n in scales:
        ds = golden.GOLDEN["cvrp_nls"](n)
        rows = []
        for arm in ("pruned", "unpruned"):
            t0 = time.time()
            costs = []
            for i in range(n_inst):
                dist = np.asarray(ds["dist"][i], np.float64)
                demands = np.asarray(ds["demand"][i], np.float64)
                coords = np.asarray(ds["coords"][i], np.float64)
                routes = sweep_routes(coords, demands, 1.0)
                improved = swapstar(
                    demands, dist, routes, count=count,
                    coords=coords if arm == "pruned" else None)
                costs.append(route_cost(dist, improved))
            wall = time.time() - t0
            rows.append((arm, wall, float(np.mean(costs))))
            print(f"n={n} {arm:9s}: {wall:7.2f}s over {n_inst} instances, "
                  f"mean cost {np.mean(costs):.4f}", flush=True)
        out[n] = {"pruned_s": round(rows[0][1], 2),
                  "unpruned_s": round(rows[1][1], 2),
                  "speedup": round(rows[1][1] / max(rows[0][1], 1e-9), 2),
                  "pruned_cost": round(rows[0][2], 4),
                  "unpruned_cost": round(rows[1][2], 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
