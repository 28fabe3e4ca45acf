"""A/B: our native LS (ls/native/cvrp_ls.cpp) vs the reference libhgscvrp.

Feeds IDENTICAL constructed routes for golden CVRP100 instances to both
local searches with the inference budget (count=100000) and compares final
route costs and wall time. Isolates whether the +1.5% cvrp_nls100 gap vs
the reference protocol comes from the LS tier.

Usage: python scripts/ab_native_ls.py [n_instances]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch


def route_cost(dist, routes):
    total = 0.0
    for r in routes:
        r = np.asarray(r)
        total += float(dist[r[:-1], r[1:]].sum())
    return total


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from deepaco_tpu.ls.hgs import swapstar as our_swapstar
    from deepaco_tpu.utils import golden

    ds = golden.GOLDEN["cvrp_nls"](100)
    # reference binding (its own wrapper + prebuilt .so; /tmp route files)
    ref_dir = "/root/reference/cvrp_nls"
    cwd = os.getcwd()
    os.chdir(ref_dir)
    sys.path.insert(0, ref_dir)
    import swapstar as ref_swapstar  # noqa: E402

    os.chdir(cwd)

    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_inst):
        dist = np.asarray(ds["dist"][i], np.float64)
        demand = np.asarray(ds["demand"][i], np.float64)
        coords = np.asarray(ds["coords"][i], np.float64)
        n = dist.shape[0] - 1
        # nearest-neighbor-ish construction with capacity 1.0 (normalized)
        perm = rng.permutation(np.arange(1, n + 1))
        routes, cur, load = [], [0], 0.0
        for c in perm:
            if load + demand[c] > 1.0:
                cur.append(0)
                routes.append(np.asarray(cur))
                cur, load = [0], 0.0
            cur.append(int(c))
            load += demand[c]
        cur.append(0)
        routes.append(np.asarray(cur))
        base = route_cost(dist, routes)
        customers = [r[1:-1].astype(np.int32) for r in routes]

        t0 = time.time()
        ours = our_swapstar(demand, dist,
                            [c.copy() for c in customers], count=100000,
                            coords=coords, time_limit_s=120.0)
        t_ours = time.time() - t0
        c_ours = route_cost(dist, [np.concatenate([[0], r, [0]])
                                   for r in ours])

        t0 = time.time()
        ref_routes = [torch.as_tensor(r) for r in routes]
        theirs = ref_swapstar.swapstar(
            torch.as_tensor(demand), torch.as_tensor(dist),
            torch.as_tensor(coords), ref_routes, count=100000)
        t_ref = time.time() - t0
        c_ref = route_cost(dist, [np.asarray(r) for r in theirs])

        rows.append((base, c_ours, t_ours, c_ref, t_ref))
        print(f"inst {i}: start {base:.3f} | ours {c_ours:.3f} "
              f"({t_ours:.2f}s) | reference {c_ref:.3f} ({t_ref:.2f}s) | "
              f"gap {100*(c_ours-c_ref)/c_ref:+.2f}%", flush=True)

    a = np.asarray(rows)
    print(f"mean: ours {a[:,1].mean():.3f} ({a[:,2].mean():.2f}s)  "
          f"reference {a[:,3].mean():.3f} ({a[:,4].mean():.2f}s)  "
          f"gap {100*(a[:,1].mean()-a[:,3].mean())/a[:,3].mean():+.2f}%")


if __name__ == "__main__":
    main()
