"""Native CVRP local-search tests: build, improve, stay feasible.

The engine (deepaco_tpu/ls/native/cvrp_ls.cpp) must strictly improve random
route solutions, never break feasibility (coverage + capacity — the
cvrp_nls/test.py:20-37 validator contract), and its SWAP* phase must find
exchanges plain RI moves cannot.
"""
import numpy as np
import pytest

from deepaco_tpu.ls import hgs


def make_instance(n_customers=30, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.concatenate([[[0.5, 0.5]], rng.random((n_customers, 2))])
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    demands = np.concatenate([[0.0], rng.integers(1, 10, n_customers)]) / 40.0
    return d, demands


def random_routes(demands, cap=1.0, seed=0):
    rng = np.random.default_rng(seed)
    customers = rng.permutation(np.arange(1, len(demands)))
    routes, cur, load = [], [], 0.0
    for c in customers:
        if load + demands[c] > cap:
            routes.append(np.array(cur, np.int32))
            cur, load = [], 0.0
        cur.append(int(c))
        load += demands[c]
    if cur:
        routes.append(np.array(cur, np.int32))
    return routes


def solution_cost(d, routes):
    c = 0.0
    for r in routes:
        if len(r):
            c += d[0, r[0]] + d[r[-1], 0]
            c += sum(d[r[i], r[i + 1]] for i in range(len(r) - 1))
    return c


def check_feasible(routes, demands, n_customers, cap=1.0):
    seen = np.concatenate([r for r in routes if len(r)])
    assert sorted(seen.tolist()) == list(range(1, n_customers + 1))
    for r in routes:
        assert demands[r].sum() <= cap + 1e-9


def test_library_builds_and_cost_agrees():
    lib = hgs.get_library()
    d, demands = make_instance(10, 1)
    routes = random_routes(demands, seed=1)
    import ctypes
    flat = np.concatenate(routes).astype(np.int32)
    lens = np.array([len(r) for r in routes], np.int32)
    c = lib.cvrp_solution_cost(
        d.shape[0],
        np.ascontiguousarray(d).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(routes))
    np.testing.assert_allclose(c, solution_cost(d, routes), rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_local_search_improves_and_feasible(seed):
    d, demands = make_instance(30, seed)
    routes = random_routes(demands, seed=seed)
    before = solution_cost(d, routes)
    out = hgs.swapstar(demands, d, routes, count=10000)
    after = solution_cost(d, out)
    assert after < before * 0.95, f"no real improvement: {before} -> {after}"
    check_feasible(out, demands, 30)


def test_swap_star_beats_ri_only():
    """Averaged over instances, enabling SWAP* must not lose to RI-only and
    should win somewhere."""
    wins = ties = 0
    for seed in range(5):
        d, demands = make_instance(40, 100 + seed)
        routes = random_routes(demands, seed=seed)
        ri = solution_cost(d, hgs.swapstar(demands, d, routes, 10000,
                                           use_swap_star=False))
        full = solution_cost(d, hgs.swapstar(demands, d, routes, 10000,
                                             use_swap_star=True))
        assert full <= ri + 1e-9
        if full < ri - 1e-9:
            wins += 1
        else:
            ties += 1
    assert wins >= 1, "SWAP* never improved over RI moves"


def test_path_roundtrip():
    path = np.array([0, 3, 1, 0, 2, 0, 0, 0])
    routes = hgs.path_to_routes(path)
    assert [r.tolist() for r in routes] == [[3, 1], [2]]
    back = hgs.routes_to_path(routes, 8)
    assert back.tolist() == [0, 3, 1, 0, 2, 0, 0, 0]


def test_multiple_swap_star_batch():
    d, demands = make_instance(20, 3)
    paths = []
    for s in range(4):
        routes = random_routes(demands, seed=s)
        paths.append(hgs.routes_to_path(routes, 2 * 20 + 1))
    paths = np.stack(paths, axis=1)
    out = hgs.multiple_swap_star(demands, d, paths, count=5000)
    assert out.shape == paths.shape
    for a in range(4):
        routes = hgs.path_to_routes(out[:, a])
        check_feasible(routes, demands, 20)
        assert (solution_cost(d, routes)
                <= solution_cost(d, hgs.path_to_routes(paths[:, a])) + 1e-9)


@pytest.mark.parametrize("seed", [0, 7])
def test_hgs_solve_full_genetic(seed):
    """Full HGS (Split + OX + education + biased-fitness population) must be
    feasible, deterministic under a seed, and beat pure local search from a
    random start (the GA tier the reference exposes via solve_cvrp,
    C_Interface.cpp:50-127)."""
    d, demands = make_instance(30, seed)
    routes, cost = hgs.solve_cvrp(demands, d, max_iters=300,
                                  no_improve_limit=120, seed=seed)
    np.testing.assert_allclose(cost, solution_cost(d, routes), rtol=1e-9)
    check_feasible(routes, demands, 30)
    # deterministic under the same seed
    routes2, cost2 = hgs.solve_cvrp(demands, d, max_iters=300,
                                    no_improve_limit=120, seed=seed)
    assert cost2 == cost
    assert [r.tolist() for r in routes2] == [r.tolist() for r in routes]
    # the GA must match or beat one local-search descent from a random start
    start = random_routes(demands, seed=seed)
    ls_only = solution_cost(d, hgs.swapstar(demands, d, start, count=100000))
    assert cost <= ls_only + 1e-9


def test_hgs_solve_tiny_and_single_route():
    """Degenerate sizes: one customer, and all customers fitting one route."""
    d = np.array([[0.0, 1.0], [1.0, 0.0]])
    demands = np.array([0.0, 0.3])
    routes, cost = hgs.solve_cvrp(demands, d, max_iters=10,
                                  no_improve_limit=5)
    assert [r.tolist() for r in routes] == [[1]]
    np.testing.assert_allclose(cost, 2.0)

    d2, dem2 = make_instance(6, 4)
    dem2 = dem2 / 10.0  # everything fits one vehicle
    routes2, cost2 = hgs.solve_cvrp(dem2, d2, max_iters=200,
                                    no_improve_limit=80, seed=1)
    check_feasible(routes2, dem2, 6)
    assert len(routes2) == 1


def test_cvrplib_parse_and_solve_cli(tmp_path, capsys):
    """CVRPLib .vrp reader + standalone solve CLI (the reference's HGS binary
    surface, InstanceCVRPLIB.cpp/main.cpp — SURVEY §2.2 N6)."""
    from deepaco_tpu.cli import main
    from deepaco_tpu.utils.convert import parse_cvrplib

    vrp = "\n".join([
        "NAME : toy", "TYPE : CVRP", "DIMENSION : 6",
        "EDGE_WEIGHT_TYPE : EUC_2D", "CAPACITY : 30",
        "NODE_COORD_SECTION",
        "1 50 50", "2 10 10", "3 90 10", "4 90 90", "5 10 90", "6 55 55",
        "DEMAND_SECTION",
        "1 0", "2 10", "3 10", "4 10", "5 10", "6 10",
        "DEPOT_SECTION", " 1", " -1", "EOF", ""])
    inst = parse_cvrplib(vrp)
    assert inst["capacity"] == 30
    assert inst["demands"][0] == 0.0 and inst["demands"][1:].sum() == 50
    np.testing.assert_allclose(inst["coords"][0], [50, 50])

    path = tmp_path / "toy.vrp"
    path.write_text(vrp)
    main(["solve-cvrp", str(path), "--max-iters", "200",
          "--no-improve", "80", "--seed", "1"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("Route #")]
    served = sorted(int(c) for ln in lines for c in ln.split(":")[1].split())
    assert served == [1, 2, 3, 4, 5], out
    cost = float([ln for ln in out.splitlines()
                  if ln.startswith("Cost")][0].split()[1])
    # hand-checked optimum for this symmetric toy is ~386.27
    assert cost <= 500.0
