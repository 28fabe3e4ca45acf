"""Adaptive-elitist CVRP baseline tests (reference cvrp/aco.py adaptive=True)."""
import numpy as np

import jax.numpy as jnp

from deepaco_tpu.aco.adaptive_cvrp import (
    AdaptiveCVRPACO,
    get_subroutes,
    insertion,
    insertion_single,
    merge_subroutes,
)
from deepaco_tpu.aco.problems.cvrp import CVRPACO, validate_routes


def make_instance(n=20, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.concatenate([[[0.5, 0.5]], rng.random((n, 2))]).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e-10)
    demand = np.concatenate([[0.0], rng.integers(1, 10, n)]).astype(np.float32)
    return d, demand


def test_subroute_roundtrip():
    path = np.array([0, 3, 1, 0, 2, 5, 0, 0])
    subs = get_subroutes(path, end_with_zero=True)
    assert [list(s) for s in subs] == [[0, 3, 1, 0], [0, 2, 5, 0]]
    merged = merge_subroutes(subs, 8)
    assert list(merged) == [0, 3, 1, 0, 2, 5, 0, 0]


def test_insertion_builds_valid_route():
    d, _ = make_instance(10, 1)
    nodes = np.array([0, 3, 7, 2, 9])
    route, cost = insertion(np.asarray(d, np.float64), nodes)
    assert route[0] == 0 and route[-1] == 0
    assert sorted(route[1:-1]) == sorted(nodes[1:].tolist())
    # reported cost equals actual incremental route length
    length = sum(d[route[i], route[i + 1]] for i in range(len(route) - 1))
    np.testing.assert_allclose(cost, length, rtol=1e-5, atol=1e-6)


def test_adaptive_beats_or_matches_plain_and_stays_feasible():
    d, demand = make_instance(20, 2)
    adaptive = AdaptiveCVRPACO(d, demand, n_ants=12, seed=3)
    plain = CVRPACO(d, demand, n_ants=12, seed=3)
    c_adaptive = float(adaptive.run(8))
    c_plain = float(plain.run(8))
    # adaptive phases should not hurt; typically they help
    assert c_adaptive <= c_plain * 1.05
    best = np.asarray(adaptive.state.best_path)[:, None]
    ok = np.asarray(validate_routes(jnp.asarray(best), jnp.asarray(demand),
                                    50.0))
    assert ok.all()
    # elite pool populated, bounded
    assert 1 <= len(adaptive.elite_pool) <= 5


def test_best_cost_consistent_with_best_path():
    d, demand = make_instance(15, 4)
    aco = AdaptiveCVRPACO(d, demand, n_ants=8, seed=5)
    aco.run(6)
    best = np.asarray(aco.state.best_path)
    recomputed = sum(d[best[i], best[i + 1]] for i in range(len(best) - 1))
    np.testing.assert_allclose(recomputed, float(aco.state.best_cost),
                               rtol=1e-4)
