"""Large-N sparse-state TSP: [N, K] construction, coordinate costs, support
deposits, and the tiled Pallas descent that lifts the 1024-node LS ceiling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.large_tsp import (classic_knn_heuristic, deposit_knn,
                                       knn_support, run_anytime_knn,
                                       sweep_construct_knn, tour_cost_coords)
from deepaco_tpu.aco.runner import ACOConfig


@pytest.fixture(scope="module")
def inst():
    rng = np.random.default_rng(7)
    coords = jnp.asarray(rng.random((120, 2)), jnp.float32)
    nbr = knn_support(coords, 15)
    return coords, nbr


def test_knn_support_matches_dense_topk(inst):
    coords, nbr = inst
    d = np.linalg.norm(np.asarray(coords)[:, None]
                       - np.asarray(coords)[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    ref = np.argsort(d, axis=1, kind="stable")[:, :15]
    # same SET per row (top_k tie order may differ)
    got = np.sort(np.asarray(nbr), axis=1)
    np.testing.assert_array_equal(np.sort(ref, axis=1), got)


def test_knn_support_tail_rows_when_n_not_tile_multiple():
    """n=2048 makes the row tile 1953 (4M/n), so the last 95 rows are a
    partial block: with a clamped dynamic_slice they silently received
    earlier rows' neighbor lists (round-2 advisor finding)."""
    n, k = 2048, 12
    rng = np.random.default_rng(11)
    coords = jnp.asarray(rng.random((n, 2)), jnp.float32)
    nbr = np.asarray(knn_support(coords, k))
    d = np.linalg.norm(np.asarray(coords)[:, None]
                       - np.asarray(coords)[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    ref = np.argsort(d, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.sort(ref, axis=1), np.sort(nbr, axis=1))


def test_sweep_construct_knn_stats_counts_fallbacks(inst):
    coords, nbr = inst
    heu = classic_knn_heuristic(coords, nbr)
    score = jnp.log(jnp.maximum(heu, 1e-30)).astype(jnp.bfloat16)
    start = jnp.zeros((4,), jnp.int32)
    paths, n_fb = sweep_construct_knn(score, nbr, start,
                                      jax.random.PRNGKey(3), with_stats=True)
    plain = sweep_construct_knn(score, nbr, start, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(paths), np.asarray(plain))
    fb = int(n_fb)
    assert 0 <= fb <= 4 * (120 - 1)
    # small n / k=15: the endgame must hit at least one exhausted neighborhood
    assert fb > 0


def test_construction_yields_permutations(inst):
    coords, nbr = inst
    heu = classic_knn_heuristic(coords, nbr)
    score = jnp.log(jnp.maximum(heu, 1e-30)).astype(jnp.bfloat16)
    start = jnp.zeros((6,), jnp.int32)
    paths = sweep_construct_knn(score, nbr, start, jax.random.PRNGKey(0))
    assert paths.shape == (120, 6)
    for a in range(6):
        assert sorted(np.asarray(paths[:, a]).tolist()) == list(range(120))


def test_tour_cost_matches_dense(inst):
    coords, _ = inst
    d = jnp.linalg.norm(coords[:, None] - coords[None], axis=-1)
    rng = np.random.default_rng(0)
    paths = jnp.asarray(np.stack([rng.permutation(120) for _ in range(3)]).T)
    ref = jnp.sum(d[paths, jnp.roll(paths, -1, axis=0)], axis=0)
    np.testing.assert_allclose(np.asarray(tour_cost_coords(coords, paths)),
                               np.asarray(ref), rtol=1e-6)


def test_deposit_lands_on_support_and_drops_off_support(inst):
    coords, nbr = inst
    n, k = nbr.shape
    tau = jnp.ones((n, k), jnp.float32)
    # a path walking nbr[u, 0] links is fully on-support in the u->v direction
    path = [0]
    for _ in range(3):
        path.append(int(nbr[path[-1], 0]))
    paths = jnp.asarray(path + list(range(100, 100 + n - 4)))[:, None]
    amounts = jnp.asarray([2.0])
    t2 = deposit_knn(tau, nbr, paths, amounts, symmetric=False)
    for u, v in zip(path[:-1], path[1:]):
        slot = int(np.argmax(np.asarray(nbr[u]) == v))
        assert float(t2[u, slot]) >= 3.0   # 1 + 2 deposited
    # total added mass <= edges * amount (off-support edges dropped)
    added = float(jnp.sum(t2 - tau))
    assert added <= 2.0 * n + 1e-4


def test_run_anytime_knn_improves_and_tracks_best(inst):
    coords, nbr = inst
    heu = classic_knn_heuristic(coords, nbr)
    curve, best = run_anytime_knn(coords, nbr, heu, ACOConfig(n_ants=8),
                                  15, None, jax.random.PRNGKey(1))
    c = np.asarray(curve)
    assert np.all(np.diff(c) <= 1e-6)          # best-so-far is monotone
    assert c[-1] < c[0]
    assert sorted(np.asarray(best).tolist()) == list(range(120))
    np.testing.assert_allclose(
        float(tour_cost_coords(coords, best[:, None])[0]), c[-1], rtol=1e-5)


def test_tiled_descent_exact_parity_with_xla():
    """The tiled Pallas kernel (no [n, n] arrays) must reproduce the XLA
    best-improvement move sequence exactly."""
    from deepaco_tpu.ops.pallas_two_opt import _tiled_two_opt_call
    from deepaco_tpu.ops.two_opt import batched_two_opt
    from deepaco_tpu.utils.datasets import distance_matrix

    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.random((70, 2)), jnp.float32)
    tours = jnp.asarray(np.stack([rng.permutation(70) for _ in range(3)]),
                        jnp.int32)
    ref = batched_two_opt(distance_matrix(coords), tours, 10000)
    got = _tiled_two_opt_call(coords, tours, 10000)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_tiled_descent_parity_multi_tile():
    """nt >= 2 exercises the unrolled tile loops (the fori_loop version
    failed Mosaic lowering on device whenever npad/_TILE > 1 — round-2
    advisor finding). n=300 -> npad=512 -> 2 tiles."""
    from deepaco_tpu.ops.pallas_two_opt import _TILE, _tiled_two_opt_call
    from deepaco_tpu.ops.two_opt import batched_two_opt
    from deepaco_tpu.utils.datasets import distance_matrix

    n = 300
    assert -(-n // _TILE) >= 2
    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.random((n, 2)), jnp.float32)
    tours = jnp.asarray(np.stack([rng.permutation(n) for _ in range(2)]),
                        jnp.int32)
    ref = batched_two_opt(distance_matrix(coords), tours, 10000)
    got = _tiled_two_opt_call(coords, tours, 10000)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_run_anytime_knn_with_ls(inst):
    coords, nbr = inst
    heu = classic_knn_heuristic(coords, nbr)
    curve, best = run_anytime_knn(coords, nbr, heu, ACOConfig(n_ants=4),
                                  3, "2opt", jax.random.PRNGKey(2))
    c_plain, _ = run_anytime_knn(coords, nbr, heu, ACOConfig(n_ants=4),
                                 3, None, jax.random.PRNGKey(2))
    assert sorted(np.asarray(best).tolist()) == list(range(120))
    assert float(curve[-1]) < float(c_plain[-1])   # LS strictly helps here
