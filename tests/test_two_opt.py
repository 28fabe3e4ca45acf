"""2-opt / NLS kernel tests, including exact parity with a numpy port of the
reference numba kernel (tsp_nls/two_opt.py:6-39 — best-improvement scan +
segment flip; numba itself is not installed, the loop is re-stated in numpy).
"""
import numpy as np

import jax.numpy as jnp

from deepaco_tpu.ops.two_opt import (
    batched_nls,
    batched_two_opt,
    heuristic_dist,
    two_opt_once,
)


def ref_two_opt_once(distmat, tour):
    """Straight numpy transcription of the reference kernel's semantics."""
    n = tour.shape[0]
    p = q = 0
    delta = 0.0
    for i in range(1, n - 1):
        for j in range(i + 1, n):
            node_i, node_j = tour[i], tour[j]
            node_prev, node_next = tour[i - 1], tour[(j + 1) % n]
            if node_prev == node_j or node_next == node_i:
                continue
            change = (distmat[node_prev, node_j] + distmat[node_i, node_next]
                      - distmat[node_prev, node_i] - distmat[node_j, node_next])
            if change < delta:
                p, q, delta = i, j, change
    if delta < -1e-6:
        tour = tour.copy()
        tour[p:q + 1] = tour[p:q + 1][::-1]
        return tour, delta
    return tour, 0.0


def ref_two_opt(distmat, tour, max_iterations):
    it, ch = 0, -1.0
    while ch < -1e-6 and it < max_iterations:
        tour, ch = ref_two_opt_once(distmat, tour)
        it += 1
    return tour


def instance(n, seed):
    rng = np.random.default_rng(seed)
    coords = rng.random((n, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e9)
    return d


def test_single_move_matches_reference():
    for seed in range(5):
        d = instance(15, seed)
        rng = np.random.default_rng(100 + seed)
        tour = rng.permutation(15).astype(np.int32)
        ours, delta = two_opt_once(jnp.asarray(d), jnp.asarray(tour))
        ref, ref_delta = ref_two_opt_once(d, tour)
        np.testing.assert_array_equal(np.asarray(ours), ref)
        np.testing.assert_allclose(float(delta), ref_delta, rtol=1e-4, atol=1e-6)


def test_full_descent_matches_reference():
    d = instance(20, 7)
    rng = np.random.default_rng(3)
    tours = np.stack([rng.permutation(20) for _ in range(6)]).astype(np.int32)
    ours = np.asarray(batched_two_opt(jnp.asarray(d), jnp.asarray(tours), 50))
    for a in range(6):
        ref = ref_two_opt(d, tours[a].copy(), 50)
        np.testing.assert_array_equal(ours[a], ref)


def tour_len(d, t):
    return sum(d[t[i], t[i - 1]] for i in range(len(t)))


def test_nls_improves_and_stays_valid():
    d = instance(30, 11)
    heu = (1.0 / d).astype(np.float32)
    hd = heuristic_dist(jnp.asarray(heu))
    rng = np.random.default_rng(4)
    tours = np.stack([rng.permutation(30) for _ in range(4)]).astype(np.int32)
    base = np.asarray(batched_two_opt(jnp.asarray(d), jnp.asarray(tours), 100))
    out = np.asarray(batched_nls(jnp.asarray(d), hd, jnp.asarray(tours),
                                 100, 3, 10))
    for a in range(4):
        assert sorted(out[a]) == list(range(30))
        # NLS must never be worse than plain 2-opt output
        assert tour_len(d, out[a]) <= tour_len(d, base[a]) + 1e-4
