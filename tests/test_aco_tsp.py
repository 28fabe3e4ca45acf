"""ACO engine tests on TSP: tour validity, cost math, search progress,
strategy variants, and equivalence of Gumbel-max with categorical sampling.

Reference behaviors under test: tsp/aco.py:74-177 (run/sample/gen_path) and the
smoke protocol at tsp/aco.py:181-188.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepaco_tpu.aco import ACO, rollout
from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec


def random_instance(n, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.random((n, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    return coords, jnp.asarray(d)


def test_paths_are_permutations():
    _, d = random_instance(12)
    aco = ACO(d, n_ants=8, seed=1)
    costs, log_probs, paths = aco.sample()
    paths = np.asarray(paths)
    assert paths.shape == (12, 8)
    for a in range(8):
        assert sorted(paths[:, a]) == list(range(12))
    assert np.asarray(log_probs).shape == (11, 8)
    assert np.all(np.asarray(log_probs) <= 0)


def test_tour_cost_matches_numpy():
    _, d = random_instance(10)
    aco = ACO(d, n_ants=4, seed=2)
    costs, _, paths = aco.sample()
    d_np, p = np.asarray(d), np.asarray(paths)
    for a in range(4):
        u = p[:, a]
        expect = sum(d_np[u[i], u[i - 1]] for i in range(10))
        np.testing.assert_allclose(float(costs[a]), expect, rtol=1e-5)


def test_run_improves_and_tracks_best():
    _, d = random_instance(20, seed=3)
    aco = ACO(d, n_ants=16, seed=3)
    aco.sparsify(k_sparse=8)
    c1 = float(aco.run(1))
    c20 = float(aco.run(19))
    assert c20 <= c1
    # best path must be a valid tour whose cost equals the reported best
    path = np.asarray(aco.shortest_path)
    assert sorted(path) == list(range(20))
    recomputed = float(tour_cost(d, jnp.asarray(path)[:, None])[0])
    np.testing.assert_allclose(recomputed, float(aco.lowest_cost), rtol=1e-5)


@pytest.mark.parametrize("kwargs", [dict(elitist=True), dict(min_max=True),
                                    dict(elitist=True, min_max=True)])
def test_strategy_variants_run(kwargs):
    _, d = random_instance(15, seed=4)
    aco = ACO(d, n_ants=8, seed=4, **kwargs)
    cost = float(aco.run(10))
    assert np.isfinite(cost)
    tau = np.asarray(aco.state.phe.tau)
    assert np.all(tau > 0)
    if kwargs.get("min_max"):
        assert float(aco.state.phe.tau_max) > 0
        assert tau.max() <= float(aco.state.phe.tau_max) * (1 + 1e-5)


def test_gumbel_sampling_matches_categorical_distribution():
    """First-move marginals must match phe^a * heu^b * mask probabilities."""
    n, n_ants = 6, 4000
    _, d = random_instance(n, seed=5)
    heu = 1.0 / d
    phe = jnp.ones((n, n))
    # beta folds into the spec's precomputed score matrix (score_rows path)
    spec = tsp_spec(phe, heu, n_ants, fixed_start=0, beta=2.0)
    ro = rollout(spec, jax.random.PRNGKey(0), require_prob=True)
    first_moves = np.asarray(ro.paths[1])  # step after fixed start 0

    probs = np.array(heu[0] ** 2.0)
    probs[0] = 0.0
    probs /= probs.sum()
    freq = np.bincount(first_moves, minlength=n) / n_ants
    np.testing.assert_allclose(freq, probs, atol=0.03)

    # log_probs at step 0 must equal log of those probabilities
    lp = np.asarray(ro.log_probs[0])
    np.testing.assert_allclose(np.exp(lp), probs[first_moves], rtol=2e-3)


def test_pheromone_deposit_symmetric_and_decayed():
    _, d = random_instance(8, seed=6)
    aco = ACO(d, n_ants=2, decay=0.5, seed=6)
    aco.run(1)
    tau = np.asarray(aco.state.phe.tau)
    np.testing.assert_allclose(tau, tau.T, rtol=1e-5)  # symmetric deposits
    # every entry >= decayed baseline of 0.5 (init 1.0 * decay)
    assert tau.min() >= 0.5 - 1e-6
