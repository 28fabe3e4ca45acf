"""Engine-level unit tests: greedy decode, teacher-forced log-probs,
score_rows/prob_rows consistency.
"""
import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import (
    greedy_rollout,
    masked_logits,
    path_log_probs,
    rollout,
)
from deepaco_tpu.aco.problems.tsp import tsp_spec, tour_cost


def instance(n, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.random((n, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e9)
    return jnp.asarray(d)


def test_greedy_rollout_is_deterministic_nearest_neighbor():
    d = instance(12, 0)
    heu = 1.0 / d
    spec = tsp_spec(jnp.ones_like(d), heu, n_ants=4, fixed_start=0)
    ro1 = greedy_rollout(spec, jax.random.PRNGKey(0))
    ro2 = greedy_rollout(spec, jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(ro1.paths), np.asarray(ro2.paths))
    # with tau=1 the greedy decode is exactly nearest-neighbor
    p = np.asarray(ro1.paths)[:, 0]
    d_np = np.asarray(d)
    visited = {0}
    cur = 0
    for step in range(1, 12):
        cands = [j for j in range(12) if j not in visited]
        nn = min(cands, key=lambda j: d_np[cur, j])
        assert p[step] == nn
        visited.add(nn)
        cur = nn


def test_path_log_probs_match_rollout_log_probs():
    """Teacher-forcing the sampled actions must reproduce the sampled
    log-probs exactly (fixed start => deterministic init state)."""
    d = instance(10, 1)
    heu = 1.0 / d
    spec = tsp_spec(jnp.ones_like(d), heu, n_ants=6, fixed_start=0, beta=1.5)
    ro = rollout(spec, jax.random.PRNGKey(3), require_prob=True)
    lp = path_log_probs(spec, ro.paths, beta=1.5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ro.log_probs),
                               rtol=1e-5, atol=1e-6)


def test_score_rows_equals_prob_rows_math():
    """The precomputed score matrix path must equal alpha*log(phe)+beta*log(heu)."""
    d = instance(8, 2)
    heu = 1.0 / d
    phe = jnp.asarray(np.random.default_rng(0).random((8, 8)) + 0.5,
                      jnp.float32)
    spec = tsp_spec(phe, heu, n_ants=3, fixed_start=0, alpha=1.3, beta=0.7)
    state, _ = spec.init(jax.random.PRNGKey(0))
    via_score = jnp.where(spec.mask(state) > 0, spec.score_rows(state), -1e30)
    pr, hr = spec.prob_rows(state)
    via_rows = masked_logits(pr, hr, spec.mask(state), 1.3, 0.7)
    np.testing.assert_allclose(np.asarray(via_score), np.asarray(via_rows),
                               rtol=1e-5)
