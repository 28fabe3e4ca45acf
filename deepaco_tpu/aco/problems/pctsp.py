"""Prize-Collecting TSP plug-in: minimize tour length + unvisited penalties.

Reference semantics (pctsp/aco.py:6-188): node 0 is the depot (start); the
depot is gated shut until the ant has collected ``min_prizes = n/4`` prize or
visited every node (pctsp/aco.py:172-184); arriving at the depot parks the ant
(all regular nodes masked, depot self-loop open). Objective = consecutive path
length + sum of penalties of never-visited nodes (pctsp/aco.py:120-129).
Prior heuristic = ``(1e-10 + prize) / dist`` with diag 1e9 (pctsp/aco.py:54-56).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO


def pctsp_spec(phe: jax.Array, heu: jax.Array, prizes: jax.Array,
               min_prizes: jax.Array, n_ants: int, alpha: float = 1.0,
               beta: float = 1.0) -> RolloutSpec:
    from deepaco_tpu.aco.problems.tsp import score_matrix

    n = phe.shape[0]
    ants = jnp.arange(n_ants)
    score = score_matrix(phe, heu, alpha, beta)

    def update_masks(visit_mask, depot_mask, cur, collected):
        visit_mask = visit_mask.at[ants, cur].set(0.0)
        at_depot = cur == 0
        # at depot: unmask depot (park), mask all regular nodes
        visit_mask = visit_mask.at[:, 0].set(
            jnp.where(at_depot, 1.0, visit_mask[:, 0]))
        visit_mask = jnp.where(
            at_depot[:, None],
            visit_mask.at[:, 1:].set(0.0).at[:, 0].set(1.0), visit_mask)
        all_visited = jnp.all(visit_mask[:, 1:] == 0.0, axis=1)
        open_depot = (~at_depot) & ((collected > min_prizes) | all_visited)
        depot_mask = depot_mask.at[:, 0].set(
            jnp.where(open_depot, 1.0, depot_mask[:, 0]))
        return visit_mask, depot_mask

    def init(rng):
        start = jnp.zeros((n_ants,), jnp.int32)
        visit_mask = jnp.ones((n_ants, n), phe.dtype)
        depot_mask = jnp.ones((n_ants, n), phe.dtype).at[:, 0].set(0.0)
        collected = jnp.zeros((n_ants,), phe.dtype)
        # reference gen_sol does NOT run update_mask before the first pick:
        # the depot gate alone blocks node 0; visit_mask[:, 0] must stay 1 so
        # the depot is selectable once the gate opens (pctsp/aco.py:135-146)
        return (start, visit_mask, depot_mask, collected), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        _, visit_mask, depot_mask, _ = state
        return visit_mask * depot_mask

    def step(state, actions):
        _, visit_mask, depot_mask, collected = state
        collected = collected + prizes[actions]
        visit_mask, depot_mask = update_masks(
            visit_mask, depot_mask, actions, collected)
        return (actions, visit_mask, depot_mask, collected)

    return RolloutSpec(horizon=n + 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def pctsp_objective(dist, prizes, penalties, paths) -> jax.Array:
    """Length + unvisited penalty (pctsp/aco.py:107-129)."""
    u = paths.T                                    # [A, L]
    length = jnp.sum(dist[u[:, :-1], u[:, 1:]], axis=1)
    n = prizes.shape[0]
    visited = jax.nn.one_hot(u, n, dtype=jnp.float32).sum(axis=1) > 0  # [A, n]
    penalty = jnp.sum(jnp.where(visited, 0.0, penalties[None, :]), axis=1)
    return length + penalty


class PCTSPACO(ProblemACO):
    """Facade mirroring reference pctsp/aco.py ACO."""

    def __init__(self, distances, prizes, penalties, n_ants: int = 20,
                 decay: float = 0.9, alpha: float = 1.0, beta: float = 1.0,
                 elitist: bool = False, min_max: bool = False,
                 heuristic=None, seed: int = 0):
        distances = jnp.asarray(distances, jnp.float32)
        prizes = jnp.asarray(prizes, jnp.float32)
        penalties = jnp.asarray(penalties, jnp.float32)
        n = distances.shape[0]
        if heuristic is None:
            d = jnp.where(jnp.eye(n, dtype=bool), 1e9, distances)
            heuristic = (1e-10 + prizes[None, :]) / d
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max,
                        cyclic=False, symmetric=False,
                        mm_scale=float(n - 1))
        data = {"dist": distances, "prizes": prizes, "penalties": penalties,
                "heu": heuristic,
                "min_prizes": jnp.asarray(n / 4.0, jnp.float32)}
        super().__init__(cfg, data, n_states=n, horizon=n + 1, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return pctsp_spec(tau, data["heu"], data["prizes"],
                          data["min_prizes"], cfg.n_ants,
                          alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return pctsp_objective(data["dist"], data["prizes"],
                               data["penalties"], paths)
