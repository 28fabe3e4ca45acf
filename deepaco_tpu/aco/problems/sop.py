"""Sequential Ordering Problem plug-in: precedence-constrained permutation.

Reference semantics (sop/aco.py:4-180): fixed start node 0; per-ant precedence
state — the reference carries a dense ``[ants, n, n]`` tensor whose column k
is zeroed when k is visited (sop/aco.py:172-180), and a node j is available
when its row is all zero (128,151). Here that state is compressed to the
equivalent unvisited-predecessor *count* ``[ants, n]``: visiting k subtracts
``prec[:, k]``; available when count == 0 (same fixed point, O(ants*n) memory
instead of O(ants*n^2)). Cost = directed consecutive path sum
(sop/aco.py:101-112); deposits directed consecutive pairs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO


def sop_spec(phe: jax.Array, heu: jax.Array, prec: jax.Array,
             n_ants: int, alpha: float = 1.0,
             beta: float = 1.0) -> RolloutSpec:
    """``prec[j, k] = 1`` iff k must precede j (reference preceding_mat_gen,
    sop/utils.py:31-38)."""
    from deepaco_tpu.aco.problems.tsp import clear_onehot, score_matrix

    n = phe.shape[0]
    ants = jnp.arange(n_ants)
    prec = prec.astype(jnp.int32)
    score = score_matrix(phe, heu, alpha, beta)

    def init(rng):
        start = jnp.zeros((n_ants,), jnp.int32)
        counts = jnp.broadcast_to(
            prec.sum(axis=1)[None, :], (n_ants, n)).astype(jnp.int32)
        counts = counts - prec[:, 0][None, :]          # visit node 0
        visit_mask = jnp.ones((n_ants, n), phe.dtype).at[:, 0].set(0.0)
        return (start, visit_mask, counts), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        _, visit_mask, counts = state
        return visit_mask * (counts == 0).astype(phe.dtype)

    def step(state, actions):
        _, visit_mask, counts = state
        visit_mask = clear_onehot(visit_mask, actions)
        counts = counts - prec[:, actions].T           # zero column = decrement
        return (actions, visit_mask, counts)

    return RolloutSpec(horizon=n - 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def sop_cost(dist: jax.Array, paths: jax.Array) -> jax.Array:
    """Directed path sum without wraparound (sop/aco.py:101-112)."""
    u = paths.T
    return jnp.sum(dist[u[:, :-1], u[:, 1:]], axis=1)


class SOPACO(ProblemACO):
    """Facade mirroring reference sop/aco.py ACO."""

    def __init__(self, distances, prec_mat, n_ants: int = 20,
                 decay: float = 0.9, alpha: float = 1.0, beta: float = 1.0,
                 elitist: bool = False, min_max: bool = False,
                 heuristic=None, seed: int = 0):
        distances = jnp.asarray(distances, jnp.float32)
        n = distances.shape[0]
        if heuristic is None:
            heuristic = 1.0 / (distances + 1e-10)
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max,
                        cyclic=False, symmetric=False)
        data = {"dist": distances, "heu": heuristic,
                "prec": jnp.asarray(prec_mat, jnp.int32)}
        super().__init__(cfg, data, n_states=n, horizon=n - 1, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return sop_spec(tau, data["heu"], data["prec"], cfg.n_ants,
                        alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return sop_cost(data["dist"], paths)
