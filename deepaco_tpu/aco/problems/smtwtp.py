"""SMTWTP plug-in: single-machine total weighted tardiness job sequencing.

Reference semantics (smtwtp/aco.py:5-153): jobs 1..n plus dummy start job 0;
pheromone/heuristic are ``[n+1, n+1]``; a plain visit mask over jobs (dummy
masked from the start); horizon is exactly n steps. Cost = sum over positions
of ``w * max(0, cumsum(proc) - due)`` (smtwtp/aco.py:99-109 — the reference
builds the prefix sums with an O(n^2) stack; here it is one ``cumsum``).
Deposits are directed consecutive with amount ``1/(cost+1)``
(smtwtp/aco.py:86-95); MAX-MIN uses a *static* tau_max = 1 (smtwtp/aco.py:41).
Prior heuristic = ``1/due`` broadcast row-wise (smtwtp/aco.py:50-52).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO


def smtwtp_spec(phe: jax.Array, heu: jax.Array, n_ants: int,
                alpha: float = 1.0, beta: float = 1.0) -> RolloutSpec:
    from deepaco_tpu.aco.problems.tsp import clear_onehot, score_matrix

    m = phe.shape[0]              # m = n + 1 (dummy job 0)
    ants = jnp.arange(n_ants)
    score = score_matrix(phe, heu, alpha, beta)

    def init(rng):
        start = jnp.zeros((n_ants,), jnp.int32)
        mask = jnp.ones((n_ants, m), phe.dtype).at[:, 0].set(0.0)
        return (start, mask), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        return state[1]

    def step(state, actions):
        _, mask = state
        return actions, clear_onehot(mask, actions)

    return RolloutSpec(horizon=m - 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def smtwtp_cost(processing, due, weights, paths) -> jax.Array:
    """Weighted tardiness; ``paths`` is ``[n+1, A]`` including the dummy row 0.

    Job arrays are 0-indexed over real jobs (reference shifts by the dummy,
    smtwtp/aco.py:102 ``paths - 1``).
    """
    jobs = paths.T[:, 1:] - 1                      # [A, n] real job ids
    finish = jnp.cumsum(processing[jobs], axis=1)
    tardiness = jnp.maximum(finish - due[jobs], 0.0)
    return jnp.sum(weights[jobs] * tardiness, axis=1)


class SMTWTPACO(ProblemACO):
    """Facade mirroring reference smtwtp/aco.py ACO."""

    def __init__(self, processing, due, weights, n_ants: int = 20,
                 decay: float = 0.9, alpha: float = 1.0, beta: float = 1.0,
                 elitist: bool = False, min_max: bool = False,
                 heuristic=None, seed: int = 0):
        processing = jnp.asarray(processing, jnp.float32)
        due = jnp.asarray(due, jnp.float32)
        weights = jnp.asarray(weights, jnp.float32)
        m = processing.shape[0] + 1
        if heuristic is None:
            prior = 1.0 / jnp.concatenate([jnp.ones((1,), jnp.float32), due])
            heuristic = jnp.broadcast_to(prior[None, :], (m, m))
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max,
                        cyclic=False, symmetric=False,
                        cost_offset=1.0, mm_static_max=1.0 if min_max else None)
        data = {"processing": processing, "due": due, "weights": weights,
                "heu": heuristic}
        super().__init__(cfg, data, n_states=m, horizon=m - 1, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return smtwtp_spec(tau, data["heu"], cfg.n_ants,
                           alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return smtwtp_cost(data["processing"], data["due"], data["weights"],
                           paths)
