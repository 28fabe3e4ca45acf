"""Orienteering Problem plug-in: prize maximization under a tour-length budget.

Reference semantics (op/aco.py:5-224): node 0 is the start/end depot; a dummy
terminal node ``n`` is appended (op/aco.py:65-86) with distance 0 from
everywhere, 1e10 back to real nodes, and heuristic 0 from dummy to real /
1 into dummy — so finished ants sink there at zero cost. The feasibility mask
forbids any candidate from which the ant could not return to the depot within
``max_len`` (op/aco.py:199-220 — a per-ant Python loop in the reference,
re-derived here as one vectorized comparison). Objective = sum of collected
prizes (maximize); deposits are ``Q * obj`` with ``Q = 1/sum(prizes)``
(op/aco.py:53,130-145).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO
from deepaco_tpu.core.graph import sparse_distance_matrix


def extend_op_instance(dist, prizes, heu):
    """Append the dummy terminal node (reference add_dummy_node, op/aco.py:65-86)."""
    n = dist.shape[0]
    dist = jnp.concatenate([dist, jnp.full((1, n), 1e10, dist.dtype)], axis=0)
    dist = jnp.concatenate([dist, jnp.zeros((n + 1, 1), dist.dtype)], axis=1)
    prizes = jnp.concatenate([prizes, jnp.zeros((1,), prizes.dtype)])
    heu = jnp.concatenate([heu, jnp.zeros((1, n), heu.dtype)], axis=0)
    heu = jnp.concatenate([heu, jnp.ones((n + 1, 1), heu.dtype)], axis=1)
    return dist, prizes, heu


def op_spec(phe: jax.Array, heu: jax.Array, dist: jax.Array,
            max_len: float, n_ants: int, alpha: float = 1.0,
            beta: float = 1.0) -> RolloutSpec:
    """``dist``/``heu``/``phe`` are the extended ``[n+1, n+1]`` arrays."""
    from deepaco_tpu.aco.problems.tsp import score_matrix

    m = phe.shape[0]             # m = n_real + 1 (dummy at index m-1)
    dummy = m - 1
    ants = jnp.arange(n_ants)
    score = score_matrix(phe, heu, alpha, beta)

    def update_mask(mask, travel, cur):
        mask = mask.at[ants, cur].set(0.0)
        # can the ant go to each candidate and still return to the depot?
        trails = travel[:, None] + dist[cur] + dist[:, 0][None, :]  # [A, m]
        feasible = (trails <= max_len).astype(mask.dtype)
        at_dummy = (cur == dummy)[:, None]
        real = mask.at[:, dummy].set(0.0)
        mask = jnp.where(at_dummy, mask, real * feasible)
        mask = mask.at[:, dummy].set(0.0)
        go2dummy = jnp.all(mask[:, :dummy] == 0.0, axis=1)
        return mask.at[:, dummy].set(go2dummy.astype(mask.dtype))

    def init(rng):
        start = jnp.zeros((n_ants,), jnp.int32)
        travel = jnp.zeros((n_ants,), dist.dtype)
        mask = update_mask(jnp.ones((n_ants, m), phe.dtype), travel, start)
        return (start, travel, mask), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        return state[2]

    def step(state, actions):
        cur, travel, mask = state
        travel = travel + dist[cur, actions]
        mask = update_mask(mask, travel, actions)
        return (actions, travel, mask)

    return RolloutSpec(horizon=m, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def op_objective(prizes: jax.Array, paths: jax.Array) -> jax.Array:
    """Total prize per ant (op/aco.py:151-158); revisited dummy adds 0 but a
    node can appear at most once otherwise (visit mask)."""
    return jnp.sum(prizes[paths.T], axis=1)


def op_default_heuristic(dist, prizes, k_sparse: int):
    """Classic baseline prior ``prizes / sparsified_dist`` (op/aco.py:90-107)."""
    return prizes[None, :] / sparse_distance_matrix(dist, k_sparse)


class OPACO(ProblemACO):
    """Facade mirroring reference op/aco.py ACO."""

    def __init__(self, distances, prizes, max_len, n_ants: int = 20,
                 decay: float = 0.9, alpha: float = 1.0, beta: float = 1.0,
                 elitist: bool = False, min_max: bool = False,
                 heuristic=None, k_sparse: int | None = None, seed: int = 0):
        distances = jnp.asarray(distances, jnp.float32)
        prizes = jnp.asarray(prizes, jnp.float32)
        if heuristic is None:
            assert k_sparse, "classic OP baseline needs k_sparse (op/aco.py:60-62)"
            heuristic = op_default_heuristic(distances, prizes, k_sparse)
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        q = float(1.0 / prizes.sum())
        dist_e, prizes_e, heu_e = extend_op_instance(distances, prizes, heuristic)
        m = dist_e.shape[0]
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max, maximize=True,
                        cyclic=False, symmetric=False)
        data = {"dist": dist_e, "prizes": prizes_e, "heu": heu_e,
                "max_len": jnp.asarray(max_len, jnp.float32),
                "q": jnp.asarray(q, jnp.float32),
                # tau_max scale n*Q (op/aco.py:121-124), traced so one compile
                # serves every instance of a given size
                "mm_scale": jnp.asarray((m - 1) * q, jnp.float32)}
        super().__init__(cfg, data, n_states=m, horizon=m, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return op_spec(tau, data["heu"], data["dist"],
                       data["max_len"], cfg.n_ants,
                       alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return op_objective(data["prizes"], paths)

    @classmethod
    def extras(cls, data):
        return {"q": data["q"], "mm_scale": data["mm_scale"]}
