"""TSP plug-in for the rollout engine (reference tsp/aco.py, tsp_nls/aco.py).

State: (current node [A], visit mask [A, N]). Horizon = N-1 steps after the
start node; start is uniform-random per ant (tsp/aco.py:141) or fixed node 0
for the NLS pipeline (tsp_nls/aco.py:191).

Hot-loop shape: pheromone and heuristic are constant within an iteration, so
``alpha*log(tau) + beta*log(eta)`` is folded into ONE score matrix outside
the construction scan (the reference's prob-matrix precompute,
tsp_nls/aco.py:195-207); each step then costs one row-gather + a vectorized
one-hot mask clear — no scatters inside the scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clear_onehot(mask: jax.Array, actions: jax.Array) -> jax.Array:
    """``mask[a, actions[a]] = 0`` without a scatter (VPU compare+select)."""
    n = mask.shape[-1]
    hit = jnp.arange(n, dtype=actions.dtype)[None, :] == actions[:, None]
    return jnp.where(hit, 0.0, mask)


def score_matrix(phe: jax.Array, heu: jax.Array, alpha: float,
                 beta: float) -> jax.Array:
    """Combined log-score matrix (floored away from subnormals)."""
    return (alpha * jnp.log(jnp.maximum(phe, 1e-30))
            + beta * jnp.log(jnp.maximum(heu, 1e-30)))


def tsp_spec(phe: jax.Array, heu: jax.Array, n_ants: int,
             fixed_start: int | None = None, alpha: float = 1.0,
             beta: float = 1.0):
    from deepaco_tpu.aco.engine import RolloutSpec

    n = phe.shape[0]
    score = score_matrix(phe, heu, alpha, beta)

    def init(rng):
        if fixed_start is None:
            start = jax.random.randint(rng, (n_ants,), 0, n)
        else:
            start = jnp.full((n_ants,), fixed_start, dtype=jnp.int32)
        mask = clear_onehot(jnp.ones((n_ants, n), phe.dtype), start)
        return (start, mask), start

    def prob_rows(state):
        cur, _ = state
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        return state[1]

    def step(state, actions):
        _, mask = state
        return actions, clear_onehot(mask, actions)

    return RolloutSpec(horizon=n - 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def tour_cost(dist: jax.Array, paths: jax.Array) -> jax.Array:
    """Cyclic tour lengths; ``paths`` is ``[N, A]`` (reference tsp/aco.py:120-132)."""
    u = paths.T
    v = jnp.roll(u, shift=1, axis=1)
    return jnp.sum(dist[u, v], axis=1)
