"""TSP plug-in for the rollout engine (reference tsp/aco.py, tsp_nls/aco.py).

State: (current node [A], visit mask [A, N]). Horizon = N-1 steps after the
start node; start is uniform-random per ant (tsp/aco.py:141) or fixed node 0
for the NLS pipeline (tsp_nls/aco.py:191).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec


def tsp_spec(phe: jax.Array, heu: jax.Array, n_ants: int,
             fixed_start: int | None = None) -> RolloutSpec:
    n = phe.shape[0]
    ants = jnp.arange(n_ants)

    def init(rng):
        if fixed_start is None:
            start = jax.random.randint(rng, (n_ants,), 0, n)
        else:
            start = jnp.full((n_ants,), fixed_start, dtype=jnp.int32)
        mask = jnp.ones((n_ants, n), phe.dtype).at[ants, start].set(0.0)
        return (start, mask), start

    def prob_rows(state):
        cur, _ = state
        return phe[cur], heu[cur]

    def mask_fn(state):
        return state[1]

    def step(state, actions):
        _, mask = state
        return actions, mask.at[ants, actions].set(0.0)

    return RolloutSpec(horizon=n - 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step)


def tour_cost(dist: jax.Array, paths: jax.Array) -> jax.Array:
    """Cyclic tour lengths; ``paths`` is ``[N, A]`` (reference tsp/aco.py:120-132)."""
    u = paths.T
    v = jnp.roll(u, shift=1, axis=1)
    return jnp.sum(dist[u, v], axis=1)
