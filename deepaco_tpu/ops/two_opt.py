"""On-device batched 2-opt and neural-guided local search (NLS).

Replaces the reference's numba host kernels (tsp_nls/two_opt.py:6-49) with a
fully vectorized formulation that runs under jit/vmap on TPU:

For tour ``t`` let ``P[i, j] = dist[t_i, t_j]`` (one gather of the distance
matrix through the tour permutation). The best-improvement 2-opt move delta
for reversing segment ``[i..j]`` is

    delta[i, j] = P[i-1, j] + P[i, j+1] - P[i-1, i] - P[j, j+1]
                = roll(P,+1,0) + roll(P,-1,1) - diag terms (broadcast),

so one iteration = one gather + O(n^2) VPU arithmetic + masked argmin +
segment flip via an index-remap gather — no scalar loops. Iterating to
convergence runs in a ``while_loop`` (per ant under ``vmap``: lock-step until
every ant's best delta >= -1e-6, exactly the reference's fixed point).

NLS (tsp_nls/aco.py:241-258): alternate 2-opt on the *heuristic* metric
``1/(heu/rowmax + 1e-5)`` (a perturbation toward what the model likes) with
re-optimization on the true metric, keeping per-ant improvements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = jnp.inf


def _two_opt_delta(dist: jax.Array, tour: jax.Array):
    """Delta matrix + validity mask for one tour. Returns ([n,n] delta)."""
    n = tour.shape[0]
    P = dist[tour][:, tour]
    P_up = jnp.roll(P, 1, axis=0)       # P_up[i, j]    = P[i-1, j]
    P_right = jnp.roll(P, -1, axis=1)   # P_right[i, j] = P[i, j+1]
    c_i = jnp.diagonal(P_up)            # P[i-1, i]
    c_j = jnp.diagonal(P_right)         # P[j, j+1]
    delta = P_up + P_right - c_i[:, None] - c_j[None, :]
    i_idx = jnp.arange(n)[:, None]
    j_idx = jnp.arange(n)[None, :]
    valid = (i_idx >= 1) & (j_idx > i_idx) & (j_idx <= n - 1)
    return jnp.where(valid, delta, BIG)


def _flip_segment(tour: jax.Array, p: jax.Array, q: jax.Array) -> jax.Array:
    idx = jnp.arange(tour.shape[0])
    rev = jnp.where((idx >= p) & (idx <= q), p + q - idx, idx)
    return tour[rev]


def two_opt_once(dist: jax.Array, tour: jax.Array):
    """One best-improvement move (reference two_opt_once, tsp_nls/two_opt.py:6-28).

    Returns (new_tour, delta) with delta = 0.0 when no improving move exists.
    """
    n = tour.shape[0]
    delta = _two_opt_delta(dist, tour)
    flat = jnp.argmin(delta)
    p, q = flat // n, flat % n
    best = delta[p, q]
    improved = best < -1e-6
    tour = jnp.where(improved, _flip_segment(tour, p, q), tour)
    return tour, jnp.where(improved, best, 0.0)


def two_opt(dist: jax.Array, tour: jax.Array, max_iterations: int):
    """Iterate to the 2-opt fixed point (reference _two_opt_python)."""

    def cond(carry):
        _, it, last = carry
        return (last < -1e-6) & (it < max_iterations)

    def body(carry):
        tour, it, _ = carry
        tour, d = two_opt_once(dist, tour)
        return tour, it + 1, d

    tour, _, _ = jax.lax.while_loop(
        cond, body, (tour, jnp.int32(0), jnp.float32(-1.0)))
    return tour


@functools.partial(jax.jit, static_argnums=2)
def batched_two_opt(dist: jax.Array, tours: jax.Array, max_iterations: int):
    """vmap over ants: ``tours`` is ``[A, n]`` (reference batched_two_opt_python)."""
    return jax.vmap(lambda t: two_opt(dist, t, max_iterations))(tours)


def heuristic_dist(heu: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Perturbation metric from the learned heuristic (tsp_nls/aco.py:228-232)."""
    return 1.0 / (heu / jnp.max(heu, axis=-1, keepdims=True) + eps)


def _tour_lengths(dist: jax.Array, tours: jax.Array) -> jax.Array:
    v = jnp.roll(tours, shift=1, axis=1)
    return jnp.sum(dist[tours, v], axis=1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def batched_nls(dist: jax.Array, heu_dist: jax.Array, tours: jax.Array,
                max_iterations: int, t_nls: int = 10, t_p: int = 20):
    """Neural-guided LS (reference nls, tsp_nls/aco.py:241-258); ``tours`` [A, n]."""
    best = jax.vmap(lambda t: two_opt(dist, t, max_iterations))(tours)
    best_cost = _tour_lengths(dist, best)

    def round_fn(carry, _):
        best, best_cost, new = carry
        pert = jax.vmap(lambda t: two_opt(heu_dist, t, t_p))(new)
        new = jax.vmap(lambda t: two_opt(dist, t, max_iterations))(pert)
        new_cost = _tour_lengths(dist, new)
        better = new_cost < best_cost
        best = jnp.where(better[:, None], new, best)
        best_cost = jnp.where(better, new_cost, best_cost)
        return (best, best_cost, new), None

    (best, best_cost, _), _ = jax.lax.scan(
        round_fn, (best, best_cost, best), None, length=t_nls)
    return best
