"""Pheromone update strategies as pure functions over a small state pytree.

Covers every variant in the reference as strategy flags (SURVEY §2.1 #5-#18):
Ant-System all-ant deposit, elitist best-ant deposit (tsp/aco.py:95-118),
MAX-MIN clamping (tsp/aco.py:29-44, 84-88, 116-118), directed CVRP deposits
(cvrp/aco.py:106-130), reward-proportional deposits for maximization problems
(op/aco.py:130-145 ``Q*obj``; bpp/aco.py:99-119 fitness), and the MKP
``PH_items`` per-item vector pheromone (mkp_transformer/aco.py:85-99).

Deposits use ``at[...].add`` scatter-adds — XLA lowers these to on-device
sorted-segment updates; duplicate edges accumulate exactly as torch index_add
would (the reference's fancy-index ``+=`` relies on the same semantics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PheromoneState(NamedTuple):
    """Matrix pheromone + MAX-MIN bookkeeping (tau_max < 0 means unset)."""

    tau: jax.Array          # [N, N] (or [M] for PH_items vector variant)
    tau_max: jax.Array      # scalar; only meaningful for min_max


def init_pheromone(n: int, min_max: bool = False, tau_min: float = 0.1,
                   dtype=jnp.float32) -> PheromoneState:
    """Init to ones (reference tsp/aco.py:37-42); MAX-MIN inits to tau_min."""
    tau = jnp.ones((n, n), dtype=dtype)
    if min_max:
        tau = tau * tau_min
    return PheromoneState(tau=tau, tau_max=jnp.asarray(-1.0, dtype))


def tour_edges(paths: jax.Array, cyclic: bool = True):
    """Edge endpoints (u, v) of each ant's tour; ``paths`` is ``[L, A]``.

    ``cyclic=True`` matches ``path, roll(path, 1)`` (tsp/aco.py:106): L edges
    including the closing edge. ``cyclic=False`` yields the L-1 directed
    consecutive edges (cvrp/aco.py:111-115 ``path[:-1] -> roll(-1)[:-1]``).
    """
    u = paths.T                                   # [A, L]
    if cyclic:
        v = jnp.roll(u, shift=1, axis=1)
        return u, v
    return u[:, :-1], u[:, 1:]


def deposit(tau: jax.Array, paths: jax.Array, amounts: jax.Array, *,
            cyclic: bool = True, symmetric: bool = True,
            use_pallas: bool | None = None) -> jax.Array:
    """Scatter-add ``amounts[a]`` onto every edge of ant ``a``'s path.

    The symmetric variant deposits one direction and adds the transpose:
    scatter-add is linear, so ``at[u,v].add(w)`` + ``at[v,u].add(w)`` equals
    ``D + D^T`` exactly — and one 1M-element scatter + a transpose pass is
    ~40% cheaper than two scatters on TPU (scatters are per-element
    latency-bound; the transpose rides full HBM bandwidth).

    On TPU with a full ant batch, even one scatter is the hot spot of the
    whole ACO update, so the deposit routes to a scatter-free Pallas kernel
    (one-hot endpoint matrices contracted on the MXU — exact up to fp32
    summation order, see ``ops.pallas_kernels.tour_deposit_pallas``);
    single-ant deposits (elitist) keep the scatter.
    """
    if use_pallas is None:
        # the kernel keeps the full [N, N] deposit matrix + the [A, L] edge
        # lists in VMEM — n=2001 (cvrp_nls2000) measured 18.07 MB, OOM
        n = tau.shape[-1]
        fits_vmem = (n * n + 2 * paths.size) * 4 < 14_000_000
        use_pallas = (jax.default_backend() == "tpu" and tau.ndim == 2
                      and paths.shape[1] > 1 and fits_vmem)
    if use_pallas:
        from deepaco_tpu.ops.pallas_kernels import tour_deposit_pallas

        d = tour_deposit_pallas(paths, amounts, tau.shape[0], cyclic=cyclic)
    else:
        u, v = tour_edges(paths, cyclic)
        w = jnp.broadcast_to(amounts[:, None], u.shape)
        d = jnp.zeros_like(tau).at[u, v].add(w)
    if symmetric:
        d = d + jnp.swapaxes(d, -1, -2)
    return tau + d


def as_update(state: PheromoneState, paths: jax.Array, costs: jax.Array, *,
              decay: float, cyclic: bool = True, symmetric: bool = True,
              q: float = 1.0, maximize: bool = False,
              div_ants: bool = False,
              cost_offset: float = 0.0) -> PheromoneState:
    """Ant-System: evaporate then all ants deposit.

    Minimization deposits ``q/cost`` (tsp/aco.py:109-114); maximization
    problems deposit ``q*objective`` (op/aco.py:130-145); BPP divides the
    all-ant deposit by n_ants (bpp/aco.py:117).
    """
    amounts = q * costs if maximize else q / (costs + cost_offset)
    if div_ants:
        amounts = amounts / costs.shape[0]
    tau = deposit(state.tau * decay, paths, amounts,
                  cyclic=cyclic, symmetric=symmetric)
    return state._replace(tau=tau)


def elitist_update(state: PheromoneState, paths: jax.Array, costs: jax.Array, *,
                   decay: float, cyclic: bool = True, symmetric: bool = True,
                   q: float = 1.0, maximize: bool = False,
                   div_ants: bool = False,
                   cost_offset: float = 0.0) -> PheromoneState:
    """Elitist: evaporate, only the iteration-best ant deposits (tsp/aco.py:103-107)."""
    best = jnp.argmax(costs) if maximize else jnp.argmin(costs)
    best_path = paths[:, best][:, None]
    best_cost = costs[best][None]
    amounts = q * best_cost if maximize else q / (best_cost + cost_offset)
    tau = deposit(state.tau * decay, best_path, amounts,
                  cyclic=cyclic, symmetric=symmetric)
    return state._replace(tau=tau)


def min_max_clamp(state: PheromoneState, tau_min: float) -> PheromoneState:
    """Clamp into [tau_min, tau_max] (reference tsp/aco.py:116-118)."""
    tau = jnp.where(state.tau_max > 0,
                    jnp.clip(state.tau, tau_min, state.tau_max), state.tau)
    return state._replace(tau=tau)


def min_max_on_new_best(state: PheromoneState, best_cost: jax.Array,
                        scale: float, maximize: bool = False) -> PheromoneState:
    """On a new global best: tau_max = scale / best_cost (minimization,
    tsp/aco.py:84-88) or scale * best_obj (maximization, op/aco.py:121-124);
    the first time, the matrix is rescaled so its max equals tau_max."""
    new_max = scale * best_cost if maximize else scale / best_cost
    cur_max = jnp.max(state.tau)
    tau = jnp.where(state.tau_max > 0, state.tau, state.tau * new_max / cur_max)
    return PheromoneState(tau=tau, tau_max=new_max.astype(state.tau.dtype))


def vector_deposit(tau: jax.Array, picks: jax.Array, amounts: jax.Array) -> jax.Array:
    """PH_items vector pheromone: deposit on every selected item
    (reference mkp_transformer/aco.py:85-99); ``picks`` is ``[L, A]``."""
    w = jnp.broadcast_to(amounts[None, :], picks.shape)
    return tau.at[picks].add(w)
