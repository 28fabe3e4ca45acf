"""Multiple Knapsack Problem plug-ins: PH_suc (pairwise pheromone) and
PH_items (per-item vector pheromone).

Reference semantics:
* mkp/aco.py:5-183 (PH_suc): items 0..n-1 plus dummy n; construction starts at
  a uniform-random item (mkp/aco.py:118), then picks condition on the
  previously picked item's pheromone row; the knapsack mask removes picked
  items and any item that would overflow *any* of the m capacity dimensions
  (capacity = n//2, mkp/aco.py:174-181 — a per-ant Python loop in the
  reference, one vectorized comparison here); the dummy stays closed until no
  real item fits (mkp/aco.py:155-160), then the ant parks on it. Deposits:
  directed consecutive pairs, ``Q*obj`` with ``Q = 1/sum(prize)``, floor
  1e-10, static MAX-MIN tau_max = 20 (mkp/aco.py:42,85-101).
* mkp_transformer/aco.py:5-178 (PH_items): pheromone is a vector ``[n+1]``;
  every pick (including the first) is history-free over
  ``phe^alpha * heu^beta * mask`` (mkp_transformer/aco.py:141-148); deposits
  add ``Q*obj`` on every selected item (85-99). Capacity is 1.0 (normalized
  weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import NEG_INF, RolloutSpec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO


def _knapsack_masks(weight_e, capacity, n_ants, dtype):
    """Shared mask machinery; ``weight_e`` is the extended ``[n+1, m]``."""
    m_items = weight_e.shape[0]
    dummy = m_items - 1
    ants = jnp.arange(n_ants)

    def update(mask, dummy_mask, knapsack, new_item):
        if new_item is not None:
            mask = mask.at[ants, new_item].set(0.0)
            knapsack = knapsack + weight_e[new_item]
        fits = jnp.all(
            knapsack[:, None, :] + weight_e[None, :, :] <= capacity, axis=-1)
        mask = mask * fits.astype(dtype)
        mask = mask.at[:, dummy].set(1.0)
        finished = jnp.all(mask[:, :dummy] == 0.0, axis=1)
        dummy_mask = jnp.where(finished[:, None],
                               jnp.ones_like(dummy_mask), dummy_mask)
        return mask, dummy_mask, knapsack

    return update, dummy


def mkp_spec(phe: jax.Array, heu: jax.Array, weight_e: jax.Array,
             capacity: float, n_ants: int, alpha: float = 1.0,
             beta: float = 1.0) -> RolloutSpec:
    """PH_suc: ``phe``/``heu`` are ``[n+1, n+1]`` (dummy-extended)."""
    from deepaco_tpu.aco.problems.tsp import score_matrix

    m_items = phe.shape[0]
    n_real = m_items - 1
    update, dummy = _knapsack_masks(weight_e, capacity, n_ants, phe.dtype)
    score = score_matrix(phe, heu, alpha, beta)

    def init(rng):
        start = jax.random.randint(rng, (n_ants,), 0, n_real)
        mask = jnp.ones((n_ants, m_items), phe.dtype)
        dummy_mask = jnp.ones((n_ants, m_items), phe.dtype).at[:, dummy].set(0.0)
        knapsack = jnp.zeros((n_ants, weight_e.shape[1]), phe.dtype)
        mask, dummy_mask, knapsack = update(mask, dummy_mask, knapsack, start)
        return (start, mask, dummy_mask, knapsack), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        _, mask, dummy_mask, _ = state
        return mask * dummy_mask

    def step(state, actions):
        _, mask, dummy_mask, knapsack = state
        mask, dummy_mask, knapsack = update(mask, dummy_mask, knapsack, actions)
        return (actions, mask, dummy_mask, knapsack)

    return RolloutSpec(horizon=n_real + 1, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def mkp_items_spec(phe_vec: jax.Array, heu_vec: jax.Array, weight_e: jax.Array,
                   capacity: float, n_ants: int, alpha: float = 1.0,
                   beta: float = 1.0) -> RolloutSpec:
    """PH_items: ``phe_vec``/``heu_vec`` are ``[n+1]``; picks are history-free.

    The engine's start slot is pinned to the dummy item (prize 0, weight 0,
    state no-op) so that *every* real pick flows through the scanned sampler
    with a log-prob, exactly like the reference loop (mkp_transformer/
    aco.py:111-135)."""
    from deepaco_tpu.aco.problems.tsp import score_matrix

    m_items = phe_vec.shape[0]
    update, dummy = _knapsack_masks(weight_e, capacity, n_ants, phe_vec.dtype)
    score_vec = score_matrix(phe_vec, heu_vec, alpha, beta)

    def init(rng):
        start = jnp.full((n_ants,), dummy, jnp.int32)
        mask = jnp.ones((n_ants, m_items), phe_vec.dtype)
        dummy_mask = jnp.ones((n_ants, m_items), phe_vec.dtype).at[:, dummy].set(0.0)
        knapsack = jnp.zeros((n_ants, weight_e.shape[1]), phe_vec.dtype)
        mask, dummy_mask, knapsack = update(mask, dummy_mask, knapsack, None)
        return (start, mask, dummy_mask, knapsack), start

    def prob_rows(state):
        phe_rows = jnp.broadcast_to(phe_vec[None, :], (n_ants, m_items))
        heu_rows = jnp.broadcast_to(heu_vec[None, :], (n_ants, m_items))
        return phe_rows, heu_rows

    def score_rows(state):
        return jnp.broadcast_to(score_vec[None, :], (n_ants, m_items))

    def mask_fn(state):
        _, mask, dummy_mask, _ = state
        return mask * dummy_mask

    def step(state, actions):
        _, mask, dummy_mask, knapsack = state
        mask, dummy_mask, knapsack = update(mask, dummy_mask, knapsack, actions)
        return (actions, mask, dummy_mask, knapsack)

    return RolloutSpec(horizon=m_items, init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def mkp_objective(prizes_e: jax.Array, paths: jax.Array) -> jax.Array:
    """Total prize (mkp/aco.py:104-111); dummy repeats add 0."""
    return jnp.sum(prizes_e[paths.T], axis=1)


def extend_mkp(prize, weight, heu_mat=None, heu_vec=None):
    """Dummy-item extension (mkp/aco.py:60-65, mkp_transformer/aco.py:61-64)."""
    n, m = weight.shape
    prize_e = jnp.concatenate([prize, jnp.zeros((1,), prize.dtype)])
    weight_e = jnp.concatenate([weight, jnp.zeros((1, m), weight.dtype)], axis=0)
    out = [prize_e, weight_e]
    if heu_mat is not None:
        h = jnp.concatenate([heu_mat, jnp.zeros((1, n), heu_mat.dtype)], axis=0)
        h = jnp.concatenate([h, jnp.full((n + 1, 1), 1e-10, h.dtype)], axis=1)
        out.append(h)
    if heu_vec is not None:
        out.append(jnp.concatenate([heu_vec,
                                    jnp.asarray([1e-8], heu_vec.dtype)]))
    return tuple(out)


class MKPACO(ProblemACO):
    """PH_suc facade (reference mkp/aco.py)."""

    def __init__(self, prize, weight, n_ants: int = 20, decay: float = 0.9,
                 alpha: float = 1.0, beta: float = 1.0, elitist: bool = False,
                 min_max: bool = False, heuristic=None, capacity=None,
                 seed: int = 0):
        prize = jnp.asarray(prize, jnp.float32)
        weight = jnp.asarray(weight, jnp.float32)
        n = prize.shape[0]
        capacity = float(n // 2) if capacity is None else float(capacity)
        if heuristic is None:
            heuristic = jnp.broadcast_to(
                (prize / weight.sum(axis=1))[None, :], (n, n))
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        prize_e, weight_e, heu_e = extend_mkp(prize, weight, heu_mat=heuristic)
        q = float(1.0 / prize.sum())
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max, maximize=True,
                        cyclic=False, symmetric=False, floor=1e-10,
                        mm_static_max=20.0 if min_max else None)
        data = {"prize": prize_e, "weight": weight_e, "heu": heu_e,
                "capacity": jnp.asarray(capacity, jnp.float32),
                "q": jnp.asarray(q, jnp.float32)}
        super().__init__(cfg, data, n_states=n + 1, horizon=n + 1, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return mkp_spec(tau, data["heu"], data["weight"], data["capacity"],
                        cfg.n_ants, alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return mkp_objective(data["prize"], paths)

    @classmethod
    def extras(cls, data):
        return {"q": data["q"]}


class MKPItemsACO(ProblemACO):
    """PH_items facade (reference mkp_transformer/aco.py)."""

    def __init__(self, price, weight, n_ants: int = 20, decay: float = 0.9,
                 alpha: float = 1.0, beta: float = 1.0, elitist: bool = False,
                 min_max: bool = False, heuristic=None, capacity: float = 1.0,
                 seed: int = 0):
        price = jnp.asarray(price, jnp.float32)
        weight = jnp.asarray(weight, jnp.float32)
        n = price.shape[0]
        if heuristic is None:
            heuristic = price / weight.sum(axis=1)
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        price_e, weight_e, heu_e = extend_mkp(price, weight, heu_vec=heuristic)
        q = float(1.0 / price.sum())
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, min_max=min_max, maximize=True,
                        vector_pheromone=True,
                        mm_static_max=20.0 if min_max else None)
        data = {"prize": price_e, "weight": weight_e, "heu": heu_e,
                "capacity": jnp.asarray(capacity, jnp.float32),
                "q": jnp.asarray(q, jnp.float32)}
        super().__init__(cfg, data, n_states=n + 1, horizon=n + 1, seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return mkp_items_spec(tau, data["heu"], data["weight"],
                              data["capacity"], cfg.n_ants,
                              alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return mkp_objective(data["prize"], paths)

    @classmethod
    def extras(cls, data):
        return {"q": data["q"]}
