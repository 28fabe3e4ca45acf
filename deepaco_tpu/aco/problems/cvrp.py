"""CVRP plug-in: capacity-masked depot-return construction.

Reference semantics (cvrp/aco.py:132-205, cloned in cvrp_nls/aco.py:205-272):
node 0 is the depot; ants start there; the visit mask clears visited customers
but keeps the depot open EXCEPT right after arriving at the depot while
customers remain (the "one exception", cvrp/aco.py:176-180); the capacity mask
forbids customers whose demand exceeds remaining capacity; capacity resets on
every depot visit (cvrp/aco.py:182-202).

The reference constructs with a data-dependent while-loop until all ants sit
at the depot with no customers left (cvrp/aco.py:150-160). Here the horizon is
the static worst case 2n steps (every trip serves >=1 customer), and finished
ants park at the depot: once done, only the depot self-loop is unmasked, so
each extra step contributes log_prob 0 and cost d[0,0] (the 1e-10 diagonal
sentinel, cvrp/utils.py:21) — cost-equivalent to the reference's early stop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec


def cvrp_spec(phe: jax.Array, heu: jax.Array, demand: jax.Array,
              capacity: float, n_ants: int, alpha: float = 1.0,
              beta: float = 1.0) -> RolloutSpec:
    from deepaco_tpu.aco.problems.tsp import score_matrix

    n = phe.shape[0]             # n = 1 + n_customers
    ants = jnp.arange(n_ants)
    score = score_matrix(phe, heu, alpha, beta)

    def visit_update(visit_mask, actions):
        """cvrp/aco.py:176-180 — clear visited; depot open; the exception."""
        visit_mask = visit_mask.at[ants, actions].set(0.0)
        visit_mask = visit_mask.at[:, 0].set(1.0)
        at_depot_with_work = (actions == 0) & jnp.any(
            visit_mask[:, 1:] > 0, axis=1)
        return visit_mask.at[:, 0].set(
            jnp.where(at_depot_with_work, 0.0, visit_mask[:, 0]))

    def capacity_update(used, actions):
        """cvrp/aco.py:182-202 — reset at depot, add current node demand."""
        used = jnp.where(actions == 0, 0.0, used)
        used = used + demand[actions]
        remaining = capacity - used
        cap_mask = (demand[None, :] <= remaining[:, None]).astype(phe.dtype)
        return used, cap_mask

    def init(rng):
        start = jnp.zeros((n_ants,), jnp.int32)
        visit_mask = visit_update(jnp.ones((n_ants, n), phe.dtype), start)
        used, cap_mask = capacity_update(jnp.zeros((n_ants,), phe.dtype), start)
        return (start, visit_mask, used, cap_mask), start

    def prob_rows(state):
        cur = state[0]
        return phe[cur], heu[cur]

    def score_rows(state):
        return score[state[0]]

    def mask_fn(state):
        _, visit_mask, _, cap_mask = state
        return visit_mask * cap_mask

    def step(state, actions):
        _, visit_mask, used, _ = state
        visit_mask = visit_update(visit_mask, actions)
        used, cap_mask = capacity_update(used, actions)
        return (actions, visit_mask, used, cap_mask)

    return RolloutSpec(horizon=2 * (n - 1), init=init, prob_rows=prob_rows,
                       mask=mask_fn, step=step, score_rows=score_rows)


def route_cost(dist: jax.Array, paths: jax.Array) -> jax.Array:
    """Directed consecutive-edge sum, no wrap (cvrp/aco.py:132-136);
    ``paths`` is ``[L, A]``, starting and (once parked) ending at the depot."""
    u = paths.T
    return jnp.sum(dist[u[:, :-1], u[:, 1:]], axis=1)


class CVRPACO:
    """Reference-style facade (cvrp/aco.py:9-205) over the functional engine."""

    def __init__(self, distances, demand, capacity: float = 50.0,
                 n_ants: int = 20, decay: float = 0.9, alpha: float = 1.0,
                 beta: float = 1.0, elitist: bool = False,
                 min_max: bool = False, heuristic=None, pheromone=None,
                 seed: int = 0):
        import functools

        from deepaco_tpu.aco.runner import ACOConfig, init_search

        self.distances = jnp.asarray(distances, jnp.float32)
        self.demand = jnp.asarray(demand, jnp.float32)
        self.capacity = float(capacity)
        self.n = self.distances.shape[0]
        self.cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha,
                             beta=beta, elitist=elitist, min_max=min_max,
                             cyclic=False, symmetric=False, floor=1e-10)
        self.heuristic = (1.0 / self.distances if heuristic is None
                          else jnp.asarray(heuristic, jnp.float32))
        self.state = init_search(self.n, 2 * (self.n - 1), self.cfg,
                                 tau=None if pheromone is None
                                 else jnp.asarray(pheromone, jnp.float32))
        self._rng = jax.random.PRNGKey(seed)
        self._it = 0
        self._cost_fn = functools.partial(route_cost, self.distances)

    def _spec_factory(self, tau):
        return cvrp_spec(tau, self.heuristic, self.demand, self.capacity,
                         self.cfg.n_ants, alpha=self.cfg.alpha,
                         beta=self.cfg.beta)

    def _next_key(self):
        self._it += 1
        return jax.random.fold_in(self._rng, self._it)

    def sample(self, require_prob: bool = True):
        from deepaco_tpu.aco.engine import rollout

        ro = rollout(self._spec_factory(self.state.phe.tau), self._next_key(),
                     alpha=self.cfg.alpha, beta=self.cfg.beta,
                     require_prob=require_prob)
        return self._cost_fn(ro.paths), ro.log_probs, ro.paths

    def run(self, n_iterations: int):
        from deepaco_tpu.aco.runner import run_anytime

        self.state, _ = _jit_run_cvrp(
            self.cfg, n_iterations, self.capacity, self.state,
            self.heuristic, self.distances, self.demand, self._next_key())
        return self.state.best_cost

    @property
    def lowest_cost(self):
        return self.state.best_cost

    @property
    def shortest_path(self):
        return self.state.best_path


def _jit_run_cvrp(cfg, n_iterations, capacity, state, heuristic, distances,
                  demand, rng):
    import functools

    from deepaco_tpu.aco.runner import run_anytime

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def go(cfg, n_iterations, capacity, state, heuristic, distances, demand, rng):
        spec_factory = lambda tau: cvrp_spec(
            tau, heuristic, demand, capacity, cfg.n_ants,
            alpha=cfg.alpha, beta=cfg.beta)
        cost_fn = functools.partial(route_cost, distances)
        return run_anytime(spec_factory, cost_fn, cfg, state, rng, n_iterations)

    return go(cfg, n_iterations, capacity, state, heuristic, distances,
              demand, rng)


def validate_routes(paths, demand, capacity) -> jax.Array:
    """Feasibility validator (port of cvrp_nls/test.py:20-37): every customer
    visited exactly once, capacity respected per trip. Returns bool per ant."""
    n = demand.shape[0]
    p = paths.T                                      # [A, L]
    # coverage: each customer 1..n-1 appears exactly once
    one_hot = jax.nn.one_hot(p, n, dtype=jnp.float32).sum(axis=1)  # [A, n]
    covered = jnp.all(one_hot[:, 1:] == 1.0, axis=1)

    # per-trip capacity: running demand sum that resets at depot
    def trip_load(carry, node):
        load = jnp.where(node == 0, 0.0, carry + demand[node])
        return load, load

    def per_ant(path):
        _, loads = jax.lax.scan(trip_load, 0.0, path)
        return jnp.all(loads <= capacity + 1e-6)

    feasible = jax.vmap(per_ant)(p)
    return covered & feasible
