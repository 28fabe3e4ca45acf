"""Anytime ACO iteration loop + a reference-style ``ACO`` facade.

The reference's ``ACO.run(T)`` (tsp/aco.py:74-92) — construct, score, track
best-so-far, update pheromone — becomes one jitted ``lax.scan`` over
iterations, generic over problem plug-ins. The anytime curve (best-so-far cost
at cumulative T, the paper's headline metric, BASELINE.md) falls out of the
scan's per-iteration outputs.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from deepaco_tpu.aco import pheromone as ph
from deepaco_tpu.aco.engine import RolloutSpec, rollout
from deepaco_tpu.core.graph import sparse_distance_matrix

# NOTE: problem plug-ins (deepaco_tpu.aco.problems.*) import this module for
# ACOConfig/ProblemACO; the TSP facade below therefore imports tsp_spec and
# tour_cost lazily to avoid a package-level cycle.


class ACOConfig(NamedTuple):
    """Strategy flags covering the reference constructor defaults
    (tsp/aco.py:6-49; rcpsp differs: decay=.975, beta=2 — rcpsp/aco.py:104-110)."""

    n_ants: int = 20
    decay: float = 0.9
    alpha: float = 1.0
    beta: float = 1.0
    elitist: bool = False
    min_max: bool = False
    tau_min: float = 0.1
    q: float = 1.0
    maximize: bool = False
    cyclic: bool = True      # deposit includes the closing edge
    symmetric: bool = True   # deposit both directions
    floor: float = 0.0       # pheromone floor (cvrp/aco.py:130 uses 1e-10)
    # MAX-MIN tau_max policy: dynamic tau_max = mm_scale/best (minimize) or
    # mm_scale*best (maximize), set on each new global best (tsp/aco.py:84-88,
    # op/aco.py:121-124); mm_scale=None -> problem size n. Some variants pin a
    # *static* tau_max instead (smtwtp/aco.py:41 max=1; mkp/aco.py:42 max=20).
    mm_scale: float | None = None
    mm_static_max: float | None = None
    # PH_items: pheromone is a per-item vector deposited on every selected
    # item instead of an edge matrix (mkp_transformer/aco.py:44,85-99)
    vector_pheromone: bool = False
    deposit_div_ants: bool = False  # BPP deposits fit/n_ants (bpp/aco.py:117)
    cost_offset: float = 0.0        # SMTWTP deposits 1/(cost+1) (smtwtp/aco.py:86-95)


class SearchState(NamedTuple):
    phe: ph.PheromoneState
    best_cost: jax.Array
    best_path: jax.Array


def init_search(n: int, horizon: int, cfg: ACOConfig,
                tau: jax.Array | None = None) -> SearchState:
    phe = ph.init_pheromone(n, cfg.min_max, cfg.tau_min)
    if tau is not None:
        phe = phe._replace(tau=tau)
    if cfg.min_max and cfg.mm_static_max is not None:
        phe = phe._replace(tau_max=jnp.asarray(cfg.mm_static_max, jnp.float32))
    worst = -jnp.inf if cfg.maximize else jnp.inf
    return SearchState(
        phe=phe,
        best_cost=jnp.asarray(worst, jnp.float32),
        best_path=jnp.zeros((horizon + 1,), jnp.int32))


def aco_iteration(spec_factory: Callable[[jax.Array], RolloutSpec],
                  cost_fn: Callable[[jax.Array], jax.Array],
                  cfg: ACOConfig,
                  state: SearchState, rng: jax.Array,
                  ls_fn: Callable[[jax.Array], jax.Array] | None = None,
                  q=None, mm_scale=None) -> SearchState:
    """One no-grad ACO iteration (reference tsp/aco.py:75-91).

    ``ls_fn(paths) -> paths`` applies local search to every ant's solution
    before scoring/deposit (reference tsp_nls/aco.py:103-130).
    ``q`` / ``mm_scale`` override the static config values with
    instance-dependent (traced) scalars — OP/MKP deposit ``Q = 1/sum(prizes)``
    (op/aco.py:53; mkp/aco.py:54) and OP's tau_max scale is ``n*Q``
    (op/aco.py:121-124).
    """
    spec = spec_factory(state.phe.tau)
    ro = rollout(spec, rng, alpha=cfg.alpha, beta=cfg.beta, require_prob=False)
    paths = ro.paths if ls_fn is None else ls_fn(ro.paths)
    return search_update(cfg, state, paths, cost_fn(paths), q=q,
                         mm_scale=mm_scale)


def search_update(cfg: ACOConfig, state: SearchState, paths, costs,
                  q=None, mm_scale=None) -> SearchState:
    """Best-so-far tracking + pheromone update for already-scored solutions.

    Split out of :func:`aco_iteration` so host-side local search (e.g. the
    native CVRP SWAP* engine) can run between construction and update,
    mirroring the reference run loop (cvrp_nls/aco.py:135-165)."""
    q = cfg.q if q is None else q
    mm_scale_v = mm_scale
    sign = -1.0 if cfg.maximize else 1.0
    it_best = jnp.argmin(sign * costs)
    it_cost = costs[it_best]
    improved = (sign * it_cost) < (sign * state.best_cost)
    best_cost = jnp.where(improved, it_cost, state.best_cost)
    best_path = jnp.where(improved, paths[:, it_best], state.best_path)

    phe = state.phe
    if cfg.min_max and cfg.mm_static_max is None:
        if mm_scale_v is None:
            scale = cfg.mm_scale if cfg.mm_scale is not None else phe.tau.shape[0]
        else:
            scale = mm_scale_v
        phe = jax.tree_util.tree_map(
            lambda new, old: jnp.where(improved, new, old),
            ph.min_max_on_new_best(phe, best_cost, scale,
                                   maximize=cfg.maximize), phe)

    if cfg.vector_pheromone:
        amounts = q * costs if cfg.maximize else q / costs
        if cfg.elitist:
            amounts = jnp.where(jnp.arange(costs.shape[0]) == it_best,
                                amounts, 0.0)
        elif cfg.deposit_div_ants:
            amounts = amounts / costs.shape[0]
        phe = phe._replace(
            tau=ph.vector_deposit(phe.tau * cfg.decay, paths, amounts))
    else:
        update = ph.elitist_update if cfg.elitist else ph.as_update
        phe = update(phe, paths, costs, decay=cfg.decay, cyclic=cfg.cyclic,
                     symmetric=cfg.symmetric, q=q, maximize=cfg.maximize,
                     div_ants=cfg.deposit_div_ants,
                     cost_offset=cfg.cost_offset)
    if cfg.min_max:
        phe = ph.min_max_clamp(phe, cfg.tau_min)
    if cfg.floor > 0.0:
        phe = phe._replace(tau=jnp.maximum(phe.tau, cfg.floor))

    return SearchState(phe=phe, best_cost=best_cost, best_path=best_path)


def run_anytime(spec_factory, cost_fn, cfg: ACOConfig, state: SearchState,
                rng: jax.Array, n_iterations: int, ls_fn=None,
                q=None, mm_scale=None):
    """Scan ``n_iterations`` ACO iterations; returns (final state, best-so-far
    cost after each iteration) — the anytime curve."""
    keys = jax.random.split(rng, n_iterations)

    def body(state, key):
        state = aco_iteration(spec_factory, cost_fn, cfg, state, key, ls_fn,
                              q=q, mm_scale=mm_scale)
        return state, state.best_cost

    return jax.lax.scan(body, state, keys)


class ACO:
    """Reference-compatible facade for dense tour problems (tsp/aco.py:4-177).

    Functional under the hood: pheromone/best state lives in a
    :class:`SearchState` pytree; ``run``/``sample`` are jit-compiled once per
    shape. A fresh PRNG fold is used per call.
    """

    def __init__(self, distances, n_ants: int = 20, decay: float = 0.9,
                 alpha: float = 1.0, beta: float = 1.0, elitist: bool = False,
                 min_max: bool = False, pheromone=None, heuristic=None,
                 tau_min: float = 0.1, seed: int = 0,
                 fixed_start: int | None = None,
                 local_search: str | None = None,
                 coords=None):
        assert local_search in (None, "2opt", "nls")
        self.distances = jnp.asarray(distances, jnp.float32)
        self.n = self.distances.shape[0]
        # Euclidean coordinates unlock the whole-descent Pallas LS kernel on
        # TPU (ops/pallas_two_opt.py); without them LS uses the XLA gathers.
        self.coords = None
        if coords is not None and local_search is not None:
            from deepaco_tpu.ops.pallas_two_opt import pallas_ls_supported

            if (jax.default_backend() == "tpu"
                    and pallas_ls_supported(self.n, local_search)):
                self.coords = jnp.asarray(coords, jnp.float32)
        self.cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha,
                             beta=beta, elitist=elitist, min_max=min_max,
                             tau_min=tau_min)
        self.heuristic = (1.0 / self.distances if heuristic is None
                          else jnp.asarray(heuristic, jnp.float32))
        self.local_search_type = local_search
        # NLS pipelines construct from a fixed start node (tsp_nls/aco.py:191)
        self.fixed_start = 0 if (local_search and fixed_start is None) \
            else fixed_start
        self.state = init_search(self.n, self.n - 1, self.cfg,
                                 tau=None if pheromone is None
                                 else jnp.asarray(pheromone, jnp.float32))
        self._rng = jax.random.PRNGKey(seed)
        self._it = 0

    # -- reference API ------------------------------------------------------
    def sparsify(self, k_sparse: int):
        """Classic-ACO baseline heuristic (reference tsp/aco.py:51-67)."""
        self.heuristic = 1.0 / sparse_distance_matrix(self.distances, k_sparse)

    def _spec_factory(self, tau):
        from deepaco_tpu.aco.problems.tsp import tsp_spec

        return tsp_spec(tau if tau is not None else self.state.phe.tau,
                        self.heuristic, self.cfg.n_ants, self.fixed_start,
                        alpha=self.cfg.alpha, beta=self.cfg.beta)

    def _next_key(self):
        self._it += 1
        return jax.random.fold_in(self._rng, self._it)

    def sample(self, require_prob: bool = True):
        """(costs, log_probs, paths) for one construction sweep (tsp/aco.py:69-72)."""
        spec = self._spec_factory(None)
        from deepaco_tpu.aco.problems.tsp import tour_cost

        ro = rollout(spec, self._next_key(), alpha=self.cfg.alpha,
                     beta=self.cfg.beta, require_prob=require_prob)
        costs = tour_cost(self.distances, ro.paths)
        return costs, ro.log_probs, ro.paths

    def sample_2opt(self, paths):
        """Apply this facade's local search to sampled paths → (costs, paths)
        (reference tsp_nls/aco.py:92-95); training budget n//4 iterations."""
        from deepaco_tpu.ops.two_opt import batched_nls, batched_two_opt, heuristic_dist

        maxt = max(self.n // 4, 1)
        tours = paths.T
        if self.local_search_type == "nls":
            if self.coords is not None:
                from deepaco_tpu.ops.pallas_two_opt import batched_nls_euclid

                tours = batched_nls_euclid(
                    self.coords, heuristic_dist(self.heuristic), tours, maxt)
            else:
                tours = batched_nls(self.distances,
                                    heuristic_dist(self.heuristic),
                                    tours, maxt)
        elif self.coords is not None:
            from deepaco_tpu.ops.pallas_two_opt import batched_two_opt_euclid

            tours = batched_two_opt_euclid(self.coords, tours, maxt)
        else:
            tours = batched_two_opt(self.distances, tours, maxt)
        paths = tours.T
        from deepaco_tpu.aco.problems.tsp import tour_cost

        return tour_cost(self.distances, paths), paths

    def run(self, n_iterations: int):
        """Run T iterations; returns best-so-far cost (tsp/aco.py:74-92)."""
        runner = functools.partial(
            _jit_run, self.cfg, n_iterations, self.fixed_start,
            self.local_search_type)
        self.state, _ = runner(self.state, self.heuristic, self.distances,
                               self.coords, self._next_key())
        return self.state.best_cost

    @property
    def lowest_cost(self):
        return self.state.best_cost

    @property
    def shortest_path(self):
        return self.state.best_path


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _jit_run(cfg: ACOConfig, n_iterations: int, fixed_start, ls_type,
             state: SearchState, heuristic, distances, coords, rng):
    from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec

    spec_factory = lambda tau: tsp_spec(tau, heuristic, cfg.n_ants,
                                        fixed_start, alpha=cfg.alpha,
                                        beta=cfg.beta)
    cost_fn = functools.partial(tour_cost, distances)
    ls_fn = None
    if ls_type is not None:
        from deepaco_tpu.ops.two_opt import batched_nls, batched_two_opt, heuristic_dist

        # inference LS budget: run to the fixed point. tsp_nls/aco.py:227
        # uses max_iterations=10000 at inference — the while_loop exits at
        # convergence, so the cap only bites on non-converged descents.
        # ``coords`` is non-None only when the facade validated the Pallas
        # whole-descent kernel applies (TPU backend + VMEM-supported size).
        if ls_type == "nls":
            hd = heuristic_dist(heuristic)
            if coords is not None:
                from deepaco_tpu.ops.pallas_two_opt import batched_nls_euclid

                ls_fn = lambda paths: batched_nls_euclid(
                    coords, hd, paths.T, 10000).T
            else:
                ls_fn = lambda paths: batched_nls(distances, hd, paths.T,
                                                  10000).T
        elif coords is not None:
            from deepaco_tpu.ops.pallas_two_opt import batched_two_opt_euclid

            ls_fn = lambda paths: batched_two_opt_euclid(coords, paths.T,
                                                         10000).T
        else:
            ls_fn = lambda paths: batched_two_opt(distances, paths.T, 10000).T
    return run_anytime(spec_factory, cost_fn, cfg, state, rng, n_iterations,
                       ls_fn=ls_fn)


# --------------------------------------------------------------------------
# Generic problem facade: subclasses provide pure spec/cost functions over an
# instance-data pytree; run() is jitted once per (class, cfg, T, shapes).
# --------------------------------------------------------------------------
class ProblemACO:
    """Base for reference-style per-problem facades.

    Subclass contract (all pure, jit-traceable):
      ``spec_fn(tau, data, cfg, rest...)`` -> RolloutSpec   (classmethod)
      ``cost_fn(paths, data)``             -> [A] objective (classmethod)
    plus ``self.data`` (pytree of instance arrays), ``self.horizon``,
    ``self.n_states`` (pheromone dims), ``self.cfg``.
    """

    def __init__(self, cfg: ACOConfig, data, n_states: int, horizon: int,
                 seed: int = 0, tau=None):
        self.cfg = cfg
        self.data = data
        self.horizon = horizon
        self.state = init_search(n_states, horizon, cfg, tau=tau)
        if cfg.vector_pheromone:
            tau0 = jnp.ones((n_states,), jnp.float32)
            if cfg.min_max:
                tau0 = tau0 * cfg.tau_min
            self.state = self.state._replace(
                phe=self.state.phe._replace(tau=tau if tau is not None else tau0))
        self._rng = jax.random.PRNGKey(seed)
        self._it = 0

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        raise NotImplementedError

    @classmethod
    def cost_fn(cls, paths, data):
        raise NotImplementedError

    @classmethod
    def extras(cls, data):
        """Instance-dependent deposit overrides: {'q': ..., 'mm_scale': ...}."""
        return {}

    def _next_key(self):
        self._it += 1
        return jax.random.fold_in(self._rng, self._it)

    def sample(self, require_prob: bool = True):
        spec = self.spec_fn(self.state.phe.tau, self.data, self.cfg)
        ro = rollout(spec, self._next_key(), alpha=self.cfg.alpha,
                     beta=self.cfg.beta, require_prob=require_prob)
        return self.cost_fn(ro.paths, self.data), ro.log_probs, ro.paths

    def run(self, n_iterations: int):
        self.state, _ = _problem_jit_run(
            type(self), self.cfg, n_iterations, self.state, self.data,
            self._next_key())
        return self.state.best_cost

    @property
    def best_cost(self):
        return self.state.best_cost

    # reference naming aliases
    @property
    def lowest_cost(self):
        return self.state.best_cost

    @property
    def alltime_best_obj(self):
        return self.state.best_cost

    @property
    def best_path(self):
        return self.state.best_path


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _problem_jit_run(cls, cfg: ACOConfig, n_iterations: int,
                     state: SearchState, data, rng):
    spec_factory = lambda tau: cls.spec_fn(tau, data, cfg)
    cost_fn = lambda paths: cls.cost_fn(paths, data)
    extras = cls.extras(data)
    return run_anytime(spec_factory, cost_fn, cfg, state, rng, n_iterations,
                       **extras)
