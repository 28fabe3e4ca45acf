"""CVRP-NLS: CVRP construction + native SWAP* local search.

Reference semantics (cvrp_nls/aco.py:35-448): the CVRP engine's rollouts are
polished by HGS-style local search — ``sample_nls`` refines every ant
(training; move budget ``max(n, 50)``), the ``run`` loop refines only the 8
best ants per iteration (cvrp_nls/aco.py:143-146; inference budget 100000).
The neural variant perturbs on the learned-heuristic metric
``1/(heu/rowmax + 1e-5)`` between two true-distance polishes
(cvrp_nls/aco.py:443-448).

Device/host split: construction + pheromone updates run jitted on TPU; the
pointer-chasing local search runs in the native C++ engine on host threads
(deepaco_tpu/ls/native), exchanging routes in memory.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco.problems.cvrp import CVRPACO, cvrp_spec, route_cost
from deepaco_tpu.aco.runner import search_update
from deepaco_tpu.ls import hgs


class CVRPNLSACO(CVRPACO):
    """Facade mirroring reference cvrp_nls/aco.py ACO (swapstar=True)."""

    def __init__(self, distances, demand, capacity: float = 1.0,
                 n_ants: int = 20, swap_star: bool = True,
                 neural_perturb: bool = True, topk_refine: int = 8,
                 coords=None, **kwargs):
        super().__init__(distances, demand, capacity, n_ants=n_ants, **kwargs)
        self.swap_star = swap_star
        self.neural_perturb = neural_perturb
        self.topk_refine = topk_refine
        self._dist_np = np.asarray(self.distances, np.float64)
        self._dem_np = np.asarray(self.demand, np.float64)
        # coords enable the native engine's polar-sector SWAP* pruning
        self._coords_np = None if coords is None else np.asarray(
            coords, np.float64)
        # persistent native contexts: one k-NN build per metric for the
        # whole search, not per LS call
        self._ctx = hgs.LSContext(self._dem_np, self._dist_np,
                                  coords=self._coords_np)
        self._heu_ctx = None

    @property
    def heuristic_dist(self) -> np.ndarray:
        """Perturbation metric (cvrp_nls/aco.py:128-132)."""
        heu = np.asarray(self.heuristic)
        return 1.0 / (heu / heu.max(-1, keepdims=True) + 1e-5)

    def _ls(self, paths: np.ndarray, indexes=None, inference=False):
        """Refine ants in place (reference multiple_swap_star)."""
        count = 100000 if inference else max(self.n - 1, 50)
        hd = self.heuristic_dist if self.neural_perturb else None
        if hd is not None and self._heu_ctx is None:
            self._heu_ctx = hgs.LSContext(self._dem_np, hd,
                                          coords=self._coords_np)
        idx = range(paths.shape[1]) if indexes is None else indexes
        sub = paths[:, list(idx)]
        improved = hgs.multiple_swap_star(
            self._dem_np, self._dist_np, sub, count=count, heu_dist=hd,
            context=self._ctx, heu_context=self._heu_ctx)
        paths[:, list(idx)] = improved
        return paths

    def sample_nls(self):
        """(ls_costs, log_probs, raw_costs) — training sweep refining all
        ants (cvrp_nls/aco.py:106-111)."""
        ro = rollout(self._spec_factory(self.state.phe.tau), self._next_key(),
                     alpha=self.cfg.alpha, beta=self.cfg.beta,
                     require_prob=True)
        raw_costs = self._cost_fn(ro.paths)
        paths = self._ls(np.asarray(ro.paths).copy())
        costs = self._cost_fn(jnp.asarray(paths))
        return costs, ro.log_probs, raw_costs

    def run(self, n_iterations: int):
        """Host loop: jitted construction → native LS on top-k ants → jitted
        pheromone/best update (reference cvrp_nls/aco.py:135-165)."""
        for _ in range(n_iterations):
            ro = rollout(self._spec_factory(self.state.phe.tau),
                         self._next_key(), alpha=self.cfg.alpha,
                         beta=self.cfg.beta, require_prob=False)
            costs = self._cost_fn(ro.paths)
            paths = np.asarray(ro.paths).copy()
            if self.swap_star:
                order = np.argsort(np.asarray(costs))
                idx = order[:min(self.topk_refine, len(order))]
                paths = self._ls(paths, indexes=idx, inference=True)
            paths_j = jnp.asarray(paths)
            costs = self._cost_fn(paths_j)
            self.state = _jit_update(self.cfg, self.state, paths_j, costs)
        return self.state.best_cost


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnums=0)
def _jit_update(cfg, state, paths, costs):
    return search_update(cfg, state, paths, costs)
