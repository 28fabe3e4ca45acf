"""Adaptive-elitist Ant System baseline for CVRP.

Re-implementation of the reference's classic-ACO comparison engine
(cvrp/aco.py:56-57, 72-104, 207-383 — "unrelated to DeepACO, kept for
comparisons"): an elitist AS with three host-side phases around the
construction loop:

* improvement phase — cheapest-insertion rebuild of each subroute of the top-5
  ants, kept when it shortens the route (cvrp/aco.py:336-357);
* intensification phase — on a new global best, try ``count`` random N1
  relocations (move a node into its best position in another subroute) and
  apply the best improving one (cvrp/aco.py:253-285, 359-376); the N2
  random-swap neighborhood is provided too (287-334; the reference loop only
  invokes N1 — 366);
* diversification phase — when an iteration fails to improve, soften the
  pheromone (``tau*decay*0.5 + 0.01``) and re-deposit from the elite pool of
  the last 5 bests (cvrp/aco.py:378-383, 95-102).

Construction and the elitist deposit stay jitted on device; the phases are
sequential pointer-chasing and run in numpy, exactly as the reference runs
them in Python.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.problems.cvrp import CVRPACO, route_cost
from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco import pheromone as ph


def get_subroutes(path, end_with_zero=True):
    """Split a depot-delimited path (cvrp/aco.py:209-217)."""
    path = np.asarray(path)
    zeros = np.nonzero(path == 0)[0]
    out = []
    for a, b in zip(zeros, zeros[1:]):
        if b - a > 1:
            out.append(path[a:b + 1] if end_with_zero else path[a:b])
    return out


def merge_subroutes(subroutes, length):
    """(cvrp/aco.py:240-251): concatenate 0-led subroutes, pad with zeros."""
    route = np.zeros(length, np.int64)
    i = 0
    for r in subroutes:
        r = np.asarray(r)
        if len(r) > 2:
            seg = r[:-1]
            route[i:i + len(seg)] = seg
            i += len(seg)
    return route


def insertion_single(dist, route, node):
    """Best position to insert ``node`` into a 0...0 route (cvrp/aco.py:219-224)."""
    route = np.asarray(route)
    p1, p2 = route[:-1], route[1:]
    deltas = dist[p1, node] + dist[node, p2] - dist[p1, p2]
    best = int(np.argmin(deltas))
    return best, float(deltas[best])


def insertion(dist, nodes):
    """Cheapest-insertion construction of one subroute (cvrp/aco.py:226-238)."""
    nodes = np.asarray(nodes)
    route = [int(nodes[0])] * 2
    cost = 0.0
    for node in nodes[1:]:
        pos, dc = insertion_single(dist, route, int(node))
        route.insert(pos + 1, int(node))
        cost += dc
    return route, cost


class AdaptiveCVRPACO(CVRPACO):
    """Reference 'adaptive=True' engine (cvrp/aco.py:24-104)."""

    def __init__(self, distances, demand, capacity: float = 50.0,
                 n_ants: int = 20, pool_size: int = 5, seed: int = 0,
                 **kwargs):
        kwargs["elitist"] = True        # adaptive forces elitist (cvrp/aco.py:37)
        super().__init__(distances, demand, capacity, n_ants=n_ants,
                         seed=seed, **kwargs)
        self.pool_size = pool_size
        self.elite_pool: list[tuple[np.ndarray, float]] = []
        self._np_rng = np.random.default_rng(seed)
        self._dist_np = np.asarray(self.distances, np.float64)
        self._dem_np = np.asarray(self.demand, np.float64)

    # ---------------------------------------------------------- phases ----
    def improvement_phase(self, paths, costs, topk: int = 5):
        idx = (range(paths.shape[1]) if topk <= 0 or topk >= paths.shape[1]
               else np.argsort(costs)[:topk])
        for i in idx:
            subroutes = get_subroutes(paths[:, i], end_with_zero=False)
            new_cost, new_subs = 0.0, []
            for r in subroutes:
                new_r, c = insertion(self._dist_np, r)
                new_cost += c
                new_subs.append(new_r + [0])
            if new_cost < costs[i]:
                paths[:, i] = merge_subroutes(new_subs, paths.shape[0])
                costs[i] = new_cost
        return paths, costs

    def n1_neighbourhood(self, subroutes, demands, count: int = 5):
        """Random relocate into the best position of another subroute."""
        dist, dem = self._dist_np, self._dem_np
        best = (None, 0.0)
        for _ in range(count):
            sri = int(self._np_rng.integers(len(subroutes)))
            route = subroutes[sri]
            if len(route) < 3:
                continue
            sni = int(self._np_rng.integers(1, len(route) - 1))
            pred, node, nxt = route[sni - 1], route[sni], route[sni + 1]
            ok = demands + dem[node] <= self.capacity
            ok[sri] = False
            if not ok.any():
                continue
            removal = dist[pred, nxt] - dist[pred, node] - dist[node, nxt]
            for i in np.nonzero(ok)[0]:
                loc, ins = insertion_single(dist, subroutes[i], int(node))
                if removal + ins < best[1]:
                    best = ((sri, sni, int(i), loc + 1), removal + ins)
        if best[0] is None:
            return None, 0.0
        sri, sni, tri, tni = best[0]
        subroutes = list(subroutes)
        node = subroutes[sri][sni]
        tgt = subroutes[tri]
        subroutes[tri] = np.concatenate([tgt[:tni], [node], tgt[tni:]])
        src = subroutes[sri]
        if len(src) == 3:
            del subroutes[sri]
        else:
            subroutes[sri] = np.concatenate([src[:sni], src[sni + 1:]])
        return subroutes, best[1]

    def n2_neighbourhood(self, subroutes, demands, count: int = 5):
        """Random swap of two nodes, each re-inserted at its best position
        (cvrp/aco.py:287-334)."""
        dist, dem = self._dist_np, self._dem_np
        best = (None, 0.0)
        if len(subroutes) < 2:
            return None, 0.0
        for _ in range(count):
            i1, i2 = self._np_rng.choice(len(subroutes), 2, replace=False)
            sr1, sr2 = subroutes[i1], subroutes[i2]
            if len(sr1) < 3 or len(sr2) < 3:
                continue
            n1i = int(self._np_rng.integers(1, len(sr1) - 1))
            p1, node1, s1 = sr1[n1i - 1], sr1[n1i], sr1[n1i + 1]
            ok = ((demands[i2] + dem[node1] - dem[sr2] <= self.capacity)
                  & (demands[i1] - dem[node1] + dem[sr2] <= self.capacity))
            ok[0] = ok[-1] = False
            if not ok.any():
                continue
            cost = dist[p1, s1] - dist[p1, node1] - dist[node1, s1]
            sr1_mod = np.concatenate([sr1[:n1i], sr1[n1i + 1:]])
            n2i = int(self._np_rng.choice(np.nonzero(ok)[0]))
            p2, node2, s2 = sr2[n2i - 1], sr2[n2i], sr2[n2i + 1]
            cost += dist[p2, s2] - dist[p2, node2] - dist[node2, s2]
            sr2_mod = np.concatenate([sr2[:n2i], sr2[n2i + 1:]])
            loc1, ins1 = insertion_single(dist, sr2_mod, int(node1))
            cost += ins1
            sr2_mod = np.concatenate(
                [sr2_mod[:loc1 + 1], [node1], sr2_mod[loc1 + 1:]])
            loc2, ins2 = insertion_single(dist, sr1_mod, int(node2))
            cost += ins2
            sr1_mod = np.concatenate(
                [sr1_mod[:loc2 + 1], [node2], sr1_mod[loc2 + 1:]])
            if cost < best[1]:
                best = ((int(i1), sr1_mod, int(i2), sr2_mod), cost)
        if best[0] is None:
            return None, 0.0
        i1, sr1, i2, sr2 = best[0]
        subroutes = list(subroutes)
        subroutes[i1], subroutes[i2] = sr1, sr2
        return subroutes, best[1]

    def intensification_phase(self):
        best = np.asarray(self.state.best_path)
        subroutes = get_subroutes(best, end_with_zero=True)
        demands = np.array([self._dem_np[r].sum() for r in subroutes])
        subs, delta = self.n1_neighbourhood(subroutes, demands)
        if subs is not None and delta < 0.0:
            new_path = merge_subroutes(
                [np.concatenate([r, [0]]) if r[-1] != 0 else r for r in subs],
                len(best))
            new_cost = float(self.state.best_cost) + delta
            self.state = self.state._replace(
                best_path=jnp.asarray(new_path, jnp.int32),
                best_cost=jnp.asarray(new_cost, jnp.float32))

    def diversification_phase(self):
        tau = self.state.phe.tau * (self.cfg.decay * 0.5) + 0.01
        for path, cost in self.elite_pool:
            u, v = path[:-1], path[1:]
            tau = tau.at[u, v].add(1.0 / cost)
        self.state = self.state._replace(phe=self.state.phe._replace(tau=tau))

    # ------------------------------------------------------------- loop ----
    def run(self, n_iterations: int):
        from deepaco_tpu.aco.runner import search_update

        for _ in range(n_iterations):
            ro = rollout(self._spec_factory(self.state.phe.tau),
                         self._next_key(), alpha=self.cfg.alpha,
                         beta=self.cfg.beta, require_prob=False)
            paths = np.asarray(ro.paths).copy()
            costs = np.asarray(self._cost_fn(ro.paths)).copy()
            paths, costs = self.improvement_phase(paths, costs)

            improved = costs.min() < float(self.state.best_cost)
            if improved:
                self.state = _jit_update_adaptive(
                    self.cfg, self.state, jnp.asarray(paths),
                    jnp.asarray(costs, jnp.float32))
                self.intensification_phase()
                self.elite_pool.insert(
                    0, (np.asarray(self.state.best_path).copy(),
                        float(self.state.best_cost)))
                del self.elite_pool[self.pool_size:]
            else:
                self.diversification_phase()
        return self.state.best_cost


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnums=0)
def _jit_update_adaptive(cfg, state, paths, costs):
    from deepaco_tpu.aco.runner import search_update

    return search_update(cfg, state, paths, costs)
