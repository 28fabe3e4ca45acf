"""Bin Packing plug-in: CVRP-style construction, Falkenauer fitness.

Reference semantics (bpp/aco.py:44-211): node 0 is the bin separator
("depot"); construction reuses the CVRP visit/capacity scheme verbatim with
capacity 150; fitness (to MAXIMIZE) is Falkenauer's
``sum((bin_fill / C)^2) / n_bins`` computed by numba kernels in the reference
(bpp/aco.py:12-40) and by a masked scan/segment reduction here. Deposits add
``fitness/n_ants`` per ant (AS) or iteration-best fitness (elitist), floor
1e-10 (bpp/aco.py:106-119). Default heuristic: demand broadcast row-wise with
``heu[:, 0] = 1e-5`` (bpp/aco.py:74-75).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import RolloutSpec
from deepaco_tpu.aco.problems.cvrp import cvrp_spec
from deepaco_tpu.aco.runner import ACOConfig, ProblemACO


def bpp_fitness(demand: jax.Array, capacity: float, paths: jax.Array) -> jax.Array:
    """Falkenauer fitness per ant (vectorized bpp/aco.py:12-40,121-127).

    ``paths`` is ``[L, A]`` starting at 0; trailing parked zeros are excluded
    from the bin count (count_last_zero) and contribute 0 to the fill sum.
    """
    p = paths.T                                            # [A, L]
    n_ants, L = p.shape
    problem_size = demand.shape[0]

    def per_ant(seq):
        def bin_step(fill, node):
            new_fill = jnp.where(node == 0, 0.0, fill + demand[node])
            closed = jnp.where(node == 0, (fill / capacity) ** 2, 0.0)
            return new_fill, closed

        _, closed = jax.lax.scan(bin_step, 0.0, seq)
        # closed[j] > 0 contribution only at zeros j>=1; j=0 closes fill 0
        fit_sum = jnp.sum(closed)
        # trailing zeros: L - 1 - last nonzero index
        idx = jnp.arange(L)
        last_nonzero = jnp.max(jnp.where(seq != 0, idx, -1))
        last_zeros = L - 1 - last_nonzero
        n_bins = L - last_zeros - problem_size + 1
        return fit_sum / n_bins

    return jax.vmap(per_ant)(p)


class BPPACO(ProblemACO):
    """Facade mirroring reference bpp/aco.py ACO (fitness maximization)."""

    def __init__(self, demand, capacity: float = 150.0, n_ants: int = 20,
                 decay: float = 0.9, alpha: float = 1.0, beta: float = 1.0,
                 elitist: bool = False, heuristic=None, seed: int = 0):
        demand = jnp.asarray(demand, jnp.float32)
        n = demand.shape[0]
        if heuristic is None:
            heuristic = jnp.broadcast_to(demand[None, :], (n, n))
            heuristic = heuristic.at[:, 0].set(1e-5)
        else:
            heuristic = jnp.asarray(heuristic, jnp.float32)
        cfg = ACOConfig(n_ants=n_ants, decay=decay, alpha=alpha, beta=beta,
                        elitist=elitist, maximize=True,
                        cyclic=False, symmetric=False, floor=1e-10,
                        deposit_div_ants=True)
        data = {"demand": demand, "heu": heuristic,
                "capacity": jnp.asarray(capacity, jnp.float32)}
        super().__init__(cfg, data, n_states=n, horizon=2 * (n - 1), seed=seed)

    @classmethod
    def spec_fn(cls, tau, data, cfg):
        return cvrp_spec(tau, data["heu"], data["demand"], data["capacity"],
                         cfg.n_ants, alpha=cfg.alpha, beta=cfg.beta)

    @classmethod
    def cost_fn(cls, paths, data):
        return bpp_fitness(data["demand"], data["capacity"], paths)

    @property
    def best_fitness(self):
        return self.state.best_cost
