"""CVRP plug-in parity tests.

The reference cvrp/aco.py is pure torch (no PyG), so these tests drive the
*actual reference implementation* side by side with ours: mask-update
semantics are compared step-by-step under forced actions, and full rollouts
are validated for feasibility and cost equivalence.
"""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import rollout
from deepaco_tpu.aco.problems.cvrp import (
    CVRPACO,
    cvrp_spec,
    route_cost,
    validate_routes,
)

def make_instance(n_customers=8, seed=0, capacity=50.0):
    rng = np.random.default_rng(seed)
    coords = np.concatenate(
        [[[0.5, 0.5]], rng.random((n_customers, 2))]).astype(np.float32)
    demand = np.concatenate(
        [[0.0], rng.integers(1, 10, n_customers)]).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e-10)
    return d, demand, capacity


def reference_aco(d, demand, capacity, n_ants):
    # unique module name: several reference dirs ship an `aco.py`
    spec = importlib.util.spec_from_file_location(
        "ref_cvrp_aco", "/root/reference/cvrp/aco.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_cvrp_aco"] = mod
    spec.loader.exec_module(mod)
    return mod.ACO(torch.as_tensor(d), torch.as_tensor(demand),
                   n_ants=n_ants, capacity=capacity)


def test_mask_semantics_match_reference_step_by_step():
    d, demand, capacity, = make_instance(6, seed=1)
    n, n_ants = d.shape[0], 3
    ref = reference_aco(d, demand, capacity, n_ants)

    # reference init (cvrp/aco.py:138-150)
    actions_t = torch.zeros((n_ants,), dtype=torch.long)
    visit_t = ref.update_visit_mask(torch.ones(n_ants, n), actions_t)
    used_t, cap_t = ref.update_capacity_mask(actions_t, torch.zeros(n_ants))

    spec = cvrp_spec(jnp.asarray(1.0 / d), jnp.asarray(1.0 / d),
                     jnp.asarray(demand), capacity, n_ants)
    state, start = spec.init(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(spec.mask(state)),
        (visit_t * cap_t).numpy())

    # force a fixed action sequence through both implementations
    forced = [[1, 2, 3], [0, 0, 4], [2, 1, 0], [0, 4, 5], [3, 5, 1]]
    for acts in forced:
        acts_np = np.asarray(acts)
        actions_t = torch.as_tensor(acts_np)
        visit_t = ref.update_visit_mask(visit_t.clone(), actions_t)
        used_t, cap_t = ref.update_capacity_mask(actions_t, used_t.clone())
        state = spec.step(state, jnp.asarray(acts_np))
        np.testing.assert_array_equal(
            np.asarray(spec.mask(state)), (visit_t * cap_t).numpy(),
            err_msg=f"mask diverged after forcing actions {acts}")


def test_rollout_routes_feasible_and_costed():
    d, demand, capacity = make_instance(10, seed=2)
    aco = CVRPACO(d, demand, capacity, n_ants=12, seed=3)
    costs, log_probs, paths = aco.sample()
    ok = np.asarray(validate_routes(paths, jnp.asarray(demand), capacity))
    assert ok.all(), "infeasible route constructed"
    # parked log-probs must be exactly 0 (single-action softmax)
    p = np.asarray(paths)
    assert (p[0] == 0).all()
    # recompute costs in numpy (tolerating the 1e-10 depot self-loops)
    d_np = np.asarray(d)
    for a in range(4):
        u = p[:, a]
        expect = sum(d_np[u[i], u[i + 1]] for i in range(len(u) - 1))
        np.testing.assert_allclose(float(costs[a]), expect, rtol=1e-4)


def test_run_improves():
    d, demand, capacity = make_instance(12, seed=4)
    aco = CVRPACO(d, demand, capacity, n_ants=16, seed=5)
    c1 = float(aco.run(1))
    c15 = float(aco.run(14))
    assert c15 <= c1 + 1e-6
    best = np.asarray(aco.shortest_path)[:, None]
    ok = np.asarray(validate_routes(jnp.asarray(best), jnp.asarray(demand),
                                    capacity))
    assert ok.all()


def test_cost_distribution_close_to_reference():
    """Same heuristic, same #ants → mean sampled cost within noise of the
    reference engine (distributional parity; RNG streams differ)."""
    d, demand, capacity = make_instance(10, seed=6)
    n_ants = 64
    torch.manual_seed(0)
    ref = reference_aco(d, demand, capacity, n_ants)
    ref_costs = ref.gen_path_costs(ref.gen_path(require_prob=False)).numpy()

    aco = CVRPACO(d, demand, capacity, n_ants=n_ants, seed=7)
    costs = np.asarray(aco.sample(require_prob=False)[0])
    # means within 10% (both are the same categorical construction process)
    assert abs(costs.mean() - ref_costs.mean()) / ref_costs.mean() < 0.10
