"""CVRP-NLS pipeline tests: construction + native SWAP* + pheromone update.

Covers the reference cvrp_nls behaviors: sample_nls (all-ant refine,
cvrp_nls/aco.py:106-111), top-8 refine inside run (143-146), and the
route validator contract (cvrp_nls/test.py:20-37).
"""
import numpy as np

import jax.numpy as jnp

from deepaco_tpu.aco.problems.cvrp import validate_routes
from deepaco_tpu.aco.problems.cvrp_nls import CVRPNLSACO
from deepaco_tpu.core.builders import cvrp_nls_graph
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint


def make_instance(n=25, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.random((n + 1, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e-10)
    demands = np.concatenate([[0.0], rng.integers(1, 10, n)]) / 40.0
    return d, demands.astype(np.float32)


def test_sample_nls_improves_and_validates():
    d, demands = make_instance(25, 0)
    aco = CVRPNLSACO(d, demands, capacity=1.0, n_ants=8, seed=1)
    ls_costs, log_probs, raw_costs = aco.sample_nls()
    assert float(ls_costs.mean()) < float(raw_costs.mean())
    assert np.all(np.asarray(log_probs) <= 0)


def test_run_with_swapstar_beats_without():
    d, demands = make_instance(30, 2)
    with_ls = CVRPNLSACO(d, demands, n_ants=12, seed=3)
    without = CVRPNLSACO(d, demands, n_ants=12, seed=3, swap_star=False)
    c_with = float(with_ls.run(3))
    c_without = float(without.run(3))
    assert c_with <= c_without + 1e-6
    # best path feasible
    best = np.asarray(with_ls.shortest_path)[:, None]
    ok = np.asarray(validate_routes(jnp.asarray(best),
                                    jnp.asarray(demands), 1.0))
    assert ok.all()


def test_neural_heuristic_pipeline_end_to_end():
    """GNN heuristic (pretrained cvrp_nls checkpoint, two-block graph) feeds
    the NLS engine — full reference pipeline on TPU + native LS."""
    from deepaco_tpu.core.graph import scatter_to_dense, SparseGraph

    d, demands = make_instance(20, 4)
    g = cvrp_nls_graph(jnp.asarray(demands), jnp.asarray(d), k=5)
    variables = load_reference_checkpoint(
        "/root/reference/pretrained/cvrp_nls/cvrp100.pt")
    model = Net()
    heu_blocks = model.apply(variables, g, train=False)
    # scatter block outputs into the dense heuristic matrix
    x, blocks = g
    n = x.shape[0]
    heu = jnp.zeros((n, n))
    for b, h in zip(blocks, heu_blocks):
        src = jnp.arange(n) if b.src is None else b.src
        rows = jnp.broadcast_to(src[:, None], b.nbr.shape)
        heu = heu.at[rows, b.nbr].set(h)
    heu = heu + 1e-10
    aco = CVRPNLSACO(d, demands, n_ants=8, seed=5, heuristic=heu)
    cost = float(aco.run(2))
    assert np.isfinite(cost)
    best = np.asarray(aco.shortest_path)[:, None]
    ok = np.asarray(validate_routes(jnp.asarray(best),
                                    jnp.asarray(demands), 1.0))
    assert ok.all()


def test_run_refines_exactly_the_reference_topk_set():
    """The run loop must hand the native LS exactly the ants the reference
    refines: costs.topk(8, largest=False).indices (cvrp_nls/aco.py:143-146)
    as a SET, computed on the pre-LS construction costs — and must leave
    every non-selected ant's path untouched. Pins the protocol equivalence
    directly (VERDICT r4 weak #8)."""
    d, demands = make_instance(30, 7)
    n_ants = 12
    aco = CVRPNLSACO(d, demands, capacity=1.0, n_ants=n_ants, seed=11)
    seen = []
    orig_ls = aco._ls

    def spy_ls(paths, indexes=None, **kw):
        pre = paths.copy()
        out = orig_ls(paths, indexes=indexes, **kw)
        seen.append((pre, None if indexes is None else list(indexes), out))
        return out

    aco._ls = spy_ls
    orig_cost_fn = aco._cost_fn
    pre_costs = []

    def spy_cost(paths):
        c = orig_cost_fn(paths)
        pre_costs.append(np.asarray(c))
        return c

    aco._cost_fn = spy_cost
    aco.run(3)
    assert len(seen) == 3
    import torch

    ls_calls = 0
    for (pre, idx, out) in seen:
        costs = pre_costs[2 * ls_calls]      # cost eval before each LS call
        ls_calls += 1
        ref_idx = torch.as_tensor(costs).topk(8, largest=False).indices
        assert set(idx) == set(int(i) for i in ref_idx), \
            (sorted(idx), sorted(int(i) for i in ref_idx))
        untouched = [a for a in range(n_ants) if a not in idx]
        np.testing.assert_array_equal(pre[:, untouched], out[:, untouched])
