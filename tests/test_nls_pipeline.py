"""TSP-NLS pipeline: facade with local search in the run loop, and the
NLS-shaped REINFORCE training step (reference tsp_nls/train.py, tsp_nls/aco.py).
"""
import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.aco import ACO
from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
from deepaco_tpu.train.reinforce import (
    init_train_state,
    make_tsp_train_step,
    nls_local_search,
)
from deepaco_tpu.models.gnn import Net


def instance(n, seed):
    rng = np.random.default_rng(seed)
    coords = rng.random((n, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, 1e9)
    return d


def test_facade_with_2opt_beats_plain_sampling():
    d = instance(30, 0)
    aco = ACO(d, n_ants=8, seed=1, local_search="2opt")
    assert aco.fixed_start == 0  # NLS pipelines pin the start node
    costs, _, paths = aco.sample()
    ls_costs, ls_paths = aco.sample_2opt(paths)
    assert float(ls_costs.mean()) < float(costs.mean())
    for a in range(8):
        assert sorted(np.asarray(ls_paths)[:, a]) == list(range(30))


def test_run_with_nls_improves_over_plain_run():
    d = instance(25, 2)
    plain = ACO(d, n_ants=6, seed=3)
    plain.sparsify(10)
    nls = ACO(d, n_ants=6, seed=3, local_search="nls")
    nls.sparsify(10)
    c_plain = float(plain.run(3))
    c_nls = float(nls.run(3))
    assert c_nls <= c_plain + 1e-6
    best = np.asarray(nls.shortest_path)
    assert sorted(best) == list(range(25))


def test_nls_train_step_runs():
    cfg = ProblemConfig(
        n_nodes=16, k_sparse=8,
        aco=ACOSettings(n_ants=6),
        train=TrainConfig(epochs=1, steps_per_epoch=1, batch_size=2))
    model = Net()
    # NLS training uses the start-node one-hot graph (tsp_nls/utils.py:37-44)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0),
                             nls_graph=True)
    step = make_tsp_train_step(model, cfg,
                               local_search=nls_local_search(t_nls=2, t_p=5))
    state2, cost = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(cost))
    p0 = np.asarray(state.params["emb_net"]["v_lin0"]["kernel"])
    p1 = np.asarray(state2.params["emb_net"]["v_lin0"]["kernel"])
    assert not np.allclose(p0, p1)
