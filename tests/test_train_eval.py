"""End-to-end slice: REINFORCE training steps run and reduce cost; anytime
eval protocol works for both neural and classic heuristics; the pretrained
reference checkpoint beats classic ACO (the paper's core claim, used here as
an integration-level sanity check on tiny instances).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.runner import ACOConfig
from deepaco_tpu.eval.anytime import evaluate_tsp
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint
from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
from deepaco_tpu.train.reinforce import init_train_state, make_tsp_train_step
from deepaco_tpu.utils.datasets import load_tsp_dataset


def small_cfg():
    return ProblemConfig(
        n_nodes=20, k_sparse=8,
        aco=ACOSettings(n_ants=8),
        train=TrainConfig(epochs=1, steps_per_epoch=4, batch_size=2, seed=0))


def test_train_step_runs_and_updates_params():
    cfg = small_cfg()
    model = Net()
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng)
    step = make_tsp_train_step(model, cfg)
    p0 = state.params["emb_net"]["v_lin0"]["kernel"]
    state, cost = step(state, jax.random.PRNGKey(1))
    state, cost = step(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(cost))
    p1 = state.params["emb_net"]["v_lin0"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(state.step) == 2
    # batch stats were updated by training
    bs = state.batch_stats["emb_net"]["v_bns_0"]["mean"]
    assert not np.allclose(np.asarray(bs), 0.0)


def test_anytime_eval_classic_monotone():
    coords = np.random.default_rng(0).random((4, 20, 2)).astype(np.float32)
    means, curves = evaluate_tsp(coords, k_sparse=8,
                                 cfg=ACOConfig(n_ants=8),
                                 t_values=(1, 5, 10))
    assert means.shape == (3,)
    c = np.asarray(curves)
    assert c.shape == (4, 10)
    assert np.all(np.diff(c, axis=1) <= 1e-6)  # best-so-far is monotone


@pytest.mark.slow
def test_pretrained_beats_classic_on_golden_tsp20():
    coords = load_tsp_dataset(20, "test")[:16]
    model = Net(dual_heads=True)
    variables = load_reference_checkpoint("/root/reference/pretrained/tsp/tsp20.pt")
    cfg = ACOConfig(n_ants=20)
    neural, _ = evaluate_tsp(coords, model=model, variables=variables,
                             k_sparse=10, cfg=cfg, t_values=(1, 10), seed=1)
    classic, _ = evaluate_tsp(coords, k_sparse=10, cfg=cfg,
                              t_values=(1, 10), seed=1)
    # DeepACO's neural heuristic must dominate classic ACO at T=1
    assert float(neural[0]) < float(classic[0])
