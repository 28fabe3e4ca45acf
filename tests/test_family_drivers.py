"""Generic family train/eval drivers: every registered family must train one
REINFORCE step (finite loss, params move) and produce a monotone anytime
curve for both neural and classic heuristics.
"""
import numpy as np
import pytest

import jax

from deepaco_tpu.families import FAMILIES, get_family
from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
from deepaco_tpu.train.drivers import (
    evaluate_family,
    family_model,
    gen_batch,
    init_family_state,
    make_family_train_step,
    train_family,
)

SIZES = {"tsp": 16, "cvrp": 12, "op": 16, "pctsp": 12, "smtwtp": 12,
         "mkp": 14, "mkp_items": 14, "bpp": 12, "sop": 12}


def small_cfg(n):
    return ProblemConfig(
        n_nodes=n, k_sparse=max(n // 3, 3),
        aco=ACOSettings(n_ants=6),
        train=TrainConfig(epochs=1, steps_per_epoch=1, batch_size=2, seed=0))


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_train_step_runs(name):
    n = SIZES[name]
    cfg = small_cfg(n)
    family = get_family(name)
    model = family_model(family)
    rng_np = np.random.default_rng(0)
    state = init_family_state(family, model, cfg, rng_np)
    step = make_family_train_step(family, model, cfg)
    batch = gen_batch(family, rng_np, n, 2)
    state2, cost = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(cost))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_classic_eval_curve_monotone(name):
    n = SIZES[name]
    family = get_family(name)
    rng_np = np.random.default_rng(1)
    batch = gen_batch(family, rng_np, n, 3)
    means, curves = evaluate_family(
        name, batch, n_nodes=n, k_sparse=max(n // 3, 3), n_ants=6,
        t_values=(1, 5))
    c = np.asarray(curves)
    assert np.all(np.isfinite(c))
    diffs = np.diff(c, axis=1)
    if family.aco.maximize:
        assert np.all(diffs >= -1e-5)
    else:
        assert np.all(diffs <= 1e-5)


def test_neural_eval_uses_trained_params():
    name, n = "tsp", 16
    cfg = small_cfg(n)
    family = get_family(name)
    model = family_model(family)
    rng_np = np.random.default_rng(2)
    state = init_family_state(family, model, cfg, rng_np)
    batch = gen_batch(family, rng_np, n, 3)
    means, curves = evaluate_family(
        name, batch, n_nodes=n, k_sparse=cfg.k_sparse, n_ants=6,
        t_values=(1, 5),
        variables={"params": state.params, "batch_stats": state.batch_stats})
    assert np.all(np.isfinite(np.asarray(curves)))


def test_train_family_validation_and_best_last_checkpoints(tmp_path):
    """Per-epoch validation + best/last checkpoint selection
    (reference tsp_nls/train.py:99-122)."""
    import dataclasses

    cfg = small_cfg(12)
    cfg = dataclasses.replace(cfg,
                              train=dataclasses.replace(cfg.train, epochs=2))
    seen = []
    state = train_family(
        "tsp", cfg,
        progress=lambda ep, c, val=None: seen.append((ep, c, val)),
        val_instances=2, val_t=2, ckpt_path=str(tmp_path / "tsp12.msgpack"))
    assert len(seen) == 2 and all(v is not None for _, _, v in seen)
    assert (tmp_path / "tsp12-best.msgpack").exists()
    assert (tmp_path / "tsp12-last.msgpack").exists()
    # last checkpoint round-trips to the final state
    from deepaco_tpu.utils.checkpoint import load_checkpoint

    loaded = load_checkpoint(str(tmp_path / "tsp12-last.msgpack"), state)
    a = jax.tree_util.tree_leaves(loaded.params)[0]
    b = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
