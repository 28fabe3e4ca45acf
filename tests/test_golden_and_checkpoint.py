"""Golden dataset regeneration + checkpoint round-trip tests."""
import os
import tempfile

import numpy as np
import torch

import jax

from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
from deepaco_tpu.train.drivers import (
    evaluate_family,
    family_model,
    gen_batch,
    init_family_state,
    make_family_train_step,
)
from deepaco_tpu.families import get_family
from deepaco_tpu.utils import golden
from deepaco_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_cvrp_golden_matches_reference_writer():
    """Regenerated instances must equal running the reference gen_instance
    under the same seed (the writer's exact stream)."""
    import sys
    sys.path.insert(0, "/root/reference/cvrp")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_cvrp_utils_g", "/root/reference/cvrp/utils.py")
    # utils.py imports torch_geometric — emulate only gen_instance's RNG calls
    torch.manual_seed(123456)
    ref0_coords = torch.rand(size=(20, 2)).numpy()
    ref0_dem = torch.randint(1, 10, size=(20,)).numpy()

    ds = golden.cvrp_test(20)
    np.testing.assert_allclose(ds["coords"][0, 1:], ref0_coords, rtol=1e-6)
    np.testing.assert_allclose(ds["demand"][0, 1:], ref0_dem)
    assert ds["coords"].shape == (100, 21, 2)


def test_op_golden_shapes_and_seed():
    ds = golden.op_test(100)
    assert ds["coords"].shape == (100, 100, 2)
    torch.manual_seed(123456)
    expect = torch.rand(size=(100, 100, 2)).numpy()
    np.testing.assert_allclose(ds["coords"], expect, rtol=1e-6)


def test_golden_evaluation_runs():
    """Anytime evaluation on real golden data (small slices)."""
    ds = golden.cvrp_test(20)
    batch = {k: v[:4] for k, v in ds.items() if k != "coords"}
    means, curves = evaluate_family("cvrp", batch, n_nodes=20, n_ants=8,
                                    t_values=(1, 3))
    assert np.all(np.isfinite(np.asarray(curves)))

    ds = golden.smtwtp_test(50)
    batch = {k: v[:4] for k, v in ds.items()}
    means, _ = evaluate_family("smtwtp", batch, n_nodes=50, n_ants=8,
                               t_values=(1, 3))
    assert np.all(np.isfinite(np.asarray(means)))

    ds = golden.sop_test(20, count=4)
    means, _ = evaluate_family("sop", ds, n_nodes=20, n_ants=8,
                               t_values=(1, 3))
    assert np.all(np.isfinite(np.asarray(means)))


def test_checkpoint_roundtrip_exact_resume():
    cfg = ProblemConfig(n_nodes=12, k_sparse=6, aco=ACOSettings(n_ants=4),
                        train=TrainConfig(epochs=1, steps_per_epoch=1,
                                          batch_size=2))
    family = get_family("tsp")
    model = family_model(family)
    rng_np = np.random.default_rng(0)
    state = init_family_state(family, model, cfg, rng_np)
    step = make_family_train_step(family, model, cfg)
    batch = gen_batch(family, rng_np, 12, 2)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.msgpack")
        save_checkpoint(path, state)
        restored = load_checkpoint(path, state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, restored)
        # a further step from restored equals a further step from original
        batch2 = gen_batch(family, rng_np, 12, 2)
        s1, c1 = step(state, batch2, jax.random.PRNGKey(2))
        s2, c2 = step(restored, batch2, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(c1), float(c2), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6), s1.params, s2.params)
