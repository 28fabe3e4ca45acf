"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates: (instance, ant) mesh construction, the sharded train step
compiling + executing with real shardings, and numerical equivalence of the
sharded step with the single-device step (same keys → same params delta).
"""
import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.models.gnn import Net
from deepaco_tpu.parallel.mesh import make_mesh, make_sharded_tsp_train_step
from deepaco_tpu.train.config import ACOSettings, ProblemConfig, TrainConfig
from deepaco_tpu.train.reinforce import init_train_state


def cfg_for(batch):
    return ProblemConfig(
        n_nodes=12, k_sparse=6,
        aco=ACOSettings(n_ants=8),
        train=TrainConfig(epochs=1, steps_per_epoch=1, batch_size=batch))


def test_mesh_shapes():
    mesh = make_mesh(n_instance=4, n_ant=2)
    assert mesh.shape == {"instance": 4, "ant": 2}
    mesh = make_mesh(n_ant=2)
    assert mesh.shape == {"instance": 4, "ant": 2}


def test_sharded_train_step_runs():
    assert jax.device_count() == 8
    mesh = make_mesh(n_instance=4, n_ant=2)
    cfg = cfg_for(batch=4)
    model = Net()
    with mesh:
        state = init_train_state(model, cfg, jax.random.PRNGKey(0))
        step = make_sharded_tsp_train_step(model, cfg, mesh)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        state2, cost = step(state, keys)
        assert np.isfinite(float(cost))
        p0 = np.asarray(state.params["emb_net"]["v_lin0"]["kernel"])
        p1 = np.asarray(state2.params["emb_net"]["v_lin0"]["kernel"])
        assert not np.allclose(p0, p1)


def test_sharded_matches_single_device():
    """Same PRNG keys → the sharded step must reproduce the local step."""
    from deepaco_tpu.train.reinforce import make_tsp_train_step

    cfg = cfg_for(batch=4)
    model = Net()
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)

    mesh = make_mesh(n_instance=4, n_ant=2)
    with mesh:
        sharded_step = make_sharded_tsp_train_step(model, cfg, mesh)
        s_sharded, cost_sharded = sharded_step(state, keys)

    # local step generates its own keys from a single rng; to compare we call
    # the sharded step on a 1-device mesh instead (same key pipeline).
    mesh1 = make_mesh(n_instance=1, n_ant=1, devices=jax.devices()[:1])
    with mesh1:
        local_step = make_sharded_tsp_train_step(model, cfg, mesh1)
        s_local, cost_local = local_step(state, keys)

    np.testing.assert_allclose(float(cost_sharded), float(cost_local),
                               rtol=1e-5)
    # Compare batch-stats (a pure forward-path reduction): byte-stable modulo
    # fp reduction order. (Post-AdamW params are NOT comparable: the first
    # Adam step normalizes near-zero grads to +-lr, amplifying reduction-order
    # noise into sign flips — so we check the forward path and the loss.)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_sharded.batch_stats, s_local.batch_stats)


def test_colony_sharded_evaluation_matches_single_device():
    """Instance-sharded anytime sweep must reproduce the unsharded curves."""
    import numpy as np
    from jax.sharding import Mesh

    from deepaco_tpu.families import get_family
    from deepaco_tpu.train.drivers import evaluate_family, gen_batch

    family = get_family("tsp")
    batch = gen_batch(family, np.random.default_rng(0), 16, 8)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), axis_names=("instance",))
    m1, c1 = evaluate_family("tsp", batch, n_nodes=16, k_sparse=6, n_ants=6,
                             t_values=(1, 4), seed=3)
    m2, c2 = evaluate_family("tsp", batch, n_nodes=16, k_sparse=6, n_ants=6,
                             t_values=(1, 4), seed=3, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5)


def test_multi_colony_island_search():
    """Island-model colony sharding: 8 colonies, periodic best-tour migration
    + pheromone blending. With migration off, the search degrades to parallel
    restarts whose global best must equal the min over 8 independent
    single-colony runs with the same folded keys."""
    from deepaco_tpu.aco import pheromone as ph
    from deepaco_tpu.aco.problems.tsp import tour_cost, tsp_spec
    from deepaco_tpu.aco.runner import ACOConfig, init_search, run_anytime
    from deepaco_tpu.parallel.mesh import make_mesh, multi_colony_tsp_search
    from deepaco_tpu.utils.datasets import distance_matrix

    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.random((14, 2)), jnp.float32)
    dist = distance_matrix(coords)
    heu = 1.0 / dist
    cfg = ACOConfig(n_ants=6)
    mesh = make_mesh(n_instance=8, n_ant=1)
    key = jax.random.PRNGKey(9)

    curve = np.asarray(multi_colony_tsp_search(
        mesh, heu, dist, cfg, key, n_rounds=3, sync_every=2,
        migrate_weight=1.0, blend=0.25))
    assert curve.shape == (3,)
    assert np.all(np.isfinite(curve))
    assert np.all(np.diff(curve) <= 1e-6)  # global best is monotone

    # migration/blending off == parallel restarts: reproduce serially
    curve0 = np.asarray(multi_colony_tsp_search(
        mesh, heu, dist, cfg, key, n_rounds=2, sync_every=2,
        migrate_weight=0.0, blend=0.0))
    best = np.inf
    for colony in range(8):
        ck = jax.random.fold_in(key, colony)
        ks = jax.random.split(ck, 2)
        state = init_search(14, 13, cfg)
        spec_factory = lambda tau: tsp_spec(tau, heu, cfg.n_ants, None)
        cost_fn = lambda paths: tour_cost(dist, paths)
        for r in range(2):
            state, _ = jax.jit(run_anytime, static_argnums=(0, 1, 2, 5))(
                spec_factory, cost_fn, cfg, state, ks[r], 2)
        best = min(best, float(state.best_cost))
    np.testing.assert_allclose(curve0[-1], best, rtol=1e-6)
