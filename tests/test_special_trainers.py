"""Specialized trainer tests: RCPSP, MKP PH_items transformer, CVRP-NLS."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepaco_tpu.core.rcpsp import load_psplib, make_rcpsp
from deepaco_tpu.models.transformer import TransformerModel
from deepaco_tpu.train.reinforce import TrainState
from deepaco_tpu.train.special import (
    cvrp_nls_train_step,
    make_cvrp_nls_train_fns,
    make_mkp_items_train_step,
    train_rcpsp,
)

ARCHIVE = "/root/reference/data/rcpsp/psplib.tar.gz"


def test_rcpsp_training_step_runs():
    insts = load_psplib(ARCHIVE, "j30rcp", limit=2)
    # re-bucket to a common padded t_max so both share one compile
    t_max = max(i.t_max for i in insts)
    insts = [make_rcpsp(np.asarray(i.duration), np.asarray(i.resources),
                        np.asarray(i.capacity), np.asarray(i.adj),
                        max_total_time=t_max) for i in insts]
    model, state = train_rcpsp(insts, epochs=1, steps_per_epoch=2, n_ants=4)
    assert int(state.step) == 2
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(state.params))


def test_mkp_items_transformer_training():
    rng = np.random.default_rng(0)
    n, m = 20, 5
    prize = jnp.asarray(rng.random(n), jnp.float32)
    weight = jnp.asarray(rng.random((n, m)) * 0.2, jnp.float32)
    model = TransformerModel()
    src = jnp.concatenate([prize[:, None], weight], axis=1)
    variables = model.init(jax.random.PRNGKey(0), src)
    tx = optax.adamw(3e-4)
    state = TrainState(params=variables["params"], batch_stats={},
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_mkp_items_train_step(model, tx, n_ants=8)
    state2, obj = step(state, prize, weight, jax.random.PRNGKey(1))
    assert np.isfinite(float(obj))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_cvrp_nls_training_step():
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.core import builders

    rng = np.random.default_rng(1)
    n = 15
    coords = rng.random((n + 1, 2)).astype(np.float32)
    dist = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(dist, 1e-10)
    demand = np.concatenate([[0.0], rng.integers(1, 10, n)]).astype(np.float32) / 30.0

    model = Net()
    g = builders.cvrp_nls_graph(jnp.asarray(demand), jnp.asarray(dist), k=5)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adamw(1e-4))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    sample_fn, grad_fn = make_cvrp_nls_train_fns(model, tx, k_sparse=5,
                                                 n_ants=6)
    state2, ls_cost, raw_cost = cvrp_nls_train_step(
        state, sample_fn, grad_fn, demand, dist, jax.random.PRNGKey(2))
    assert ls_cost <= raw_cost + 1e-6        # LS can only improve
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
