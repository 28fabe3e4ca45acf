"""Edge-partitioned GNN forward: numerics identical to the single-device net
on the virtual 8-device CPU mesh, in both eval and train (global-BN) modes.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepaco_tpu.core.graph import knn_graph
from deepaco_tpu.models.gnn import EmbNet
from deepaco_tpu.parallel.gnn_shard import sharded_embnet_forward
from deepaco_tpu.utils.datasets import distance_matrix


def setup(n=64, k=8, seed=0):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.random((n, 2)), jnp.float32)
    dist = distance_matrix(coords)
    g = knn_graph(coords, dist, k)
    model = EmbNet()
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    return model, variables, g


def make_mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8), axis_names=("instance",))


def test_eval_mode_matches_single_device():
    model, variables, g = setup()
    ref = model.apply(variables, g, train=False)
    mesh = make_mesh()
    out = sharded_embnet_forward(
        variables["params"]["emb_net"] if "emb_net" in variables["params"]
        else variables["params"],
        variables["batch_stats"].get("emb_net", variables["batch_stats"]),
        g.x, g.nbr, g.edge, mesh, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-5)


def test_train_mode_global_bn_matches_single_device():
    """psum-ed batch statistics must equal the full-batch moments."""
    model, variables, g = setup(seed=1)
    ref, _ = model.apply(variables, g, train=True, mutable=["batch_stats"])
    mesh = make_mesh()
    params = variables["params"]
    stats = variables["batch_stats"]
    out = sharded_embnet_forward(params, stats, g.x, g.nbr, g.edge, mesh,
                                 train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
