"""Numerics oracle: Flax GNN must reproduce the reference torch net.

The reference net (tsp/net.py:8-102) is emulated here in plain torch (PyG is
not installed; on the k-regular top-k graph ``global_mean_pool`` keyed by
source node is an exact segment mean with k elements per segment, and
``gnn.BatchNorm`` in eval mode is BatchNorm1d eval). Weights come from the
committed pretrained checkpoint ``pretrained/tsp/tsp20.pt`` so the comparison
pins real production numerics, not random init.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deepaco_tpu.core.graph import knn_graph, scatter_to_dense
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint

CKPT = "/root/reference/pretrained/tsp/tsp20.pt"


def torch_reference_forward(sd, x, nbr, edge_attr, depth=12):
    """Eval-mode forward of the reference Net (tsp/net.py:27-45, 59-75, 84-88)."""
    silu = torch.nn.functional.silu

    def lin(prefix, v):
        return v @ sd[f"{prefix}.weight"].T + sd[f"{prefix}.bias"]

    def bn(prefix, v):
        mean = sd[f"{prefix}.module.running_mean"]
        var = sd[f"{prefix}.module.running_var"]
        w = sd[f"{prefix}.module.weight"]
        b = sd[f"{prefix}.module.bias"]
        return (v - mean) / torch.sqrt(var + 1e-5) * w + b

    n, k = nbr.shape
    src = torch.arange(n).repeat_interleave(k)          # edge_index[0]
    dst = nbr.reshape(-1)                               # edge_index[1]

    x = silu(lin("emb_net.v_lin0", x))
    w = silu(lin("emb_net.e_lin0", edge_attr))          # [n*k, U]
    for i in range(depth):
        x0, w0 = x, w
        x1 = lin(f"emb_net.v_lins1.{i}", x0)
        x2 = lin(f"emb_net.v_lins2.{i}", x0)
        x3 = lin(f"emb_net.v_lins3.{i}", x0)
        x4 = lin(f"emb_net.v_lins4.{i}", x0)
        w1 = lin(f"emb_net.e_lins0.{i}", w0)
        w2 = torch.sigmoid(w0)
        # global_mean_pool(w2 * x2[dst], src) — k-regular segment mean
        agg = (w2 * x2[dst]).reshape(n, k, -1).mean(dim=1)
        x = x0 + silu(bn(f"emb_net.v_bns.{i}", x1 + agg))
        w = w0 + silu(bn(f"emb_net.e_bns.{i}", w1 + x3[src] + x4[dst]))

    # par_net_heu: MLP silu, silu, sigmoid (tsp/net.py:59-75)
    h = silu(lin("par_net_heu.lins.0", w))
    h = silu(lin("par_net_heu.lins.1", h))
    h = torch.sigmoid(lin("par_net_heu.lins.2", h)).squeeze(-1)
    return h                                            # [n*k]


@pytest.fixture(scope="module")
def instance():
    torch.manual_seed(7)
    coords = torch.rand(20, 2)
    dist = torch.cdist(coords, coords)
    dist[torch.arange(20), torch.arange(20)] = 1e9
    k = 10
    topk_values, topk_indices = torch.topk(dist, k=k, dim=1, largest=False)
    return coords, dist, topk_indices, topk_values


def test_heuristic_vector_allclose(instance):
    coords, dist, nbr, vals = instance
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)

    ref = torch_reference_forward(
        sd, coords, nbr, vals.reshape(-1, 1)).numpy().reshape(20, 10)

    g = knn_graph(jnp.asarray(coords.numpy()), jnp.asarray(dist.numpy()), k=10)
    np.testing.assert_array_equal(np.asarray(g.nbr), nbr.numpy())
    np.testing.assert_allclose(
        np.asarray(g.edge[..., 0]), vals.numpy(), rtol=1e-6, atol=1e-6)

    model = Net(dual_heads=True)
    variables = load_reference_checkpoint(CKPT)
    phe, heu = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        g, train=False)

    np.testing.assert_allclose(np.asarray(heu), ref, rtol=2e-4, atol=2e-5)


def test_scatter_to_dense_matches_reference_reshape(instance):
    coords, dist, nbr, vals = instance
    g = knn_graph(jnp.asarray(coords.numpy()), jnp.asarray(dist.numpy()), k=10)
    vec = jnp.arange(200, dtype=jnp.float32).reshape(20, 10)
    dense = scatter_to_dense(g, vec)

    # reference Net.reshape (tsp/net.py:94-102) in torch
    mat = torch.zeros(20, 20)
    src = torch.arange(20).repeat_interleave(10)
    mat[src, nbr.reshape(-1)] = torch.arange(200, dtype=torch.float32)
    np.testing.assert_allclose(np.asarray(dense), mat.numpy())
