"""Numerics parity across ALL pretrained GNN checkpoint families.

For every problem family we: build the instance graph with our builders,
load the committed reference checkpoint into the Flax Net, and compare the
heuristic vector against a plain-torch emulation of the reference forward
(net.py clones differ only in feats/edge_feats/node_update flags) run on the
same edge list in eval mode. This is the BASELINE.md "per-layer activations
matched" oracle, extended beyond TSP.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepaco_tpu.core import builders
from deepaco_tpu.core.graph import knn_graph
from deepaco_tpu.models.gnn import Net
from deepaco_tpu.models.torch_compat import load_reference_checkpoint

PRE = "/root/reference/pretrained"


def torch_forward(sd, x, edge_index, edge_attr, depth=12, node_update=True,
                  head="par_net_heu"):
    """Eval-mode emulation of the reference EmbNet+ParNet on a flat edge list
    (tsp/net.py:27-45 and clones; segment mean over variable out-degrees)."""
    silu = torch.nn.functional.silu
    n = x.shape[0]
    src, dst = edge_index

    def lin(p, v):
        return v @ sd[f"{p}.weight"].T + sd[f"{p}.bias"]

    def bn(p, v):
        return ((v - sd[f"{p}.module.running_mean"])
                / torch.sqrt(sd[f"{p}.module.running_var"] + 1e-5)
                * sd[f"{p}.module.weight"] + sd[f"{p}.module.bias"])

    def seg_mean(vals, idx):
        out = torch.zeros(n, vals.shape[1])
        out.index_add_(0, idx, vals)
        cnt = torch.zeros(n).index_add_(
            0, idx, torch.ones(len(idx))).clamp(min=1)
        return out / cnt[:, None]

    x = silu(lin("emb_net.v_lin0", x))
    w = silu(lin("emb_net.e_lin0", edge_attr))
    for i in range(depth):
        x0, w0 = x, w
        x1 = lin(f"emb_net.v_lins1.{i}", x0)
        x2 = lin(f"emb_net.v_lins2.{i}", x0)
        x3 = lin(f"emb_net.v_lins3.{i}", x0)
        x4 = lin(f"emb_net.v_lins4.{i}", x0)
        w1 = lin(f"emb_net.e_lins0.{i}", w0)
        if node_update:
            agg = seg_mean(torch.sigmoid(w0) * x2[dst], src)
            x = x0 + silu(bn(f"emb_net.v_bns.{i}", x1 + agg))
        w = w0 + silu(bn(f"emb_net.e_bns.{i}", w1 + x3[src] + x4[dst]))

    h = silu(lin(f"{head}.lins.0", w))
    h = silu(lin(f"{head}.lins.1", h))
    return torch.sigmoid(lin(f"{head}.lins.2", h)).squeeze(-1)


def blocks_to_edge_list(x, blocks):
    """Flatten our block layout into (edge_index, edge_attr) torch tensors."""
    srcs, dsts, attrs, masks = [], [], [], []
    n = x.shape[0]
    for b in blocks:
        src = np.arange(n) if b.src is None else np.asarray(b.src)
        r, k = b.nbr.shape
        s = np.repeat(src, k)
        d = np.asarray(b.nbr).reshape(-1)
        a = np.asarray(b.edge).reshape(r * k, -1)
        m = (np.ones(r * k, bool) if b.mask is None
             else np.asarray(b.mask).reshape(-1) > 0)
        srcs.append(s[m]); dsts.append(d[m]); attrs.append(a[m])
        masks.append(m)
    edge_index = torch.tensor(np.stack([np.concatenate(srcs),
                                        np.concatenate(dsts)]))
    edge_attr = torch.tensor(np.concatenate(attrs), dtype=torch.float32)
    return edge_index, edge_attr, masks


def compare(ckpt, graph, node_update=True, dual_heads=False, pad_feats=0,
            rtol=5e-4, atol=5e-5):
    variables = load_reference_checkpoint(ckpt)
    model = Net(node_update=node_update, dual_heads=dual_heads,
                pad_feats=pad_feats)
    out = model.apply(variables, graph, train=False)
    heu = out[1] if dual_heads else out

    from deepaco_tpu.core.graph import SparseGraph

    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    if not isinstance(graph, SparseGraph):
        x, blocks = graph
        edge_index, edge_attr, masks = blocks_to_edge_list(x, blocks)
        ref = torch_forward(sd, torch.tensor(np.asarray(x)), edge_index,
                            edge_attr, node_update=node_update)
        ours = np.concatenate([
            np.asarray(h).reshape(-1)[m]
            for h, m in zip(heu if isinstance(heu, list) else [heu], masks)])
    else:
        n, k = graph.nbr.shape
        edge_index = torch.tensor(np.stack([
            np.repeat(np.arange(n), k), np.asarray(graph.nbr).reshape(-1)]))
        edge_attr = torch.tensor(
            np.asarray(graph.edge).reshape(n * k, -1), dtype=torch.float32)
        ref = torch_forward(sd, torch.tensor(np.asarray(graph.x)),
                            edge_index, edge_attr, node_update=node_update)
        ours = np.asarray(heu).reshape(-1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=rtol, atol=atol)


def coords_dist(n, seed, diag=1e9):
    rng = np.random.default_rng(seed)
    coords = rng.random((n, 2)).astype(np.float32)
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
    np.fill_diagonal(d, diag)
    return jnp.asarray(coords), jnp.asarray(d)


def test_cvrp_dense():
    rng = np.random.default_rng(0)
    coords, d = coords_dist(40, 0, diag=1e-10)
    demands = jnp.asarray(np.concatenate([[0], rng.integers(1, 10, 39)]),
                          jnp.float32)
    g = builders.cvrp_graph(demands, d)
    compare(f"{PRE}/cvrp/cvrp100.pt", g)


def test_cvrp_nls_two_block():
    rng = np.random.default_rng(1)
    coords, d = coords_dist(30, 1, diag=1e-10)
    demands = jnp.asarray(np.concatenate([[0], rng.random(29)]), jnp.float32)
    g = builders.cvrp_nls_graph(demands, d, k=5)
    compare(f"{PRE}/cvrp_nls/cvrp100.pt", g)


def test_op_knn():
    coords, d = coords_dist(50, 2)
    prizes = builders.op_prizes(coords)
    g = builders.op_graph(coords, d, prizes, k=10)
    compare(f"{PRE}/op/op100.pt", g)


def test_pctsp_dense():
    rng = np.random.default_rng(3)
    coords, d = coords_dist(30, 3, diag=0.0)
    d = jnp.asarray(np.where(np.eye(30, dtype=bool), 0.0, np.asarray(d)))
    prizes = jnp.asarray(np.concatenate([[0], rng.random(29)]), jnp.float32)
    pens = jnp.asarray(np.concatenate([[0], rng.random(29) * .3]), jnp.float32)
    g = builders.pctsp_graph(prizes, pens, d)
    compare(f"{PRE}/pctsp/pctsp100.pt", g)


def test_smtwtp_dense_no_node_update():
    rng = np.random.default_rng(4)
    n = 25
    due_norm = jnp.asarray(rng.random(n), jnp.float32)
    weights = jnp.asarray(rng.random(n), jnp.float32)
    proc = jnp.asarray(rng.random(n), jnp.float32)
    g = builders.smtwtp_graph(due_norm, weights, proc)
    compare(f"{PRE}/smtwtp/smtwtp50.pt", g, node_update=False)


def test_mkp_dense():
    rng = np.random.default_rng(5)
    n, m = 30, 5
    prize = jnp.asarray(rng.random(n), jnp.float32)
    weight = jnp.asarray(rng.random((n, m)), jnp.float32)
    g = builders.mkp_graph(prize, weight)
    compare(f"{PRE}/mkp/mkp300.pt", g)


def test_sop_masked_no_node_update():
    rng = np.random.default_rng(6)
    n = 20
    dist = jnp.asarray(rng.random((n, n)), jnp.float32)
    adj = np.ones((n, n)); np.fill_diagonal(adj, 0)
    adj[5, 3] = 0; adj[7, 2] = 0  # some forbidden successor edges
    g = builders.sop_graph(dist, jnp.asarray(adj, jnp.float32))
    compare(f"{PRE}/sop/sop50.pt", g, node_update=False)


def test_rcpsp_masked_edge_feats():
    from deepaco_tpu.core.rcpsp import load_psplib

    data = load_psplib("/root/reference/data/rcpsp/psplib.tar.gz",
                       "j30rcp", limit=1)[0]
    g = builders.rcpsp_graph(data)
    compare(f"{PRE}/rcpsp/rcpsp30-5.pt", g, pad_feats=5)


def test_tsp_nls_one_hot_start():
    coords, d = coords_dist(40, 7)
    g = builders.tsp_nls_graph(coords, d, k=10, start_node=0)
    compare(f"{PRE}/tsp_nls/tsp500.pt", g)
