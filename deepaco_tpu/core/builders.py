"""Per-problem GNN input-graph builders.

Each mirrors the corresponding reference ``gen_pyg_data`` but produces the
block-regular layouts of :mod:`deepaco_tpu.models.gnn` instead of PyG edge
lists:

  TSP       top-k kNN, node feats = coords            (tsp/utils.py:16-36)
  TSP-NLS   top-k kNN, node feats = one-hot start     (tsp_nls/utils.py:17-45)
  CVRP      dense incl. self-loops, feats = demand    (cvrp/utils.py:24-33)
  CVRP-NLS  customer kNN + depot star, two blocks     (cvrp_nls/utils.py:35-60)
  OP        top-k kNN, feats = (dist-to-depot, prize) (op/utils.py:26-48)
  PCTSP     dense, feats = (prize, penalty)           (pctsp/utils.py:31-40)
  SMTWTP    dense over n+1 jobs, attr = proc[dst]     (smtwtp/utils.py:5-22)
  MKP       dense, feats = weights, attr = prize[dst]? (mkp/utils.py:27-36 —
            attr = prize[src]; see note below)
  SOP       masked dense on allowed-successor edges   (sop/utils.py:52-58)
  RCPSP     masked dense: precedence + no-relation    (rcpsp_inst.py:202-222)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.core.graph import SparseGraph, knn_graph
from deepaco_tpu.models.gnn import EdgeBlock


def _dense_nbr(n: int) -> jax.Array:
    return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))


# ----------------------------------------------------------------- TSP -----
def tsp_graph(coords, dist, k: int) -> SparseGraph:
    return knn_graph(coords, dist, k)


def tsp_nls_graph(coords, dist, k: int, start_node: int = 0) -> SparseGraph:
    """Start-node one-hot feature variant (tsp_nls/utils.py:37-45)."""
    n = coords.shape[0]
    x = jnp.zeros((n, 1), jnp.float32).at[start_node, 0].set(1.0)
    return knn_graph(coords, dist, k, node_feats=x)


# ---------------------------------------------------------------- CVRP -----
def cvrp_graph(demands, dist) -> SparseGraph:
    """Vanilla CVRP: dense graph including self-loops (cvrp/utils.py:24-33);
    this IS k-regular with K = N."""
    n = dist.shape[0]
    return SparseGraph(x=demands[:, None], nbr=_dense_nbr(n),
                       edge=dist[..., None])


def cvrp_nls_graph(demands, dist, k: int = 5):
    """Two-block layout (cvrp_nls/utils.py:35-60): block A = each customer's
    k nearest customers + its depot edge (k+1 out-edges); block B = the depot
    row with all n-1 customers. Edge attrs are distances; depot-edge attrs use
    ``dist[cust, 0]`` both ways (the reference reuses edge_attr_2)."""
    n = dist.shape[0]
    cust = jnp.arange(1, n, dtype=jnp.int32)
    sub = dist[1:, 1:]
    neg_topk, idx = jax.lax.top_k(-sub, k)
    nbr_a = jnp.concatenate(
        [idx.astype(jnp.int32) + 1,
         jnp.zeros((n - 1, 1), jnp.int32)], axis=1)          # [n-1, k+1]
    depot_attr = dist[1:, 0]
    edge_a = jnp.concatenate(
        [(-neg_topk)[..., None], depot_attr[:, None, None]], axis=1)
    block_a = EdgeBlock(src=cust, nbr=nbr_a, edge=edge_a, mask=None)
    block_b = EdgeBlock(
        src=jnp.zeros((1,), jnp.int32),
        nbr=cust[None, :],
        edge=depot_attr[None, :, None],
        mask=None)
    x = demands[:, None].astype(jnp.float32)
    return (x, (block_a, block_b))


# ------------------------------------------------------------------ OP -----
def op_graph(coords, dist, prizes, k: int) -> SparseGraph:
    dis_to_depot = jnp.linalg.norm(coords - coords[0][None, :], axis=-1)
    x = jnp.stack([dis_to_depot, prizes], axis=1)
    return knn_graph(coords, dist, k, node_feats=x)


def op_prizes(coords) -> jax.Array:
    """Prize-by-distance rule (op/utils.py:5-11)."""
    d = jnp.linalg.norm(coords - coords[0][None, :], axis=-1)
    prizes = 1.0 + jnp.floor(99.0 * d / jnp.max(d))
    return prizes / jnp.max(prizes)


# --------------------------------------------------------------- PCTSP -----
def pctsp_graph(prizes, penalties, dist) -> SparseGraph:
    n = dist.shape[0]
    x = jnp.stack([prizes, penalties], axis=1)
    return SparseGraph(x=x, nbr=_dense_nbr(n), edge=dist[..., None])


# -------------------------------------------------------------- SMTWTP -----
def smtwtp_graph(due_norm, weights, processing) -> SparseGraph:
    """Dense over n+1 jobs; x = [[0,0], (due_norm, weight)...]; edge attr of
    (i, j) = processing time of j (smtwtp/utils.py:5-22)."""
    n = due_norm.shape[0]
    x = jnp.concatenate(
        [jnp.zeros((1, 2), jnp.float32),
         jnp.stack([due_norm, weights], axis=1)], axis=0)
    proc_e = jnp.concatenate([jnp.zeros((1,), jnp.float32), processing])
    edge = jnp.broadcast_to(proc_e[None, :, None], (n + 1, n + 1, 1))
    return SparseGraph(x=x, nbr=_dense_nbr(n + 1), edge=edge)


# ----------------------------------------------------------------- MKP -----
def mkp_graph(prize, weight) -> SparseGraph:
    """Dense; x = weight matrix [n, m]; edge attr of (u, v) = prize[u]
    (mkp/utils.py:27-36: ``prize.repeat(n)`` indexed by the fast-varying
    ``u = nodes.repeat(n)`` — the attr follows the SOURCE node)."""
    n = prize.shape[0]
    # reference edge e has (u, v) = (e % n, e // n) and attr prize[e % n]:
    # in [N, K] row-major layout with row=src that means attr = prize[src]...
    # but PyG aggregation keys on edge_index[0]=u=src, so out-edges of node i
    # all carry prize[i].
    edge = jnp.broadcast_to(prize[:, None, None], (n, n, 1))
    return SparseGraph(x=weight, nbr=_dense_nbr(n), edge=edge)


# ----------------------------------------------------------------- SOP -----
def sop_graph(dist, adj) -> tuple:
    """Masked dense block over allowed-successor edges (sop/utils.py:52-58):
    ``adj[i, j] = 1`` iff j may come after i. x = cost row 0."""
    n = dist.shape[0]
    x = dist[0, :][:, None]
    block = EdgeBlock(src=None, nbr=_dense_nbr(n), edge=dist[..., None],
                      mask=adj.astype(jnp.float32))
    return (x, (block,))


# --------------------------------------------------------------- RCPSP -----
def rcpsp_graph(data) -> tuple:
    """Masked dense block with 2-dim edge-type attrs (rcpsp_inst.py:202-222):
    precedence edges -> [1, 0]; "no-relation" edges (neither ancestor nor
    descendant) -> [0, 1]; plus the reference's extra self-loop at the sink
    with attr [0, 0]. Node feats = [duration/max, resources/capacity]."""
    adj = np.asarray(data.adj)
    n = adj.shape[0]
    reach = adj.astype(bool).copy()
    # transitive closure (succ); n <= 122
    for _ in range(n):
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    related = reach | reach.T | np.eye(n, dtype=bool)
    no_rel = ~related

    t = np.asarray(data.duration, np.float32)
    t = t / max(t.max(), 1.0)
    r = np.asarray(data.resources, np.float32) / np.asarray(data.capacity)
    x = jnp.asarray(np.hstack([t[:, None], r]), jnp.float32)

    prec_feat = adj.astype(np.float32)
    norel_feat = no_rel.astype(np.float32)
    edge = jnp.asarray(np.stack([prec_feat, norel_feat], axis=-1))
    mask = np.logical_or(adj, no_rel)
    mask[n - 1, n - 1] = True      # the reference's extra [0,0]-attr self-loop
    block = EdgeBlock(src=None, nbr=_dense_nbr(n), edge=edge,
                      mask=jnp.asarray(mask, jnp.float32))
    return (x, (block,))
