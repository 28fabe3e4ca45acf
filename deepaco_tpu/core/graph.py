"""Regular sparse instance graphs: fixed ``[N, K]`` neighbor/value layout.

The reference builds PyG ``Data(x, edge_index[2, N*K], edge_attr)`` from a
top-k sparsification of the distance matrix (reference tsp/utils.py:16-36).
Because every node gets exactly ``k`` outgoing edges, that edge list is secretly
*regular*: edge ``e = i*K + j`` runs from node ``i`` to ``nbr[i, j]``. We keep
that regularity explicit — neighbor indices ``[N, K]`` and edge features
``[N, K, E]`` — so GNN aggregation is a gather + mean over a static axis
(no scatter, no segment ops, XLA tiles it straight onto the VPU/MXU) and
shapes stay static under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseGraph(NamedTuple):
    """A k-regular directed graph over ``n`` nodes (a pytree of arrays).

    Attributes:
      x:    ``[N, F]`` node features.
      nbr:  ``[N, K]`` int32 — ``nbr[i, j]`` is the destination of edge (i, j).
      edge: ``[N, K, E]`` edge features (E=1: distance; RCPSP uses E=2).
    """

    x: jax.Array
    nbr: jax.Array
    edge: jax.Array

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def k(self) -> int:
        return self.nbr.shape[1]


def knn_graph(coords: jax.Array, dist: jax.Array, k: int,
              node_feats: jax.Array | None = None) -> SparseGraph:
    """Top-k nearest-neighbor sparsification (reference tsp/utils.py:26-35).

    ``dist`` must carry a large diagonal sentinel so self-loops never enter the
    top-k (the reference sets diag=1e9, tsp/utils.py:13).
    """
    neg_topk, idx = jax.lax.top_k(-dist, k)  # smallest k distances per row
    edge = (-neg_topk)[..., None]
    x = coords if node_feats is None else node_feats
    return SparseGraph(x=x, nbr=idx.astype(jnp.int32), edge=edge)


def scatter_to_dense(graph: SparseGraph, vec: jax.Array, fill: float = 0.0) -> jax.Array:
    """Scatter a per-edge vector ``[N, K]`` into a dense ``[N, N]`` matrix.

    Mirrors ``Net.reshape`` (reference tsp/net.py:94-102): zero padding off the
    sparse support. Duplicate (i, j) edges resolve to the last write, matching
    torch advanced-indexing assignment.
    """
    n, k = graph.nbr.shape
    dense = jnp.full((n, n), fill, dtype=vec.dtype)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    return dense.at[rows, graph.nbr].set(vec)


def gather_from_dense(graph: SparseGraph, mat: jax.Array) -> jax.Array:
    """Gather dense ``[N, N]`` values onto the sparse support → ``[N, K]``."""
    n, k = graph.nbr.shape
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    return mat[rows, graph.nbr]


def sparse_distance_matrix(dist: jax.Array, k: int, big: float = 1e10) -> jax.Array:
    """Classic-ACO sparsified heuristic support (reference tsp/aco.py:51-67).

    Keeps each row's k smallest distances, sets the rest to ``big``; the
    classic-ACO heuristic is then ``1 / sparse_dist``.
    """
    neg_topk, idx = jax.lax.top_k(-dist, k)
    n = dist.shape[0]
    out = jnp.full_like(dist, big)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    return out.at[rows, idx].set(-neg_topk)
