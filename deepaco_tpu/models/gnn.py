"""Anisotropic edge-gated GNN heuristic network (Flax, ``[N, K]`` layout).

Re-derivation of the reference EmbNet/ParNet/Net family (reference
tsp/net.py:8-102 and its per-problem clones) for TPU:

* The reference runs 12 residual layers over a PyG edge list with
  ``global_mean_pool`` as a scatter-mean keyed by source node
  (tsp/net.py:43). On the k-regular top-k graph every node owns exactly K
  out-edges, so the scatter-mean is an ordinary ``mean`` over a static axis
  of a ``[N, K, U]`` tensor — gather + VPU reduce, no segment ops.
* All Linears are ``[U, U]`` matmuls over N (or N*K) rows — MXU food. We keep
  them fp32 by default for checkpoint parity; ``dtype=bfloat16`` is a flag.
* BatchNorm matches ``torch_geometric.nn.BatchNorm`` semantics (eps 1e-5,
  momentum 0.1 torch-convention) so pretrained torch checkpoints reproduce
  activations exactly (see models/torch_compat.py).

Per-problem switches cataloged in SURVEY §2.1:
  feats ∈ {1, 2, 5, 6}; edge_feats ∈ {1, 2} (rcpsp/net.py:8-47);
  node_update=False for SOP/SMTWTP (sop/net.py:42, smtwtp/net.py:42);
  rcpsp pads node features to ``feats`` width (rcpsp/net.py:31-32);
  dual heads (phe + heu) for tsp/ and rcpsp/ (tsp/net.py:78-88).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepaco_tpu.core.graph import SparseGraph


class EmbNet(nn.Module):
    """Edge-embedding GNN: 12 gated residual layers → edge embeddings [N, K, U].

    Node update: ``x ← x + act(BN(W1 x + mean_k(σ(w) ⊙ W2 x[nbr])))``
    Edge update: ``w ← w + act(BN(W5 w + W3 x[src] + W4 x[dst]))``
    (reference tsp/net.py:34-44).
    """

    depth: int = 12
    units: int = 32
    act: str = "silu"
    node_update: bool = True   # False for SOP/SMTWTP variants
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: SparseGraph, *, train: bool = False):
        act = getattr(nn, self.act)
        dense = lambda name: nn.Dense(self.units, name=name, dtype=self.dtype)

        def bn(name):
            return nn.BatchNorm(
                name=name, use_running_average=not train,
                momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        x = act(dense("v_lin0")(g.x.astype(self.dtype)))          # [N, U]
        w = act(dense("e_lin0")(g.edge.astype(self.dtype)))       # [N, K, U]
        nbr = g.nbr

        for i in range(self.depth):
            x0, w0 = x, w
            x1 = dense(f"v_lins1_{i}")(x0)
            x2 = dense(f"v_lins2_{i}")(x0)
            x3 = dense(f"v_lins3_{i}")(x0)
            x4 = dense(f"v_lins4_{i}")(x0)
            w1 = dense(f"e_lins0_{i}")(w0)
            gate = jax.nn.sigmoid(w0)                              # [N, K, U]
            # scatter-mean over out-edges == mean over the static K axis
            agg = jnp.mean(gate * x2[nbr], axis=1)                 # [N, U]
            if self.node_update:
                x = x0 + act(bn(f"v_bns_{i}")(x1 + agg))
            w = w0 + act(bn(f"e_bns_{i}")(w1 + x3[:, None, :] + x4[nbr]))
        return w


class ParNet(nn.Module):
    """Edge-logit head: 3-layer MLP, act hidden, sigmoid out, squeeze → [N, K].

    (reference tsp/net.py:48-75; MKP transformer uses act='relu').
    """

    depth: int = 3
    units: int = 32
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, w):
        act = getattr(nn, self.act)
        for i in range(self.depth - 1):
            w = act(nn.Dense(self.units, name=f"lin_{i}", dtype=self.dtype)(w))
        w = jax.nn.sigmoid(nn.Dense(1, name=f"lin_{self.depth - 1}", dtype=self.dtype)(w))
        return jnp.squeeze(w, axis=-1)


class Net(nn.Module):
    """EmbNet + heuristic head (optionally + pheromone head).

    ``__call__`` returns the per-edge heuristic vector ``[N, K]`` (the dense
    ``[n, n]`` matrix is produced by ``core.graph.scatter_to_dense``, the
    analog of ``Net.reshape`` at reference tsp/net.py:94-102). With
    ``dual_heads=True`` (tsp/, rcpsp/) returns ``(phe, heu)``.
    """

    depth: int = 12
    units: int = 32
    node_update: bool = True
    dual_heads: bool = False
    pad_feats: int = 0          # rcpsp pads node feats to this width if > 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: SparseGraph, *, train: bool = False):
        if self.pad_feats and g.x.shape[-1] < self.pad_feats:
            pad = self.pad_feats - g.x.shape[-1]
            g = g._replace(x=jnp.pad(g.x, ((0, 0), (0, pad))))
        emb = EmbNet(depth=self.depth, units=self.units,
                     node_update=self.node_update, dtype=self.dtype,
                     name="emb_net")(g, train=train)
        heu = ParNet(units=self.units, dtype=self.dtype, name="par_net_heu")(emb)
        if self.dual_heads:
            phe = ParNet(units=self.units, dtype=self.dtype, name="par_net_phe")(emb)
            return phe, heu
        return heu
