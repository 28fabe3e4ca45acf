"""Anisotropic edge-gated GNN heuristic network (Flax, block-regular layout).

Re-derivation of the reference EmbNet/ParNet/Net family (reference
tsp/net.py:8-102 and its per-problem clones) for TPU:

* The reference runs 12 residual layers over a PyG edge list with
  ``global_mean_pool`` as a scatter-mean keyed by source node
  (tsp/net.py:43). Most of the reference's graphs are k-regular (top-k kNN,
  tsp/utils.py:26-34) or fully dense (cvrp/utils.py:24-33), so edges live in
  a ``[N, K]`` array and the scatter-mean is an ordinary masked mean over a
  static axis — gather + VPU reduce, no segment ops.
* Irregular graphs decompose into a few *blocks of equal out-degree*:
  cvrp_nls's graph (k-NN over customers + depot star, cvrp_nls/utils.py:34-59)
  is block A = customers with k+1 out-edges and block B = the depot row with
  n-1 out-edges. Each block is regular; BatchNorm statistics are computed
  jointly across all blocks' edges, matching PyG's single flat edge list.
* RCPSP's precedence + no-relation edge set (rcpsp_inst.py:202-222) uses a
  dense ``[N, N]`` block with a validity mask (n <= 122).
* All Linears are ``[U, U]`` matmuls over N (or N*K) rows — MXU food. fp32 by
  default for checkpoint parity; ``dtype=bfloat16`` is a flag.
* BatchNorm matches ``torch_geometric.nn.BatchNorm`` semantics (eps 1e-5,
  torch momentum 0.1, biased batch variance for normalization, unbiased for
  the running update) so pretrained torch checkpoints reproduce activations
  exactly (models/torch_compat.py maps the weights).

Per-problem switches cataloged in SURVEY §2.1:
  feats ∈ {1, 2, 5, 6}; edge_feats ∈ {1, 2} (rcpsp/net.py:8-47);
  node_update=False for SOP/SMTWTP (sop/net.py:42, smtwtp/net.py:42);
  rcpsp pads node features to ``feats`` width (rcpsp/net.py:31-32);
  dual heads (phe + heu) for tsp/ and rcpsp/ (tsp/net.py:78-88).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepaco_tpu.core.graph import SparseGraph


class EdgeBlock(NamedTuple):
    """A regular block of out-edges: every row (source node) has Kb slots.

    src:  [R] int32 source-node ids (or None -> arange(N), the k-regular case)
    nbr:  [R, Kb] int32 destination ids
    edge: [R, Kb, E] edge features
    mask: [R, Kb] float {0,1} edge-validity (or None -> all valid)
    """

    src: jax.Array | None
    nbr: jax.Array
    edge: jax.Array
    mask: jax.Array | None


def as_blocks(g) -> tuple[Sequence[EdgeBlock], jax.Array]:
    """Normalize input (SparseGraph | (x, blocks)) to (blocks, node feats)."""
    if isinstance(g, SparseGraph):
        return (EdgeBlock(src=None, nbr=g.nbr, edge=g.edge, mask=None),), g.x
    x, blocks = g
    return tuple(blocks), x


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch/PyG numerics + optional element masking.

    Parameter/collection names match flax ``nn.BatchNorm`` ('scale', 'bias' /
    'mean', 'var') so ``torch_compat`` mappings stay valid. Batch statistics
    are computed over all leading axes (optionally weighted by ``mask``);
    normalization uses the biased variance, the running update the unbiased
    one, with torch momentum 0.1 (running = 0.9*running + 0.1*batch).
    """

    use_running_average: bool = True
    momentum: float = 0.9       # decay on the running stat (torch 1-0.1)
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), self.dtype))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            flat = x.reshape(-1, feat)
            if mask is None:
                count = jnp.asarray(flat.shape[0], self.dtype)
                mean = jnp.mean(flat, axis=0)
                var = jnp.mean((flat - mean) ** 2, axis=0)
            else:
                w = mask.reshape(-1, 1).astype(self.dtype)
                count = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(flat * w, axis=0) / count
                var = jnp.sum(w * (flat - mean) ** 2, axis=0) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense`` (identical param tree:
    kernel/bias under the module name) so fused Pallas kernels can consume
    the weights directly while checkpoints stay interchangeable."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class EmbNet(nn.Module):
    """Edge-embedding GNN: gated residual layers → per-block edge embeddings.

    Node update: ``x ← x + act(BN(W1 x + mean_k(σ(w) ⊙ W2 x[nbr])))``
    Edge update: ``w ← w + act(BN(W5 w + W3 x[src] + W4 x[dst]))``
    (reference tsp/net.py:34-44).

    ``use_pallas``: None (auto) fuses each layer's gather phase — the two
    neighbor gathers + gate/mean + e_lin matmul — into one Pallas kernel
    (ops/pallas_kernels.fused_gnn_layer, a single one-hot MXU pass) on TPU
    for regular single-block graphs; 3x faster than the XLA gather path at
    TSP500 shapes and exact to ~1e-6 (it accumulates in fp32 HIGHEST,
    tighter than XLA's default-precision matmul). True forces it (tests run
    it in interpreter mode on CPU); False always uses the XLA path. Under
    ``train=True`` the fused path goes through ``fused_gnn_layer_ad`` — a
    custom-VJP wrapper whose backward is the exact XLA-math gradient — so
    training rides the kernel too.
    """

    depth: int = 12
    units: int = 32
    act: str = "silu"
    node_update: bool = True   # False for SOP/SMTWTP variants
    dtype: Any = jnp.float32
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, g, *, train: bool = False):
        blocks, x_in = as_blocks(g)
        act = getattr(nn, self.act)
        dense = lambda name: nn.Dense(self.units, name=name, dtype=self.dtype)

        def bn(name, val, mask=None):
            return TorchBatchNorm(
                name=name, use_running_average=not train,
                dtype=self.dtype)(val, mask)

        n = x_in.shape[0]
        x = act(dense("v_lin0")(x_in.astype(self.dtype)))           # [N, U]
        e_lin0 = dense("e_lin0")
        ws = [act(e_lin0(b.edge.astype(self.dtype))) for b in blocks]

        def src_ids(b):
            return jnp.arange(n) if b.src is None else b.src

        fused = (self.use_pallas is True) or (
            self.use_pallas is None and jax.default_backend() == "tpu")
        fused = (fused and self.node_update and len(blocks) == 1
                 and blocks[0].src is None and blocks[0].mask is None)
        if fused and self.use_pallas is None:
            # auto mode respects the kernel's VMEM envelope: dense-graph
            # families (K = N, e.g. MKP300) overflow the per-core budget —
            # see ops.pallas_kernels.fused_gnn_supported.
            from deepaco_tpu.ops.pallas_kernels import fused_gnn_supported

            fused = fused_gnn_supported(n, blocks[0].nbr.shape[1],
                                        self.units)

        for i in range(self.depth):
            x0, ws0 = x, ws
            x1 = dense(f"v_lins1_{i}")(x0)
            x2 = dense(f"v_lins2_{i}")(x0)
            x3 = dense(f"v_lins3_{i}")(x0)
            x4 = dense(f"v_lins4_{i}")(x0)

            if fused:
                from deepaco_tpu.ops.pallas_kernels import (
                    fused_gnn_layer, fused_gnn_layer_ad)

                ew, ebias = _DenseParams(self.units, self.units,
                                         name=f"e_lins0_{i}")()
                layer = fused_gnn_layer_ad if train else (
                    lambda *a: fused_gnn_layer(*a, use_pallas=True))
                agg, pre0 = layer(
                    x2, x3, x4, blocks[0].nbr, ws0[0],
                    ew.astype(self.dtype), ebias.astype(self.dtype))
                x = x0 + act(bn(f"v_bns_{i}", x1 + agg))
                flat = bn(f"e_bns_{i}", pre0.reshape(-1, self.units))
                ws = [ws0[0] + act(flat.reshape(pre0.shape))]
                continue

            e_lin = dense(f"e_lins0_{i}")

            if self.node_update:
                # per-block masked scatter-mean over out-edges, merged by src
                agg = jnp.zeros((n, self.units), self.dtype)
                for b, w0 in zip(blocks, ws0):
                    gated = jax.nn.sigmoid(w0) * x2[b.nbr]          # [R, K, U]
                    if b.mask is None:
                        block_agg = jnp.mean(gated, axis=1)
                    else:
                        m = b.mask[..., None].astype(self.dtype)
                        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
                        block_agg = jnp.sum(gated * m, axis=1) / cnt
                    if b.src is None:
                        agg = agg + block_agg
                    else:
                        agg = agg.at[b.src].add(block_agg)
                # BN over nodes (all valid)
                x = x0 + act(bn(f"v_bns_{i}", x1 + agg))

            # edge update per block with SHARED BN statistics across blocks
            pre = []
            for b, w0 in zip(blocks, ws0):
                s = src_ids(b)
                pre.append(e_lin(w0) + x3[s][:, None, :] + x4[b.nbr])
            flat = jnp.concatenate([p.reshape(-1, self.units) for p in pre])
            if any(b.mask is not None for b in blocks):
                masks = jnp.concatenate([
                    (jnp.ones(b.nbr.shape, self.dtype) if b.mask is None
                     else b.mask.astype(self.dtype)).reshape(-1)
                    for b in blocks])
            else:
                masks = None
            flat = bn(f"e_bns_{i}", flat, masks)
            out, off = [], 0
            for p, w0 in zip(pre, ws0):
                sz = p.shape[0] * p.shape[1]
                out.append(w0 + act(flat[off:off + sz].reshape(p.shape)))
                off += sz
            ws = out

        if isinstance(g, SparseGraph):
            return ws[0]
        return ws


class ParNet(nn.Module):
    """Edge-logit head: 3-layer MLP, act hidden, sigmoid out, squeeze.

    (reference tsp/net.py:48-75; MKP transformer uses act='relu')."""

    depth: int = 3
    units: int = 32
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, w):
        act = getattr(nn, self.act)
        for i in range(self.depth - 1):
            w = act(nn.Dense(self.units, name=f"lin_{i}", dtype=self.dtype)(w))
        w = jax.nn.sigmoid(nn.Dense(1, name=f"lin_{self.depth - 1}",
                                    dtype=self.dtype)(w))
        return jnp.squeeze(w, axis=-1)


class Net(nn.Module):
    """EmbNet + heuristic head (optionally + pheromone head).

    ``__call__`` returns per-edge heuristic values, shaped like the input's
    edge layout: ``[N, K]`` for a SparseGraph, or a list per EdgeBlock. The
    dense ``[n, n]`` matrix is produced by ``core.graph.scatter_to_dense``
    (the analog of ``Net.reshape``, reference tsp/net.py:94-102). With
    ``dual_heads=True`` (tsp/, rcpsp/) returns ``(phe, heu)``.
    """

    depth: int = 12
    units: int = 32
    node_update: bool = True
    dual_heads: bool = False
    pad_feats: int = 0          # rcpsp pads node feats to this width if > 0
    dtype: Any = jnp.float32
    use_pallas: bool | None = None   # see EmbNet.use_pallas

    @nn.compact
    def __call__(self, g, *, train: bool = False):
        blocks_input = not isinstance(g, SparseGraph)
        if self.pad_feats:
            if blocks_input:
                x, blocks = g
                if x.shape[-1] < self.pad_feats:
                    x = jnp.pad(x, ((0, 0), (0, self.pad_feats - x.shape[-1])))
                g = (x, blocks)
            elif g.x.shape[-1] < self.pad_feats:
                pad = self.pad_feats - g.x.shape[-1]
                g = g._replace(x=jnp.pad(g.x, ((0, 0), (0, pad))))
        emb = EmbNet(depth=self.depth, units=self.units,
                     node_update=self.node_update, dtype=self.dtype,
                     use_pallas=self.use_pallas,
                     name="emb_net")(g, train=train)
        heu_head = ParNet(units=self.units, dtype=self.dtype,
                          name="par_net_heu")
        apply_head = (lambda h: [h(e) for e in emb]) if blocks_input \
            else (lambda h: h(emb))
        heu = apply_head(heu_head)
        if self.dual_heads:
            phe_head = ParNet(units=self.units, dtype=self.dtype,
                              name="par_net_phe")
            return apply_head(phe_head), heu
        return heu
