"""Edge-partitioned multi-device GNN forward (shard_map + collectives).

The north-star scaling design (BASELINE.json): partition the instance graph's
edges across devices, exchange boundary node features over ICI, and let XLA
compile the collectives. For the k-regular ``[N, K]`` layout the natural
partition is by source-node row blocks: each device owns ``N/D`` rows of the
edge arrays (and of the node table). Per layer:

* node update — aggregation over out-edges is LOCAL to the row shard; the
  gather ``x[nbr]`` needs the full node table, so the sharded node features
  are ``all_gather``-ed once per layer (the boundary exchange; on hardware
  this rides ICI and overlaps with the local matmuls under XLA's scheduler);
* BatchNorm — batch statistics are GLOBAL moments: per-shard sums are
  ``psum``-ed so train-mode numerics match the single-device net exactly;
* edge update — entirely local to the shard.

The forward is numerically identical to ``models.gnn.EmbNet`` (tests compare
elementwise on the virtual 8-device CPU mesh); parameters are replicated,
activations are sharded.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepaco_tpu.models.gnn import EmbNet


def _dense(params, name, x):
    p = params[name]
    return x @ p["kernel"] + p["bias"]


def _bn_train_global(params, stats_unused, name, v, axis_name, total):
    """Train-mode BatchNorm with globally-psummed moments (biased var)."""
    p = params[name]
    local_sum = jnp.sum(v.reshape(-1, v.shape[-1]), axis=0)
    mean = jax.lax.psum(local_sum, axis_name) / total
    local_sq = jnp.sum((v.reshape(-1, v.shape[-1]) - mean) ** 2, axis=0)
    var = jax.lax.psum(local_sq, axis_name) / total
    inv = jax.lax.rsqrt(var + 1e-5)
    return (v - mean) * inv * p["scale"] + p["bias"]


def _bn_eval(params, batch_stats, name, v):
    p, s = params[name], batch_stats[name]
    inv = jax.lax.rsqrt(s["var"] + 1e-5)
    return (v - s["mean"]) * inv * p["scale"] + p["bias"]


def sharded_embnet_forward(params, batch_stats, x, nbr, edge, mesh: Mesh,
                           axis: str = "instance", *, depth: int = 12,
                           train: bool = False, node_update: bool = True):
    """Run the EmbNet forward with node/edge rows sharded over ``mesh[axis]``.

    ``params``/``batch_stats`` follow models.gnn naming (emb_net subtree).
    Returns the per-edge embeddings ``[N, K, U]`` (sharded layout inside,
    gathered on return).
    """
    n, k = nbr.shape
    d = mesh.shape[axis]
    assert n % d == 0, f"N={n} must divide the {axis}-axis size {d}"
    act = jax.nn.silu

    def fwd(x_shard, nbr_shard, edge_shard):
        # x_shard: [N/D, F]; nbr/edge shards: [N/D, K(, E)]
        xs = act(_dense(params, "v_lin0", x_shard))
        w = act(_dense(params, "e_lin0", edge_shard))
        for i in range(depth):
            # boundary exchange: full node table for the nbr gather
            x_full = jax.lax.all_gather(xs, axis, tiled=True)
            x0, w0 = xs, w
            x1 = _dense(params, f"v_lins1_{i}", x0)
            x2_full = _dense(params, f"v_lins2_{i}", x_full)
            x3 = _dense(params, f"v_lins3_{i}", x0)
            x4_full = _dense(params, f"v_lins4_{i}", x_full)
            w1 = _dense(params, f"e_lins0_{i}", w0)
            gate = jax.nn.sigmoid(w0)
            agg = jnp.mean(gate * x2_full[nbr_shard], axis=1)
            if node_update:
                pre = x1 + agg
                if train:
                    normed = _bn_train_global(params, batch_stats,
                                              f"v_bns_{i}", pre, axis, n)
                else:
                    normed = _bn_eval(params, batch_stats, f"v_bns_{i}", pre)
                xs = x0 + act(normed)
            e_pre = w1 + x3[:, None, :] + x4_full[nbr_shard]
            if train:
                e_normed = _bn_train_global(params, batch_stats,
                                            f"e_bns_{i}", e_pre, axis, n * k)
            else:
                e_normed = _bn_eval(params, batch_stats, f"e_bns_{i}", e_pre)
            w = w0 + act(e_normed)
        return w

    shard = NamedSharding(mesh, P(axis))
    spec = P(axis)
    fwd_sharded = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec)
    return fwd_sharded(x, nbr, edge)


def edges_per_second_bench(params, batch_stats, x, nbr, edge, mesh: Mesh,
                           reps: int = 3):
    """Edges/s scaling harness (BASELINE north star: >=80% efficiency)."""
    import time

    fn = jax.jit(functools.partial(
        sharded_embnet_forward, mesh=mesh, train=False))
    out = fn(params, batch_stats, x, nbr, edge)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(params, batch_stats, x, nbr, edge)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    n, k = nbr.shape
    return n * k * 12 / dt        # edges processed per second (12 layers)
