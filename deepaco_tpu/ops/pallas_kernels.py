"""Pallas TPU kernels for the hot compute paths.

Two fused kernels (each with a pure-XLA reference implementation used for
testing and as the default fallback — flip ``use_pallas=True`` or set
``DEEPACO_PALLAS=1`` to run them):

* :func:`fused_pick` — one construction-step sampler: masked logits + Gumbel
  noise (on-chip PRNG) + argmax + log-softmax-at-argmax in a single VMEM pass
  over the ``[A, N]`` candidate tile. This is the body of the rollout scan
  (deepaco_tpu/aco/engine.py), executed n-1 times per iteration.
* :func:`gated_mean_aggregate` — the GNN's edge aggregation
  ``mean_k(sigmoid(w[i,k,:]) * x[nbr[i,k], :])``: the gather, gate, multiply
  and mean fuse into one kernel over row tiles, with the full ``[N, U]`` node
  table resident in VMEM (U=32: 500 nodes = 64 KB).

Both kernels are exact (not approximations) — tests compare them elementwise
against the XLA paths in interpreter mode, so they run in CI without a TPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_pallas(flag):
    if flag is not None:
        return flag
    return os.environ.get("DEEPACO_PALLAS", "0") == "1"


# ----------------------------------------------------------- fused pick ----
def _pick_kernel(score_ref, mask_ref, gumbel_ref, action_ref, logp_ref):
    logits = jnp.where(mask_ref[:] > 0, score_ref[:], NEG_INF)     # [A, N]
    noisy = logits + gumbel_ref[:]
    actions = jnp.argmax(noisy, axis=-1)                           # [A]
    # log-softmax at the sampled index, single VMEM pass
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1)) + m[:, 0]
    a_cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    chosen = jnp.sum(jnp.where(a_cols == actions[:, None], logits, 0.0),
                     axis=-1)
    action_ref[:] = actions.astype(jnp.int32)
    logp_ref[:] = chosen - lse


def fused_pick_pallas(score_rows, mask, gumbel):
    """One sampling step on a ``[A, N]`` tile; ``gumbel`` is pre-drawn noise
    (on-chip PRNG requires a real TPU — the fusion win is the single-pass
    mask/argmax/log-softmax over the candidate tile)."""
    a, n = score_rows.shape
    return pl.pallas_call(
        _pick_kernel,
        out_shape=(jax.ShapeDtypeStruct((a,), jnp.int32),
                   jax.ShapeDtypeStruct((a,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=jax.default_backend() == "cpu",
    )(score_rows, mask, gumbel)


def fused_pick_xla(score_rows, mask, key):
    """Reference XLA path (identical math to engine.rollout's step)."""
    logits = jnp.where(mask > 0, score_rows, NEG_INF)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    actions = jnp.argmax(logits + gumbel, axis=-1)
    logp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                               actions[:, None], axis=-1)[:, 0]
    return actions.astype(jnp.int32), logp


# ----------------------------------------------- gated mean aggregation ----
def _aggregate_kernel(k_const, x_ref, nbr_ref, w_ref, out_ref):
    # x: [N, U]; nbr: [T, K] int32; w: [T, K*U] (row-major); out: [T, U].
    # The row gather is expressed as a one-hot matmul — the canonical TPU
    # gather: a [T, N] selector rides the MXU against the node table, once
    # per neighbor slot (K is small: 5-50). All shapes stay 2D for Mosaic.
    t, k = nbr_ref.shape
    n, u = x_ref.shape
    acc = jnp.zeros((t, u), jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    for j in range(k_const):
        idx = nbr_ref[:, j]                                   # [T]
        onehot = (cols == idx[:, None]).astype(x_ref.dtype)
        gathered = jnp.dot(onehot, x_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        gate = jax.nn.sigmoid(w_ref[:, j * u:(j + 1) * u])
        acc = acc + gate * gathered
    out_ref[:] = acc * (1.0 / k_const)


def gated_mean_aggregate_pallas(x, nbr, w, tile: int = 128):
    """``mean_k(sigmoid(w[i,k]) * x[nbr[i,k]])`` fused over row tiles."""
    n, u = x.shape
    rows, k = nbr.shape
    pad = (-rows) % tile
    if pad:
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0), (0, 0)))
    grid = (nbr.shape[0] // tile,)
    # row-major [T, K*U]: tile rows align with the nbr tile; each neighbor
    # slot is a contiguous [T, U] column block
    w_flat = w.reshape(nbr.shape[0], k * u)
    out = pl.pallas_call(
        functools.partial(_aggregate_kernel, int(k)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k * u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, u), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr.shape[0], u), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, nbr, w_flat)
    return out[:rows]


def gated_mean_aggregate_xla(x, nbr, w):
    """Reference XLA path (models/gnn.py aggregation)."""
    return jnp.mean(jax.nn.sigmoid(w) * x[nbr], axis=1)


def gated_mean_aggregate(x, nbr, w, use_pallas: bool | None = None):
    if _use_pallas(use_pallas):
        return gated_mean_aggregate_pallas(x, nbr, w)
    return gated_mean_aggregate_xla(x, nbr, w)


# ------------------------------------------------------ fused GNN layer ----
def _fused_layer_kernel(k_const, x24_ref, x3_ref, nbr_ref, w_ref, ew_ref,
                        eb_ref, agg_ref, pre_ref):
    """One EmbNet layer's gather phase for a row tile.

    x24: [N, 2U] = concat(x2, x4) node tables (both gathers share nbr —
         ONE one-hot MXU pass fetches both);
    x3:  [T, U] source-node term rows for this tile (src = arange for the
         regular k-NN case, so the tile slice IS the src gather);
    nbr: [T, K]; w: [T, K*U] current edge embeddings (row-major slots);
    ew/eb: e_lin weight [U, U] / bias [1, U].
    Outputs: agg [T, U] = mean_k(sigmoid(w)*x2[nbr]);
             pre [T, K*U] = e_lin(w) + x3[src] + x4[nbr].
    """
    t, k = nbr_ref.shape
    n = x24_ref.shape[0]
    u = x3_ref.shape[1]
    acc = jnp.zeros((t, u), jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    base = x3_ref[:] + eb_ref[0, :][None, :]
    for j in range(k_const):
        onehot = (cols == nbr_ref[:, j][:, None]).astype(x24_ref.dtype)
        both = jnp.dot(onehot, x24_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)      # [T, 2U]
        w0 = w_ref[:, j * u:(j + 1) * u]
        acc = acc + jax.nn.sigmoid(w0) * both[:, :u]
        lin = jnp.dot(w0, ew_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        pre_ref[:, j * u:(j + 1) * u] = lin + base + both[:, u:]
    agg_ref[:] = acc * (1.0 / k_const)


def fused_gnn_layer_pallas(x2, x3, x4, nbr, w, ew, eb, tile: int = 128):
    """Gather phase of one EmbNet layer, fused over row tiles.

    Returns ``(agg [R, U], pre [R, K, U])`` — see `_fused_layer_kernel`.
    The [N, U] node tables stay VMEM-resident; the two neighbor gathers ride
    the MXU as one one-hot matmul per neighbor slot.
    """
    n, u = x2.shape
    rows, k = nbr.shape
    x24 = jnp.concatenate([x2, x4], axis=1)                      # [N, 2U]
    pad = (-rows) % tile
    if pad:
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0), (0, 0)))
        x3 = jnp.pad(x3, ((0, pad), (0, 0)))
    grid = (nbr.shape[0] // tile,)
    w_flat = w.reshape(nbr.shape[0], k * u)
    agg, pre = pl.pallas_call(
        functools.partial(_fused_layer_kernel, int(k)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, 2 * u), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k * u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k * u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((nbr.shape[0], u), x2.dtype),
                   jax.ShapeDtypeStruct((nbr.shape[0], k * u), x2.dtype)),
        interpret=jax.default_backend() == "cpu",
    )(x24, x3, nbr, w_flat, ew, eb.reshape(1, u))
    return agg[:rows], pre[:rows].reshape(rows, k, u)


def fused_gnn_layer_xla(x2, x3, x4, nbr, w, ew, eb):
    """Reference XLA path — identical math to models/gnn.py's layer body."""
    agg = jnp.mean(jax.nn.sigmoid(w) * x2[nbr], axis=1)
    pre = w @ ew + eb + x3[:, None, :] + x4[nbr]
    return agg, pre


def fused_gnn_layer(x2, x3, x4, nbr, w, ew, eb,
                    use_pallas: bool | None = None):
    if _use_pallas(use_pallas):
        return fused_gnn_layer_pallas(x2, x3, x4, nbr, w, ew, eb)
    return fused_gnn_layer_xla(x2, x3, x4, nbr, w, ew, eb)
