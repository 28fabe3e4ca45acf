"""Whole-network fused GNN inference: all EmbNet layers in ONE Pallas kernel.

Round-3 telemetry showed the GNN phase at 0.16% MFU while being ~60% of the
headline sweep's device time: the per-layer fused kernel
(ops/pallas_kernels.fused_gnn_layer) re-reads the edge state from HBM every
layer and runs its one-hot gathers in fp32 HIGHEST precision (6 MXU passes
per bf16 pass of work). This module keeps the WHOLE 12-layer forward
resident in VMEM per instance:

* the ``[K, NP, U]`` edge-embedding state lives in the kernel's output block
  and is updated in place across layers — zero HBM traffic between layers;
* the neighbor gathers ride the MXU as one-hot contractions in **bfloat16**
  (a one-hot row is exact in bf16, so the gather selects bf16-rounded values
  — single-pass MXU instead of fp32-HIGHEST's 6 passes). ``compute_dtype=
  jnp.float32`` keeps HIGHEST-precision exactness for parity testing;
* BatchNorm (inference mode, running stats) folds into a per-layer affine;
* the input embeddings (``v_lin0``/``e_lin0``) and the ParNet heads run as
  plain XLA matmuls over the flattened ``[B*N*K, U]`` batch — large-row
  GEMMs that XLA tiles well — so the kernel contains only the 12-layer loop.

Semantics match ``models.gnn.Net.apply(..., train=False)`` for the regular
single-block case (reference tsp/net.py:8-102): verified elementwise in
``tests/test_fused_gnn.py`` (fp32 mode ~1e-5; bf16 mode distributional).

ROOFLINE (round-5, TPU v5e, bench shape B=100, N=500, K=50): the whole-net
bf16 kernel runs at ~47 ms (~470 us/instance). Floor decomposition of the
one-hot-gather formulation: the [NP, NP] one-hot build compares alone are
~62k VPU passes =~ 17 ms across the batch, the gather/e_lin MXU dots ~10 ms,
k-NN extraction + head + elementwise ~15 ms — i.e. the kernel runs within
~1.15x of its formulation's floor. Merging each slot group's G gather dots
into one [2U, NP] x [NP, G*NP] pass (round 5) measured neutral — Mosaic
already pipelines the narrow dots; the build compares, not the dots, are
the binding cost, and they cannot be cached across layers (26 MB for the
full one-hot set exceeds VMEM). The alternative XLA per-layer gather path
measures 253 ms at the same shape, so ~5.4x stands as the achieved
envelope for this formulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


class FoldedEmbNet(NamedTuple):
    """Inference-folded EmbNet weights (stacked over layers).

    ``wv``: [L*U, 4U] — v_lins1..4 kernels concatenated per layer;
    ``wel``: [L*U, U] — e_lins0 kernels; ``vs/vb``, ``es/eb``: [L, U]
    BatchNorm inference affines (``s = scale*rsqrt(var+eps)``,
    ``b = bias - mean*s``); ``w_in/b_in``: v_lin0; ``we_in/be_in``: e_lin0.
    """

    w_in: jax.Array
    b_in: jax.Array
    we_in: jax.Array
    be_in: jax.Array
    wv: jax.Array
    bv: jax.Array
    wel: jax.Array
    bel: jax.Array
    vs: jax.Array
    vb: jax.Array
    es: jax.Array
    eb: jax.Array


def fold_embnet_params(variables, depth: int = 12, units: int = 32,
                       eps: float = 1e-5) -> FoldedEmbNet:
    """Fold a Net variables tree into stacked inference weights."""
    p = variables["params"]["emb_net"]
    st = variables["batch_stats"]["emb_net"]

    def affine(name, i):
        s = p[f"{name}_{i}"]["scale"] * jax.lax.rsqrt(
            st[f"{name}_{i}"]["var"] + eps)
        b = p[f"{name}_{i}"]["bias"] - st[f"{name}_{i}"]["mean"] * s
        return s, b

    wv = jnp.concatenate([
        jnp.concatenate([p[f"v_lins{j}_{i}"]["kernel"] for j in (1, 2, 3, 4)],
                        axis=1)
        for i in range(depth)], axis=0)                       # [L*U, 4U]
    bv = jnp.stack([
        jnp.concatenate([p[f"v_lins{j}_{i}"]["bias"] for j in (1, 2, 3, 4)])
        for i in range(depth)])                               # [L, 4U]
    wel = jnp.concatenate([p[f"e_lins0_{i}"]["kernel"]
                           for i in range(depth)], axis=0)    # [L*U, U]
    bel = jnp.stack([p[f"e_lins0_{i}"]["bias"] for i in range(depth)])
    v_aff = [affine("v_bns", i) for i in range(depth)]
    e_aff = [affine("e_bns", i) for i in range(depth)]
    return FoldedEmbNet(
        w_in=p["v_lin0"]["kernel"], b_in=p["v_lin0"]["bias"],
        we_in=p["e_lin0"]["kernel"], be_in=p["e_lin0"]["bias"],
        wv=wv, bv=bv, wel=wel, bel=bel,
        vs=jnp.stack([a[0] for a in v_aff]),
        vb=jnp.stack([a[1] for a in v_aff]),
        es=jnp.stack([a[0] for a in e_aff]),
        eb=jnp.stack([a[1] for a in e_aff]),
    )


def _layers_kernel(depth, k_const, g_const, e_const, node_update, cdt, prec,
                   x_ref, nbr_ref, edge_ref,
                   wein_ref, bein_ref, wv_ref, bv_ref, wel_ref, bel_ref,
                   vs_ref, vb_ref, es_ref, eb_ref,
                   wout_ref, x_scr):
    """All EmbNet layers for one instance; edge state lives in ``wout_ref``.

    TPU arrays pad their minor (lane) dim to 128, so a ``[K, NP, U=32]``
    state would waste 4x VMEM. Instead G=128//U neighbor slots share one
    128-lane row: slot ``j = jg*G + s`` lives at lanes ``[s*U, (s+1)*U)`` of
    group ``jg``. Layouts (leading dims are untiled):

    Everything lives TRANSPOSED — features on sublanes, nodes on lanes — so
    every dot in the hot loop is a standard ``[M, K] x [K, N]`` with K (the
    one-hot table axis, NP) and N (nodes, NP) both full-width; the straight
    orientation left the gather at 64 of 128 lanes and the [NP,U]x[U,U]
    edge-update dots at 1/16 utilization. TPU arrays also pad their minor
    (lane) dim to 128, so G=128//U neighbor slots share one row group: slot
    ``j = jg*G + s`` lives at sublanes ``[s*U, (s+1)*U)`` of group ``jg``.

    x: [1, U, NP] f32 (= silu(v_lin0(x_in)).T);
    nbr: [1, KG, G, NP] int32 (slot-grouped neighbor table);
    edge: [1, E, KG, G, NP] f32; weinT: [G*U, E] (e_lin0 rows tiled G times,
    as columns); all per-layer weights transposed (see wrapper);
    wout: [1, KG, G*U, NP] f32 — the edge-embedding state, updated in place.
    """
    np_ = x_ref.shape[2]
    u = x_scr.shape[0]
    gu = g_const * u
    kg_full, rem = k_const // g_const, k_const % g_const
    f32 = jnp.float32
    act = jax.nn.silu
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    # expand_t[l, s] = 1 iff sublane l belongs to sub-slot s: broadcasts a
    # [G, NP] row group onto [G*U, NP] via one tiny MXU contraction.
    expand_t = (jax.lax.broadcasted_iota(jnp.int32, (gu, g_const), 0) // u
                == jax.lax.broadcasted_iota(jnp.int32, (gu, g_const), 1)
                ).astype(f32)

    # ---- edge-embedding init: w = act(e_lin0(edge)), whole group at once
    def winit(jg, _):
        acc = jnp.zeros((gu, np_), f32) + bein_ref[:]          # [GU,1] bcast
        for e in range(e_const):
            e_sel = jax.lax.dot(
                expand_t, edge_ref[0, e, jg],
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)           # [GU, NP]
            acc = acc + e_sel * wein_ref[:, e:e + 1]
        wout_ref[0, jg] = act(acc)
        return 0

    jax.lax.fori_loop(0, kg_full + (1 if rem else 0), winit, 0)
    x_scr[:] = x_ref[0]
    _layer_stack(depth, k_const, g_const, node_update, cdt, prec,
                 lambda jg: nbr_ref[0, jg], lambda jg: wout_ref[0, jg],
                 lambda jg, v: wout_ref.__setitem__((0, jg), v),
                 x_scr, wv_ref, bv_ref, wel_ref, bel_ref,
                 vs_ref, vb_ref, es_ref, eb_ref, iota0)


def _layer_stack(depth, k_const, g_const, node_update, cdt, prec,
                 read_nbr, read_w, write_w, x_scr,
                 wv_ref, bv_ref, wel_ref, bel_ref,
                 vs_ref, vb_ref, es_ref, eb_ref, iota0):
    """The 12-layer EmbNet loop over slot-grouped state accessors.

    ``read_nbr(jg) -> [G, NP]`` int32, ``read_w(jg) -> [G*U, NP]`` f32,
    ``write_w(jg, val)``; state lives in the caller's ref/scratch. One-hot
    gather: oh_t[c, r] = (c == nbr[j, r]) selects node nbr[j, r] into
    column r (= the edge's source row in the straight orientation).
    """
    u = x_scr.shape[0]
    np_ = x_scr.shape[1]
    kg_full, rem = k_const // g_const, k_const % g_const
    act = jax.nn.silu
    f32 = jnp.float32

    for i in range(depth):
        xc = x_scr[:]                                          # [U, NP]
        x1234 = jax.lax.dot(
            wv_ref[i * 4 * u:(i + 1) * 4 * u, :].astype(cdt), xc.astype(cdt),
            preferred_element_type=f32, precision=prec) + bv_ref[:, i:i + 1]
        x1 = x1234[:u]
        x3 = x1234[2 * u:3 * u]
        x24 = jnp.concatenate(
            [x1234[u:2 * u], x1234[3 * u:]], axis=0).astype(cdt)  # [2U, NP]
        wel_i = wel_ref[i * u:(i + 1) * u, :].astype(cdt)
        base = x3 + bel_ref[:, i:i + 1]
        es_i = es_ref[:, i:i + 1]
        eb_i = eb_ref[:, i:i + 1]

        def group(jg, agg, n_sub):
            nbr_g = read_nbr(jg)                               # [G, NP]
            w0 = read_w(jg)                                    # [G*U, NP]
            # ONE wide gather dot for the whole slot group: the G per-slot
            # one-hots lie side by side on the lane axis, so a single
            # [2U, NP] x [NP, n_sub*NP] MXU pass fetches every slot's x2/x4
            # columns (round-5: merges G dependent small dots into one).
            oh_wide = jnp.concatenate(
                [(iota0 == nbr_g[s:s + 1, :]).astype(cdt)
                 for s in range(n_sub)], axis=1)          # [NP, n_sub*NP]
            both_wide = jax.lax.dot(
                x24, oh_wide,
                preferred_element_type=f32, precision=prec)  # [2U, n_sub*NP]
            parts = []
            for s in range(g_const):
                if s >= n_sub:
                    # padded slots: keep state, skip gather entirely
                    parts.append(w0[s * u:(s + 1) * u])
                    continue
                both = both_wide[:, s * np_:(s + 1) * np_]     # [2U, NP]
                w0s = w0[s * u:(s + 1) * u]
                agg = agg + jax.nn.sigmoid(w0s) * both[:u]
                pre = jax.lax.dot(wel_i, w0s.astype(cdt),
                                  preferred_element_type=f32,
                                  precision=prec) + base + both[u:]
                parts.append(w0s + act(pre * es_i + eb_i))
            write_w(jg, jnp.concatenate(parts, axis=0))
            return agg

        agg = jax.lax.fori_loop(
            0, kg_full, lambda jg, a: group(jg, a, g_const),
            jnp.zeros((u, np_), f32))
        if rem:
            agg = group(kg_full, agg, rem)
        if node_update:
            pre_v = (x1 + agg * (1.0 / k_const)) * vs_ref[:, i:i + 1] \
                + vb_ref[:, i:i + 1]
            x_scr[:] = xc + act(pre_v)


def embnet_layers_pallas(folded: FoldedEmbNet, x_emb, nbr_p, edge_p, *,
                         k: int, depth: int = 12, node_update: bool = True,
                         compute_dtype=jnp.bfloat16):
    """Run the fused layer stack. Batched packed inputs (one grid
    cell/instance):

    ``x_emb`` [B, NP, U] f32, ``nbr_p`` [B, KG, G, NP] int32,
    ``edge_p`` [B, E, KG, G, NP] f32 → edge state [B, KG, G*U, NP] f32
    (slot ``j = jg*G + s`` at sublanes ``[s*U, (s+1)*U)``; transposed
    feature-major orientation — see ``_layers_kernel``).
    """
    b, np_, u = x_emb.shape
    _, kg, g, _ = nbr_p.shape
    e = edge_p.shape[1]
    depth_ = depth
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_layers_kernel, depth, int(k), int(g), int(e),
                               node_update, compute_dtype, prec)
    bcast = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    ws = _transposed_weights(folded, depth_, g, u)
    x_t = jnp.swapaxes(x_emb, 1, 2)                             # [B, U, NP]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, u, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kg, g, np_), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, kg, g, np_), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[bcast(a) for a in ws],
        ],
        out_specs=pl.BlockSpec((1, kg, g * u, np_), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kg, g * u, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((u, np_), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(x_t, nbr_p, edge_p, *ws)


def _transposed_weights(folded: FoldedEmbNet, depth: int, g: int, u: int):
    """Stacked weights in the kernel's feature-major orientation."""
    e = folded.we_in.shape[0]
    weinT = jnp.tile(folded.we_in, (1, g)).reshape(e, g * u).T  # [G*U, E]
    beinT = jnp.tile(folded.be_in.reshape(1, u),
                     (1, g)).reshape(g * u, 1)                  # [G*U, 1]
    wvT = jnp.concatenate(
        [folded.wv[i * u:(i + 1) * u, :].T for i in range(depth)],
        axis=0)                                                 # [L*4U, U]
    welT = jnp.concatenate(
        [folded.wel[i * u:(i + 1) * u, :].T for i in range(depth)],
        axis=0)                                                 # [L*U, U]
    return (weinT, beinT, wvT, folded.bv.T, welT, folded.bel.T,
            folded.vs.T, folded.vb.T, folded.es.T, folded.eb.T)


_KNN_BIG = 1e30


def _dense_kernel(depth, k_const, g_const, node_update, cdt, prec, fill,
                  x_ref, dist_ref,
                  wein_ref, bein_ref, wv_ref, bv_ref, wel_ref, bel_ref,
                  vs_ref, vb_ref, es_ref, eb_ref,
                  h0_ref, hb0_ref, h1_ref, hb1_ref, h2_ref, hb2_ref,
                  out_ref, x_scr, w_scr, nbr_scr, d_scr):
    """dist → dense heuristic, fully fused for one instance.

    Phases: (1) exact k-NN selection by iterative column-min extraction on
    the VMEM-resident distance matrix (ties -> lowest index, matching
    ``lax.top_k`` on ``-dist``), initializing the edge embeddings from the
    extracted distances (e_lin0); (2) the 12-layer stack (``_layer_stack``);
    (3) the ParNet head per slot + scatter into the dense ``[NP, NP]``
    output (``scatter_to_dense`` + ``fill`` semantics, transposed: the
    caller swaps axes back). Replaces XLA ``top_k`` (~30 ms at the bench
    shape) and the dense scatter (~20 ms) with in-kernel VPU passes.
    """
    np_ = x_scr.shape[1]
    u = x_scr.shape[0]
    kg_full, rem = k_const // g_const, k_const % g_const
    act = jax.nn.silu
    f32 = jnp.float32
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    ident = (iota0 == iota1).astype(f32)

    # ---- phase 1: k-NN extraction + e_lin0 init (slot-grouped).
    # Reductions run over the LANE axis (cross-sublane reductions are slow);
    # the extracted per-row column is transposed to a row with one exact
    # identity-matmul MXU pass (0/1 products in f32 HIGHEST are exact).
    d_scr[:] = dist_ref[0]

    def extract():
        d = d_scr[:]
        m_col = jnp.min(d, axis=1, keepdims=True)              # [NP, 1]
        idx_col = jnp.min(jnp.where(d == m_col, iota1, np_), axis=1,
                          keepdims=True)                       # [NP, 1]
        d_scr[:] = jnp.where(iota1 == idx_col, _KNN_BIG, d)
        both = jnp.concatenate([m_col, idx_col.astype(f32)], axis=1)
        rows = jax.lax.dot_general(
            both, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)               # [2, NP]
        return rows[0:1, :], rows[1:2, :].astype(jnp.int32)

    def init_group(jg, n_sub):
        idxs, parts = [], []
        for s in range(g_const):
            if s >= n_sub:
                idxs.append(jnp.zeros((1, np_), jnp.int32))
                parts.append(jnp.zeros((u, np_), f32))
                continue
            m, idx = extract()
            idxs.append(idx)
            parts.append(act(m * wein_ref[s * u:(s + 1) * u, 0:1]
                             + bein_ref[s * u:(s + 1) * u, :]))
        nbr_scr[jg] = jnp.concatenate(idxs, axis=0)
        w_scr[jg] = jnp.concatenate(parts, axis=0)
        return 0

    jax.lax.fori_loop(0, kg_full, lambda jg, c: init_group(jg, g_const), 0)
    if rem:
        init_group(kg_full, rem)

    # ---- phase 2: the layer stack over scratch state
    x_scr[:] = x_ref[0]
    _layer_stack(depth, k_const, g_const, node_update, cdt, prec,
                 lambda jg: nbr_scr[jg], lambda jg: w_scr[jg],
                 lambda jg, v: w_scr.__setitem__(jg, v),
                 x_scr, wv_ref, bv_ref, wel_ref, bel_ref,
                 vs_ref, vb_ref, es_ref, eb_ref, iota0)

    # ---- phase 3: ParNet head per slot + dense scatter
    out_ref[0] = jnp.full((np_, np_), fill, f32)

    def head_group(jg, n_sub):
        w0 = w_scr[jg]
        nbr_g = nbr_scr[jg]
        for s in range(n_sub):
            w0s = w0[s * u:(s + 1) * u]
            h = act(jax.lax.dot(h0_ref[:].astype(cdt), w0s.astype(cdt),
                                preferred_element_type=f32,
                                precision=prec) + hb0_ref[:])
            h = act(jax.lax.dot(h1_ref[:].astype(cdt), h.astype(cdt),
                                preferred_element_type=f32,
                                precision=prec) + hb1_ref[:])
            o = jax.nn.sigmoid(
                jax.lax.dot(h2_ref[:].astype(cdt), h.astype(cdt),
                            preferred_element_type=f32,
                            precision=prec) + hb2_ref[:])       # [1, NP]
            idx = nbr_g[s:s + 1, :]
            out_ref[0] = jnp.where(iota0 == idx, o + fill, out_ref[0])
        return 0

    jax.lax.fori_loop(0, kg_full, lambda jg, c: head_group(jg, g_const), 0)
    if rem:
        head_group(kg_full, rem)


def dense_heuristic_supported(n: int, k: int, u: int = 32) -> bool:
    """VMEM gate for the fully fused dist→heuristic kernel."""
    if 128 % u:
        return False
    np_ = _pad8(n)
    kg = -(-k // (128 // u))
    state = kg * np_ * 128 * 4                 # w scratch (not buffered)
    dense = 3 * np_ * np_ * 4                  # dist in + d scratch + out
    dense += 2 * np_ * np_ * 4                 # double buffers (in + out)
    temps = 2 * np_ * max(np_, 128) * 4
    return state + dense + temps + kg * np_ * 8 * 4 < 11_500_000


def tsp_dense_heuristic(variables, x, dist, k: int, *, depth: int = 12,
                        units: int = 32, node_update: bool = True,
                        head: str = "heu", compute_dtype=jnp.bfloat16,
                        fill: float = 1e-10):
    """Batched dist→dense-heuristic on the fully fused kernel.

    ``x`` [B, N, F] node features, ``dist`` [B, N, N] (diagonal sentinel
    included, reference tsp/utils.py:13) → ``heu`` [B, N, N] — identical
    semantics to knn_graph + Net.apply + scatter_to_dense + fill.
    """
    b, n, _ = dist.shape
    np_ = _pad8(n)
    u = units
    g = 128 // u
    kg = -(-k // g)
    folded = fold_embnet_params(variables, depth, u)
    x_emb = jax.nn.silu(x.astype(jnp.float32) @ folded.w_in + folded.b_in)
    x_t = jnp.swapaxes(jnp.pad(x_emb, ((0, 0), (0, np_ - n), (0, 0))), 1, 2)
    dist_p = jnp.pad(dist.astype(jnp.float32),
                     ((0, 0), (0, np_ - n), (0, np_ - n)),
                     constant_values=_KNN_BIG)
    hp = variables["params"][f"par_net_{head}"]
    h0T = hp["lin_0"]["kernel"].T
    hb0 = hp["lin_0"]["bias"].reshape(u, 1)
    h1T = hp["lin_1"]["kernel"].T
    hb1 = hp["lin_1"]["bias"].reshape(u, 1)
    h2T = hp["lin_2"]["kernel"].T                               # [1, U]
    hb2 = hp["lin_2"]["bias"].reshape(1, 1)
    ws = _transposed_weights(folded, depth, g, u)
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_dense_kernel, depth, int(k), int(g),
                               node_update, compute_dtype, prec, float(fill))
    bcast = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    heads_w = (h0T, hb0, h1T, hb1, h2T, hb2)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, u, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[bcast(a) for a in ws], *[bcast(a) for a in heads_w],
        ],
        out_specs=pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((u, np_), jnp.float32),
                        pltpu.VMEM((kg, g * u, np_), jnp.float32),
                        pltpu.VMEM((kg, g, np_), jnp.int32),
                        pltpu.VMEM((np_, np_), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(x_t, dist_p, *ws, *heads_w)
    return jnp.swapaxes(out, 1, 2)[:, :n, :n]


def parnet_apply(params, w, act=jax.nn.silu, depth: int = 3):
    """ParNet head as flat XLA matmuls (reference tsp/net.py:48-75)."""
    for i in range(depth - 1):
        w = act(w @ params[f"lin_{i}"]["kernel"] + params[f"lin_{i}"]["bias"])
    last = params[f"lin_{depth - 1}"]
    return jax.nn.sigmoid(w @ last["kernel"] + last["bias"])[..., 0]


def whole_net_supported(n: int, k: int, u: int = 32) -> bool:
    """VMEM envelope: the packed [KG, NP, 128] f32 edge state is
    double-buffered across grid cells; plus [NP, NP] one-hot temporaries,
    packed nbr/edge inputs and weights, it must fit ~16 MB/core."""
    if 128 % u:
        return False
    np_ = _pad8(n)
    kg = -(-k // (128 // u))
    state = 2 * kg * np_ * 128 * 4            # double-buffered out block
    inputs = 2 * 2 * kg * _pad8(128 // u) * np_ * 4
    temps = 2 * np_ * max(np_, 128) * 4
    return state + inputs + temps < 11_000_000


def fast_inference_mode(model, n: int, k: int):
    """Gate for the whole-net kernel: returns the compute dtype to use, or
    ``None`` for the regular per-layer path.

    ``DEEPACO_FAST_GNN``: ``auto`` (default — bfloat16 on TPU when the shape
    fits VMEM), ``0`` (off), ``f32`` (HIGHEST-precision kernel, exact parity),
    ``bf16`` (force on, used by CPU interpreter tests).
    """
    import os

    env = os.environ.get("DEEPACO_FAST_GNN", "auto")
    if env == "0":
        return None
    if env == "auto" and jax.default_backend() != "tpu":
        return None
    if type(model).__name__ != "Net" or getattr(model, "use_pallas", None) \
            is False:
        return None
    if not whole_net_supported(n, k, model.units):
        return None
    return jnp.float32 if env == "f32" else jnp.bfloat16


def net_apply_fast(model, variables, x, nbr, edge, compute_dtype,
                   heads: tuple = ("heu",)):
    """Batched ``Net.apply(train=False)`` via the whole-net kernel.

    ``model`` supplies the architecture switches; heads defaults to the
    heuristic head only (the phe head of dual-head nets is unused at
    inference, reference tsp/test.ipynb)."""
    return net_forward_fast(variables, x, nbr, edge, depth=model.depth,
                            units=model.units,
                            node_update=model.node_update, heads=heads,
                            compute_dtype=compute_dtype,
                            pad_feats=getattr(model, "pad_feats", 0))


def net_forward_fast(variables, x, nbr, edge, *, depth: int = 12,
                     units: int = 32, node_update: bool = True,
                     heads: tuple = ("heu",),
                     compute_dtype=jnp.bfloat16, pad_feats: int = 0):
    """Batched Net forward on the whole-net kernel.

    ``x`` [B, N, F], ``nbr`` [B, N, K] int32, ``edge`` [B, N, K, E] →
    per-edge head outputs, each ``[B, N, K]``; returns a single array for one
    head or a tuple in the given order (``("phe", "heu")`` matches
    ``Net(dual_heads=True)``).
    """
    b, n, k = nbr.shape
    np_ = _pad8(n)
    u = units
    g = 128 // u
    kg = -(-k // g)
    kp = kg * g
    if pad_feats and x.shape[-1] < pad_feats:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_feats - x.shape[-1])))
    folded = fold_embnet_params(variables, depth, u)
    x_emb = jax.nn.silu(x.astype(jnp.float32) @ folded.w_in + folded.b_in)
    x_emb = jnp.pad(x_emb, ((0, 0), (0, np_ - n), (0, 0)))
    # packed slot-transposed layouts: slot j = jg*G + s
    nbr_p = jnp.pad(jnp.swapaxes(nbr, 1, 2),
                    ((0, 0), (0, kp - k), (0, np_ - n)))      # [B, KP, NP]
    nbr_p = nbr_p.reshape(b, kg, g, np_)
    edge_p = jnp.pad(
        jnp.transpose(edge.astype(jnp.float32), (0, 3, 2, 1)),
        ((0, 0), (0, 0), (0, kp - k), (0, np_ - n)))          # [B, E, KP, NP]
    edge_p = edge_p.reshape(b, edge.shape[-1], kg, g, np_)
    w_fin = embnet_layers_pallas(folded, x_emb, nbr_p.astype(jnp.int32),
                                 edge_p, k=k, depth=depth,
                                 node_update=node_update,
                                 compute_dtype=compute_dtype)
    # [B, KG, G*U, NP] -> [B, N, K, U]
    w_fin = w_fin.reshape(b, kg, g, u, np_)
    w_fin = jnp.transpose(w_fin, (0, 4, 1, 2, 3)).reshape(b, np_, kp, u)
    w_fin = w_fin[:, :n, :k, :]
    outs = tuple(parnet_apply(variables["params"][f"par_net_{h}"], w_fin)
                 for h in heads)
    return outs[0] if len(outs) == 1 else outs
