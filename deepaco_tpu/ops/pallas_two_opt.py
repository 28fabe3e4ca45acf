"""Pallas TPU kernel: the FULL 2-opt / NLS descent of one ant in VMEM.

The XLA formulation in :mod:`deepaco_tpu.ops.two_opt` pays one ``[n, n]``
double-gather (``dist[tour][:, tour]``) through HBM per descent iteration.
This kernel (SURVEY §7 item 4a — the on-device replacement for the
reference's numba host loop, tsp_nls/two_opt.py:6-49) keeps the whole
best-improvement descent on-chip, one grid program per ant:

* The permuted distance matrix ``P[i, j] = d(tour_i, tour_j)`` is rebuilt
  each iteration from *permuted coordinates*: one-hot permutation matrices
  contracted on the MXU (exact in f32 — each output sums a single product),
  then the Euclidean form ``sqrt(dx^2 + dy^2 + 1e-20)`` elementwise on the
  VPU. This is bit-identical to gathering ``utils.datasets.distance_matrix``
  (the diagonal sentinel is never read under the move-validity mask), so the
  kernel reproduces the XLA path's move/descent sequence EXACTLY.
* The segment flip is an index remap applied as another one-hot MXU
  contraction — no dynamic-shape ops, no gathers.
* NLS perturbation rounds (tsp_nls/aco.py:241-258) run the same descent on
  the learned-heuristic metric; that matrix is arbitrary, so it is permuted
  by one-hot bf16 matmuls (exact selection of bf16-rounded values — i.e. the
  perturbation metric is deterministically ``heu_dist.astype(bfloat16)``).

Per-iteration cost is O(n^2) VPU work + two skinny MXU contractions with
zero HBM traffic; at TSP500/48 ants this is ~20-40x faster than the XLA
gather path. Grid programs serialize on the TPU core, which is fine here:
each ant's descent is itself dense vector work.

Wrappers fall back to the XLA implementations off-TPU (unless interpreted
for tests) and for instances whose padded size exceeds the VMEM budget.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (TPU lowering)

from deepaco_tpu.ops.two_opt import batched_nls, batched_two_opt

HIGHEST = lax.Precision.HIGHEST
# VMEM gate for the whole-matrix kernels: peak live set is ~3 [npad, npad]
# f32 arrays (~12 MB at 1024, within the ~16 MB/core budget; verified to
# compile + match the XLA path exactly at n=1000 on v5e). Covers every
# reference TSP scale (max 1000).
MAX_NPAD = 1024
# The TILED euclid 2-opt kernel (see _tiled_two_opt_kernel) never
# materializes an [npad, npad] array — its live set is the [16, npad] state
# + one [TILE, npad] delta tile — so plain 2-opt extends to 4096 nodes.
MAX_NPAD_TILED = 4096
# The tiled NLS kernel (round-4, _tiled_nls_kernel) keeps the metric
# resident in bf16 and recomputes the permuted delta in doubly-tiled
# [TILE, TILE] blocks per move — [2048 x 2048] bf16 = 8 MB, within VMEM.
MAX_NPAD_NLS_TILED = 2048
_TILE = 256
# the NLS variant carries the resident bf16 metric (8 MB at 2048) on top of
# the row-tile temporaries; tile 128 keeps the unrolled-loop live set under
# the 16 MB scoped-VMEM budget (tile 256 measured 18.8 MB at npad 2048)
_TILE_NLS = 128


def _npad(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _kernel_fns(n: int, npad: int):
    """Shape-closed helper ops shared by both kernel modes."""
    ii = lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
    jj = lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    f32 = jnp.float32

    def w_matrix(tour_row):
        """One-hot permutation, ``W[k, i] = (tour_i == k)`` — [npad, npad]."""
        k = lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        return (k == tour_row.astype(jnp.int32)).astype(f32)

    ident = (ii == jj).astype(f32)
    valid = (ii >= 1) & (jj > ii) & (jj <= n - 1)
    i1 = lax.broadcasted_iota(jnp.int32, (npad, 1), 0)
    j1 = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    lane8 = lax.broadcasted_iota(jnp.int32, (8, npad), 1)

    def _pair_dist(a, b):
        """Elementwise Euclidean distance between coordinate views ``a``
        [*, 0:2] columns / rows — same formula as datasets.distance_matrix."""
        dx = a[0] - b[0]
        dy = a[1] - b[1]
        return jnp.sqrt(dx * dx + dy * dy + 1e-20)

    def euclid_parts(W, CT8):
        """The four 2-opt delta ingredients, all computed directly from
        permuted coordinate VIEWS — no [npad, npad] rolls or diag extracts.

        ``CT8`` is the [8, npad] transposed coordinate table (rows 0/1 =
        x/y), so the contraction is skinny (O(n^2 * 8) MXU work); one-hot
        operands make HIGHEST precision exact (each output sums one
        product). The column view is the row view transposed via a one-hot
        identity contraction (cheaper than a relayout on TPU). Rolls /
        wrap fixes happen on the small views; every distance is evaluated
        by the same elementwise formula as datasets.distance_matrix, so
        values are bit-identical to gathering the distance matrix."""
        H2 = lax.dot_general(CT8, W, (((1,), (0,)), ((), ())),
                             precision=HIGHEST)    # H2[c, j] = coords[tour_j, c]
        T2 = lax.dot_general(ident, H2, (((1,), (1,)), ((), ())),
                             precision=HIGHEST)    # T2[i, c] = H2[c, i]
        H2r = jnp.roll(H2, -1, axis=1)             # coords[tour_{j+1}]
        H2r = jnp.where(lane8 == n - 1, H2[:, 0:1], H2r)   # j+1 wraps to 0
        T2u = jnp.roll(T2, 1, axis=0)              # coords[tour_{i-1}]
        col = lambda V: (V[:, 0:1], V[:, 1:2])
        row = lambda V: (V[0:1, :], V[1:2, :])
        d_up = _pair_dist(col(T2u), row(H2))       # d(t_{i-1}, t_j)
        d_right = _pair_dist(col(T2), row(H2r))    # d(t_i, t_{j+1})
        c_i = _pair_dist(col(T2u), col(T2))        # d(t_{i-1}, t_i) [npad,1]
        c_j = _pair_dist(row(H2), row(H2r))        # d(t_j, t_{j+1}) [1,npad]
        return d_up, d_right, c_i, c_j

    def metric_parts(W, Mb):
        """Same ingredients for an arbitrary (bf16-rounded) metric: permute
        by one-hot bf16 MXU contractions (exact selection of bf16 values),
        then shift on the [npad, npad] result."""
        Wb = W.astype(jnp.bfloat16)
        A1 = lax.dot_general(Wb, Mb, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)
        P = lax.dot_general(A1.astype(jnp.bfloat16), Wb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        P_up = jnp.roll(P, 1, axis=0)
        P_right = jnp.roll(P, -1, axis=1)
        # j = n-1 wraps to column 0 (closing edge), not into the padding
        P_right = jnp.where(jj == n - 1, P[:, 0:1], P_right)
        c_i = jnp.sum(jnp.where(ident > 0, P_up, 0.0), axis=1, keepdims=True)
        c_j = jnp.sum(jnp.where(ident > 0, P_right, 0.0), axis=0,
                      keepdims=True)
        return P_up, P_right, c_i, c_j

    def best_move(parts):
        """First-occurrence argmin of the 2-opt delta matrix — identical
        semantics to ops.two_opt._two_opt_delta + flat argmin."""
        d_up, d_right, c_i, c_j = parts
        delta = d_up + d_right - c_i - c_j
        delta = jnp.where(valid, delta, jnp.inf)
        rowmin = jnp.min(delta, axis=1, keepdims=True)          # [npad, 1]
        g = jnp.min(rowmin)
        r = jnp.min(jnp.where(rowmin == g, i1, npad))
        rowvals = jnp.sum(jnp.where(ii == r, delta, 0.0), axis=0,
                          keepdims=True)                        # [1, npad]
        c = jnp.min(jnp.where(rowvals == g, j1, npad))
        return r, c, g

    def flip(tour_row, p, q):
        li = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
        rev = jnp.where((li >= p) & (li <= q), p + q - li, li)
        R = (lax.broadcasted_iota(jnp.int32, (npad, npad), 0) == rev
             ).astype(f32)
        return lax.dot_general(tour_row, R, (((1,), (0,)), ((), ())),
                               precision=HIGHEST)

    def descent(tour_row, parts_fn, max_it):
        """Best-improvement fixed point (ops.two_opt.two_opt semantics)."""

        def cond(carry):
            _, it, last = carry
            return (last < -1e-6) & (it < max_it)

        def body(carry):
            tour, it, _ = carry
            r, c, g = best_move(parts_fn(w_matrix(tour)))
            improved = g < -1e-6
            tour = jnp.where(improved, flip(tour, r, c), tour)
            return tour, it + 1, jnp.where(improved, g, 0.0)

        tour, _, _ = lax.while_loop(
            cond, body, (tour_row, jnp.int32(0), jnp.float32(-1.0)))
        return tour

    def euclid_cost(tour_row, CT8):
        """Cyclic tour length, straight from coordinate views."""
        H2 = lax.dot_general(CT8, w_matrix(tour_row),
                             (((1,), (0,)), ((), ())), precision=HIGHEST)
        H2r = jnp.roll(H2, -1, axis=1)
        H2r = jnp.where(lane8 == n - 1, H2[:, 0:1], H2r)
        row = lambda V: (V[0:1, :], V[1:2, :])
        edges = _pair_dist(row(H2), row(H2r))      # d(t_j, t_{j+1}) [1, npad]
        return jnp.sum(jnp.where(j1 <= n - 1, edges, 0.0))

    return (w_matrix, euclid_parts, metric_parts, best_move, flip, descent,
            euclid_cost)


def _two_opt_kernel(n, npad, max_it, coords_ref, tours_ref, out_ref):
    _, euclid_parts, _, _, _, descent, _ = _kernel_fns(n, npad)
    CT8 = coords_ref[...]
    tour = tours_ref[0].astype(jnp.float32)                      # [1, npad]
    tour = descent(tour, lambda W: euclid_parts(W, CT8), max_it)
    out_ref[0] = tour.astype(jnp.int32)


def _nls_kernel(n, npad, max_it, t_nls, t_p,
                coords_ref, metric_ref, tours_ref, out_ref):
    (_, euclid_parts, metric_parts, _, _, descent,
     euclid_cost) = _kernel_fns(n, npad)
    CT8 = coords_ref[...]
    Mb = metric_ref[...].astype(jnp.bfloat16)
    true_parts = lambda W: euclid_parts(W, CT8)
    heu_parts = lambda W: metric_parts(W, Mb)

    tour = tours_ref[0].astype(jnp.float32)                      # [1, npad]
    tour = descent(tour, true_parts, max_it)
    best_cost = euclid_cost(tour, CT8)

    def round_body(_, carry):
        cur, best, best_cost = carry
        cur = descent(cur, heu_parts, t_p)        # perturb toward the model
        cur = descent(cur, true_parts, max_it)    # re-optimize on true dists
        c = euclid_cost(cur, CT8)
        better = c < best_cost
        return (cur,
                jnp.where(better, cur, best),
                jnp.where(better, c, best_cost))

    _, best, _ = lax.fori_loop(0, t_nls, round_body, (tour, tour, best_cost))
    out_ref[0] = best.astype(jnp.int32)


def _tiled_fns(n, npad, tile):
    """Shape-closed helpers for the O(npad)-state tiled kernels."""
    nt = npad // tile
    f32 = jnp.float32
    j_row = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    i_col_t = lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    j_row_t = lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ident_t = (lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
               == lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
               ).astype(f32)

    def dist_rr(ax, ay, bx, by):
        dx = ax - bx
        dy = ay - by
        return jnp.sqrt(dx * dx + dy * dy + 1e-20)

    def permute_columns(S, src_row):
        """S'[:, j] = S[:, src[j]] — column-tiled one-hot contraction
        (f32 one-hot x f32 values at HIGHEST = exact selection).

        The tile loop is a *Python* unroll over the static ``nt`` so every
        slice index is a compile-time constant — Mosaic has no lowering for
        dynamic_update_slice on TPU, so a ``fori_loop`` version fails to
        compile whenever nt > 1 (i.e. every size this kernel exists for)."""
        k_iota = lax.broadcasted_iota(jnp.int32, (npad, tile), 0)
        outs = []
        for ti in range(nt):
            seg = src_row[:, ti * tile:(ti + 1) * tile]        # static slice
            R = (k_iota == seg.astype(jnp.int32)).astype(f32)  # [npad, tile]
            outs.append(lax.dot_general(S, R, (((1,), (0,)), ((), ())),
                                        precision=HIGHEST))    # [16, tile]
        return jnp.concatenate(outs, axis=1) if nt > 1 else outs[0]

    def flip(S, p, q):
        src = jnp.where((j_row >= p) & (j_row <= q), p + q - j_row, j_row)
        return permute_columns(S, src.astype(f32))

    def tile_cols(M, i0, rows):
        """[rows, npad] view -> transposed [tile, rows] segment at i0.

        ``i0`` is a Python int (static unroll) so the slice is constant."""
        seg = M[:rows, i0:i0 + tile]
        return lax.dot_general(ident_t, seg, (((1,), (1,)), ((), ())),
                               precision=HIGHEST)              # [tile, rows]

    def best_move(S):
        Hx, Hy = S[0:1, :], S[1:2, :]
        Hxu = jnp.roll(Hx, 1, axis=1)
        Hyu = jnp.roll(Hy, 1, axis=1)
        Hxr = jnp.roll(Hx, -1, axis=1)
        Hyr = jnp.roll(Hy, -1, axis=1)
        wrap = j_row == n - 1                  # j+1 wraps to tour_0
        Hxr = jnp.where(wrap, Hx[:, 0:1], Hxr)
        Hyr = jnp.where(wrap, Hy[:, 0:1], Hyr)
        c_j = dist_rr(Hx, Hy, Hxr, Hyr)                        # [1, npad]
        Hu = jnp.concatenate([Hxu, Hyu], axis=0)               # [2, npad]
        Hc = jnp.concatenate([Hx, Hy], axis=0)

        # Python unroll over the static tile count (see permute_columns for
        # why — constant slice starts are required for Mosaic lowering).
        carry = (jnp.asarray(jnp.inf, f32), jnp.int32(npad), jnp.int32(npad))
        for ti in range(nt):
            g, r, c = carry
            i0 = ti * tile
            Tu = tile_cols(Hu, i0, 2)                          # [tile, 2]
            Tc = tile_cols(Hc, i0, 2)
            xi_u, yi_u = Tu[:, 0:1], Tu[:, 1:2]
            xi, yi = Tc[:, 0:1], Tc[:, 1:2]
            d_up = dist_rr(xi_u, yi_u, Hx, Hy)                 # [tile, npad]
            d_right = dist_rr(xi, yi, Hxr, Hyr)
            c_i = dist_rr(xi_u, yi_u, xi, yi)                  # [tile, 1]
            delta = d_up + d_right - c_i - c_j
            gi = i0 + i_col_t                                  # global row ids
            valid = (gi >= 1) & (j_row > gi) & (j_row <= n - 1)
            delta = jnp.where(valid, delta, jnp.inf)
            rowmin = jnp.min(delta, axis=1, keepdims=True)     # [tile, 1]
            tg = jnp.min(rowmin)
            tr = jnp.min(jnp.where(rowmin == tg, gi, npad))
            rowvals = jnp.sum(
                jnp.where(gi == tr, delta, 0.0), axis=0, keepdims=True)
            tc = jnp.min(jnp.where(rowvals == tg, j_row, npad))
            better = tg < g                       # strict: earlier tile wins
            carry = (jnp.where(better, tg, g),
                     jnp.where(better, tr, r),
                     jnp.where(better, tc, c))
        return carry

    def best_move_metric(S, m_dot, cj_scr):
        """Best 2-opt move under an arbitrary (bf16) metric, doubly tiled.

        ``delta[i, j] = M[t_{i-1}, t_j] + M[t_i, t_{j+1}]
                        - M[t_{i-1}, t_i] - M[t_j, t_{j+1}]``.
        ``m_dot(oh)`` contracts a one-hot row-selector ``[tile, npad]``
        against the metric -> ``[tile, npad]`` f32 (the caller owns the
        metric's residency — HBM streamed in halves, see
        ``_tiled_nls_kernel``); ``cj_scr`` is an ``[8, npad]`` f32 scratch
        whose row 0 carries the closing-edge costs. Both tile loops are
        ``fori_loop``s with 128-aligned dynamic slices: the Python-unrolled
        variant kept every iteration's [tile, npad] temporaries live and
        blew the 16 MB scoped-VMEM budget (measured 23-45 MB at npad
        1536-2048). Ties break lexicographically on (value, i, j), matching
        the whole-matrix kernel's flat first-occurrence argmin.
        """
        f32 = jnp.float32
        t = S[2:3, :]                                          # [1, npad]
        t_up = jnp.roll(t, 1, axis=1)
        u = jnp.roll(t, -1, axis=1)
        u = jnp.where(j_row == n - 1, t[:, 0:1], u)            # j+1 wraps
        # Mosaic has no dynamic_slice on VALUES — stage the three tour rows
        # in the scratch (rows 1..3) and pl.ds-slice the REF instead.
        cj_scr[1:2, :] = t
        cj_scr[2:3, :] = t_up
        cj_scr[3:4, :] = u
        city_lane = lax.broadcasted_iota(jnp.int32, (tile, npad), 1)
        city_col = lax.broadcasted_iota(jnp.int32, (npad, tile), 0)

        T_ROW, TUP_ROW, U_ROW = 1, 2, 3

        def dyn_row(row_id, i0):
            """scratch row -> [1, tile] at lane offset i0 (128-aligned)."""
            return cj_scr[row_id:row_id + 1, pl.ds(i0, tile)]

        def seg_col(row_id, i0):
            """scratch row -> [tile, 1] transposed segment at i0."""
            return lax.dot_general(ident_t, dyn_row(row_id, i0),
                                   (((1,), (1,)), ((), ())),
                                   precision=HIGHEST)

        def extract_rows(vals_col):
            """[tile, 1] city ids -> their metric rows [tile, npad] bf16
            (+ the one-hot used, for diagonal picks)."""
            oh = (city_lane == vals_col.astype(jnp.int32))
            return m_dot(oh).astype(jnp.bfloat16), oh

        # pass 1: the closing-edge row c_j[j] = M[t_j, t_{j+1}] -> cj_scr[0]
        def cj_body(ti, _):
            i0 = ti * tile
            b_rows, _ = extract_rows(seg_col(T_ROW, i0))       # M[t_j, :]
            oh_u = (city_lane == seg_col(U_ROW, i0).astype(jnp.int32))
            cj_seg = jnp.sum(jnp.where(oh_u, b_rows.astype(f32), 0.0),
                             axis=1, keepdims=True)            # [tile, 1]
            cj_scr[0:1, pl.ds(i0, tile)] = lax.dot_general(
                cj_seg, ident_t, (((0,), (0,)), ((), ())),
                precision=HIGHEST)                             # [1, tile]
            return 0

        lax.fori_loop(0, nt, cj_body, 0)

        def ti_body(ti, carry):
            i0 = ti * tile
            b_col = seg_col(T_ROW, i0)
            oh_b = city_lane == b_col.astype(jnp.int32)
            a_rows, _ = extract_rows(seg_col(TUP_ROW, i0))     # M[t_{i-1},:]
            b_rows, _ = extract_rows(b_col)                    # M[t_i, :]
            c_i = jnp.sum(jnp.where(oh_b, a_rows.astype(f32), 0.0),
                          axis=1, keepdims=True)               # [tile, 1]
            gi = i0 + i_col_t

            def tj_body(tj, carry):
                g, r, c = carry
                j0 = tj * tile
                t_seg = dyn_row(T_ROW, j0)                     # [1, tile]
                u_seg = dyn_row(U_ROW, j0)
                w_t = (city_col == t_seg.astype(jnp.int32)).astype(
                    jnp.bfloat16)                              # [npad, tile]
                w_u = (city_col == u_seg.astype(jnp.int32)).astype(
                    jnp.bfloat16)
                d_up = lax.dot_general(a_rows, w_t,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=f32)
                d_right = lax.dot_general(b_rows, w_u,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=f32)
                delta = d_up + d_right - c_i - cj_scr[0:1, pl.ds(j0, tile)]
                gj = j0 + j_row_t
                valid = (gi >= 1) & (gj > gi) & (gj <= n - 1)
                delta = jnp.where(valid, delta, jnp.inf)
                rowmin = jnp.min(delta, axis=1, keepdims=True)
                tg = jnp.min(rowmin)
                tr = jnp.min(jnp.where(rowmin == tg, gi, npad))
                rowvals = jnp.sum(jnp.where(gi == tr, delta, 0.0), axis=0,
                                  keepdims=True)
                tc = jnp.min(jnp.where(rowvals == tg, gj, npad))
                # lexicographic (value, i, j) — matches a flat argmin
                better = (tg < g) | ((tg == g) & ((tr < r) | ((tr == r)
                                                             & (tc < c))))
                return (jnp.where(better, tg, g),
                        jnp.where(better, tr, r),
                        jnp.where(better, tc, c))

            return lax.fori_loop(0, nt, tj_body, carry)

        init = (jnp.asarray(jnp.inf, f32), jnp.int32(npad), jnp.int32(npad))
        return lax.fori_loop(0, nt, ti_body, init)

    def euclid_cost(S):
        Hx, Hy = S[0:1, :], S[1:2, :]
        Hxr = jnp.roll(Hx, -1, axis=1)
        Hyr = jnp.roll(Hy, -1, axis=1)
        wrap = j_row == n - 1
        Hxr = jnp.where(wrap, Hx[:, 0:1], Hxr)
        Hyr = jnp.where(wrap, Hy[:, 0:1], Hyr)
        edges = dist_rr(Hx, Hy, Hxr, Hyr)
        return jnp.sum(jnp.where(j_row <= n - 1, edges, 0.0))

    def descent(S, move_fn, max_it):
        def cond(carry):
            _, it, last = carry
            return (last < -1e-6) & (it < max_it)

        def body(carry):
            S, it, _ = carry
            g, r, c = move_fn(S)
            improved = g < -1e-6
            S = jnp.where(improved, flip(S, r, c), S)
            return S, it + 1, jnp.where(improved, g, 0.0)

        S, _, _ = lax.while_loop(
            cond, body, (S, jnp.int32(0), jnp.float32(-1.0)))
        return S

    def assemble(CT8, tour0):
        S0 = jnp.concatenate([CT8[0:2, :], jnp.zeros((14, npad), f32)],
                             axis=0)
        S0 = permute_columns(S0, tour0)       # rows 0/1 = coords[tour_j]
        return jnp.concatenate([S0[0:2, :], tour0, S0[3:, :]], axis=0)

    return (permute_columns, flip, best_move, best_move_metric, euclid_cost,
            descent, assemble)


def _tiled_two_opt_kernel(n, npad, tile, max_it, coords_ref, tours_ref,
                          out_ref):
    """Whole 2-opt descent with O(npad) live state — TSP2000+ in VMEM.

    The search state is ``S [16, npad]``: rows 0/1 = tour-permuted x/y
    coordinates, row 2 = the tour itself (as exact f32 integers). Each
    iteration scans the delta matrix in ``[tile, npad]`` row tiles computed
    from coordinate views (running first-occurrence argmin, identical
    semantics to the whole-matrix kernel), and applies the 2-opt segment
    reversal as a column-tiled one-hot permutation matmul over S —
    O(16 * npad^2) MXU work per move, no [npad, npad] array ever lives.
    """
    (_, _, best_move, _, _, descent, assemble) = _tiled_fns(n, npad, tile)
    S = assemble(coords_ref[...], tours_ref[0].astype(jnp.float32))
    S = descent(S, best_move, max_it)
    out_ref[0] = S[2:3, :].astype(jnp.int32)


def _tiled_nls_kernel(n, npad, tile, max_it, t_nls, t_p,
                      coords_ref, metric_ref, tours_ref, out_ref,
                      mh_scr, cj_scr, m_sem):
    """NLS (reference tsp_nls/aco.py:241-258) at 1024 < n <= 2048: euclid
    descents from coordinate views, perturbation descents on the resident
    bf16 metric via ``best_move_metric`` — no [npad, npad] f32 ever lives.

    ALL ants run inside one gridless invocation (an ant ``fori`` loop),
    and the metric LIVES IN HBM (``ANY`` memory space): every VMEM-resident
    variant measured 18.6-44.9 MB scoped VMEM at npad 2048 (grid double
    buffering; Mosaic materializing full-array read values). Each metric
    contraction streams the matrix through a half-size VMEM scratch
    (~npad^2 bytes of DMA per one-hot extraction — ~0.5 ms/move at 2048,
    small against the descent's MXU work)."""
    (_, _, best_move, best_move_metric, euclid_cost, descent,
     assemble) = _tiled_fns(n, npad, tile)
    chunk = npad // 4
    f32 = jnp.float32

    def m_dot(oh):
        acc = jnp.zeros((oh.shape[0], npad), f32)
        for h in range(4):
            cp = pltpu.make_async_copy(
                metric_ref.at[h * chunk:(h + 1) * chunk, :], mh_scr, m_sem)
            cp.start()
            cp.wait()
            acc = acc + lax.dot_general(
                oh[:, h * chunk:(h + 1) * chunk].astype(jnp.bfloat16),
                mh_scr[...], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        return acc

    a_total = tours_ref.shape[0]

    def ant_body(a, _):
        S = assemble(coords_ref[...], tours_ref[a].astype(jnp.float32))
        S = descent(S, best_move, max_it)
        best_cost = euclid_cost(S)
        best_tour = S[2:3, :]

        def round_body(_, carry):
            S, best_tour, best_cost = carry
            S = descent(S, lambda s: best_move_metric(s, m_dot,
                                                      cj_scr), t_p)
            S = descent(S, best_move, max_it)
            cost = euclid_cost(S)
            better = cost < best_cost
            return (S,
                    jnp.where(better, S[2:3, :], best_tour),
                    jnp.where(better, cost, best_cost))

        _, best_tour, _ = lax.fori_loop(0, t_nls, round_body,
                                        (S, best_tour, best_cost))
        out_ref[a] = best_tour.astype(jnp.int32)
        return 0

    lax.fori_loop(0, a_total, ant_body, 0)


def _tiled_two_opt_call(coords, tours, max_iterations: int):
    n = coords.shape[0]
    npad = max(_TILE, -(-n // _TILE) * _TILE)
    a = tours.shape[0]
    out = pl.pallas_call(
        functools.partial(_tiled_two_opt_kernel, n, npad, _TILE,
                          max_iterations),
        grid=(a,),
        in_specs=[
            pl.BlockSpec((8, npad), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((a, 1, npad), jnp.int32),
        interpret=_interpret(),
    )(_pad_coords(coords, npad), _pad_tours(tours, npad))
    return out[:, 0, :n]


def _pad_coords(coords, npad):
    """[n, 2] -> transposed [8, npad] table (rows 0/1 = x/y, rest zero)."""
    ct = jnp.zeros((8, npad), jnp.float32)
    return lax.dynamic_update_slice(
        ct, coords.astype(jnp.float32).T, (0, 0))


def _pad_square(m, npad):
    n = m.shape[0]
    out = jnp.zeros((npad, npad), jnp.float32)
    return lax.dynamic_update_slice(out, m.astype(jnp.float32), (0, 0))


def _pad_tours(tours, npad):
    """[A, n] -> [A, 1, npad] (3-D so the per-ant block satisfies the TPU
    (8, 128)-divisibility rule on the last two dims)."""
    a, n = tours.shape
    out = jnp.zeros((a, npad), jnp.int32)
    out = lax.dynamic_update_slice(out, tours.astype(jnp.int32), (0, 0))
    return out[:, None, :]


def pallas_ls_supported(n: int, ls: str = "nls") -> bool:
    """Whether the on-chip descent covers size ``n`` for the given mode.

    NLS runs whole-matrix to npad 1024, then the doubly-tiled resident-bf16
    metric kernel to 2048; plain 2-opt has the tiled kernel to 4096."""
    if ls == "2opt":
        return _npad(n) <= MAX_NPAD_TILED
    return _npad(n) <= MAX_NPAD_NLS_TILED


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnums=2)
def batched_two_opt_euclid(coords, tours, max_iterations: int):
    """2-opt to the fixed point for Euclidean TSP; ``tours`` is ``[A, n]``.

    Exact move/descent parity with ``batched_two_opt(distance_matrix(coords),
    tours, max_iterations)``; falls back to it when the instance exceeds the
    kernel's VMEM budget.
    """
    n = coords.shape[0]
    if not pallas_ls_supported(n, "2opt"):
        import warnings

        from deepaco_tpu.utils.datasets import distance_matrix

        # past the tiled kernel's cap the fallback densifies to [N, N] —
        # breaking large_tsp's no-dense-matrix contract; surface it loudly
        # at trace time instead of silently allocating O(N^2).
        warnings.warn(
            f"batched_two_opt_euclid: n={n} exceeds the tiled Pallas cap "
            f"({MAX_NPAD_TILED}); falling back to the XLA path which "
            f"materializes an [N, N] distance matrix", stacklevel=2)
        return batched_two_opt(distance_matrix(coords), tours, max_iterations)
    if _npad(n) > MAX_NPAD:            # 1024 < n <= 4096: tiled kernel
        return _tiled_two_opt_call(coords, tours, max_iterations)
    npad = _npad(n)
    a = tours.shape[0]
    out = pl.pallas_call(
        functools.partial(_two_opt_kernel, n, npad, max_iterations),
        grid=(a,),
        in_specs=[
            pl.BlockSpec((8, npad), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((a, 1, npad), jnp.int32),
        interpret=_interpret(),
    )(_pad_coords(coords, npad), _pad_tours(tours, npad))
    return out[:, 0, :n]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def batched_nls_euclid(coords, heu_dist, tours, max_iterations: int,
                       t_nls: int = 10, t_p: int = 20,
                       force_tiled: bool = False):
    """Neural-guided LS for Euclidean TSP (reference nls,
    tsp_nls/aco.py:241-258) fully in VMEM; ``tours`` is ``[A, n]``.

    The perturbation metric is deterministically rounded to bfloat16 (the
    true-distance descents stay exact f32) — identical to
    ``batched_nls(dist, heu_dist.astype(bf16), ...)``.
    """
    n = coords.shape[0]
    if not pallas_ls_supported(n):
        from deepaco_tpu.utils.datasets import distance_matrix

        return batched_nls(distance_matrix(coords), heu_dist, tours,
                           max_iterations, t_nls, t_p)
    a = tours.shape[0]
    # force_tiled: the training path wraps this under value_and_grad, where
    # the whole-matrix kernel's scoped VMEM at npad=1024 overflows by ~2.5 MB
    # (round-5 probe, results/train_tsp_nls1000.log); the tiled kernel has
    # exact move parity and fits
    if _npad(n) > MAX_NPAD or (force_tiled and _npad(n) >= MAX_NPAD):
        npad = max(_TILE_NLS, -(-n // _TILE_NLS) * _TILE_NLS)
        out = pl.pallas_call(
            functools.partial(_tiled_nls_kernel, n, npad, _TILE_NLS,
                              max_iterations, t_nls, t_p),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((a, 1, npad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((npad // 4, npad), jnp.bfloat16),
                            pltpu.VMEM((8, npad), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            interpret=_interpret(),
        )(_pad_coords(coords, npad),
          _pad_square(heu_dist, npad).astype(jnp.bfloat16),
          _pad_tours(tours, npad))
        return out[:, 0, :n]
    npad = _npad(n)
    out = pl.pallas_call(
        functools.partial(_nls_kernel, n, npad, max_iterations, t_nls, t_p),
        grid=(a,),
        in_specs=[
            pl.BlockSpec((8, npad), lambda i: (0, 0)),
            pl.BlockSpec((npad, npad), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((a, 1, npad), jnp.int32),
        interpret=_interpret(),
    )(_pad_coords(coords, npad), _pad_square(heu_dist, npad),
      _pad_tours(tours, npad))
    return out[:, 0, :n]
