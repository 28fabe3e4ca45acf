"""Large-N TSP: sparse ``[N, K]`` ACO state END-TO-END (SURVEY §5 north star).

Beyond the reference's biggest scale (TSP1000) the dense formulation stops
fitting: score/pheromone/distance matrices are O(N²) each and the reference's
own engine (tsp/aco.py) materializes all three. This module keeps EVERY piece
of per-instance search state on the k-NN support:

  coords [N, 2] · nbr [N, K] · heu [N, K] · tau [N, K] · visited bits [A, N/32]

* **Scores** — ``alpha*log(tau) + beta*log(heu)`` is one [N, K] table per
  iteration (bf16 for the sampling sweep, like ``batched_tsp``).
* **Sampling** — Gumbel-max over the K unvisited support slots of the current
  city. When an ant has exhausted its neighborhood (all K neighbors visited —
  increasingly common near the end of construction), a ``lax.cond``-gated
  fallback samples UNIFORMLY over the remaining unvisited cities. This is the
  documented large-N approximation of the reference semantics: off-support
  the reference's probability is ``tau[u,v]^α · (1e-10)^β`` (tsp/aco.py:165-177
  with the sparsified heuristic floor), i.e. ~uniform modulo the rare deposits
  that land off-support; we drop those deposits (see below) so the fallback
  law is exactly uniform-over-unvisited.
* **Costs** — tour length straight from coordinates (O(N·A)); no [N, N]
  distance matrix exists anywhere.
* **Deposits** — each traversed edge (u, v) is folded back onto u's support
  slot (one [K]-wide compare); edges only a fallback step can produce (v not
  in u's k-NN list) are dropped. With K = N/10 the fallback fires late in
  construction where edges are long and deposits tiny, so the search dynamics
  match the dense path closely (test: curves within a few % at n=200).
* **Local search** — the tiled Pallas descent (ops.pallas_two_opt) consumes
  coordinates directly, so 2-opt/NLS also needs no [N, N] input.

The reference cannot run these scales at all; this module is benchmarked as
new capability (TSP2000+ tours/s) rather than A/B parity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import NEG_INF
from deepaco_tpu.aco.runner import ACOConfig

_WORD = 32


def _n_words(n: int) -> int:
    return -(-n // _WORD)


def knn_support(coords: jax.Array, k: int) -> jax.Array:
    """``[N, K]`` nearest-neighbor ids by Euclidean distance (self excluded).

    Computed in row tiles so no [N, N] distance matrix is materialized.
    Coordinates are padded up to a tile multiple so ``dynamic_slice`` never
    clamps the last block's start — with clamping, the tail ``n % tile``
    rows would silently receive earlier rows' neighbor lists (the padded
    rows compute garbage against the real column set but are sliced off)."""
    n = coords.shape[0]
    tile = max(1, min(n, 4_000_000 // max(n, 1)))
    n_pad = ((n + tile - 1) // tile) * tile
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))

    def row_block(start):
        block = jax.lax.dynamic_slice(cpad, (start, 0), (tile, 2))
        d = jnp.linalg.norm(block[:, None] - coords[None], axis=-1)
        rows = start + jnp.arange(tile)
        d = jnp.where(jnp.arange(n)[None, :] == rows[:, None], jnp.inf, d)
        _, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32)

    starts = jnp.arange(0, n_pad, tile)
    blocks = jax.lax.map(row_block, starts)
    return blocks.reshape(-1, k)[:n]


def sparse_tsp_graph(coords: jax.Array, nbr: jax.Array):
    """SparseGraph over a precomputed support — the GNN input for large N.

    Equivalent to ``core.graph.knn_graph`` (same node feats = coords, edge
    feat = neighbor distance) but built WITHOUT the [N, N] distance matrix."""
    from deepaco_tpu.core.graph import SparseGraph

    edge = jnp.linalg.norm(coords[:, None] - coords[nbr], axis=-1)[..., None]
    return SparseGraph(x=coords, nbr=nbr, edge=edge)


def classic_knn_heuristic(coords: jax.Array, nbr: jax.Array) -> jax.Array:
    """1/dist on the support (the reference's ``sparsify`` prior,
    tsp/aco.py:51-67, in [N, K] layout)."""
    d = jnp.linalg.norm(coords[:, None] - coords[nbr], axis=-1)
    return 1.0 / jnp.maximum(d, 1e-12)


def _visited_lookup(words: jax.Array, ids: jax.Array) -> jax.Array:
    """``words [A, W]`` bitmask; ``ids [A, K]`` → 0/1 visited [A, K]."""
    w = jnp.take_along_axis(words, (ids >> 5), axis=1)
    return ((w >> (ids & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)


def _set_bit(words: jax.Array, actions: jax.Array) -> jax.Array:
    aw = (actions >> 5)[:, None]
    bit = jnp.left_shift(jnp.uint32(1),
                         (actions & 31)[:, None].astype(jnp.uint32))
    return jnp.where(jnp.arange(words.shape[1]) == aw, words | bit, words)


def _unpack_unvisited(words: jax.Array, n: int) -> jax.Array:
    cols = jnp.arange(n, dtype=jnp.int32)
    w = words[:, cols >> 5]
    return 1 - ((w >> (cols & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)


def sweep_construct_knn(score: jax.Array, nbr: jax.Array, start: jax.Array,
                        rng: jax.Array, with_stats: bool = False):
    """One construction sweep for one instance over the sparse support.

    score [N, K] (bf16 ok), nbr [N, K], start [A] → paths [N, A] int32.
    Fallback steps (any ant with its whole neighborhood visited) sample
    uniformly over that ant's unvisited set, gated by ``lax.cond`` so the
    O(A·N) unpack only runs when needed.

    ``with_stats=True`` additionally returns the number of ant-steps that
    took the uniform fallback (scalar int32) — the telemetry behind the
    module's documented approximation (scripts/fallback_rate.py).
    """
    n, k = nbr.shape
    a = start.shape[0]
    dt = score.dtype
    words0 = _set_bit(jnp.zeros((a, _n_words(n)), jnp.uint32), start)

    def sparse_step(cur, words, key):
        ids = nbr[cur]                                    # [A, K]
        mask = 1 - _visited_lookup(words, ids)
        logits = jnp.where(mask > 0, score[cur], jnp.asarray(NEG_INF, dt))
        g = jax.random.gumbel(key, (a, k), dtype=dt)
        slot = jnp.argmax(logits + g, axis=-1)
        action = jnp.take_along_axis(ids, slot[:, None], 1)[:, 0]
        return action, jnp.sum(mask, axis=1) == 0         # exhausted flags

    def fallback(cur, words, key, action, exhausted):
        unv = _unpack_unvisited(words, n)                  # [A, N]
        logits = jnp.where(unv > 0, jnp.asarray(0.0, dt),
                           jnp.asarray(NEG_INF, dt))
        g = jax.random.gumbel(key, (a, n), dtype=dt)
        uni = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
        return jnp.where(exhausted, uni, action)

    def step(carry, key):
        cur, words = carry
        k_s, k_f = jax.random.split(key)
        action, exhausted = sparse_step(cur, words, k_s)
        action = jax.lax.cond(
            jnp.any(exhausted),
            lambda: fallback(cur, words, k_f, action, exhausted),
            lambda: action)
        words = _set_bit(words, action)
        return (action, words), (action, jnp.sum(exhausted.astype(jnp.int32)))

    keys = jax.random.split(rng, n - 1)
    _, (path, n_fb) = jax.lax.scan(step, (start, words0), keys)
    paths = jnp.concatenate([start[None, :], path], axis=0)  # [N, A]
    if with_stats:
        return paths, jnp.sum(n_fb)
    return paths


def tour_cost_coords(coords: jax.Array, paths: jax.Array) -> jax.Array:
    """Cyclic tour lengths from coordinates; paths [N, A] → [A]."""
    pts = coords[paths]                                     # [N, A, 2]
    nxt = jnp.roll(pts, -1, axis=0)
    return jnp.sum(jnp.linalg.norm(pts - nxt, axis=-1), axis=0)


def deposit_knn(tau: jax.Array, nbr: jax.Array, paths: jax.Array,
                amounts: jax.Array, symmetric: bool = True) -> jax.Array:
    """Fold tour-edge deposits onto the [N, K] support.

    For each directed edge (u, v): the slot is ``argmax(nbr[u] == v)``;
    edges with v not in u's list are dropped (fallback-only edges — see
    module docstring)."""
    u = paths                                               # [N, A]
    v = jnp.roll(paths, -1, axis=0)

    def one_dir(tau, uu, vv):
        hits = nbr[uu] == vv[..., None]                     # [N, A, K]
        on = jnp.any(hits, axis=-1)
        slot = jnp.argmax(hits, axis=-1)
        amt = jnp.where(on, amounts[None, :], 0.0)
        return tau.at[uu, slot].add(amt)

    tau = one_dir(tau, u, v)
    if symmetric:
        tau = one_dir(tau, v, u)
    return tau


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def run_anytime_knn(coords: jax.Array, nbr: jax.Array, heu: jax.Array,
                    cfg: ACOConfig, n_iterations: int, ls: str | None,
                    rng: jax.Array):
    """Anytime TSP sweep with O(N·K) state; returns (curve [T], best [N]).

    ``ls='2opt'`` applies the coordinate-driven Pallas descent to every
    ant's tour each iteration (no [N, N] input matrix)."""
    n, k = nbr.shape
    a = cfg.n_ants
    log_heu = cfg.beta * jnp.log(jnp.maximum(heu, 1e-30))
    tau0 = jnp.ones((n, k), jnp.float32)
    best0 = (jnp.asarray(jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))

    ls_fn = None
    if ls == "2opt":
        from deepaco_tpu.ops.pallas_two_opt import batched_two_opt_euclid

        ls_fn = lambda paths: batched_two_opt_euclid(
            coords, paths.T, 10000).T

    def body(carry, key):
        tau, best_cost, best_path = carry
        score = (cfg.alpha * jnp.log(jnp.maximum(tau, 1e-30))
                 + log_heu).astype(jnp.bfloat16)
        k_start, k_sweep = jax.random.split(key)
        start = jax.random.randint(k_start, (a,), 0, n)
        paths = sweep_construct_knn(score, nbr, start, k_sweep)
        if ls_fn is not None:
            paths = ls_fn(paths)
        costs = tour_cost_coords(coords, paths)
        it_best = jnp.argmin(costs)
        improved = costs[it_best] < best_cost
        best_cost = jnp.where(improved, costs[it_best], best_cost)
        best_path = jnp.where(improved, paths[:, it_best], best_path)
        tau = deposit_knn(tau * cfg.decay, nbr, paths, cfg.q / costs,
                          cfg.symmetric)
        return (tau, best_cost, best_path), best_cost

    keys = jax.random.split(rng, n_iterations)
    (_, _, best_path), curve = jax.lax.scan(
        body, (tau0,) + best0, keys)
    return curve, best_path
