"""Batched TSP anytime runners — the inference fast path behind the bench.

Two whole-batch runners (state ``[B, A]``, ONE scan for the full instance
set) replacing a vmap of per-instance scans:

* :func:`run_anytime_batched` — the production path. Dense ``[A, N]``
  candidate rows exactly like the reference (tsp/aco.py:165-177), with two
  TPU-shaped optimizations that leave the sampling distribution intact:

  - ``beta*log(heu)`` is hoisted OUT of the iteration loop (the heuristic is
    constant across iterations; only ``alpha*log(tau)`` is refreshed) —
    the per-instance path recomputed both logs over ``[N, N]`` every
    iteration;
  - the construction step runs in a reduced ``sample_dtype`` (bfloat16 by
    default on the bench): score-row gather, Gumbel noise, and argmax all
    halve their HBM traffic. Logit quantization (~3 decimal digits) is far
    below the Gumbel noise scale, so the sampling law is unchanged in
    practice; pheromone state, deposits, and costs stay float32. Pass
    ``sample_dtype=jnp.float32`` for bit-exact greedy parity with the
    engine (pinned by tests).

ROOFLINE (round-5 measurement campaign, TPU v5e, bench shape B=100, N=500,
A=20, T=10 — all numbers idle-chip): the construction scan runs at
~37.5 us/step and is bounded by per-row random access, not streaming
bandwidth. Decomposition per step: ~5.7 us base (2 MB sequential read +
scan glue), ~17.6 us row-gather premium (2000 rows from [B*N, N] bf16 at
~8.8 ns/row — byte-count-insensitive: [2000, 64] int32 rows still cost
~14 us), ~13.6 us pick work (mask/noise/argmax VPU passes over [2000, 512]).
Alternatives measured and rejected:

* per-step fused Pallas pick (:func:`dense_sweep_fused`, the default on
  TPU): 186 vs 187 ms — the kernel fuses ~5 XLA passes but the gather
  premium and VPU pass count are unchanged; kept for the 16x smaller scan
  carry (bit-packed visited words) and on-chip PRNG;
* one-hot MXU row fetch: +44 us/step (B=100 batched [20,500]x[500,500]
  matmuls underutilize the MXU);
* whole-iteration VMEM-resident kernel (score chunks in VMEM, per-ant
  ``pl.ds`` dynamic-slice row loads at ~2-3 ns/load, grid-sequential
  state): 39.3 us/step — chunk serialization (score > VMEM forces >= 9
  chunks) plus a per-step VMEM->SMEM DMA for the action scalars eat the
  gather saving; also bf16 refs reject unaligned dynamic sublane loads
  (f32 required, halving the feasible chunk count);
* 2-way software pipelining (half-batch gather overlapped with the other
  half's pick): 42.4 us/step — no DMA/compute overlap materializes.

The phase floor at this batch shape is therefore ~(5.7 + 14 + ~8) us/step
=~ 140 ms for the T=10 sweep — the engine runs within ~1.3x of it. Scaling
throughput further means more instances per sweep (the gather cost is
row-count-bound and saturates: 1000-row and 2000-row gathers cost the
same), not faster per-step kernels.

* :func:`run_anytime_sparse` — an experiment retained with its measurements:
  sample over the ``[N, K]`` k-NN support only (valid whenever the heuristic
  is floored off-support, as both eval paths produce) with an exact dense
  fallback step under ``lax.cond`` when any ant exhausts its neighborhood.
  MEASURED on TPU v5e at the bench shape (B=100, N=500, K=50, A=20): no win —
  XLA row gathers are latency-bound (~row count, not bytes: [2000,50] costs
  ~0.8x of [2000,500]), and with 2000 ants the global fallback predicate
  fires on ~45% of steps (178-267 of 499), paying sparse+dense. It remains
  the better path on gather-cheap backends (CPU) and for very large N/K
  ratios; tests keep it correct.

Both reuse the stock :func:`deepaco_tpu.aco.runner.search_update` under
``vmap`` — deposits land on arbitrary tour edges exactly as in the reference.
Inference only (no log-probs): training keeps the dense engine's
differentiable path (engine.rollout with require_prob=True).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.engine import NEG_INF
from deepaco_tpu.aco.problems.tsp import tour_cost
from deepaco_tpu.aco.runner import ACOConfig, init_search, search_update

_WORD = 32


def _n_words(n: int) -> int:
    return -(-n // _WORD)


def _gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table [B, N, X]`` gathered at ``idx [B, A]`` → ``[B, A, X]``."""
    return jax.vmap(lambda t, i: t[i])(table, idx)


def _set_bits(words: jax.Array, actions: jax.Array) -> jax.Array:
    """Set bit ``actions[b, a]`` in ``words [B, A, W]`` (uint32)."""
    w = words.shape[-1]
    aw = (actions >> 5)[..., None]                       # word index [B,A,1]
    ab = (actions & 31)[..., None].astype(jnp.uint32)
    bit = jnp.left_shift(jnp.uint32(1), ab)
    w_iota = jnp.arange(w, dtype=actions.dtype)
    return jnp.where(w_iota == aw, words | bit, words)


def _unpack(words: jax.Array, n: int) -> jax.Array:
    """Expand bit-packed visits to a ``[B, A, N]`` 0/1 int32 mask."""
    cols = jnp.arange(n, dtype=jnp.int32)
    wvals = words[:, :, cols >> 5]                       # [B, A, N] uint32
    return ((wvals >> (cols & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)


def _start_cities(key, b, a, n, fixed_start):
    if fixed_start is None:
        return jax.random.randint(key, (b, a), 0, n)
    return jnp.full((b, a), fixed_start, jnp.int32)


def _batched_init(b, n, cfg):
    return jax.vmap(lambda _: init_search(n, n - 1, cfg))(jnp.arange(b))


def _fused_update_ok(cfg) -> bool:
    """The fused Pallas update covers exactly the plain-AS TSP strategy
    (the bench/eval default); every other flag keeps the generic path."""
    return (jax.default_backend() == "tpu" and not cfg.elitist
            and not cfg.min_max and not cfg.maximize
            and not cfg.vector_pheromone and not cfg.deposit_div_ants
            and cfg.cost_offset == 0.0 and cfg.cyclic)


def _batched_update(cfg, state, paths, dist):
    if _fused_update_ok(cfg):
        from deepaco_tpu.ops.pallas_kernels import fused_tsp_update_pallas

        d, costs = jax.vmap(functools.partial(
            fused_tsp_update_pallas, q=cfg.q))(paths, dist)
        if cfg.symmetric:
            d = d + jnp.swapaxes(d, -1, -2)
        tau = state.phe.tau * cfg.decay + d
        if cfg.floor > 0.0:
            tau = jnp.maximum(tau, cfg.floor)
        it_best = jnp.argmin(costs, axis=1)
        it_cost = jnp.take_along_axis(costs, it_best[:, None], 1)[:, 0]
        improved = it_cost < state.best_cost
        best_cost = jnp.where(improved, it_cost, state.best_cost)
        bpath = jnp.take_along_axis(
            paths, it_best[:, None, None], axis=2)[:, :, 0]
        best_path = jnp.where(improved[:, None], bpath, state.best_path)
        return state._replace(phe=state.phe._replace(tau=tau),
                              best_cost=best_cost, best_path=best_path)
    costs = jax.vmap(tour_cost)(dist, paths)             # [B, A]
    return jax.vmap(functools.partial(search_update, cfg))(
        state, paths, costs)


# ------------------------------------------------------------ dense path ---
def dense_sweep(score: jax.Array, start: jax.Array, rng: jax.Array,
                *, stochastic: bool = True) -> jax.Array:
    """Full construction for the ``[B, A]`` ant batch over dense rows.

    ``score`` is ``[B, N, N]`` in the sampling dtype (bf16 on the bench);
    per step: one flat row gather, Gumbel noise, masked argmax, and a
    compare-select mask clear — the same math as ``engine.rollout`` with the
    TSP spec, batched. Returns paths ``[B, N, A]`` int32.
    """
    b, n, _ = score.shape
    a = start.shape[1]
    dtype = score.dtype
    neg = jnp.asarray(NEG_INF, dtype)
    score_flat = score.reshape(b * n, n)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    start = start.astype(jnp.int32)
    cols = jnp.arange(n, dtype=jnp.int32)
    mask0 = jnp.where(cols[None, None, :] == start[..., None],
                      jnp.zeros((), dtype), jnp.ones((), dtype))
    step_keys = jax.random.split(rng, n - 1)

    def step(carry, key):
        cur, mask = carry
        rows = score_flat[(base + cur).reshape(-1)].reshape(b, a, n)
        logits = jnp.where(mask > 0, rows, neg)
        if stochastic:
            logits = logits + jax.random.gumbel(key, logits.shape,
                                                dtype=dtype)
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        mask = jnp.where(cols[None, None, :] == action[..., None],
                         jnp.zeros((), dtype), mask)
        return (action, mask), action

    # unroll: the step body is tiny relative to the loop's fixed per-iteration
    # cost (measured on TPU v5e at the bench shape: 43us/step at unroll=1,
    # 29us/step at unroll=8; scan bookkeeping itself is negligible — the win
    # is XLA scheduling/fusing across adjacent steps)
    _, actions = jax.lax.scan(step, (start, mask0), step_keys, unroll=8)
    return jnp.transpose(jnp.concatenate([start[None], actions], axis=0),
                         (1, 0, 2))


def dense_sweep_fused(score: jax.Array, start: jax.Array, rng: jax.Array,
                      *, stochastic: bool = True, tile: int = 512
                      ) -> jax.Array:
    """:func:`dense_sweep` with the per-step Pallas fused pick.

    Identical sampling law (Gumbel-max over masked bf16 score rows;
    tsp/aco.py:165-177): the XLA row gather stays, but mask test, Gumbel
    noise (on-chip PRNG), argmax and the visited-set update run as ONE
    VMEM pass per step, with the visited set carried bit-packed
    ([B*A, ceil(N/32)] uint32 instead of a [B, A, N] bf16 mask — 16x less
    scan-carry traffic). Greedy mode (``stochastic=False``) is bit-equal to
    :func:`dense_sweep`'s argmax decode (pinned by tests).
    """
    from deepaco_tpu.ops.pallas_kernels import (fused_step_pallas,
                                                pack_visited, visited_words)

    b, n, _ = score.shape
    a = start.shape[1]
    score_flat = score.reshape(b * n, n)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    start = start.astype(jnp.int32)
    words0 = pack_visited(jnp.zeros((b * a, visited_words(n)), jnp.uint32),
                          start.reshape(-1), n)
    info = jnp.iinfo(jnp.int32)
    seeds = jax.random.randint(rng, (n - 1,), info.min, info.max,
                               dtype=jnp.int32)

    def step(carry, seed):
        cur, words = carry
        rows = score_flat[(base + cur).reshape(-1)]          # [B*A, N]
        action, words = fused_step_pallas(rows, words, seed,
                                          stochastic=stochastic, tile=tile)
        action = action.reshape(b, a)
        return (action, words), action

    _, actions = jax.lax.scan(step, (start, words0), seeds, unroll=8)
    return jnp.transpose(jnp.concatenate([start[None], actions], axis=0),
                         (1, 0, 2))


def _use_fused_step() -> bool:
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("DEEPACO_FUSED_STEP", "1") != "0")


def _batched_ls_fn(ls: str | None, coords, dist, heu, ls_budget: int):
    """Whole-batch local-search hook: ``paths [B, N, A] -> improved paths``.

    Routes to the whole-descent Pallas kernel (grid ``(B, A)`` via its vmap
    rule) when coordinates are available on TPU; otherwise vmaps the XLA
    descent per instance (reference semantics either way,
    tsp_nls/aco.py:226-258)."""
    if ls is None:
        return None
    from deepaco_tpu.ops.two_opt import batched_nls, batched_two_opt, heuristic_dist

    import os

    use_pallas = (coords is not None and jax.default_backend() == "tpu"
                  and os.environ.get("DEEPACO_PALLAS_LS", "1") != "0")
    if use_pallas:
        from deepaco_tpu.ops.pallas_two_opt import (
            batched_nls_euclid, batched_two_opt_euclid, pallas_ls_supported)

        use_pallas = pallas_ls_supported(dist.shape[-1], ls)

    if ls == "nls":
        hd = heuristic_dist(heu)
        if use_pallas:
            per_inst = lambda c, h, t: batched_nls_euclid(c, h, t, ls_budget)
            args = (coords, hd)
        else:
            per_inst = lambda d, h, t: batched_nls(d, h, t, ls_budget)
            args = (dist, hd)
    else:
        if use_pallas:
            per_inst = lambda c, t: batched_two_opt_euclid(c, t, ls_budget)
            args = (coords,)
        else:
            per_inst = lambda d, t: batched_two_opt(d, t, ls_budget)
            args = (dist,)

    def fn(paths):
        tours = jnp.swapaxes(paths, 1, 2)                      # [B, A, N]
        tours = jax.vmap(per_inst)(*args, tours)
        return jnp.swapaxes(tours, 1, 2)

    return fn


def run_anytime_batched(heu: jax.Array, dist: jax.Array, cfg: ACOConfig,
                        rng: jax.Array, n_iterations: int,
                        fixed_start: int | None = None,
                        sample_dtype=jnp.bfloat16,
                        coords: jax.Array | None = None,
                        ls: str | None = None,
                        ls_budget: int = 10000,
                        state=None, return_state: bool = False):
    """Batched dense anytime TSP sweep (the production bench path).

    Args:
      heu:  ``[B, N, N]`` dense heuristic (off-support floored).
      dist: ``[B, N, N]`` distances.
      coords: optional ``[B, N, 2]`` — unlocks the Pallas LS kernel on TPU.
      ls:   None | "2opt" | "nls" — local search applied to every ant's tour
            before scoring/deposit (the tsp_nls run loop, tsp_nls/aco.py:103-130),
            batched over the whole instance set.

    Returns the anytime curve ``[B, n_iterations]`` of best-so-far costs —
    the protocol of ``runner.run_anytime`` vmapped per instance, minus the
    redundant per-iteration ``log(heu)`` and with reduced-precision sampling.
    ``state``/``return_state`` let a host driver carry the search state across
    several short device programs (chunked anytime sweeps: one multi-minute
    program can trip the TPU worker's watchdog when LS runs per iteration).
    """
    b, n, _ = heu.shape
    a = cfg.n_ants
    log_heu = (cfg.beta * jnp.log(jnp.maximum(heu, 1e-30)))  # hoisted, fp32
    if ls is not None and fixed_start is None:
        fixed_start = 0     # NLS protocol constructs from node 0
    ls_fn = _batched_ls_fn(ls, coords, dist, heu, ls_budget)

    state0 = _batched_init(b, n, cfg) if state is None else state
    keys = jax.random.split(rng, n_iterations)

    def body(state, key):
        score = (cfg.alpha * jnp.log(jnp.maximum(state.phe.tau, 1e-30))
                 + log_heu).astype(sample_dtype)
        k_start, k_sweep = jax.random.split(key)
        start = _start_cities(k_start, b, a, n, fixed_start)
        if _use_fused_step():
            paths = dense_sweep_fused(score, start, k_sweep)
        else:
            paths = dense_sweep(score, start, k_sweep)
        if ls_fn is not None:
            paths = ls_fn(paths)
        state = _batched_update(cfg, state, paths, dist)
        return state, state.best_cost

    final, curve = jax.lax.scan(body, state0, keys)             # [T, B]
    if return_state:
        return final, curve.T
    return curve.T


# ----------------------------------------------------------- sparse path ---
def sweep_construct(score_dense: jax.Array, score_sparse: jax.Array,
                    nbr: jax.Array, start: jax.Array, rng: jax.Array,
                    *, stochastic: bool = True, count_dense: bool = False):
    """Construct full tours over the ``[N, K]`` support (see module note).

    Args:
      score_dense:  ``[B, N, N]`` combined log-scores (exact fallback rows).
      score_sparse: ``[B, N, K]`` the same scores gathered on the k-NN support.
      nbr:          ``[B, N, K]`` int32 neighbor indices.
      start:        ``[B, A]`` int32 start cities.
      rng:          key for the per-step Gumbel noise.
      stochastic:   ``False`` → greedy argmax decode (testing).
      count_dense:  also return the number of steps that fell back to the
                    dense row (diagnostics).

    Returns paths ``[B, N, A]`` int32 (row 0 = start), matching the layout of
    ``engine.rollout`` per instance.
    """
    b, n, k = score_sparse.shape
    a = start.shape[1]
    start = start.astype(jnp.int32)
    words0 = _set_bits(jnp.zeros((b, a, _n_words(n)), jnp.uint32), start)
    step_keys = jax.random.split(rng, n - 1)

    def step(carry, key):
        cur, words = carry
        nbr_rows = _gather_rows(nbr, cur)                       # [B, A, K]
        wvals = jnp.take_along_axis(words, nbr_rows >> 5, axis=2)
        vis = (wvals >> (nbr_rows & 31).astype(jnp.uint32)) & 1
        open_nbr = vis == 0                                     # [B, A, K]
        need_dense = ~jnp.all(jnp.any(open_nbr, axis=-1))

        def sparse_step(_):
            rows = _gather_rows(score_sparse, cur)              # [B, A, K]
            logits = jnp.where(open_nbr, rows, NEG_INF)
            if stochastic:
                logits = logits + jax.random.gumbel(key, logits.shape,
                                                    dtype=logits.dtype)
            slot = jnp.argmax(logits, axis=-1)
            return jnp.take_along_axis(nbr_rows, slot[..., None],
                                       axis=-1)[..., 0]

        def dense_step(_):
            rows = _gather_rows(score_dense, cur)               # [B, A, N]
            logits = jnp.where(_unpack(words, n) == 0, rows, NEG_INF)
            if stochastic:
                logits = logits + jax.random.gumbel(key, logits.shape,
                                                    dtype=logits.dtype)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        action = jax.lax.cond(need_dense, dense_step, sparse_step, None)
        return ((action, _set_bits(words, action)),
                (action, need_dense.astype(jnp.int32)))

    _, (actions, dense_flags) = jax.lax.scan(step, (start, words0), step_keys)
    paths = jnp.concatenate([start[None], actions], axis=0)     # [N, B, A]
    paths = jnp.transpose(paths, (1, 0, 2))                     # [B, N, A]
    if count_dense:
        return paths, jnp.sum(dense_flags)
    return paths


def run_anytime_sparse(heu: jax.Array, dist: jax.Array, nbr: jax.Array,
                       cfg: ACOConfig, rng: jax.Array, n_iterations: int,
                       fixed_start: int | None = None) -> jax.Array:
    """Batched anytime TSP sweep over the sparse support (see module note).

    Args:
      heu:  ``[B, N, N]`` dense heuristic (off-support floored, as produced
            by ``scatter_to_dense(...) + 1e-10``).
      dist: ``[B, N, N]`` distances.
      nbr:  ``[B, N, K]`` k-NN support (the graph the heuristic lives on).

    Returns the anytime curve ``[B, n_iterations]`` of best-so-far costs.
    """
    b, n, _ = heu.shape
    a = cfg.n_ants
    log_heu = cfg.beta * jnp.log(jnp.maximum(heu, 1e-30))

    state0 = _batched_init(b, n, cfg)
    keys = jax.random.split(rng, n_iterations)

    def body(state, key):
        tau = state.phe.tau                                     # [B, N, N]
        score_d = cfg.alpha * jnp.log(jnp.maximum(tau, 1e-30)) + log_heu
        score_s = jnp.take_along_axis(score_d, nbr, axis=-1)    # [B, N, K]
        k_start, k_sweep = jax.random.split(key)
        start = _start_cities(k_start, b, a, n, fixed_start)
        paths = sweep_construct(score_d, score_s, nbr, start, k_sweep)
        state = _batched_update(cfg, state, paths, dist)
        return state, state.best_cost

    _, curve = jax.lax.scan(body, state0, keys)                 # [T, B]
    return curve.T
