"""Unified vectorized ACO rollout engine.

ONE engine replaces the 10 near-identical per-problem construction loops of the
reference (tsp/aco.py:134-177, cvrp/aco.py:132-205, op/aco.py:147-220, ...).
Problems plug in via :class:`RolloutSpec` — a bundle of pure functions over a
problem-specific ant-state pytree. The engine:

* runs a ``lax.scan`` over a *static* construction horizon (variable-length
  constructions pad to a fixed bound with "done ants park at depot/dummy"
  semantics — SURVEY §7 hard-parts),
* vectorizes all ants as a leading ``[A]`` axis (the reference's ant-batch
  vectorization, tsp/aco.py:134-177) and is ``vmap``-able over instances,
* samples with the Gumbel-max trick over
  ``alpha*log(phe) + beta*log(heu) + log(mask)`` — identical in distribution
  to the reference's ``Categorical(phe**alpha * heu**beta * mask)``
  (tsp/aco.py:165-177) but renormalization-free and jit/vmap-friendly,
* returns differentiable per-step log-probs (``log_softmax`` at the sampled
  index) for REINFORCE; actions themselves carry no gradient.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class RolloutSpec(NamedTuple):
    """Problem plug-in interface for the construction engine.

    Attributes:
      horizon:   static number of construction steps (after the start node).
      init:      ``rng -> (state, start_actions[A])``.
      prob_rows: ``state -> (phe_rows[A, M], heu_rows[A, M])`` — the pheromone /
                 heuristic rows conditioning the next move (most problems index
                 row ``cur``; MKP PH_items broadcasts a vector —
                 reference mkp_transformer/aco.py:141-148).
      mask:      ``state -> [A, M]`` feasibility mask (>0 = allowed). Must keep
                 at least one action open for every ant (park semantics).
      step:      ``(state, actions[A]) -> state``.
    """

    horizon: int
    init: Callable[[jax.Array], tuple[Any, jax.Array]]
    prob_rows: Callable[[Any], tuple[jax.Array, jax.Array]]
    mask: Callable[[Any], jax.Array]
    step: Callable[[Any, jax.Array], Any]
    # Optional full-probability override (already masked, unnormalized
    # nonneg): used when selection is not the phe^a*heu^b product form —
    # e.g. RCPSP's balanced direct+summation evaluation (rcpsp/aco.py:183-206).
    probs_fn: Callable[[Any], jax.Array] | None = None
    # Optional PRE-COMBINED logit rows (alpha/beta already applied): pheromone
    # and heuristic are constant within an iteration, so plugins can fold
    # ``alpha*log(tau) + beta*log(eta)`` into ONE matrix outside the scan and
    # serve single-row gathers per step — halves the hot-loop HBM traffic
    # (the reference's prob-matrix precompute, tsp_nls/aco.py:195-207).
    # When set, the engine ignores its alpha/beta arguments.
    score_rows: Callable[[Any], jax.Array] | None = None


class Rollout(NamedTuple):
    """Result of one construction sweep.

    paths:     ``[horizon+1, A]`` int32 — row 0 is the start action.
    log_probs: ``[horizon, A]`` — differentiable w.r.t. heuristic/pheromone
               inputs (zeros when ``require_prob=False``).
    state:     final ant state (problem-specific pytree).
    """

    paths: jax.Array
    log_probs: jax.Array
    state: Any


def masked_logits(phe_rows, heu_rows, mask, alpha, beta):
    """Log-space scores: ``alpha*log(phe) + beta*log(heu)`` with mask = -inf.

    Inputs must be strictly positive on the mask support (the reference keeps
    heuristics ``+1e-10`` off-support, tsp/train.ipynb cell 1; pheromone stays
    positive under decay).
    """
    # floor at a NORMAL fp32 value: subnormals flush to 0 in XLA, and
    # log(0)'s VJP is 0/0 = NaN even under a zero cotangent
    logits = (alpha * jnp.log(jnp.maximum(phe_rows, 1e-30))
              + beta * jnp.log(jnp.maximum(heu_rows, 1e-30)))
    return jnp.where(mask > 0, logits, NEG_INF)


def _step_logits(spec: RolloutSpec, state, alpha, beta):
    """Per-step masked logits via whichever interface the plug-in provides."""
    if spec.probs_fn is not None:
        probs = spec.probs_fn(state)
        return jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)),
                         NEG_INF)
    if spec.score_rows is not None:
        return jnp.where(spec.mask(state) > 0, spec.score_rows(state),
                         NEG_INF)
    phe_rows, heu_rows = spec.prob_rows(state)
    return masked_logits(phe_rows, heu_rows, spec.mask(state), alpha, beta)


def rollout(spec: RolloutSpec, rng: jax.Array, *, alpha: float = 1.0,
            beta: float = 1.0, require_prob: bool = False) -> Rollout:
    """Construct solutions for all ants of one instance.

    Mirrors ``ACO.gen_path`` (reference tsp/aco.py:134-163) as a single scan.
    """
    rng_init, rng_scan = jax.random.split(rng)
    state, start = spec.init(rng_init)
    step_keys = jax.random.split(rng_scan, spec.horizon)

    def step_fn(state, key):
        logits = _step_logits(spec, state, alpha, beta)
        gumbel = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
        actions = jnp.argmax(jax.lax.stop_gradient(logits) + gumbel, axis=-1)
        if require_prob:
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, actions[:, None], axis=-1)[:, 0]
        else:
            logp = jnp.zeros(actions.shape, logits.dtype)
        state = spec.step(state, actions)
        return state, (actions.astype(jnp.int32), logp)

    state, (actions, log_probs) = jax.lax.scan(step_fn, state, step_keys)
    paths = jnp.concatenate([start.astype(jnp.int32)[None], actions], axis=0)
    return Rollout(paths=paths, log_probs=log_probs, state=state)


def path_log_probs(spec: RolloutSpec, paths: jax.Array, *, alpha: float = 1.0,
                   beta: float = 1.0) -> jax.Array:
    """Differentiable log-probs of a GIVEN action sequence (teacher-forced).

    Re-walks the construction with the recorded actions and evaluates
    ``log_softmax(logits)[action]`` at each step — the gradient path for
    REINFORCE when the advantage is computed off-device (e.g. after native
    local search, reference cvrp_nls/train.py:14-55). ``paths`` is
    ``[horizon+1, A]`` with row 0 = start actions.
    """
    state, _ = spec.init(jax.random.PRNGKey(0))  # start must be deterministic

    def step_fn(state, actions):
        logits = _step_logits(spec, state, alpha, beta)
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.take_along_axis(logp_all, actions[:, None], axis=-1)[:, 0]
        state = spec.step(state, actions)
        return state, logp

    _, log_probs = jax.lax.scan(step_fn, state, paths[1:])
    return log_probs


def greedy_rollout(spec: RolloutSpec, rng: jax.Array, *, alpha: float = 1.0,
                   beta: float = 1.0) -> Rollout:
    """Deterministic argmax construction (no Gumbel noise) — greedy decode."""
    rng_init, _ = jax.random.split(rng)
    state, start = spec.init(rng_init)

    def step_fn(state, _):
        logits = _step_logits(spec, state, alpha, beta)
        actions = jnp.argmax(logits, axis=-1)
        state = spec.step(state, actions)
        return state, actions.astype(jnp.int32)

    state, actions = jax.lax.scan(step_fn, state, None, length=spec.horizon)
    paths = jnp.concatenate([start.astype(jnp.int32)[None], actions], axis=0)
    return Rollout(paths=paths,
                   log_probs=jnp.zeros((spec.horizon,) + start.shape),
                   state=state)
