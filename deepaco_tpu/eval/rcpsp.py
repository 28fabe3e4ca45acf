"""Batched RCPSP anytime evaluation over PSPLIB subsets.

Reference protocol (rcpsp/test.ipynb cells 0-5): for each of the first 100
``.RCP`` files of a subset (j30/j60/j120), run ACO_RCPSP with
``elitist=True, min_max=True, n_ants=20`` — neural (pretrained
``pretrained/rcpsp/rcpsp{n}-5.pt`` heuristic through the dual-head GNN) or
classic (``default_rcpsp_heuristic``) — and report the mean best makespan at
cumulative T in {1,10,20,30,40,50,100}.

The reference loops instances in Python and re-runs torch per iteration; here
the whole sweep is ONE device program per chunk: the per-instance search is a
``lax.scan`` over iterations and the instance axis is ``vmap``-ed (instances
within a PSPLIB subset share n and, after horizon padding, ``t_max``).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.problems.rcpsp import (RCPSPConfig, RCPSPSearchState,
                                            rcpsp_iteration)
from deepaco_tpu.core.rcpsp import RCPSPData, default_rcpsp_heuristic
from deepaco_tpu.train.special import rcpsp_graph_arrays


@functools.partial(jax.jit, static_argnums=(0, 1))
def _rcpsp_curves(cfg: RCPSPConfig, t_max_iter: int, datas: RCPSPData,
                  heus: jax.Array, rng: jax.Array) -> jax.Array:
    """[B]-stacked instances + [B, n, n] heuristics → [B, t_max_iter] curves."""

    def per_instance(data, heu, key):
        n = heu.shape[0]
        tau = jnp.ones((n, n), jnp.float32)
        if cfg.min_max:   # MAX-MIN inits at tau_min (rcpsp/aco.py:118-121)
            tau = tau * cfg.tau_min
        state = RCPSPSearchState(
            tau=tau, tau_max=jnp.asarray(jnp.inf, jnp.float32),
            best_cost=jnp.asarray(jnp.inf, jnp.float32),
            best_path=jnp.zeros((n,), jnp.int32))
        keys = jax.random.split(key, t_max_iter)

        def body(st, k):
            st = rcpsp_iteration(data, heu, cfg, st, k)
            return st, st.best_cost

        _, curve = jax.lax.scan(body, state, keys)
        return curve

    b = heus.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(per_instance)(datas, heus, keys)


def rcpsp_heuristics(datas: list[RCPSPData], variables) -> jax.Array:
    """Stacked ``[B, n, n]`` neural heuristics from the dual-head GNN.

    One jitted forward shared across the subset (shapes are uniform);
    mirrors ``model.reshape(pyg_data, heu_vec) + EPS`` (rcpsp/test.ipynb
    cell 1) — the masked block IS the dense layout, so reshape is a
    mask-multiply. The reference rcpsp Net's phe head is commented out
    (rcpsp/net.py:86-102), so this is the single-head GNN."""
    from deepaco_tpu.models.gnn import EdgeBlock, Net

    model = Net(pad_feats=5)

    @jax.jit
    def heu_fn(x, nbr, edge, mask):
        g = (x, (EdgeBlock(src=None, nbr=nbr, edge=edge, mask=mask),))
        out = model.apply(variables, g, train=False)
        heu_vec = (out[1] if isinstance(out, tuple) else out)[0]
        return heu_vec * mask + 1e-10

    return jnp.stack([heu_fn(*rcpsp_graph_arrays(d)) for d in datas])


def evaluate_rcpsp(instances: list[RCPSPData], variables=None, *,
                   n_ants: int = 20,
                   t_values=(1, 10, 20, 30, 40, 50, 100), seed: int = 0,
                   elitist: bool = True, min_max: bool = True,
                   b_chunk: int | None = 25, backfill: bool = False):
    """Anytime protocol over a PSPLIB subset.

    ``variables=None`` runs the classic A/B (default heuristic). Returns
    (mean best makespan at each t, full [B, t_max] curves).

    ``b_chunk`` bounds the size of each device program (j120's SSGS timeline
    makes a single 100-instance x T=100 program multi-minute — the TPU
    worker watchdog kills those).

    ``backfill`` selects the SSGS decoder: False = the reference's
    append-only scheduler (protocol parity), True = the gap-filling
    improvement (see ``ssgs_schedule``)."""
    # Uniform static horizon so the instance axis stacks/vmaps; padding the
    # SSGS timeline up is feasibility-preserving.
    horizon = max(d.t_max for d in instances)
    datas = [d._replace(t_max=horizon) for d in instances]
    if variables is not None:
        heus = rcpsp_heuristics(datas, variables)
    else:
        heus = jnp.stack([default_rcpsp_heuristic(d) for d in datas])
    cfg = RCPSPConfig(n_ants=n_ants, elitist=elitist, min_max=min_max,
                      backfill=backfill)
    t_max_iter = int(max(t_values))
    b = len(datas)
    b_chunk = b if b_chunk is None else min(b_chunk, b)

    blocks = []
    for s in range(0, b, b_chunk):
        part = datas[s:s + b_chunk]
        real = len(part)
        while len(part) < b_chunk:     # pad to the jitted shape
            part = part + [part[-1]]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *part)
        hpart = heus[s:s + b_chunk]
        if hpart.shape[0] < b_chunk:
            hpart = jnp.concatenate(
                [hpart, jnp.repeat(hpart[-1:], b_chunk - real, axis=0)])
        cur = _rcpsp_curves(cfg, t_max_iter, stacked, hpart,
                            jax.random.fold_in(jax.random.PRNGKey(seed), s))
        blocks.append(np.asarray(cur)[:real])
    curves = np.concatenate(blocks, axis=0)
    idx = np.asarray([t - 1 for t in t_values])
    return curves[:, idx].mean(axis=0), curves
