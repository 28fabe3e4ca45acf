"""RCPSP instance layer: parsing, precedence analysis, validation, graphs.

Array-based re-derivation of the reference's object model (reference
rcpsp/rcpsp_inst.py:10-280 — Activity/Resource classes, DFS closures, PSPLIB
``.RCP`` parser, schedule validator). Everything an on-device kernel needs is
a fixed-shape array: durations, resource requirements, the precedence
adjacency matrix, earliest-start / latest-finish bounds, and closure counts
for the hand heuristics (rcpsp/aco.py:65-91).
"""
from __future__ import annotations

import os
import tarfile
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp


class RCPSPData(NamedTuple):
    """Pytree of instance arrays (n activities, m renewable resources).

    ``t_max`` (the schedule-horizon bound) is registered as *static* aux data
    — it sets the resource-timeline array shape inside jit.
    """

    duration: jnp.ndarray        # [n] int32
    resources: jnp.ndarray       # [n, m] int32
    capacity: jnp.ndarray        # [m] int32
    adj: jnp.ndarray             # [n, n] int32 — adj[i, j]=1 iff i precedes j
    earliest_start: jnp.ndarray  # [n] int32
    latest_finish: jnp.ndarray   # [n] int32
    t_max: int                   # STATIC horizon bound = sum(duration)

    @property
    def n(self) -> int:
        return self.duration.shape[0]

    @property
    def m(self) -> int:
        return self.capacity.shape[0]


def _rcpsp_flatten(d: RCPSPData):
    return (d[:6], d.t_max)


def _rcpsp_unflatten(t_max, children):
    return RCPSPData(*children, t_max=t_max)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(RCPSPData, _rcpsp_flatten, _rcpsp_unflatten)


def _es_lf(duration: np.ndarray, adj: np.ndarray, max_total_time: int):
    """Forward/backward critical-path passes (rcpsp_inst.py:112-135).

    Activities are numbered so that a topological order exists; we relax in
    index order repeatedly until fixpoint (n is small: <= 122)."""
    n = len(duration)
    es = np.zeros(n, np.int64)
    order = _topo_order(adj)
    for j in order:
        preds = np.nonzero(adj[:, j])[0]
        if len(preds):
            es[j] = max(es[p] + duration[p] for p in preds)
    lf = np.full(n, max_total_time, np.int64)
    for j in order[::-1]:
        succs = np.nonzero(adj[j])[0]
        if len(succs):
            lf[j] = min(lf[s] - duration[s] for s in succs)
    return es, lf


def _topo_order(adj: np.ndarray) -> np.ndarray:
    n = adj.shape[0]
    indeg = adj.sum(axis=0).copy()
    order, stack = [], [i for i in range(n) if indeg[i] == 0]
    while stack:
        i = stack.pop()
        order.append(i)
        for j in np.nonzero(adj[i])[0]:
            indeg[j] -= 1
            if indeg[j] == 0:
                stack.append(int(j))
    assert len(order) == n, "precedence graph contains a cycle"
    return np.array(order)


def make_rcpsp(duration, resources, capacity, adj,
               max_total_time: int | None = None) -> RCPSPData:
    duration = np.asarray(duration, np.int64)
    resources = np.asarray(resources, np.int64)
    capacity = np.asarray(capacity, np.int64)
    adj = np.asarray(adj, np.int64)
    if max_total_time is None:
        max_total_time = int(duration.sum())
    es, lf = _es_lf(duration, adj, max_total_time)
    return RCPSPData(
        duration=jnp.asarray(duration, jnp.int32),
        resources=jnp.asarray(resources, jnp.int32),
        capacity=jnp.asarray(capacity, jnp.int32),
        adj=jnp.asarray(adj, jnp.int32),
        earliest_start=jnp.asarray(es, jnp.int32),
        latest_finish=jnp.asarray(lf, jnp.int32),
        t_max=int(max_total_time))


def parse_rcp(text: str) -> RCPSPData:
    """Parse a PSPLIB ``.RCP`` file (reference read_RCPfile,
    rcpsp_inst.py:239-261; successor indices are 1-based in the file)."""
    tokens = text.split()
    it = iter(tokens)
    n_jobs, n_res = int(next(it)), int(next(it))
    capacity = [int(next(it)) for _ in range(n_res)]
    duration = np.zeros(n_jobs, np.int64)
    resources = np.zeros((n_jobs, n_res), np.int64)
    adj = np.zeros((n_jobs, n_jobs), np.int64)
    for i in range(n_jobs):
        duration[i] = int(next(it))
        for r in range(n_res):
            resources[i, r] = int(next(it))
        n_succ = int(next(it))
        for _ in range(n_succ):
            adj[i, int(next(it)) - 1] = 1
    assert next(it, None) is None, "trailing tokens in RCP file"
    assert adj[:, 0].sum() == 0, "first node should have no predecessor"
    assert adj[-1].sum() == 0, "last node should have no successor"
    return make_rcpsp(duration, resources, capacity, adj)


def load_psplib(archive: str, subset: str = "j30rcp", limit: int | None = None,
                test_size: int = 100, split: str = "test"):
    """Load instances from the reference's psplib.tar.gz (data/rcpsp/).

    Mirrors load_dataset (rcpsp_inst.py:263-280): first ``test_size`` files in
    lexicographic order are the test set, the rest the train set."""
    out = []
    with tarfile.open(archive) as tf:
        names = sorted(n for n in tf.getnames()
                       if n.startswith(subset) and n.endswith(".RCP"))
        names = names[:test_size] if split == "test" else names[test_size:]
        if limit:
            names = names[:limit]
        for name in names:
            out.append(parse_rcp(tf.extractfile(name).read().decode()))
    return out


# ------------------------------------------------------------- validation --
def check_schedule(data: RCPSPData, start_time) -> bool:
    """Feasibility validator (port of rcpsp_inst.py:168-191): precedence and
    per-timestep resource constraints. Host-side numpy."""
    start = np.asarray(start_time, np.int64)
    dur = np.asarray(data.duration)
    res = np.asarray(data.resources)
    cap = np.asarray(data.capacity)
    adj = np.asarray(data.adj)
    n = len(start)
    # precedence
    for i in range(n):
        for j in np.nonzero(adj[i])[0]:
            if start[i] + dur[i] > start[j]:
                return False
    # resources over the whole timeline
    horizon = int((start + dur).max()) + 1
    usage = np.zeros((horizon, len(cap)), np.int64)
    for j in range(n):
        usage[start[j]:start[j] + dur[j]] += res[j]
    return bool((usage <= cap[None, :]).all())


# ------------------------------------------------------- hand heuristics ---
def _succ_closure_sizes(adj: np.ndarray) -> np.ndarray:
    """|succ_closure| per node via boolean matrix closure (rcpsp_inst.py:32-38)."""
    n = adj.shape[0]
    reach = adj.astype(bool).copy()
    for j in _topo_order(adj)[::-1]:
        succs = np.nonzero(adj[j])[0]
        for s in succs:
            reach[j] |= reach[s]
    return reach.sum(axis=1)


def nlft_heuristic(data: RCPSPData) -> jnp.ndarray:
    """normalized Latest-Finish-Time column prior (rcpsp/aco.py:66-72)."""
    lf = jnp.asarray(data.latest_finish, jnp.float32)
    col = lf.max() - lf + 1.0
    return jnp.broadcast_to(col[None, :], (data.n, data.n))


def ngrpwa_heuristic(data: RCPSPData) -> jnp.ndarray:
    """normalized Greatest-Rank-Positional-Weight prior (rcpsp/aco.py:74-79)."""
    closure = _succ_closure_sizes(np.asarray(data.adj))
    col = jnp.asarray(closure, jnp.float32)
    col = col - col.min() + 1.0
    return jnp.broadcast_to(col[None, :], (data.n, data.n))


def nwrup_heuristic(data: RCPSPData, omega: float = 0.5) -> jnp.ndarray:
    """normalized Weighted-Resource-Utilization+Precedence prior
    (rcpsp/aco.py:82-92)."""
    outdeg = jnp.asarray(np.asarray(data.adj).sum(axis=1), jnp.float32)
    util = jnp.sum(jnp.asarray(data.resources, jnp.float32)
                   / jnp.asarray(data.capacity, jnp.float32)[None, :], axis=1)
    col = omega * outdeg + (1.0 - omega) * util
    col = col - col.min() + 1.0
    return jnp.broadcast_to(col[None, :], (data.n, data.n))


def default_rcpsp_heuristic(data: RCPSPData) -> jnp.ndarray:
    """Reference default: nWRUP(0.3)/max * nGRPWA (rcpsp/aco.py:152-155)."""
    h = nwrup_heuristic(data, omega=0.3)
    return h / h.max() * ngrpwa_heuristic(data)
