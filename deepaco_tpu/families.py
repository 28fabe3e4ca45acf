"""Problem-family registry: ONE description per problem, consumed by the
generic train/eval drivers.

This is the layer that factors the reference's 13 copy-paste pipelines
(SURVEY §1) into data: each family bundles the instance generator, GNN graph
builder, heuristic post-processing, rollout spec, objective, and ACO strategy
flags. The quirks are faithful to each reference driver:

* heuristic orientation: the cvrp/bpp/mkp notebooks reshape the per-edge
  vector with the *source index varying fast* (``u = nodes.repeat(n)``), so
  their dense heuristic matrix is the transpose of the (src, dst) layout
  (cvrp/train.ipynb cell 1 ``heu_vec.reshape((n+1, n+1))`` with
  cvrp/utils.py:27-29 edge order); tsp/op/sop/smtwtp/rcpsp scatter by
  (edge_index[0], edge_index[1]) — no transpose.
* heuristic normalization: pctsp and mkp divide by ``min() + eps``
  (pctsp/train.ipynb cell 1; mkp/train.py:19); others add ``eps`` only.
* REINFORCE sign: maximization families flip the advantage
  (mkp/train.py:29 ``(baseline - objs)``).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import numpy as np

import jax.numpy as jnp

from deepaco_tpu.aco.problems import (
    bpp_fitness, cvrp_spec, mkp_objective, mkp_spec, op_objective, op_spec,
    pctsp_objective, pctsp_spec, smtwtp_cost, smtwtp_spec, sop_cost, sop_spec,
    tour_cost, tsp_spec,
)
from deepaco_tpu.aco.problems.cvrp import route_cost
from deepaco_tpu.aco.problems.op import extend_op_instance
from deepaco_tpu.aco.problems.mkp import extend_mkp
from deepaco_tpu.aco.runner import ACOConfig
from deepaco_tpu.core import builders
from deepaco_tpu.core.graph import scatter_to_dense, sparse_distance_matrix

EPS = 1e-10

# reference per-scale constants
OP_MAX_LEN = {100: 4.0, 200: 5.0, 300: 6.0}        # op/test.py:13-17
PCTSP_KN = {20: 2.0, 100: 4.0, 500: 9.0}           # pctsp/utils.py:4-8
CVRP_CAPACITY = 50.0                                # cvrp/aco.py:7
BPP_CAPACITY = 150.0                                # bpp/aco.py:9


class Family(NamedTuple):
    name: str
    model_kwargs: tuple  # sorted (key, value) pairs; dict is unhashable for jit statics
    gen: Callable[[np.random.Generator, int], dict]
    graph: Callable[[dict, int], Any]                 # (inst, k_sparse)
    heu_matrix: Callable[[Any, Any, dict], jnp.ndarray]
    spec: Callable[[jnp.ndarray, jnp.ndarray, dict, int], Any]
    cost: Callable[[jnp.ndarray, dict], jnp.ndarray]
    aco: ACOConfig
    horizon_states: Callable[[int], tuple]   # n_nodes -> (n_states, horizon)
    extras: Callable[[dict], dict] = staticmethod(lambda inst: {})
    prepare: Callable[[dict], dict] = staticmethod(lambda inst: inst)
    classic_heu: Callable[[dict, int], jnp.ndarray] | None = None
    k_sparse: Callable[[int], int] = staticmethod(lambda n: max(n // 10, 3))
    # Non-GNN families (MKP PH_items transformer) override the model and the
    # forward pass wholesale:
    #   model_ctor() -> flax module           (default: models.gnn.Net)
    #   forward(model, variables, inst, k_sparse, train)
    #       -> (heuristic [dense matrix or PH_items vector], new_batch_stats)
    #   model_init(model, key, inst, k_sparse) -> variables
    model_ctor: Callable[[], Any] | None = None
    forward: Callable | None = None
    model_init: Callable | None = None


# ----------------------------------------------------------- generators ----
def _dist(coords, diag):
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    np.fill_diagonal(d, diag)
    return d.astype(np.float32)


def gen_tsp(rng, n):
    coords = rng.random((n, 2), dtype=np.float32)
    return {"coords": coords, "dist": _dist(coords, 1e9)}


def gen_cvrp(rng, n):
    """(cvrp/utils.py:9-22): depot pinned at (0.5, 0.5), integer demands."""
    coords = np.concatenate(
        [[[0.5, 0.5]], rng.random((n, 2))]).astype(np.float32)
    demands = np.concatenate(
        [[0.0], rng.integers(1, 10, n)]).astype(np.float32)
    return {"coords": coords, "dist": _dist(coords, 1e-10),
            "demand": demands}


def gen_op(rng, n):
    coords = rng.random((n, 2), dtype=np.float32)
    d0 = np.linalg.norm(coords - coords[0], axis=-1)
    prizes = 1.0 + np.floor(99.0 * d0 / d0.max())
    prizes = (prizes / prizes.max()).astype(np.float32)
    max_len = OP_MAX_LEN.get(n, 4.0)
    return {"coords": coords, "dist": _dist(coords, 1e9),
            "prizes": prizes, "max_len": np.float32(max_len)}


def gen_pctsp(rng, n):
    coords = rng.random((n + 1, 2), dtype=np.float32)
    k = PCTSP_KN.get(n, 3.0 * max(n, 1) / 100.0 + 1.0)
    prizes = np.concatenate([[0.0], rng.random(n)]).astype(np.float32)
    penalties = np.concatenate(
        [[0.0], rng.random(n) * 3.0 * k / n]).astype(np.float32)
    return {"coords": coords, "dist": _dist(coords, 0.0).astype(np.float32),
            "prizes": prizes, "penalties": penalties}


def gen_smtwtp(rng, n):
    # due = due_norm * n from the SAME draw (smtwtp/utils.py:6-8) — round-4
    # fix: independent draws left the model's due_norm input feature
    # uncorrelated with the objective's due times, so smtwtp training
    # diverged after the pheromone's early gains
    due_norm = rng.random(n, dtype=np.float32)
    return {"due_norm": due_norm,
            "due": due_norm * n,
            "weights": rng.random(n, dtype=np.float32),
            "processing": rng.random(n, dtype=np.float32)}


def gen_mkp(rng, n, m=5):
    """Well-stated instances (mkp/utils.py:6-24)."""
    prize = rng.random(n, dtype=np.float32)
    w = rng.random((n, m), dtype=np.float32)
    constraints = np.array([rng.uniform(w[:, j].max(), w[:, j].sum())
                            for j in range(m)])
    w = w * (n // 2) / constraints[None, :]
    return {"prize": prize, "weight": w.astype(np.float32)}


def gen_bpp(rng, n):
    demand = np.concatenate(
        [[0.0], rng.integers(20, 101, n)]).astype(np.float32)
    return {"demand": demand}


def gen_mkp_items(rng, n, m=5):
    """PH_items instances (mkp_transformer/utils.py:6-21): weights drawn as
    ``[m, n]`` and normalized column-wise to capacity 1."""
    price = rng.random(n, dtype=np.float32)
    w = rng.random((m, n))
    constraints = np.array([rng.uniform(w[j].max(), w[j].sum())
                            for j in range(m)])
    w = (w / constraints[:, None]).T
    return {"prize": price, "weight": w.astype(np.float32)}


def gen_sop(rng, n):
    """Random-DAG precedence + shifted cost matrix (sop/utils.py:5-43)."""
    r = [(0, i) for i in range(1, n)]
    a = list(range(1, n))
    precede = [set() for _ in range(n)]
    for i in range(n - 3, -1, -1):
        for j in range(i + 1, n - 1):
            if rng.random() > 0.2:
                continue
            precede[i].add(j)
            precede[i].update(precede[j])
        for j in precede[i]:
            r.append((a[i], a[j]))
    dist = rng.random((n, n)).astype(np.float32)
    dist[1:, :] += dist[0, :][None, :]
    adj = np.ones((n, n), np.float32)
    np.fill_diagonal(adj, 0)
    prec = np.zeros((n, n), np.float32)
    for i, j in r:
        adj[j, i] = 0.0
        prec[j, i] = 1.0
    return {"dist": dist, "adj": adj, "prec": prec}


# ------------------------------------------------- heuristic post-process --
def _std_heu(g, out, inst):
    return scatter_to_dense(g, out) + EPS


def _dense_transposed_heu(g, out, inst):
    # row=src [N, N] output -> reference reshape orientation is dst-major
    return out.T + EPS


def _pctsp_heu(g, out, inst):
    return out / (out.min() + EPS) + EPS      # row=src, no transpose


def _mkp_heu(g, out, inst):
    return (out / (out.min() + EPS) + EPS).T


# ------------------------------------------------------------- registry ----
def _tsp_family():
    return Family(
        name="tsp",
        model_kwargs=(("dual_heads", True),),
        gen=gen_tsp,
        graph=lambda inst, k: builders.tsp_graph(inst["coords"],
                                                 inst["dist"], k),
        heu_matrix=_std_heu,
        spec=lambda tau, heu, inst, a: tsp_spec(tau, heu, a),
        cost=lambda paths, inst: tour_cost(inst["dist"], paths),
        aco=ACOConfig(),
        horizon_states=lambda n: (n, n - 1),
        classic_heu=lambda inst, k: 1.0 / sparse_distance_matrix(
            inst["dist"], k))


def _cvrp_family():
    return Family(
        name="cvrp",
        model_kwargs=(),
        gen=gen_cvrp,
        graph=lambda inst, k: builders.cvrp_graph(inst["demand"],
                                                  inst["dist"]),
        heu_matrix=_dense_transposed_heu,
        spec=lambda tau, heu, inst, a: cvrp_spec(
            tau, heu, inst["demand"], CVRP_CAPACITY, a),
        cost=lambda paths, inst: route_cost(inst["dist"], paths),
        aco=ACOConfig(cyclic=False, symmetric=False, floor=1e-10),
        horizon_states=lambda n: (n + 1, 2 * n),
        classic_heu=lambda inst, k: 1.0 / inst["dist"])


def _op_family():
    def prepare(inst):
        dist_e, prizes_e, _ = extend_op_instance(
            inst["dist"], inst["prizes"],
            jnp.zeros_like(inst["dist"]))
        return {**inst, "dist_ext": dist_e, "prizes_ext": prizes_e}

    def heu_matrix(g, out, inst):
        heu = scatter_to_dense(g, out) + EPS
        _, _, heu_e = extend_op_instance(inst["dist"], inst["prizes"], heu)
        return heu_e

    def classic_heu(inst, k):
        from deepaco_tpu.aco.problems.op import op_default_heuristic
        heu = op_default_heuristic(inst["dist"], inst["prizes"], k)
        _, _, heu_e = extend_op_instance(inst["dist"], inst["prizes"], heu)
        return heu_e

    return Family(
        name="op",
        model_kwargs=(),
        gen=gen_op,
        graph=lambda inst, k: builders.op_graph(
            inst["coords"], inst["dist"], inst["prizes"], k),
        heu_matrix=heu_matrix,
        spec=lambda tau, heu, inst, a: op_spec(
            tau, heu, inst["dist_ext"], inst["max_len"], a),
        cost=lambda paths, inst: op_objective(inst["prizes_ext"], paths),
        aco=ACOConfig(maximize=True, cyclic=False, symmetric=False),
        horizon_states=lambda n: (n + 1, n + 1),
        extras=lambda inst: {"q": 1.0 / jnp.sum(inst["prizes"])},
        prepare=prepare,
        classic_heu=classic_heu)


def _pctsp_family():
    return Family(
        name="pctsp",
        model_kwargs=(),
        gen=gen_pctsp,
        graph=lambda inst, k: builders.pctsp_graph(
            inst["prizes"], inst["penalties"], inst["dist"]),
        heu_matrix=_pctsp_heu,
        spec=lambda tau, heu, inst, a: pctsp_spec(
            tau, heu, inst["prizes"],
            jnp.asarray((inst["prizes"].shape[0] - 1) / 4.0, jnp.float32), a),
        cost=lambda paths, inst: pctsp_objective(
            inst["dist"], inst["prizes"], inst["penalties"], paths),
        aco=ACOConfig(cyclic=False, symmetric=False),
        horizon_states=lambda n: (n + 1, n + 2),
        classic_heu=lambda inst, k: (1e-10 + inst["prizes"][None, :])
        / jnp.where(jnp.eye(inst["dist"].shape[0], dtype=bool), 1e9,
                    inst["dist"]))


def _smtwtp_family():
    return Family(
        name="smtwtp",
        model_kwargs=(("node_update", False),),
        gen=gen_smtwtp,
        graph=lambda inst, k: builders.smtwtp_graph(
            inst["due_norm"], inst["weights"], inst["processing"]),
        heu_matrix=_std_heu,
        spec=lambda tau, heu, inst, a: smtwtp_spec(tau, heu, a),
        cost=lambda paths, inst: smtwtp_cost(
            inst["processing"], inst["due"], inst["weights"], paths),
        aco=ACOConfig(cyclic=False, symmetric=False, cost_offset=1.0),
        horizon_states=lambda n: (n + 1, n),
        classic_heu=lambda inst, k: jnp.broadcast_to(
            (1.0 / jnp.concatenate([jnp.ones((1,)), inst["due"]]))[None, :],
            (inst["due"].shape[0] + 1,) * 2))


def _mkp_family():
    def prepare(inst):
        prize_e, weight_e = extend_mkp(inst["prize"], inst["weight"])
        return {**inst, "prize_ext": prize_e, "weight_ext": weight_e}

    def heu_matrix(g, out, inst):
        heu = _mkp_heu(g, out, inst)
        _, _, heu_e = extend_mkp(inst["prize"], inst["weight"], heu_mat=heu)
        return heu_e

    def classic_heu(inst, k):
        n = inst["prize"].shape[0]
        prior = jnp.broadcast_to(
            (inst["prize"] / inst["weight"].sum(axis=1))[None, :], (n, n))
        _, _, heu_e = extend_mkp(inst["prize"], inst["weight"], heu_mat=prior)
        return heu_e

    return Family(
        name="mkp",
        model_kwargs=(),
        gen=gen_mkp,
        graph=lambda inst, k: builders.mkp_graph(inst["prize"],
                                                 inst["weight"]),
        heu_matrix=heu_matrix,
        spec=lambda tau, heu, inst, a: mkp_spec(
            tau, heu, inst["weight_ext"],
            jnp.asarray(inst["prize"].shape[0] // 2, jnp.float32), a),
        cost=lambda paths, inst: mkp_objective(inst["prize_ext"], paths),
        aco=ACOConfig(maximize=True, cyclic=False, symmetric=False,
                      floor=1e-10),
        horizon_states=lambda n: (n + 1, n + 1),
        extras=lambda inst: {"q": 1.0 / jnp.sum(inst["prize"])},
        prepare=prepare,
        classic_heu=classic_heu)


def _bpp_family():
    return Family(
        name="bpp",
        model_kwargs=(),
        gen=gen_bpp,
        # bpp/utils.py:14-23: dense graph, x = demands, edge attrs all ones
        graph=lambda inst, k: builders.cvrp_graph(
            inst["demand"],
            jnp.ones((inst["demand"].shape[0],) * 2, jnp.float32)),
        heu_matrix=_dense_transposed_heu,
        spec=lambda tau, heu, inst, a: cvrp_spec(
            tau, heu, inst["demand"], BPP_CAPACITY, a),
        cost=lambda paths, inst: bpp_fitness(
            inst["demand"], BPP_CAPACITY, paths),
        aco=ACOConfig(maximize=True, cyclic=False, symmetric=False,
                      floor=1e-10, deposit_div_ants=True),
        horizon_states=lambda n: (n + 1, 2 * n),
        classic_heu=lambda inst, k: jnp.broadcast_to(
            inst["demand"][None, :],
            (inst["demand"].shape[0],) * 2).at[:, 0].set(1e-5))


def _mkp_items_family():
    """PH_items: TransformerModel over [price, weights] tokens, per-item
    *vector* pheromone (mkp_transformer/{net,aco,train,test}.py)."""
    from deepaco_tpu.aco.problems.mkp import mkp_items_spec
    from deepaco_tpu.models.transformer import TransformerModel

    def prepare(inst):
        prize_e, weight_e = extend_mkp(inst["prize"], inst["weight"])
        return {**inst, "prize_ext": prize_e, "weight_ext": weight_e}

    def _src(inst):
        # reformat(price, weight) -> [n, 1+m] tokens (mkp_transformer/utils.py:24-30)
        return jnp.concatenate([inst["prize"][:, None], inst["weight"]],
                               axis=1)

    def forward(model, variables, inst, k_sparse, train):
        heu = model.apply({"params": variables["params"]}, _src(inst)) + EPS
        _, _, heu_e = extend_mkp(inst["prize"], inst["weight"], heu_vec=heu)
        return heu_e, variables.get("batch_stats", {})

    def classic_heu(inst, k):
        heu = inst["prize"] / inst["weight"].sum(axis=1)
        _, _, heu_e = extend_mkp(inst["prize"], inst["weight"], heu_vec=heu)
        return heu_e

    return Family(
        name="mkp_items",
        model_kwargs=(),
        gen=gen_mkp_items,
        graph=lambda inst, k: _src(inst),
        heu_matrix=lambda g, out, inst: out,   # forward() already extends
        spec=lambda tau, heu, inst, a: mkp_items_spec(
            tau, heu, inst["weight_ext"], 1.0, a),
        cost=lambda paths, inst: mkp_objective(inst["prize_ext"], paths),
        aco=ACOConfig(maximize=True, cyclic=False, symmetric=False,
                      vector_pheromone=True),
        horizon_states=lambda n: (n + 1, n + 1),
        extras=lambda inst: {"q": 1.0 / jnp.sum(inst["prize"])},
        prepare=prepare,
        classic_heu=classic_heu,
        model_ctor=TransformerModel,
        forward=forward,
        model_init=lambda model, key, inst, k: model.init(key, _src(inst)))


def _sop_family():
    return Family(
        name="sop",
        model_kwargs=(("node_update", False),),
        gen=gen_sop,
        graph=lambda inst, k: builders.sop_graph(inst["dist"], inst["adj"]),
        heu_matrix=lambda g, out, inst: _sop_scatter(g, out) + EPS,
        spec=lambda tau, heu, inst, a: sop_spec(tau, heu, inst["prec"], a),
        cost=lambda paths, inst: sop_cost(inst["dist"], paths),
        aco=ACOConfig(cyclic=False, symmetric=False),
        horizon_states=lambda n: (n, n - 1),
        classic_heu=lambda inst, k: 1.0 / (inst["dist"] + 1e-10))


def _sop_scatter(g, out):
    # masked dense block: out is a per-block list; block 0 covers [N, N]
    x, blocks = g
    b = blocks[0]
    return out[0] * b.mask     # invalid edges contribute 0 (+EPS later)


FAMILIES = {
    "tsp": _tsp_family(),
    "cvrp": _cvrp_family(),
    "op": _op_family(),
    "pctsp": _pctsp_family(),
    "smtwtp": _smtwtp_family(),
    "mkp": _mkp_family(),
    "mkp_items": _mkp_items_family(),
    "bpp": _bpp_family(),
    "sop": _sop_family(),
}


def get_family(name: str) -> Family:
    return FAMILIES[name]
