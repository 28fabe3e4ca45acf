"""Golden fixed-seed evaluation datasets.

The reference repo commits golden ``.pt`` files only for TSP and RCPSP; every
other problem's test set is produced by a fixed-seed writer in its
``utils.py __main__`` block (SURVEY §4.4). This module regenerates those
datasets with the SAME torch RNG seeds and the SAME sampling-call order, so
A/B numbers are computed on identical instances. Each function returns a dict
of stacked numpy arrays matching the family instance layout
(deepaco_tpu/families.py).

Caveat: the MKP writers draw their knapsack constraints from the *unseeded*
numpy global RNG (mkp/utils.py:18, mkp_transformer/utils.py:18), so those
instances were never exactly reproducible; we seed numpy alongside torch and
document the divergence.
"""
from __future__ import annotations

import numpy as np

from deepaco_tpu.families import OP_MAX_LEN, PCTSP_KN


def _torch():
    import torch

    return torch


# ------------------------------------------------------------------ TSP -----
def tsp_test(n: int, split: str = "test") -> dict:
    """Committed files (data/tsp/*.pt, reference tsp/utils.py:47-54)."""
    from deepaco_tpu.utils.datasets import load_tsp_dataset

    coords = load_tsp_dataset(n, split)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None], axis=-1)
    idx = np.arange(coords.shape[1])
    dist[:, idx, idx] = 1e9
    return {"coords": coords.astype(np.float32),
            "dist": dist.astype(np.float32)}


# ----------------------------------------------------------------- CVRP -----
def cvrp_test(n: int, count: int = 100, seed: int = 123456) -> dict:
    """(cvrp/utils.py:42-53): seed once, 100 instances per scale in order
    20, 100, 500 — regenerating scale n requires consuming the RNG stream of
    the preceding scales, which this does."""
    torch = _torch()
    torch.manual_seed(seed)
    out = None
    for scale in [20, 100, 500]:
        coords_l, dem_l = [], []
        for _ in range(count):
            locations = torch.rand(size=(scale, 2))
            demands = torch.randint(1, 10, size=(scale,))
            coords_l.append(np.concatenate(
                [[[0.5, 0.5]], locations.numpy()]))
            dem_l.append(np.concatenate([[0.0], demands.numpy()]))
        if scale == n:
            coords = np.stack(coords_l).astype(np.float32)
            dist = np.linalg.norm(
                coords[:, :, None] - coords[:, None], axis=-1)
            idx = np.arange(scale + 1)
            dist[:, idx, idx] = 1e-10
            out = {"coords": coords, "dist": dist.astype(np.float32),
                   "demand": np.stack(dem_l).astype(np.float32)}
            break
    assert out is not None, f"unknown CVRP scale {n}"
    return out


def cvrp_nls_test(n: int, count: int = 100, seed: int = 123456) -> dict:
    """(cvrp_nls/utils.py:89-100): per-scale re-seed; normalized demands,
    double-precision coordinates, depot = node 0."""
    from deepaco_tpu.families import Family  # noqa: F401 (doc only)

    torch = _torch()
    caps = {1: 10, 20: 30, 50: 40, 100: 50, 400: 150, 1000: 200, 2000: 300}
    cap = [v for k, v in sorted(caps.items()) if k <= n][-1]
    torch.manual_seed(seed)
    coords_l, dem_l = [], []
    for _ in range(count):
        locations = torch.rand(size=(n + 1, 2), dtype=torch.double)
        demands = torch.randint(1, 10, size=(n,), dtype=torch.double)
        coords_l.append(locations.numpy())
        dem_l.append(np.concatenate([[0.0], demands.numpy() / cap]))
    coords = np.stack(coords_l)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None], axis=-1)
    idx = np.arange(n + 1)
    dist[:, idx, idx] = 1e-10
    return {"coords": coords.astype(np.float32),
            "dist": dist.astype(np.float32),
            "demand": np.stack(dem_l).astype(np.float32),
            "capacity": np.float32(1.0)}


# ------------------------------------------------------------------- OP -----
def op_test(n: int, split: str = "test") -> dict:
    """(op/utils.py:73-83): val seed 12345 (30 inst), test 123456 (100)."""
    torch = _torch()
    seed, count = (123456, 100) if split == "test" else (12345, 30)
    torch.manual_seed(seed)
    out = None
    for scale in [100, 200, 300]:
        coor = torch.rand(size=(count, scale, 2)).numpy()
        if scale == n:
            out = coor
    assert out is not None
    coords = out.astype(np.float32)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None], axis=-1)
    idx = np.arange(n)
    dist[:, idx, idx] = 1e9
    d0 = np.linalg.norm(coords - coords[:, :1], axis=-1)
    prizes = 1.0 + np.floor(99.0 * d0 / d0.max(axis=1, keepdims=True))
    prizes = prizes / prizes.max(axis=1, keepdims=True)
    return {"coords": coords, "dist": dist.astype(np.float32),
            "prizes": prizes.astype(np.float32),
            "max_len": np.full(coords.shape[0], OP_MAX_LEN[n], np.float32)}


# ---------------------------------------------------------------- PCTSP -----
def pctsp_test(n: int, count: int = 100, seed: int = 123456) -> dict:
    """(pctsp/utils.py:50-59): single seed, scales in order 20, 100, 500."""
    torch = _torch()
    torch.manual_seed(seed)
    out = None
    for scale in [20, 100, 500]:
        coords_l, prize_l, pen_l = [], [], []
        k = PCTSP_KN[scale]
        for _ in range(count):
            coor = torch.rand((scale + 1, 2))
            prizes = torch.rand(size=(scale,))
            beta = torch.rand(size=(scale,)) * 3 * k / scale
            coords_l.append(coor.numpy())
            prize_l.append(np.concatenate([[0.0], prizes.numpy()]))
            pen_l.append(np.concatenate([[0.0], beta.numpy()]))
        if scale == n:
            coords = np.stack(coords_l).astype(np.float32)
            dist = np.linalg.norm(
                coords[:, :, None] - coords[:, None], axis=-1)
            out = {"coords": coords, "dist": dist.astype(np.float32),
                   "prizes": np.stack(prize_l).astype(np.float32),
                   "penalties": np.stack(pen_l).astype(np.float32)}
            break
    assert out is not None
    return out


# --------------------------------------------------------------- SMTWTP -----
def smtwtp_test(n: int, count: int = 100, seed: int = 123456) -> dict:
    """(smtwtp/utils.py:32-44): single seed, scales in order 50, 100, 500;
    instance_gen draws due, weights, processing in that order."""
    torch = _torch()
    torch.manual_seed(seed)
    out = None
    for scale in [50, 100, 500]:
        rows = []
        for _ in range(count):
            due_norm = torch.rand(size=(scale,))
            weights = torch.rand(size=(scale,))
            proc = torch.rand(size=(scale,))
            rows.append((due_norm.numpy(), weights.numpy(), proc.numpy()))
        if scale == n:
            due_norm = np.stack([r[0] for r in rows]).astype(np.float32)
            out = {"due_norm": due_norm,
                   "due": (due_norm * scale).astype(np.float32),
                   "weights": np.stack([r[1] for r in rows]).astype(np.float32),
                   "processing": np.stack([r[2] for r in rows]).astype(np.float32)}
            break
    assert out is not None
    return out


# ------------------------------------------------------------------ SOP -----
def sop_test(n: int, count: int = 100, seed: int = 123456) -> dict:
    """(sop/utils.py:68-81): torch-RNG DAG + cost matrices, scales 20/50/100."""
    torch = _torch()
    torch.manual_seed(seed)
    out = None
    for scale in [20, 50, 100]:
        insts = []
        for _ in range(count):
            insts.append(_sop_instance_torch(torch, scale))
        if scale == n:
            out = {k: np.stack([i[k] for i in insts])
                   for k in ("dist", "adj", "prec")}
            break
    assert out is not None
    return out


def _sop_instance_torch(torch, n):
    """training_instance_gen (sop/utils.py:46-51): cost_mat first, then the
    ordering-constraint loop drawing one uniform per candidate pair."""
    dist = torch.rand(size=(n, n))
    job_cost = dist[0, :].clone()
    dist[1:, :] += job_cost
    r = [(0, i) for i in range(1, n)]
    a = list(range(1, n))
    precede = [set() for _ in range(n - 1)]
    for i in range(n - 3, -1, -1):
        for j in range(i + 1, n - 1):
            if torch.rand(size=(1,)) > 0.2:
                continue
            precede[i].add(j)
            precede[i].update(precede[j])
        for j in precede[i]:
            r.append((a[i], a[j]))
    adj = np.ones((n, n), np.float32)
    np.fill_diagonal(adj, 0)
    prec = np.zeros((n, n), np.float32)
    for i, j in r:
        adj[j, i] = 0.0
        prec[j, i] = 1.0
    return {"dist": dist.numpy().astype(np.float32), "adj": adj, "prec": prec}


# ------------------------------------------------------------------ MKP -----
def mkp_test(n: int = 50, count: int = 100, seed: int = 123456,
             np_seed: int = 0) -> dict:
    """(mkp/utils.py:51-72). numpy global RNG is seeded here (see module
    docstring caveat)."""
    torch = _torch()
    torch.manual_seed(seed)
    np.random.seed(np_seed)
    m = 5
    prizes, weights = [], []
    for _ in range(count):
        prize = torch.rand(size=(n,))
        w = torch.rand(size=(n, m))
        constraints = np.array([np.random.uniform(
            float(w[:, j].max()), float(w[:, j].sum())) for j in range(m)])
        w = w.numpy() * (n // 2) / constraints[None, :]
        prizes.append(prize.numpy())
        weights.append(w)
    return {"prize": np.stack(prizes).astype(np.float32),
            "weight": np.stack(weights).astype(np.float32)}


def mkp_items_test(n: int, count: int = 100, seed: int = 123456,
                   np_seed: int = 0) -> dict:
    """(mkp_transformer/utils.py:46-67): weight drawn as [m, n], normalized
    to capacity 1."""
    torch = _torch()
    torch.manual_seed(seed)
    np.random.seed(np_seed)
    m = 5
    prices, weights = [], []
    for scale in [300, 500]:
        for _ in range(count):
            price = torch.rand(size=(scale,))
            w = torch.rand(size=(m, scale))
            constraints = np.array([np.random.uniform(
                float(w[j].max()), float(w[j].sum())) for j in range(m)])
            wn = (w.numpy() / constraints[:, None]).T   # [n, m], cap 1
            if scale == n:
                prices.append(price.numpy())
                weights.append(wn)
        if scale == n:
            break
    return {"prize": np.stack(prices).astype(np.float32),
            "weight": np.stack(weights).astype(np.float32)}


# ------------------------------------------------------------------ BPP -----
def bpp_test(n: int = 120, count: int = 100, seed: int = 123456) -> dict:
    """(bpp/utils.py:29-39)."""
    torch = _torch()
    torch.manual_seed(seed)
    dems = []
    for _ in range(count):
        d = torch.randint(20, 101, size=(n,))
        dems.append(np.concatenate([[0.0], d.numpy()]))
    return {"demand": np.stack(dems).astype(np.float32)}


GOLDEN = {
    "tsp": tsp_test,
    "cvrp": cvrp_test,
    "cvrp_nls": cvrp_nls_test,
    "op": op_test,
    "pctsp": pctsp_test,
    "smtwtp": smtwtp_test,
    "sop": sop_test,
    "mkp": mkp_test,
    "mkp_items": mkp_items_test,
    "bpp": bpp_test,
}
