"""Cross-problem plug-in tests: OP, PCTSP, SMTWTP, MKP (PH_suc + PH_items),
BPP, SOP.

Where the reference engine is importable (pure torch: op, pctsp, smtwtp, mkp,
mkp_transformer, sop) these tests drive it side-by-side on the same instance +
heuristic and compare sampled-objective distributions; feasibility is checked
with independent validators. BPP's reference imports numba (absent), so its
fitness semantics are transcribed directly.
"""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepaco_tpu.aco.problems import (
    BPPACO, MKPACO, MKPItemsACO, OPACO, PCTSPACO, SMTWTPACO, SOPACO,
)


def load_reference(problem, name):
    """Import /root/reference/<problem>/aco.py under a unique module name.

    smtwtp/aco.py does ``import utils`` (which needs torch_geometric, absent);
    a stub satisfies the import — the ACO class itself never touches it.
    """
    import types

    if "utils" not in sys.modules:
        sys.modules["utils"] = types.ModuleType("utils")
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/{problem}/aco.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------------- OP ----
class TestOP:
    def make(self, n=15, seed=0):
        rng = np.random.default_rng(seed)
        coords = rng.random((n, 2)).astype(np.float32)
        d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
        np.fill_diagonal(d, 1e9)
        depot_d = d[0].copy(); depot_d[0] = 0
        prizes = (1 + np.floor(99 * depot_d / depot_d.max())) / 100.0
        prizes[0] = 0.0
        return d.astype(np.float32), prizes.astype(np.float32), 4.0

    def test_feasible_and_distribution(self):
        d, prizes, max_len = self.make()
        ref_mod = load_reference("op", "op")
        torch.manual_seed(0)
        ref = ref_mod.ACO(torch.as_tensor(d), torch.as_tensor(prizes),
                          max_len, n_ants=64, k_sparse=5)
        ref_objs = ref.gen_sol_obj(ref.gen_sol(require_prob=False)).numpy()

        ours = OPACO(d, prizes, max_len, n_ants=64, k_sparse=5, seed=1)
        objs, log_probs, paths = ours.sample()
        objs = np.asarray(objs)

        # feasibility: tours start at 0, length budget respected
        p = np.asarray(paths)
        d_ext = np.asarray(ours.data["dist"])
        for a in range(8):
            tour = p[:, a]
            real = tour[tour != d.shape[0]]  # drop dummy
            assert real[0] == 0
            assert len(set(real.tolist())) == len(real)
            length = sum(d_ext[tour[i], tour[i + 1]] for i in range(len(tour) - 1))
            ret = length + d_ext[real[-1], 0] if real[-1] != 0 else length
            assert ret <= max_len + 1e-3

        assert abs(objs.mean() - ref_objs.mean()) / max(ref_objs.mean(), 1e-9) < 0.15

    def test_run_improves(self):
        d, prizes, max_len = self.make(seed=3)
        aco = OPACO(d, prizes, max_len, n_ants=16, k_sparse=5, seed=2)
        o1 = float(aco.run(1))
        o10 = float(aco.run(9))
        assert o10 >= o1 - 1e-6


# ---------------------------------------------------------------- PCTSP ----
class TestPCTSP:
    def make(self, n=15, seed=0):
        rng = np.random.default_rng(seed)
        coords = rng.random((n + 1, 2)).astype(np.float32)
        d = np.linalg.norm(coords[:, None] - coords[None], axis=-1).astype(np.float32)
        prizes = np.concatenate([[0.0], rng.random(n)]).astype(np.float32)
        penalties = np.concatenate([[0.0], rng.random(n) * 0.4]).astype(np.float32)
        return d, prizes, penalties

    def test_objective_matches_reference(self):
        d, prizes, penalties = self.make()
        ref_mod = load_reference("pctsp", "pctsp")
        torch.manual_seed(0)
        ref = ref_mod.ACO(torch.as_tensor(d), torch.as_tensor(prizes),
                          torch.as_tensor(penalties), n_ants=32)
        ref_objs = ref.gen_sol_obj(ref.gen_sol(require_prob=False)).numpy()

        ours = PCTSPACO(d, prizes, penalties, n_ants=32, seed=1)
        objs, _, paths = ours.sample()
        objs = np.asarray(objs)
        p = np.asarray(paths)
        # every route starts at 0 and ends parked at 0
        assert (p[0] == 0).all() and (p[-1] == 0).all()
        # enough prize collected before first return to depot
        n = d.shape[0] - 1
        for a in range(8):
            tour = p[:, a]
            first_ret = np.nonzero(tour[1:] == 0)[0][0] + 1
            visited = tour[1:first_ret]
            collected = prizes[visited].sum()
            assert collected > n / 4 or len(set(visited)) == n
        assert abs(objs.mean() - ref_objs.mean()) / ref_objs.mean() < 0.15

    def test_run_improves(self):
        d, prizes, penalties = self.make(seed=5)
        aco = PCTSPACO(d, prizes, penalties, n_ants=16, seed=3)
        c1 = float(aco.run(1)); c10 = float(aco.run(9))
        assert c10 <= c1 + 1e-6


# --------------------------------------------------------------- SMTWTP ----
class TestSMTWTP:
    def make(self, n=20, seed=0):
        rng = np.random.default_rng(seed)
        due = (rng.random(n) * n).astype(np.float32)
        weights = rng.random(n).astype(np.float32)
        proc = rng.random(n).astype(np.float32)
        return proc, due, weights

    def test_cost_matches_reference(self):
        proc, due, weights = self.make()
        ref_mod = load_reference("smtwtp", "smtwtp")
        torch.manual_seed(0)
        ref = ref_mod.ACO(torch.as_tensor(due), torch.as_tensor(weights),
                          torch.as_tensor(proc), n_ants=16)
        ref_paths = ref.gen_path(require_prob=False)
        ref_costs = ref.gen_path_costs(ref_paths).numpy()

        ours = SMTWTPACO(proc, due, weights, n_ants=16, seed=1)
        costs, _, paths = ours.sample()
        p = np.asarray(paths)
        assert (p[0] == 0).all()
        for a in range(4):
            assert sorted(p[1:, a]) == list(range(1, 21))
        # exact cost-function parity on the reference's own sampled paths
        from deepaco_tpu.aco.problems.smtwtp import smtwtp_cost
        ref_p = np.vstack([np.zeros((1, 16), np.int64), ref_paths.numpy()])
        ours_on_ref = np.asarray(smtwtp_cost(
            jnp.asarray(proc), jnp.asarray(due), jnp.asarray(weights),
            jnp.asarray(ref_p)))
        np.testing.assert_allclose(ours_on_ref, ref_costs, rtol=1e-4)

    def test_run_improves(self):
        proc, due, weights = self.make(seed=2)
        aco = SMTWTPACO(proc, due, weights, n_ants=16, seed=4, min_max=True)
        c1 = float(aco.run(1)); c10 = float(aco.run(9))
        assert c10 <= c1 + 1e-6


# ------------------------------------------------------------------ MKP ----
class TestMKP:
    def make(self, n=30, m=5, seed=0):
        rng = np.random.default_rng(seed)
        weight = rng.random((n, m)).astype(np.float32)
        prize = (weight.sum(1) / m + rng.random(n) * 0.5).astype(np.float32)
        return prize, weight

    def test_ph_suc_feasible_and_close_to_reference(self):
        prize, weight = self.make()
        n = len(prize)
        ref_mod = load_reference("mkp", "mkp")
        torch.manual_seed(0)
        ref = ref_mod.ACO(torch.as_tensor(prize), torch.as_tensor(weight),
                          n_ants=64)
        ref_objs = ref.gen_sol_obj(ref.gen_sol(require_prob=False)).numpy()

        ours = MKPACO(prize, weight, n_ants=64, seed=1)
        objs, _, paths = ours.sample()
        p = np.asarray(paths)
        for a in range(8):
            sol = p[:, a]
            real = sol[sol != n]
            assert len(set(real.tolist())) == len(real)
            assert (weight[real].sum(axis=0) <= n // 2 + 1e-5).all()
        assert abs(np.asarray(objs).mean() - ref_objs.mean()) / ref_objs.mean() < 0.15

    def test_ph_items_feasible_and_close_to_reference(self):
        prize, weight = self.make(seed=3)
        weight = weight / (weight.sum(0, keepdims=True) * 0.25)  # cap 1.0
        n = len(prize)
        ref_mod = load_reference("mkp_transformer", "mkp_t")
        torch.manual_seed(0)
        # reference PH_items takes weight as [m, n] and transposes internally
        ref = ref_mod.ACO(torch.as_tensor(prize), torch.as_tensor(weight.T),
                          n_ants=64)
        ref_objs = ref.gen_sol_obj(ref.gen_sol(require_prob=False)).numpy()

        ours = MKPItemsACO(prize, weight, n_ants=64, seed=1)
        objs, log_probs, paths = ours.sample()
        p = np.asarray(paths)
        assert (p[0] == n).all()  # pinned dummy start
        for a in range(8):
            real = p[1:, a][p[1:, a] != n]
            assert len(set(real.tolist())) == len(real)
            assert (weight[real].sum(axis=0) <= 1.0 + 1e-5).all()
        assert abs(np.asarray(objs).mean() - ref_objs.mean()) / ref_objs.mean() < 0.15

    def test_runs_improve(self):
        prize, weight = self.make(seed=4)
        aco = MKPACO(prize, weight, n_ants=16, seed=2)
        o1 = float(aco.run(1)); o10 = float(aco.run(9))
        assert o10 >= o1 - 1e-6
        aco2 = MKPItemsACO(prize, weight * 0.1, n_ants=16, seed=2)
        o1 = float(aco2.run(1)); o10 = float(aco2.run(9))
        assert o10 >= o1 - 1e-6
        assert np.asarray(aco2.state.phe.tau).shape == (len(prize) + 1,)


# ------------------------------------------------------------------ BPP ----
class TestBPP:
    def make(self, n=30, seed=0):
        rng = np.random.default_rng(seed)
        demand = np.concatenate([[0.0], rng.integers(20, 101, n)]).astype(np.float32)
        return demand

    def ref_fitness(self, seq, demand, capacity=150.0):
        """Transcription of bpp/aco.py:12-40 cal_fitness/count_last_zero."""
        L = len(seq)
        last_zeros = 0
        for j in range(L - 1, -1, -1):
            if seq[j] == 0:
                last_zeros += 1
            else:
                break
        n_bins = L - last_zeros - len(demand) + 1
        f, sub = 0.0, 0.0
        for j in range(1, L):
            if seq[j] != 0:
                sub += demand[seq[j]]
            else:
                f += (sub / capacity) ** 2
                sub = 0.0
        return f / n_bins

    def test_fitness_matches_reference_semantics(self):
        demand = self.make()
        aco = BPPACO(demand, n_ants=16, seed=1)
        fits, _, paths = aco.sample()
        p = np.asarray(paths)
        for a in range(8):
            seq = p[:, a]
            expect = self.ref_fitness(seq, demand)
            np.testing.assert_allclose(float(fits[a]), expect, rtol=1e-5)
            # packing feasibility: bins respect capacity, all items packed
            items = seq[seq != 0]
            assert sorted(items.tolist()) == list(range(1, len(demand)))

    def test_run_improves(self):
        demand = self.make(seed=2)
        aco = BPPACO(demand, n_ants=16, seed=3)
        f1 = float(aco.run(1)); f10 = float(aco.run(9))
        assert f10 >= f1 - 1e-6


# ------------------------------------------------------------------ SOP ----
class TestSOP:
    def make(self, n=15, seed=0):
        torch.manual_seed(seed)
        # sop/utils.py imports torch_geometric — replicate its generators
        r = []
        for i in range(1, n):
            r.append((0, i))
        rng = np.random.default_rng(seed)
        a = list(range(1, n))
        precede = [set() for _ in range(n)]
        for i in range(n - 3, -1, -1):
            for j in range(i + 1, n - 1):
                if rng.random() > 0.2:
                    continue
                precede[i].add(j)
                for k in precede[j]:
                    precede[i].add(k)
            for j in precede[i]:
                r.append((a[i], a[j]))
        dist = rng.random((n, n)).astype(np.float32)
        prec = np.zeros((n, n), np.float32)
        for i, j in r:
            prec[j, i] = 1.0
        return dist, prec

    def test_topological_validity_and_reference_distribution(self):
        dist, prec = self.make()
        ref_mod = load_reference("sop", "sop")
        torch.manual_seed(0)
        ref = ref_mod.ACO(distances=torch.as_tensor(dist),
                          prec_cons=torch.as_tensor(prec), n_ants=32,
                          heuristic=torch.as_tensor(1.0 / (dist + 1e-10)))
        ref_costs = ref.gen_path_costs(ref.gen_path(require_prob=False)).numpy()

        ours = SOPACO(dist, prec, n_ants=32, seed=1)
        costs, _, paths = ours.sample()
        p = np.asarray(paths)
        n = dist.shape[0]
        for a in range(8):
            order = p[:, a]
            assert sorted(order) == list(range(n))
            pos = np.empty(n, int)
            pos[order] = np.arange(n)
            for j in range(n):
                for k in range(n):
                    if prec[j, k] > 0:
                        assert pos[k] < pos[j], "precedence violated"
        assert abs(np.asarray(costs).mean() - ref_costs.mean()) / ref_costs.mean() < 0.15

    def test_run_improves(self):
        dist, prec = self.make(seed=2)
        aco = SOPACO(dist, prec, n_ants=16, seed=5)
        c1 = float(aco.run(1)); c10 = float(aco.run(9))
        assert c10 <= c1 + 1e-6
