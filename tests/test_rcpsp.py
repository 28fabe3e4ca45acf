"""RCPSP tests: PSPLIB parsing, SSGS feasibility (check_schedule oracle),
ACO search progress, and summation-evaluation equivalence with the
reference's prefix re-reduction.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepaco_tpu.core.rcpsp import (
    check_schedule,
    load_psplib,
    make_rcpsp,
    parse_rcp,
)
from deepaco_tpu.aco.problems.rcpsp import (
    RCPSPACO,
    RCPSPConfig,
    makespans,
    rcpsp_spec,
    ssgs_schedule,
)

ARCHIVE = "/root/reference/data/rcpsp/psplib.tar.gz"


@pytest.fixture(scope="module")
def j30():
    return load_psplib(ARCHIVE, "j30rcp", limit=2)[0]


def toy_instance():
    #        0 -> 1 -> 3
    #         \-> 2 -/       durations 0,3,2,0; 1 resource cap 2, req 1 each
    adj = np.zeros((4, 4), int)
    adj[0, 1] = adj[0, 2] = adj[1, 3] = adj[2, 3] = 1
    return make_rcpsp([0, 3, 2, 0], [[0], [1], [1], [0]], [2], adj)


def test_parse_psplib(j30):
    assert j30.n == 32
    assert j30.m == 4
    assert int(j30.duration[0]) == 0 and int(j30.duration[-1]) == 0
    assert int(jnp.sum(j30.adj[:, 0])) == 0    # no preds for source
    assert int(jnp.sum(j30.adj[-1])) == 0      # no succs for sink


def test_ssgs_toy_parallel_execution():
    data = toy_instance()
    start = np.asarray(ssgs_schedule(data, jnp.arange(4)))
    # both middle jobs fit concurrently (cap 2), so makespan = max(3,2) = 3
    assert start[0] == 0 and start[3] == 3
    assert check_schedule(data, start)


def test_ssgs_toy_resource_contention():
    adj = np.zeros((4, 4), int)
    adj[0, 1] = adj[0, 2] = adj[1, 3] = adj[2, 3] = 1
    data = make_rcpsp([0, 3, 2, 0], [[1], [1], [1], [0]], [1], adj)
    start = np.asarray(ssgs_schedule(data, jnp.arange(4)))
    # cap 1 serializes jobs 1 and 2 → makespan 5
    assert start[3] == 5
    assert check_schedule(data, start)


def test_ssgs_feasible_on_psplib(j30):
    aco = RCPSPACO(j30, n_ants=8, seed=0)
    costs, log_probs, paths = aco.sample()
    p = np.asarray(paths)
    n = j30.n
    adj = np.asarray(j30.adj)
    for a in range(4):
        seq = p[:, a]
        assert sorted(seq) == list(range(n))
        pos = np.empty(n, int); pos[seq] = np.arange(n)
        for i in range(n):
            for j in np.nonzero(adj[i])[0]:
                assert pos[i] < pos[j], "activity list not topological"
        start = np.asarray(ssgs_schedule(j30, jnp.asarray(seq)))
        assert check_schedule(j30, start)
        assert float(costs[a]) == start[-1]


def test_run_improves_and_best_is_feasible(j30):
    aco = RCPSPACO(j30, n_ants=8, seed=1, elitist=True, min_max=True)
    c1 = float(aco.run(1))
    c15 = float(aco.run(14))
    assert c15 <= c1 + 1e-6
    route, schedule, cost = aco.best_solution
    assert check_schedule(j30, schedule)
    assert schedule[-1] == cost


def test_summation_evaluation_matches_prefix_reduction(j30):
    """Running-sum S must equal the reference's explicit gamma^(k-j) prefix
    reduction (rcpsp/aco.py:190-206)."""
    cfg = RCPSPConfig(n_ants=4, gamma=0.8, c=0.5)
    n = j30.n
    rng = np.random.default_rng(0)
    tau = jnp.asarray(rng.random((n, n)), jnp.float32)
    heu = jnp.asarray(rng.random((n, n)) + 0.5, jnp.float32)
    spec = rcpsp_spec(tau, heu, j30, cfg)
    state, start = spec.init(jax.random.PRNGKey(0))
    route = [np.zeros(4, int)]
    for k in range(10):
        s_sum = np.asarray(state[3])
        # reference prefix reduction over routes[:, :k+1]
        prefix = np.stack(route, axis=1)       # [A, k+1]
        expect = np.zeros_like(s_sum)
        for j in range(prefix.shape[1]):
            expect += (0.8 ** (prefix.shape[1] - 1 - j)) * np.asarray(tau)[prefix[:, j]]
        np.testing.assert_allclose(s_sum, expect, rtol=1e-4)
        # take a valid action per ant
        mask = np.asarray(spec.mask(state))
        actions = np.array([np.nonzero(mask[a])[0][0] for a in range(4)])
        state = spec.step(state, jnp.asarray(actions))
        route.append(actions)


def _random_topo_seq(adj, rng):
    """Kahn's algorithm with a shuffled ready set → random topological order."""
    n = adj.shape[0]
    indeg = adj.sum(axis=0).astype(int)
    ready = [i for i in range(n) if indeg[i] == 0]
    seq = []
    while ready:
        i = ready.pop(rng.integers(len(ready)))
        seq.append(i)
        for j in np.nonzero(adj[i])[0]:
            indeg[j] -= 1
            if indeg[j] == 0:
                ready.append(int(j))
    return np.asarray(seq)


@pytest.fixture(scope="module")
def reference_rcpsp(tmp_path_factory):
    """Import the reference decoder (rcpsp/aco.py SSGS_ordered) with a
    torch_geometric stub, plus the matching reference RCPSPInstance built
    from the same j30 .RCP text our loader reads."""
    import importlib.util
    import sys
    import tarfile
    import types

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data.Data = object
        tg.data = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tg_data
    np.Infinity = np.inf  # reference code predates numpy 2.0

    tmp = tmp_path_factory.mktemp("refrcpsp")
    with tarfile.open(ARCHIVE) as tf:
        names = sorted(m.name for m in tf.getmembers()
                       if "j30rcp" in m.name and m.name.endswith(".RCP"))
        text = tf.extractfile(names[0]).read().decode()
    rcp_path = tmp / "inst.RCP"
    rcp_path.write_text(text)

    sys.path.insert(0, "/root/reference/rcpsp")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_rcpsp_aco", "/root/reference/rcpsp/aco.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        inst_mod = sys.modules["rcpsp_inst"]
    finally:
        sys.path.remove("/root/reference/rcpsp")
    return mod.SSGS_ordered, inst_mod.read_RCPfile(str(rcp_path)), text


def test_ssgs_exact_parity_vs_reference_decoder(reference_rcpsp):
    """Default decode must reproduce the REFERENCE SSGS start times exactly —
    per-requested-resource request monotonicity (rcpsp_inst.py:78-90) and the
    latest_start clamp (rcpsp/aco.py:55), over 50 random topological orders.
    backfill=True fills resource gaps and can only shorten the makespan."""
    ssgs_ref, ref_inst, text = reference_rcpsp
    data = parse_rcp(text)
    adj = np.asarray(data.adj)
    rng = np.random.default_rng(0)
    worse = 0
    for trial in range(50):
        seq = _random_topo_seq(adj, rng)
        expect = np.asarray(ssgs_ref(ref_inst, list(seq)))
        got = np.asarray(ssgs_schedule(data, jnp.asarray(seq),
                                       backfill=False))
        np.testing.assert_array_equal(got, expect,
                                      err_msg=f"trial {trial}")
        s_bf = np.asarray(ssgs_schedule(data, jnp.asarray(seq),
                                        backfill=True))
        assert check_schedule(data, got) and check_schedule(data, s_bf)
        worse += int(s_bf[-1] > got[-1])
    assert worse == 0   # gap-filling never lengthens the makespan
