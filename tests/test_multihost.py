"""Multi-HOST runtime test: two real OS processes, each with 4 virtual CPU
devices, coordinate through jax.distributed; the DCN-aware hybrid mesh spans
both, each process feeds only its local batch shard, and one sharded TSP
train step produces bit-identical replicated parameters on every host.

This is the writable stand-in for an N-host TPU pod (BASELINE "N>=2 hosts"):
the same code path (`parallel.multihost`) runs there with no changes.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from deepaco_tpu.parallel.multihost import (all_processes_mean,
                                                hybrid_mesh, init_distributed)

    pid = int(sys.argv[1]); port = sys.argv[2]
    init_distributed(coordinator_address="127.0.0.1:" + port,
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8

    mesh = hybrid_mesh(ant_parallelism=2)
    assert mesh.devices.shape == (4, 2), mesh.devices.shape
    # the instance axis must span processes: each column of hosts
    procs = {d.process_index for d in mesh.devices[:, 0]}
    assert procs == {0, 1}, procs

    import jax.numpy as jnp
    import numpy as np
    from deepaco_tpu.models.gnn import Net
    from deepaco_tpu.parallel.mesh import make_sharded_tsp_train_step
    from deepaco_tpu.train.config import (ACOSettings, ProblemConfig,
                                          TrainConfig)
    from deepaco_tpu.train.reinforce import init_train_state

    cfg = ProblemConfig(n_nodes=12, k_sparse=4,
                        aco=ACOSettings(n_ants=4),
                        train=TrainConfig(epochs=1, steps_per_epoch=1,
                                          batch_size=4, seed=0))
    model = Net()
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_sharded_tsp_train_step(model, cfg, mesh)

    # every process contributes its LOCAL half of the 4 instance keys
    from jax.sharding import NamedSharding, PartitionSpec as P
    all_keys = jax.random.split(jax.random.PRNGKey(7), 4)
    local = np.asarray(all_keys)[pid * 2:(pid + 1) * 2]
    keys = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("instance")), local)

    state2, cost = step(state, keys)
    leaf = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    mc = all_processes_mean(cost)
    print("RESULT", pid, float(np.sum(leaf)), mc, flush=True)
""")


def _free_port() -> str:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def _run_two_process(port):
    env = {**os.environ, "PYTHONPATH": os.getcwd()}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            return None, outs
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, s, mc = line.split()
                results[int(pid)] = (float(s), float(mc))
    if set(results) != {0, 1}:
        return None, outs
    return results, outs


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    # dynamic free port + one retry: under full-suite load the fixed-port
    # variant raced other tests' sockets (round-3 flake)
    results, outs = _run_two_process(_free_port())
    if results is None:
        results, outs = _run_two_process(_free_port())
    assert results is not None, outs
    # replicated params and cross-host metric agree bit-for-bit
    assert results[0] == results[1], results
