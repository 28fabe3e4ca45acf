"""Multi-host runtime: process initialization, DCN-aware meshes, data feeding.

The reference is single-process (SURVEY §2.3); this is the green-field
multi-HOST tier on top of :mod:`deepaco_tpu.parallel.mesh`'s in-process mesh
layer (BASELINE "Scaling ... N>=2 hosts"):

* :func:`init_distributed` — one call per process, env-var- or
  argument-driven, wrapping ``jax.distributed.initialize`` (works for TPU
  pods via the metadata auto-detect AND for the multi-process CPU test
  harness, ``tests/test_multihost.py``).
* :func:`hybrid_mesh` — hosts x local-chips mesh via
  ``mesh_utils.create_hybrid_device_mesh``: the ``instance`` (data) axis
  spans hosts so its once-per-step gradient/psum crosses DCN, while the
  ``ant``/colony axis stays inside a host and rides ICI. This is the
  "collectives ride ICI, not DCN" layout.
* :func:`host_local_batch` — per-process feeding: every process supplies its
  local shard of the global batch (``jax.make_array_from_process_local_data``)
  so no host ever materializes the full array.
* :func:`all_processes_mean` — cross-host scalar reduction for metrics.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.experimental import mesh_utils, multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime for this process.

    On TPU pods all three arguments auto-detect from the metadata server —
    call with no arguments. For manual clusters (or the CPU test harness)
    pass them explicitly or via ``DEEPACO_COORDINATOR`` /
    ``DEEPACO_NUM_PROCESSES`` / ``DEEPACO_PROCESS_ID``. Idempotent: a second
    call is a no-op.
    """
    # NB: must not touch the backend (jax.devices / process_count) before
    # jax.distributed.initialize — only the module flag guards idempotency
    if getattr(init_distributed, "_done", False):
        return
    coordinator_address = coordinator_address or os.environ.get(
        "DEEPACO_COORDINATOR")
    if num_processes is None and "DEEPACO_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DEEPACO_NUM_PROCESSES"])
    if process_id is None and "DEEPACO_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DEEPACO_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # No explicit cluster config. On a TPU pod the runtime metadata
        # carries everything jax.distributed needs — detect that via the
        # standard TPU env markers and call initialize() WITH NO ARGUMENTS
        # (the auto-detect path). Anywhere else stay single-process: calling
        # initialize() on a bare CPU/GPU host would hang waiting for a
        # coordinator that does not exist.
        pod_markers = ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                       "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID")
        if not any(m in os.environ for m in pod_markers):
            return
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    init_distributed._done = True


def hybrid_mesh(ant_parallelism: int | None = None,
                axis_names=("instance", "ant")) -> Mesh:
    """DCN-aware ``(instance, ant)`` mesh over all hosts' devices.

    ``instance`` spans processes (gradient/migration collectives cross DCN
    once per step); ``ant`` spans each host's local chips (construction-time
    collectives ride ICI). ``ant_parallelism`` defaults to all local chips.
    Single-process: degrades to :func:`deepaco_tpu.parallel.mesh.make_mesh`.
    """
    local = jax.local_device_count()
    if ant_parallelism is None:
        ant_parallelism = local
    if jax.process_count() == 1:
        from deepaco_tpu.parallel.mesh import make_mesh

        return make_mesh(n_ant=ant_parallelism)
    assert local % ant_parallelism == 0, (local, ant_parallelism)
    dcn_instance = jax.process_count() * (local // ant_parallelism)
    try:
        # TPU pods: granule = slice (devices carry slice_index)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // ant_parallelism, ant_parallelism),
            dcn_mesh_shape=(jax.process_count(), 1))
    except ValueError:
        # CPU/GPU clusters: granule = process
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // ant_parallelism, ant_parallelism),
            dcn_mesh_shape=(jax.process_count(), 1),
            process_is_granule=True)
    return Mesh(devices.reshape(dcn_instance, ant_parallelism),
                axis_names=axis_names)


def host_local_batch(mesh: Mesh, local_data: dict, axis: str = "instance"):
    """Assemble a globally-sharded batch from per-process local shards.

    Every process passes ONLY its share (``global_batch / process_count``
    leading rows); the result is a global jax.Array sharded over ``axis``
    with no host materializing the whole batch."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.make_array_from_process_local_data(
        sharding, np.asarray(v)) for k, v in local_data.items()}


def all_processes_mean(x) -> float:
    """Mean of a per-process scalar across hosts (metrics aggregation)."""
    vals = multihost_utils.process_allgather(
        jax.numpy.asarray([float(x)], jax.numpy.float32))
    return float(np.mean(np.asarray(vals)))
