"""Multi-host (DCN) runtime initialization and mesh construction.

The reference has NO distributed backend — all parallelism is one
rayon pool in one process (/root/reference/src/multicore.rs; SURVEY.md
§2.4 "Distributed communication backend: none exists"). The TPU-native
design scales past one host with the JAX distributed runtime: every
host in a pod slice runs the same SPMD program, `jax.distributed`
wires the coordination plane over DCN, and a `Mesh` over the GLOBAL
device list makes the existing shard_map pipelines
(parallel/sharding.py — all-to-all FFT transposes, per-shard MSM)
span hosts with zero further code changes: XLA routes collectives
over ICI within a slice and DCN across slices.

Usage on each host of a 2-host run:

    from bellman_tpu.parallel import distributed
    distributed.initialize(coordinator_address="host0:1234",
                           num_processes=2, process_id=<0|1>)
    mesh = distributed.global_mesh()
    plan = sharding.ShardedDomainPlan(spec, Fr, exp, mesh)

or let the environment drive it (BELLMAN_TPU_COORDINATOR,
BELLMAN_TPU_NUM_PROCESSES, BELLMAN_TPU_PROCESS_ID — or the cloud
auto-detection built into jax.distributed when no address is given).
"""

from __future__ import annotations

import os

import numpy as np

import jax

from .sharding import AXIS, make_mesh

_INITIALIZED = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Start the JAX distributed runtime (idempotent).

    Returns True if a multi-process runtime was (or already had been)
    initialized, False for the single-process fast path — a
    num_processes of 1 (explicit or via env) skips the coordination
    service entirely, so single-host runs and the CPU-mesh test/dryrun
    environment never pay for or depend on it.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "BELLMAN_TPU_COORDINATOR"
    )
    if num_processes is None:
        env = os.environ.get("BELLMAN_TPU_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("BELLMAN_TPU_PROCESS_ID")
        process_id = int(env) if env else None

    if num_processes == 1 or (
        num_processes is None and coordinator_address is None
    ):
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def global_mesh(n_devices: int | None = None):
    """1-D mesh over the GLOBAL device list (all hosts' chips after
    initialize()); device order is JAX's global order, so every process
    builds the identical mesh."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return make_mesh(devices=devices)


def host_local_shard(global_shape_last: int):
    """(start, stop) of this process's slice of a length-n batch axis
    laid out contiguously across processes (block sharding): the host
    feeds only its local shard of CRS bases/scalars/coefficients."""
    p = jax.process_index()
    np_ = jax.process_count()
    assert global_shape_last % np_ == 0, (global_shape_last, np_)
    per = global_shape_last // np_
    return p * per, (p + 1) * per


def describe() -> dict:
    """Runtime topology snapshot (observability hook)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.default_backend(),
        "initialized_multiprocess": _INITIALIZED,
    }
