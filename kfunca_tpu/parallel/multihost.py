"""Multi-host (DCN) scale-out glue.

A TPU pod slice spans multiple hosts: each host drives its locally-attached
chips, hosts coordinate over DCN (data-center network), and ICI only exists
WITHIN a slice's chip fabric.  The scaling recipe (jax-ml.github.io/
scaling-book) is therefore mesh-geometric: put the bandwidth-hungry axes
(tp, and fsdp's weight all-gathers) on ICI inside a host's chips, and the
bandwidth-light axis (plain dp — one gradient psum per step) across hosts
on DCN.

This module is the thin, testable layer between `jax.distributed` and the
rest of kfunca_tpu.parallel (green-field; the reference is single-process
single-GPU — SURVEY.md §2.5).  Everything degrades to a no-op in a
single-process run, so the same training script works from one chip to a
pod:

    from kfunca_tpu.parallel import multihost
    multihost.initialize()                      # no-op if single process
    mesh = multihost.make_multihost_mesh()      # dp across DCN, tp on ICI
    batch = multihost.global_batch_from_local(local_np_batch, mesh)
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as meshlib


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host run; returns whether a
    multi-process runtime is active afterwards.

    Safe to call unconditionally: a single-process run (no coordinator
    configured anywhere) is a no-op, and calling again after successful
    initialization is a no-op too.  Arguments fall back to the standard
    environment (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS and cloud
    TPU metadata, which jax.distributed autodetects on TPU VMs)."""
    if jax.process_count() > 1:
        return True  # already initialized (or auto-initialized by the VM)
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None)
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to coordinate
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_multihost_mesh(dp: int | None = None, tp: int | None = None) -> Mesh:
    """(dp, tp) mesh over ALL processes' devices: tp packed within each
    process's local chips (ICI-adjacent), dp spanning hosts (DCN).

    Single-process: identical to parallel.mesh.make_mesh.  Multi-process:
    tp must fit within one host's local device count (a tp axis across DCN
    would put per-matmul collectives on the slow network — refused rather
    than silently degraded)."""
    nproc = jax.process_count()
    if nproc == 1:
        return meshlib.make_mesh(dp=dp, tp=tp)
    n_local = jax.local_device_count()
    n = n_local * nproc
    if dp is None or tp is None:
        dp, tp = meshlib.factor_mesh(n)
        tp = min(tp, n_local)
        dp = n // tp
    if tp > n_local or n_local % tp:
        raise ValueError(
            f"tp={tp} does not pack into one host's {n_local} local devices"
            " — tensor-parallel collectives must ride ICI, not DCN"
        )
    from jax.experimental import mesh_utils

    # hybrid mesh: contiguous local devices along tp (and dp within a
    # host), hosts stacked along dp over DCN
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(n_local // tp, tp),
        dcn_mesh_shape=(nproc, 1),
    )
    return Mesh(arr.reshape(dp, tp), axis_names=("dp", "tp"))


def process_batch_info(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """(start, size) of the global batch this process must load.

    With the batch sharded over dp (parallel.mesh.batch_spec) and dp laid
    host-major (make_multihost_mesh), each process owns one contiguous
    stripe; data loaders feed only their stripe (models/data.py
    TokenDataset can be constructed per-process with seed=process_index)."""
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{nproc} processes")
    size = global_batch // nproc
    return jax.process_index() * size, size


def global_batch_from_local(local_batch, mesh: Mesh, spec: P | None = None):
    """Assemble each process's host-local batch slice into one global
    dp-sharded jax.Array (no cross-host data movement: every shard stays
    on the process that loaded it)."""
    spec = meshlib.batch_spec() if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    local_batch = np.asarray(local_batch)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape
    )
