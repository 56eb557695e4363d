"""Multi-host (DCN) wiring: jax.distributed setup + process-aware meshes.

The reference is single-process with no distributed backend (SURVEY.md §2.4);
single-host multi-chip data parallelism lives in shm_tpu.parallel.mesh (ICI
collectives inside shard_map). This module adds the multi-host layer: each
host runs the same SPMD program, JAX's runtime routes the gradient psum over
ICI within a host and DCN across hosts.

Usage (every process runs the same script):

    from shm_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address="host0:1234",
                    num_processes=NPROC, process_id=RANK)
    mesh = dist.make_global_mesh()
    step = make_dp_vae_train_step(model, tx, mesh)   # unchanged SPMD step
    Wg = dist.host_local_batch_to_global(W_local, mesh)
    params, opt_state, loss = step(params, opt_state, Wg, key, kl_w)

Tested without hardware by a 2-process CPU integration test
(tests/test_distributed.py): coordinator + workers on localhost, each with 2
virtual CPU devices, producing the same first-step loss as a single-process
4-device run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None,
               initialization_timeout: Optional[int] = None) -> None:
    """Connect this process to the JAX distributed runtime.

    Thin wrapper over ``jax.distributed.initialize`` (args are auto-detected
    on managed TPU pods; explicit on CPU/GPU clusters). Must run before any
    other JAX call in the process.

    ``initialization_timeout``: seconds to wait for the full cluster to
    assemble (JAX default: 300). If any expected process never arrives —
    crashed before startup, wrong rank count, dead host — every OTHER
    process raises rather than hanging forever; launchers should treat that
    raise as "restart the whole job", the standard SPMD failure model.
    Measured behavior on this JAX version is pinned by
    tests/test_distributed.py::test_missing_worker_raises_within_timeout.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(**kwargs)


def shutdown() -> None:
    jax.distributed.shutdown()


def make_global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over ALL devices of ALL processes, ordered process-major so a
    batch sharded along ``axis`` assigns each process a contiguous block."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def host_local_batch_to_global(x: np.ndarray, mesh: Mesh,
                               axis: str = "data") -> jax.Array:
    """Assemble per-process local batch shards into one global sharded array.

    Every process passes ITS OWN rows (same shape on each process); the result
    is a global array of ``num_processes * local_rows`` rows sharded along the
    mesh's data axis.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def replicate_from_host(tree, mesh: Mesh):
    """Replicate host-local values (params/opt state) across all processes'
    devices. Values must be identical on every process (same seed/init)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)


__all__ = [
    "initialize",
    "shutdown",
    "make_global_mesh",
    "host_local_batch_to_global",
    "replicate_from_host",
]
