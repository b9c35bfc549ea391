"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/DDP layer
(reference scripts/train.py:92-119, patterns.py:226-240): a 1D ``data``
mesh over all devices; batches are sharded on the leading axis and params
replicated. Gradient all-reduce, SyncBN statistics, and loss averaging all
fall out of jit-compiling the global computation over sharded inputs — XLA
inserts the ICI collectives (the scaling-book recipe), no explicit psum
calls needed. Multi-host uses the same code path after
``jax.distributed.initialize``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "initialize_distributed"]


def create_mesh(n_devices=None, axis_name="data", devices=None):
    """1D mesh over (up to) all visible devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Device-put a pytree of host arrays with leading-axis sharding.

    The batch size must divide the mesh size; callers drop ragged tails
    (DataLoader drop_last) exactly like DDP per-rank batching.
    """
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (replaces dist.init_process_group,
    reference train.py:118). No-op when single-process. Must run before
    the first backend use. The gloo CPU-collectives implementation is
    always selected so multi-process runs that RESOLVE to the CPU
    backend (tests, CPU serving, auto-detected CPU hosts — the platform
    may not be known before backend init) get working cross-process
    collectives; TPU slices use their own runtime and ignore the CPU
    client's setting."""
    if num_processes is None or num_processes <= 1:
        return
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
