"""Host-level collectives for multi-host pipelines.

The reference's object all_gather pickles tensors through a gloo side
group (reference inference3d_multigpu.py:78-171, patterns.py:226-240); on
JAX multi-host the same capability comes from multihost_utils, which rides
the ICI/DCN fabric — no second backend needed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["all_gather_arrays", "all_gather_objects", "broadcast_object"]


def all_gather_arrays(array):
    """Gather a per-process numpy array across hosts; returns a list of
    per-process arrays (shapes must match)."""
    import jax

    if jax.process_count() == 1:
        return [np.asarray(array)]
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(np.asarray(array))
    return list(stacked)


def all_gather_objects(obj):
    """Gather arbitrary picklable objects across hosts (the reference's
    pickle->ByteTensor->pad->all_gather, inference3d_multigpu.py:88-171)."""
    import pickle

    import jax

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    max_size = int(np.max(sizes))
    padded = np.zeros((max_size,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(bytes(buf[:int(sz[0])]))
        for buf, sz in zip(gathered, sizes)
    ]


def broadcast_object(obj, root=0):
    """Broadcast a picklable object from the root process."""
    import jax

    if jax.process_count() == 1:
        return obj
    gathered = all_gather_objects(obj if jax.process_index() == root
                                  else None)
    return gathered[root]
