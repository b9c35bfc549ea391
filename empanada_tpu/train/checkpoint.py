"""Training checkpoint save/resume.

Parity with reference scripts/train.py:321-390: a checkpoint carries
epoch, arch, model params/batch_stats, optimizer state, and dataset norms;
saved every save_freq epochs by process 0; resume restores everything.
Format: flax msgpack for the pytree + a JSON sidecar for metadata.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "restore_state"]


def save_checkpoint(path, state_dict, metadata=None):
    """state_dict: pytree of arrays (params/batch_stats/opt_state/step)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree_util.tree_map(np.asarray, state_dict)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_checkpoint(path, target=None):
    """Returns (state_dict, metadata)."""
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        state = serialization.from_bytes(target, data)
    else:
        state = serialization.msgpack_restore(data)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def restore_state(path, state):
    """Restore a TrainState-shaped pytree in place-of (returns new)."""
    restored, meta = load_checkpoint(
        path, target=serialization.to_state_dict(state))
    return serialization.from_state_dict(state, restored), meta
