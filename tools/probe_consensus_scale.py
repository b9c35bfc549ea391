"""Consensus scaling probe: merge_objects_from_trackers at the product's
operating point (thousands of 3D instances per class across 3 axis
trackers — reference consensus.py:348-469 runs at this scale on real
MitoNet volumes; round-3 bench only ever pushed 19 instances through).

Synthesizes N cuboid 3D objects on a virtual (D, H, W) grid; each of the
3 "axis trackers" sees every object with a slightly jittered extent, so
the consensus graph gets ~3 nodes + ~3 edges per object plus occasional
cross-object contacts — the realistic regime (clusters are small; the
total node count is what scales).

Run: python tools/probe_consensus_scale.py [Ns...]
Prints one JSON line per N with wall seconds and phase breakdown.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from empanada_tpu.inference.consensus import merge_objects_from_trackers


class _FakeTracker:
    def __init__(self, instances):
        self.instances = instances


def synthetic_trackers(n_objects, seed=0, grid=None, jitter=2):
    """3 trackers, each seeing all n_objects cuboids with jittered spans.

    Cuboids live on a coarse lattice so neighbors occasionally touch
    (some cross-object edges survive box screening, like real data).
    """
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n_objects ** (1 / 3)))
    cell = 24
    D = H = W = side * cell + 32
    if grid is not None:
        D, H, W = grid
    trackers = []
    # lattice positions
    pos = np.stack(np.unravel_index(np.arange(n_objects),
                                    (side, side, side)), axis=1) * cell + 4
    base = rng.integers(10, 18, size=(n_objects, 3))  # spans per axis
    for t in range(3):
        instances = {}
        for i in range(n_objects):
            z0, y0, x0 = pos[i]
            dz, dy, dx = base[i] + rng.integers(-jitter, jitter + 1, size=3)
            dz, dy, dx = max(dz, 4), max(dy, 4), max(dx, 4)
            z1, y1, x1 = min(z0 + dz, D), min(y0 + dy, H), min(x0 + dx, W)
            # raveled RLE of the cuboid: one run per (z, y) row
            zz, yy = np.meshgrid(np.arange(z0, z1), np.arange(y0, y1),
                                 indexing="ij")
            starts = (zz.ravel() * H + yy.ravel()) * W + x0
            runs = np.full(starts.shape, x1 - x0, dtype=np.int64)
            instances[1000 + i + 1] = {
                "box": (int(z0), int(y0), int(x0),
                        int(z1), int(y1), int(x1)),
                "starts": starts.astype(np.int64),
                "runs": runs,
            }
        trackers.append(_FakeTracker(instances))
    return trackers, (D, H, W)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [500, 2000, 5000]
    for n in ns:
        trackers, shape = synthetic_trackers(n)
        t0 = time.perf_counter()
        out = merge_objects_from_trackers(trackers, pixel_vote_thr=2,
                                          cluster_iou_thr=0.75)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "n_objects": n,
            "grid": shape,
            "instances_out": len(out),
            "seconds": round(dt, 3),
            "us_per_object": round(dt / n * 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
