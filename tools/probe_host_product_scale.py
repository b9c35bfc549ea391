"""Host-side product-scale orthoplane run (no model, no TPU needed).

Drives ground-truth panoptic maps through the ENTIRE host pipeline at
the reference's operating point — 512^3 (or 1k^3), label_divisor 20000,
~170 instances/slice, thousands of 3D instances: per-slice run
encoding, RLE decode, forward matching, backward matching + tracking,
3-axis cross-consensus, chunked zarr fill — and reports per-phase time
and peak RSS. This isolates the host half of bench.py --large
(tools/probe_product_scale.py runs the same flow with the model in the
loop on the TPU).

Run: python tools/probe_host_product_scale.py [side] [n_instances]
"""

import json
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_instances = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    ld = 20000

    from empanada_tpu.core.ccl import image_to_runs
    from empanada_tpu.data.zarr_store import create_zarr
    from empanada_tpu.inference import patterns
    from empanada_tpu.inference.rle import runs_to_rle_seg
    from tools.probe_product_scale import get_volume

    _, gt = get_volume(side, n_instances)
    gt = gt.astype(np.int32)
    shape = gt.shape

    axes = {"xy": 0, "xz": 1, "yz": 2}
    trackers = patterns.create_axis_trackers(axes, [1], ld, shape)
    phase = {}
    total_slices = 0
    densities = []

    t_all = time.perf_counter()
    for axis_name, axis in axes.items():
        view = gt if axis == 0 else np.moveaxis(gt, axis, 0)
        n = len(view)
        total_slices += n
        matchers = patterns.create_matchers([1], ld, 0.25, 0.25)

        t0 = time.perf_counter()
        rle_stack = []
        for z in range(n):
            pan = view[z] + (view[z] > 0) * ld
            s, e, v = image_to_runs(np.ascontiguousarray(pan))
            seg = runs_to_rle_seg(s, e, v, pan.shape, [1], ld, [1])
            rle_stack.append(patterns.apply_matchers(seg, matchers))
        phase.setdefault("forward_s", 0.0)
        phase["forward_s"] += time.perf_counter() - t0
        densities.append(np.mean([len(s[1]) for s in rle_stack]))

        t0 = time.perf_counter()
        patterns.finish_axis(rle_stack, matchers, trackers[axis_name], n,
                             500, 4)
        phase.setdefault("backward_s", 0.0)
        phase["backward_s"] += time.perf_counter() - t0

    t0 = time.perf_counter()
    consensus = patterns.build_consensus(
        trackers, [1], [1], mode="orthoplane", pixel_vote_thr=2,
        cluster_iou_thr=0.75, min_size=500, min_span=4)
    phase["consensus_s"] = time.perf_counter() - t0

    out = create_zarr(f"/tmp/probe_host_{side}.zarr", shape,
                      dtype=np.uint32, overwrite=True)
    t0 = time.perf_counter()
    patterns.fill_volume(out, consensus[1].instances, processes=4)
    phase["fill_s"] = time.perf_counter() - t0

    elapsed = time.perf_counter() - t_all
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "volume": list(shape),
        "instances_per_slice": round(float(np.mean(densities)), 1),
        "instances_3d": len(consensus[1].instances),
        "host_slices_per_sec": round(total_slices / elapsed, 1),
        "total_seconds": round(elapsed, 1),
        "phases": {k: round(v, 1) for k, v in phase.items()},
        "host_rss_gb": round(rss_gb, 2),
    }))


if __name__ == "__main__":
    main()
