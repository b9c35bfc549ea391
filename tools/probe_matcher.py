"""Host matcher cost at product instance density (round-3 VERDICT weak #3).

Times the per-slice host pipeline stages in isolation — run decode
(runs_to_rle_seg), forward matching (apply_matchers), backward matching +
tracking (finish_axis) — on synthetic EM ground truth at ~100+
instances/slice, 512^2, label_divisor 20000. Pure CPU: no TPU needed.

Run: python tools/probe_matcher.py [side] [n_instances] [n_slices]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_instances = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from empanada_tpu.core.ccl import image_to_runs
    from empanada_tpu.inference import patterns
    from empanada_tpu.inference.rle import runs_to_rle_seg
    from tools.probe_product_scale import get_volume

    _, gt = get_volume(side, n_instances)
    label_divisor = 20000

    # panoptic-map form of the GT: thing class 1, instance ids offset
    slices = []
    for z in range(min(n_slices, gt.shape[0])):
        pan = gt[z].astype(np.int64)
        pan[pan > 0] += label_divisor
        slices.append(pan)
    density = float(np.mean([len(np.unique(p[p > 0])) for p in slices]))

    # stage 1: dense->runs (device-side in prod; host numpy here)
    run_bufs = [image_to_runs(p.astype(np.int32)) for p in slices]
    n_runs = float(np.mean([len(b[0]) for b in run_bufs]))

    # best of 3 reps per stage: this host's CPU contention varies 2x
    # between back-to-back runs; min-of-reps within one process is the
    # only comparable figure (same policy as bench.py on the tunnel)
    t_decode = t_fwd = t_bwd = float("inf")
    for _ in range(3):
        # stage 2: decode runs -> rle_seg (CCL + region props)
        t0 = time.perf_counter()
        rle_segs = [
            runs_to_rle_seg(s, e, v, (side, side), [1], label_divisor, [1])
            for s, e, v in run_bufs
        ]
        t_decode = min(t_decode,
                       (time.perf_counter() - t0) / len(slices))

        # stage 3: forward matching
        matchers = patterns.create_matchers([1], label_divisor, 0.25, 0.25)
        t0 = time.perf_counter()
        rle_stack = [patterns.apply_matchers(dict(s), matchers)
                     for s in rle_segs]
        t_fwd = min(t_fwd, (time.perf_counter() - t0) / len(slices))

        # stage 4: backward matching + tracking + filters
        trackers = patterns.create_axis_trackers(
            {"xy": 0}, [1], label_divisor, (len(slices), side, side))
        t0 = time.perf_counter()
        patterns.finish_axis(rle_stack, matchers, trackers["xy"],
                             len(slices), 500, 4)
        t_bwd = min(t_bwd, (time.perf_counter() - t0) / len(slices))

    total_ms = (t_decode + t_fwd + t_bwd) * 1e3
    print(json.dumps({
        "side": side,
        "instances_per_slice": round(density, 1),
        "runs_per_slice": round(n_runs, 0),
        "decode_ms_per_slice": round(t_decode * 1e3, 2),
        "forward_match_ms_per_slice": round(t_fwd * 1e3, 2),
        "backward_track_ms_per_slice": round(t_bwd * 1e3, 2),
        "host_total_ms_per_slice": round(total_ms, 2),
        "host_ceiling_slices_per_sec": round(1e3 / total_ms, 1),
        "n_tracked": len(trackers["xy"][0].instances),
    }))


if __name__ == "__main__":
    main()
