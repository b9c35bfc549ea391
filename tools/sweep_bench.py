"""Sweep FusedStackEngine (block_size, pipeline_depth) on the attached
chip with the exact bench.py workload, printing per-config slices/s and a
per-stage latency breakdown (load, dispatch, consume-D2H, match).

Run: PYTHONPATH=. python tools/sweep_bench.py [--blocks 16,32] [--depths 1,2,4]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def build_workload():
    import jax

    from empanada_tpu.models import create_model
    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    N, H, W = 128, 512, 512
    rng = np.random.default_rng(0)
    vol = rng.normal(0.5, 0.1, (N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    for cy, cx, r in [(128, 128, 60), (300, 380, 90), (420, 100, 40)]:
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        vol[:, disk] -= 0.3
    vol = (vol.clip(0, 1) * 255).astype(np.uint8)

    model = create_model("PanopticBiFPNPR", encoder="regnety_6p4gf",
                         num_classes=1, dtype="bfloat16")
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib
    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        variables = model.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)},
            np.zeros((1, 128, 128, 1), np.float32), train=False)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables["params"])
    for key in flat:
        if key[-1] == "bias" and flat[key].shape[-1] == 1:
            if "semantic_head" in key[0] or "semantic_pr" in key[0]:
                flat[key] = flat[key] - 2.5
            elif "ins_center" in key[0]:
                flat[key] = flat[key] - 5.0
    variables = dict(variables)
    variables["params"] = traverse_util.unflatten_dict(flat)

    class _DS:
        def __len__(self):
            return N

        def __getitem__(self, i):
            return {"index": i, "image": vol[i], "size": (H, W)}

    ds = _DS()
    ds.vol = vol
    return model, variables, ds, N


def timed_pass(engine, ds, n_slices, mode):
    from empanada_tpu.inference import patterns

    matchers = patterns.create_matchers([1], 1000, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], 1000, [1])
    t0 = time.perf_counter()
    t_yield = []
    last = t0
    if mode == "resident":
        it = engine.infer_blocks_resident(ds.vol)
    else:
        it = engine.infer_blocks(ds)
    for z_indices, pan_block, packed in it:
        now = time.perf_counter()
        t_yield.append(now - last)
        fm.put_block(z_indices, pan_block, packed)
        last = time.perf_counter()
    out = fm.finish()
    elapsed = time.perf_counter() - t0
    assert len(out) == n_slices
    return elapsed, t_yield


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="16,32")
    ap.add_argument("--depths", default="2")
    ap.add_argument("--modes", default="stream,resident")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from empanada_tpu.inference.fused import FusedStackEngine

    model, variables, ds, n = build_workload()
    configs = [(b, d, m)
               for b in [int(x) for x in args.blocks.split(",")]
               for d in [int(x) for x in args.depths.split(",")]
               for m in args.modes.split(",")]
    engines = {}
    for b, d, m in configs:
        engines[(b, d, m)] = FusedStackEngine(
            model, variables, thing_list=[1], block_size=b,
            label_divisor=1000, median_kernel_size=3,
            padding_factor=128, coarse_boundaries=True,
            max_centers=256, device_norms={"mean": 0.57, "std": 0.12},
            pipeline_depth=d)
        timed_pass(engines[(b, d, m)], ds, n, m)  # warmup/compile
        print(f"warm {b}/{d}/{m}", flush=True)

    # alternate configs per rep so tunnel weather hits all configs alike
    samples = {c: [] for c in configs}
    for rep in range(args.reps):
        for c in configs:
            elapsed, t_yield = timed_pass(engines[c], ds, n, c[2])
            samples[c].append((elapsed, t_yield))
        print(f"rep {rep}: " + " ".join(
            f"{c[0]}/{c[1]}/{c[2]}={n / samples[c][-1][0]:.1f}"
            for c in configs), flush=True)

    results = []
    for c in configs:
        best, t_yield = min(samples[c], key=lambda s: s[0])
        r = {"block": c[0], "depth": c[1], "mode": c[2],
             "slices_per_sec": round(n / best, 2),
             "all": [round(n / e, 1) for e, _ in samples[c]],
             "yield_gaps_ms": [round(t * 1e3, 1) for t in t_yield]}
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["slices_per_sec"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
