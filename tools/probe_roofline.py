"""Per-op forward roofline attribution of the fused block dispatch.

Round-2 left stage-level attribution (encoder ~17ms / fpn+heads ~3ms /
render ~17ms per 8x512^2 block) but no per-op table showing each major
op against its memory/compute bound. This captures a jax.profiler device
trace of the block function on the real TPU and reports the top ops by
self-time, with bytes/flops context where the HLO cost model provides
it.

Run on the TPU: PYTHONPATH=. python tools/probe_roofline.py [H W]
(default 512 512 — pass e.g. 320 320 to attribute the orthoplane
slice shape). Falls back to a stage-split timing table if device
tracing is unavailable through the tunnel.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import glob
import gzip
import json
import os
import sys
import time

import numpy as np

TRACE_DIR = "/tmp/roofline_trace"
H = int(sys.argv[1]) if len(sys.argv) > 2 else 512
W = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def build_block_fn():
    import jax

    from empanada_tpu.inference.fused import FusedStackEngine
    from empanada_tpu.models import create_model
    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    model = create_model("PanopticBiFPNPR", encoder="regnety_6p4gf",
                         num_classes=1, dtype="bfloat16")
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu else None:
        variables = model.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)},
            np.zeros((1, 128, 128, 1), np.float32), train=False)
    engine = FusedStackEngine(
        model, variables, thing_list=[1], block_size=8,
        label_divisor=1000, median_kernel_size=3, padding_factor=128,
        coarse_boundaries=True, max_centers=256,
        device_norms={"mean": 0.57, "std": 0.12})
    return engine


def capture(engine):
    import jax

    rng = np.random.default_rng(0)
    vol = (rng.normal(0.5, 0.1, (24, H, W)).clip(0, 1)
           * 255).astype(np.uint8)

    class DS:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"index": i, "image": vol[i], "size": (H, W)}

    # warmup/compile
    for _ in engine.infer_blocks(DS()):
        pass

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        t0 = time.perf_counter()
        for _ in engine.infer_blocks(DS()):
            pass
        wall = time.perf_counter() - t0
    print(f"traced pass: {wall * 1e3:.1f} ms for 24 slices "
          f"({24 / wall:.1f} slices/s)")


def parse_chrome_trace():
    """Fallback parser: per-op device time straight from the chrome
    trace json the profiler also writes (no tensorflow/protobuf deps —
    the plugin converter needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=
    python and a matching pywrap build, neither guaranteed here)."""
    import collections
    import gzip

    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no chrome trace found")
        return False
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            dur[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
            total += e["dur"]
    print(f"[chrome trace] total device-op time: {total / 1e3:.1f} ms "
          f"over {sum(cnt.values())} events  ({path})")
    for name, d in dur.most_common(40):
        print(f"{d / 1e3:9.2f} ms  x{cnt[name]:4d}  {name[:100]}")
    return True


def parse_trace():
    """Summarize per-op self time from the captured xplane protobuf via
    tensorboard_plugin_profile's converter."""
    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane capture found (tunnel profiling unavailable)")
        return False
    path = max(paths, key=os.path.getmtime)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        print(f"plugin-profile unavailable ({e}); raw file: {path}")
        return False
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [path], "op_profile", {})
    except Exception as e:
        print(f"op_profile conversion failed: {e}")
        return False
    prof = json.loads(data) if isinstance(data, (str, bytes)) else data
    out = os.path.join(TRACE_DIR, "op_profile.json")
    with open(out, "w") as f:
        json.dump(prof, f)
    print(f"op profile written to {out}")

    def walk(node, depth=0, rows=None):
        rows = rows if rows is not None else []
        m = node.get("metrics", {})
        name = node.get("name", "?")
        if m and depth >= 2:
            rows.append((name, m.get("time", 0.0), m.get("flops", 0.0),
                         m.get("memoryBandwidth", 0.0)))
        for ch in node.get("children", []):
            walk(ch, depth + 1, rows)
        return rows

    root = prof.get("byProgram") or prof.get("byCategory") or {}
    rows = walk(root)
    rows.sort(key=lambda r: -r[1])
    print(f"{'op':60s} {'time%':>7s} {'flops%':>7s} {'mem bw':>8s}")
    for name, t, fl, bw in rows[:30]:
        print(f"{name[:60]:60s} {t * 100:7.2f} {fl * 100:7.2f} {bw:8.2f}")
    return True


if __name__ == "__main__":
    engine = build_block_fn()
    capture(engine)
    if not parse_trace():
        parse_chrome_trace()
