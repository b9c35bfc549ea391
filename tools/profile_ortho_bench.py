"""One-off: profile the bench.py orthoplane headline config phase by phase.

Runs the exact bench ortho flow (warmup + 2 timed passes) with
progress=True so per-axis forward seconds print, and dumps the full
stats dict including consensus seconds and fill seconds.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import build_model, LABEL_DIVISOR_3D
from empanada_tpu.data.synthetic import synthetic_em_volume
from empanada_tpu.cli.infer3d import run_inference3d
from empanada_tpu.data.zarr_store import create_zarr
from empanada_tpu.inference import patterns
from empanada_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

model, variables, _cpu = build_model()
ortho_vol, _ = synthetic_em_volume((128, 320, 320), n_instances=94, seed=11)
ortho_kw = dict(
    labels=[1], thing_list=[1], mode="orthoplane", qlen=3,
    label_divisor=LABEL_DIVISOR_3D, seg_thr=0.5, nms_thr=0.1,
    nms_kernel=3, iou_thr=0.25, ioa_thr=0.25, pixel_vote_thr=2,
    cluster_iou_thr=0.75, min_size=200, min_span=2,
    padding_factor=128, max_centers=256, block_size=None,
    norms={"mean": 0.57, "std": 0.12}, progress=True)

t0 = time.perf_counter()
run_inference3d((model, variables), ortho_vol, **ortho_kw)  # warmup
print(f"warmup total {time.perf_counter() - t0:.2f}s", file=sys.stderr)

for rep in range(2):
    stats = {}
    t0 = time.perf_counter()
    consensus = run_inference3d((model, variables), ortho_vol,
                                stats=stats, **ortho_kw)
    t_inf = time.perf_counter() - t0
    out = create_zarr("/tmp/bench_ortho_seg.zarr", ortho_vol.shape,
                      dtype=np.uint32, overwrite=True)
    t1 = time.perf_counter()
    patterns.fill_volume(out, consensus[1].instances, processes=4)
    t_fill = time.perf_counter() - t1
    print(json.dumps({"rep": rep, "infer_consensus_s": round(t_inf, 2),
                      "zarr_create_fill_s": round(t_fill, 2),
                      "stats": stats,
                      "instances_3d": len(consensus[1].instances)}))
