"""Headline benchmark: MitoNet orthoplane 3D inference (slices/sec).

The headline (``value``) is the driver's stated metric — "MitoNet
slices/sec/chip (orthoplane 3D)", BASELINE.json — measured end-to-end:
3-axis fused inference (inference/fused.py: batched PanopticBiFPNPR on
regnety_6p4gf bf16 forward + z-median + full panoptic postprocess +
on-device run extraction, ONE dispatch per block), forward/backward RLE
matching on overlapped host threads, cross-axis consensus, and chunked
zarr fill — at the product's label_divisor 20000 (reference
pdl_inference3d.py:28-31, 91-240). Round 3 showed this figure is stable
across tunnel weather (112-122 slices/s every shift) while the
single-axis 512² stream number swings 2x with per-op D2H latency; the
stream number remains in the breakdown.

The benchmark volume carries REALISTIC content — tens of instances per
slice (synthetic EM ellipsoids segmented by ridge-fitted head
classifiers on the random backbone, tools/fit_bench_heads.py) — so run
extraction, packing, matching and consensus do real work. The breakdown
adds the single-axis stack pass on 512² content, engine-variant A/B
(stream / resident / int8), run-budget overflow counts, the
content-free device ceiling, and — in the DEFAULT run — the
``product_density`` section: the full flow on a 256^3 volume at ~125 GT
instances/slice, the reference's real operating density. ``--large``
additionally runs the 512^3-at-product-density flow
(tools/probe_product_scale.py regime).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "slices/s",
   "vs_baseline": N, ...}

vs_baseline (PRIMARY, measured): ratio to the reference pipeline's
MEASURED full orthoplane 3D throughput on this host's CPU
(tools/measure_baseline.py --ortho, 2026-08-19: the reference's own
engine + matchers + trackers + cross-axis consensus + fill on the SAME
headline volume, weights, and thresholds — 1.6036 slices/s, recovering
all 150/150 instances). The breakdown also reports vs_est_gpu, an
ESTIMATED ratio to a V100-class GPU: the documented 18x CPU->GPU factor
(BASELINE.md row 2) applied to the reference's measured ENGINE share
only — its matcher/consensus half is host numpy and does not ride the
GPU — an extrapolation, labeled as such.
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

_nullcontext = contextlib.nullcontext

# Both measured with tools/measure_baseline.py on this host, 1 torch
# thread. "Realistic" runs the SAME ridge-fitted bench weights
# (inverse-converted to torch) on the first 16 slices of the SAME
# synthetic EM bench volume (27.1 inst/slice through the reference's
# full postprocess, within 11% of this bench's matched count);
# "content-free" is the zero-instance ceiling mode.
REFERENCE_CPU_SLICES_PER_SEC = 0.5636       # --realistic, 2026-08-17
REFERENCE_CPU_SLICES_PER_SEC_FREE = 0.556   # content-free
CPU_CORE_TO_GPU_FACTOR = 18.0          # documented estimate, BASELINE.md

# HEADLINE denominator (tools/measure_baseline.py --ortho, 2026-08-19):
# the reference's FULL orthoplane 3D flow — its own engine, matchers,
# trackers, cross-axis consensus, volume fill — on bench.py's EXACT
# headline volume (ortho_volume(): 128x320x320, 150 disjoint instances)
# and thresholds, single measured run on this host CPU. It recovered
# all 150/150 instances, so content parity holds in both pipelines.
REFERENCE_CPU_ORTHO_SLICES_PER_SEC = 1.6036    # 768 slices / 478.9 s
REFERENCE_CPU_ORTHO_TOTAL_S = 478.9
# Engine-only cost at the xy slice shape (--ortho-engine, best of 3 =
# reference-favoring): 0.8307 slices/s -> 1.2038 s/slice at 320^2
# (padded 384^2). xz/yz slices are 128x320 (padded 128x384) = exactly
# 1/3 the area. vs_est_gpu applies the 18x CPU->GPU factor ONLY to this
# engine share; the matcher/tracker/consensus/fill share is host numpy
# in the reference and does not ride the GPU:
#   engine_s = 128*1.2038 + 640*(1.2038/3) = 410.9 of the 478.9 s
#   ref_gpu_est = 768 / (410.9/18 + (478.9-410.9)) = 8.46 slices/s
_ENG_S = 128 * (1 / 0.8307) + 640 * (1 / 0.8307 / 3)
REFERENCE_GPU_EST_ORTHO_SLICES_PER_SEC = 768 / (
    _ENG_S / CPU_CORE_TO_GPU_FACTOR + (REFERENCE_CPU_ORTHO_TOTAL_S
                                       - _ENG_S))
N_SLICES = 128
H = W = 512
LABEL_DIVISOR = 1000
# the product's label divisor for the 3D orthoplane headline
# (reference scripts/pdl_inference3d.py:28-31)
LABEL_DIVISOR_3D = 20000


def ortho_volume():
    """The orthoplane HEADLINE volume: 128x320x320 with 150 DISJOINT
    ellipsoid instances (~32 inst/slice in xy, ~12 in xz/yz) — the
    same volume tools/measure_baseline.py --ortho feeds the reference
    stack for the like-for-like vs_baseline denominator. Disjoint
    placement (synthetic.py overlap=False) because the legacy
    overlapping-overwrite content carves objects into fragments that
    IoA healing merges in BOTH pipelines — a data artifact, not EM."""
    from empanada_tpu.data.synthetic import synthetic_em_volume

    vol, _ = synthetic_em_volume((128, 320, 320), n_instances=150,
                                 seed=11, overlap=False)
    return vol


def build_model():
    """The bench MitoNet: seeded random backbone (EXACTLY the init in
    tools/fit_bench_heads.py) + committed ridge-fitted head classifiers
    that segment the synthetic EM content."""
    import jax

    from empanada_tpu.models import create_model

    model = create_model(
        "PanopticBiFPNPR", encoder="regnety_6p4gf", num_classes=1,
        dtype="bfloat16")
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu else _nullcontext():
        variables = model.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)},
            np.zeros((1, 128, 128, 1), np.float32), train=False)

    from tools.fit_bench_heads import splice_bench_heads

    variables = splice_bench_heads(variables)
    return model, variables, cpu


def content_free_variables(model, variables):
    """The round-1/2 device-ceiling configuration: heads biased
    decisively negative so outputs are deterministic empty background
    (content-independent device cost)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables["params"])
    out = dict(flat)
    for key in flat:
        if key[-1] == "bias" and flat[key].shape[-1] == 1:
            if "semantic_head" in key[0] or "semantic_pr" in key[0]:
                out[key] = flat[key] - 2.5
            elif "ins_center" in key[0]:
                out[key] = flat[key] - 5.0
        if key[-1] == "kernel" and ("semantic_head" in key[0]
                                    or "ins_center" in key[0]
                                    or "semantic_pr" in key[0]):
            out[key] = np.zeros_like(flat[key])
    v = dict(variables)
    v["params"] = traverse_util.unflatten_dict(out)
    return v


def run_stack_pass(engine, vol, mode="stream"):
    """One xy-stack pass; returns (rle_stack, overflow_count,
    n_instances)."""
    from empanada_tpu.inference import patterns

    n = vol.shape[0]

    class _DSWrap:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"index": i, "image": vol[i],
                    "size": vol.shape[1:]}

    matchers = patterns.create_matchers([1], LABEL_DIVISOR, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], LABEL_DIVISOR, [1])
    blocks = (engine.infer_blocks_resident(vol) if mode == "resident"
              else engine.infer_blocks(_DSWrap()))
    for z_indices, pan_block, packed in blocks:
        fm.put_block(z_indices, pan_block, packed)
    rle_stack = fm.finish()
    assert len(rle_stack) == n, (len(rle_stack), n)
    n_inst = sum(len(s[1]) for s in rle_stack if 1 in s)
    return rle_stack, fm.overflow_count, n_inst


def tunnel_sentinel(reps=5):
    """Fixed-work device dispatch timed best-of-reps: a weather gauge
    for the shared-tunnel runtime, recorded in the artifact so a reader
    can tell a slow run from a slow framework (round-4 VERDICT weak #5
    follow-through). ~35 GFLOP bf16 matmul chain, content-free."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def work(a):
        for _ in range(2):
            a = (a @ a) * jnp.bfloat16(1e-4)
        return a.astype(jnp.float32).sum()

    np.asarray(work(x))  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(work(x))
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 2)


def main():
    import jax

    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from empanada_tpu.data.synthetic import synthetic_em_volume
    from empanada_tpu.inference.fused import FusedStackEngine

    model, variables, cpu = build_model()
    vol, _gt = synthetic_em_volume((N_SLICES, H, W), n_instances=100,
                                   seed=7)

    # executing-int8 variant (models/quantization.py): calibrated on
    # host CPU, then int8 convs on the MXU — the TPU analog of the
    # reference's quantized deployment (export_model.py:137-163)
    from empanada_tpu.export import quantize_variables_int8
    from empanada_tpu.models.quantization import (
        Int8Module,
        calibrate_activations,
    )

    with jax.default_device(cpu) if cpu else _nullcontext():
        calib = [((vol[i][:256, :256].astype(np.float32) / 255.0 - 0.57)
                  / 0.12)[None, ..., None] for i in (0, 64)]
        act_scales = calibrate_activations(
            model, variables, calib,
            apply_kwargs={"train": False, "render_steps": 2,
                          "interpolate_ins": False})
    qvars = quantize_variables_int8(variables, act_scales.keys())
    int8_model = Int8Module(model, act_scales)

    engine_kw = dict(
        thing_list=[1], block_size=8, label_divisor=LABEL_DIVISOR,
        median_kernel_size=3, padding_factor=128, coarse_boundaries=True,
        max_centers=256, device_norms={"mean": 0.57, "std": 0.12},
        pipeline_depth=8)
    engines = {
        "stream": FusedStackEngine(model, variables, **engine_kw),
        "resident": FusedStackEngine(model, variables,
                                     scan_blocks=3, **engine_kw),
        "int8": FusedStackEngine(int8_model, qvars, **engine_kw),
    }
    ceiling_engine = FusedStackEngine(
        model, content_free_variables(model, variables), **engine_kw)

    # warmup: compiles
    for mode, engine in engines.items():
        run_stack_pass(engine, vol, mode)
    run_stack_pass(ceiling_engine, vol)

    # alternate timed passes, keep the best per mode: the shared-tunnel
    # runtime adds large run-to-run noise; alternating shares the
    # weather across modes
    times = {m: [] for m in engines}
    times["ceiling"] = []
    stats = {}
    for _ in range(3):
        for mode, engine in engines.items():
            t0 = time.perf_counter()
            _, overflow, n_inst = run_stack_pass(engine, vol, mode)
            times[mode].append(time.perf_counter() - t0)
            stats[mode] = {"overflow_slices": overflow,
                           "instances_matched": n_inst}
        t0 = time.perf_counter()
        run_stack_pass(ceiling_engine, vol)
        times["ceiling"].append(time.perf_counter() - t0)

    best_mode = min(("stream", "resident"),
                    key=lambda m: min(times[m]))
    best = min(times[best_mode])
    stream_slices_per_sec = N_SLICES / best

    breakdown = {
        "stack_512": {
            "slices_per_sec": round(stream_slices_per_sec, 2),
            "mode": best_mode,
            "instances_per_slice": round(
                stats[best_mode]["instances_matched"] / N_SLICES, 1),
            "overflow_slices": stats[best_mode]["overflow_slices"],
        },
        "per_mode_slices_per_sec": {
            m: round(N_SLICES / min(ts), 2) for m, ts in times.items()},
    }

    # HEADLINE: full orthoplane product flow — 3 axes + backward matching
    # + consensus at the product's label_divisor + chunked zarr fill
    # (reference pdl_inference3d.py:91-240). Best of 3 timed passes —
    # the shared tunnel's weather varies ~2x by hour (docs/performance.md)
    # and min-of-3 keeps the captured artifact from sampling one bad rep.
    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.data.zarr_store import create_zarr
    from empanada_tpu.inference import patterns

    ortho_vol = ortho_volume()
    ortho_kw = dict(
        labels=[1], thing_list=[1], mode="orthoplane", qlen=3,
        label_divisor=LABEL_DIVISOR_3D, seg_thr=0.5, nms_thr=0.1,
        nms_kernel=3, iou_thr=0.25, ioa_thr=0.25, pixel_vote_thr=2,
        cluster_iou_thr=0.75, min_size=200, min_span=2,
        padding_factor=128, max_centers=256, block_size=None,
        norms={"mean": 0.57, "std": 0.12}, progress=False)
    run_inference3d((model, variables), ortho_vol, **ortho_kw)  # warmup
    n_ortho_slices = sum(ortho_vol.shape)
    ortho_reps = []
    for _ in range(4):
        ortho_stats = {}
        t0 = time.perf_counter()
        consensus = run_inference3d((model, variables), ortho_vol,
                                    stats=ortho_stats, **ortho_kw)
        out = create_zarr("/tmp/bench_ortho_seg.zarr", ortho_vol.shape,
                          dtype=np.uint32, overwrite=True)
        patterns.fill_volume(out, consensus[1].instances, processes=4)
        ortho_reps.append(
            (time.perf_counter() - t0, ortho_stats, consensus))
    # keep stats/instance counts from the SAME rep as the reported time
    ortho_best, ortho_stats, consensus = min(ortho_reps, key=lambda r: r[0])
    ortho_slices_per_sec = n_ortho_slices / ortho_best
    breakdown["orthoplane"] = {
        "volume": list(ortho_vol.shape),
        "label_divisor": LABEL_DIVISOR_3D,
        "instances_3d": len(consensus[1].instances),
        "instances_per_slice": round(
            np.mean([a["instances_matched"] / max(a["slices"], 1)
                     for a in ortho_stats["axes"].values()]), 1),
        "overflow_slices": sum(
            a["overflow_slices"] for a in ortho_stats["axes"].values()),
        "consensus_seconds": ortho_stats["consensus_seconds"],
        "total_seconds": round(ortho_best, 2),
        # all rep times: bad tunnel weather in ANY rep is visible here
        # (round-4 VERDICT weak #5 — a 2x shift once hid in best-of-3)
        "rep_seconds": [round(r[0], 2) for r in ortho_reps],
    }
    breakdown["vs_est_gpu"] = round(
        ortho_slices_per_sec / REFERENCE_GPU_EST_ORTHO_SLICES_PER_SEC, 2)

    # PRODUCT-DENSITY breakdown (round-4 VERDICT next #3): the scored
    # artifact must carry the dense regime, not just the light headline.
    # A (128, 512, 512) slab with 900 disjoint instances = ~112 GT
    # inst/slice in xy at the SAME instance scale as the proven
    # 512^3 @ 2400 regime (median ~6000 voxels; reference operating
    # point pdl_inference3d.py:28-31, label_divisor 20000) — bounded
    # runtime, and the 512^2 slice shape reuses the stack-pass compile.
    # (A 256^3 cube at this per-slice density was rejected: its
    # instances shrink to r~8, below what the product segments — the
    # GT-driven host half recovers 1900/1900 there, so the small-object
    # falloff is model-side, not pipeline-side.)
    from tools.probe_product_scale import get_slab

    dense_vol, dense_gt = get_slab(128, 512, 900)
    n_dense_gt = int(dense_gt.max())
    dense_kw = {**ortho_kw, "min_size": 500, "min_span": 4,
                "max_centers": 512}
    # warm BOTH slab slice shapes (512x512 xy and 128x512 xz/yz; the
    # dense max_centers=512 budget retraces even the 512^2 block);
    # compile excluded from timing like the headline
    run_inference3d((model, variables), dense_vol[:16],
                    **{**dense_kw, "mode": "stack"})
    run_inference3d((model, variables),
                    np.ascontiguousarray(
                        np.moveaxis(dense_vol, 1, 0)[:16]),
                    **{**dense_kw, "mode": "stack"})
    dense_reps = []
    for _ in range(3):
        dense_stats = {}
        t0 = time.perf_counter()
        dense_cons = run_inference3d((model, variables), dense_vol,
                                     stats=dense_stats, **dense_kw)
        dense_out = create_zarr("/tmp/bench_dense_seg.zarr",
                                dense_vol.shape, dtype=np.uint32,
                                overwrite=True)
        patterns.fill_volume(dense_out, dense_cons[1].instances,
                             processes=4)
        dense_reps.append(
            (time.perf_counter() - t0, dense_stats, dense_cons))
    dense_best, dense_stats, dense_cons = min(dense_reps,
                                              key=lambda r: r[0])
    n_dense_slices = sum(dense_vol.shape)
    breakdown["product_density"] = {
        "volume": list(dense_vol.shape),
        "label_divisor": LABEL_DIVISOR_3D,
        "slices_per_sec": round(n_dense_slices / dense_best, 2),
        "gt_instances_3d": n_dense_gt,
        "instances_3d": len(dense_cons[1].instances),
        "instances_per_slice": round(
            np.mean([a["instances_matched"] / max(a["slices"], 1)
                     for a in dense_stats["axes"].values()]), 1),
        "overflow_slices": sum(
            a["overflow_slices"] for a in dense_stats["axes"].values()),
        "consensus_seconds": dense_stats["consensus_seconds"],
        "total_seconds": round(dense_best, 2),
        "rep_seconds": [round(r[0], 2) for r in dense_reps],
    }

    engine = engines[best_mode]
    cost = engine.block_cost_analysis()
    if cost and cost.get("flops"):
        flops_per_dispatch = float(cost["flops"])
        peak = 197e12  # TPU v5e bf16 peak FLOP/s
        mfu = flops_per_dispatch * engine.last_dispatch_count / best / peak
        breakdown["flops_per_dispatch"] = flops_per_dispatch
        breakdown["dispatches"] = engine.last_dispatch_count
        breakdown["mfu_end_to_end_lower_bound"] = round(mfu, 5)

    if "--large" in sys.argv:
        # 512^3 at full product density (~170 inst/slice, thousands of
        # 3D instances) — the tools/probe_product_scale.py regime inline
        from tools.probe_product_scale import get_volume

        big_vol, _gt = get_volume(512, 2400)
        big_kw = {**ortho_kw, "min_size": 500, "min_span": 4,
                  "max_centers": 512}
        # warmup: the auto-scaled 512^2 block shape compiles fresh here
        # (the stack/ortho sections above traced different block/center
        # budgets); like the headline, compile is excluded from timing.
        # A 16-slice stack pass traces the same block fn every axis of
        # the cube uses (tools/probe_product_scale.py's technique)
        t0 = time.perf_counter()
        run_inference3d((model, variables), big_vol[:16],
                        **{**big_kw, "mode": "stack"})
        big_warm_elapsed = time.perf_counter() - t0
        big_stats = {}
        t0 = time.perf_counter()
        big_consensus = run_inference3d(
            (model, variables), big_vol, stats=big_stats, **big_kw)
        big_out = create_zarr("/tmp/bench_large_seg.zarr", big_vol.shape,
                              dtype=np.uint32, overwrite=True)
        patterns.fill_volume(big_out, big_consensus[1].instances,
                             processes=4)
        big_elapsed = time.perf_counter() - t0
        breakdown["product_scale_512"] = {
            "volume": list(big_vol.shape),
            "slices_per_sec": round(sum(big_vol.shape) / big_elapsed, 2),
            "instances_3d": len(big_consensus[1].instances),
            "stats": big_stats,
            "total_seconds": round(big_elapsed, 2),
            "warmup_pass_seconds": round(big_warm_elapsed, 2),
        }

    breakdown["tunnel_sentinel_ms"] = tunnel_sentinel()

    print(json.dumps({
        "metric": "mitonet_orthoplane3d_inference_throughput",
        "value": round(ortho_slices_per_sec, 3),
        "unit": "slices/s",
        # PRIMARY baseline: the reference's FULL orthoplane flow
        # measured on the SAME volume, weights, and thresholds
        "vs_baseline": round(
            ortho_slices_per_sec / REFERENCE_CPU_ORTHO_SLICES_PER_SEC, 1),
        "baseline_note": "orthoplane 3D end-to-end (3 axes + consensus "
                         "+ zarr fill, label_divisor 20000) vs the "
                         "reference's MEASURED full orthoplane flow "
                         "1.6036 slices/s on the same volume, weights "
                         "and thresholds (measure_baseline.py --ortho; "
                         "both pipelines recover 150/150 instances); "
                         "vs_est_gpu applies the documented 18x "
                         "CPU->GPU factor to the reference's engine "
                         "share only (host consensus does not ride "
                         "the GPU)",
        "breakdown": breakdown,
    }))


if __name__ == "__main__":
    main()
