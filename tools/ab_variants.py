"""Same-process A/B of trace-time engine variants on the attached chip.

Alternates the bench.py stream workload across variants — baseline,
space-to-depth stem (EMPANADA_S2D_STEM), approximate PointRend top-k
(EMPANADA_APPROX_TOPK), both, and int8 — within ONE process so tunnel
weather is shared (never compare absolute numbers across processes:
docs/performance.md). Env gates are part of the block-fn cache key
(fused.FusedStackEngine._trace_key), so each variant gets its own
compiled executable.

Also asserts output parity for the s2d-stem variant (bit-level vs
baseline up to float tolerance -> compares matched instance counts) and
reports the instance-count delta for approx top-k.

Run: PYTHONPATH=. python tools/ab_variants.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import (
        LABEL_DIVISOR,
        N_SLICES,
        build_model,
        run_stack_pass,
    )
    from empanada_tpu.data.synthetic import synthetic_em_volume
    from empanada_tpu.inference.fused import FusedStackEngine

    model, variables, cpu = build_model()
    # EMPANADA_AB_SLICES/SIDE: shrink the workload for CPU smoke tests
    # of the variant construction paths (the device A/B uses defaults)
    n_slices = int(os.environ.get("EMPANADA_AB_SLICES", N_SLICES))
    side = int(os.environ.get("EMPANADA_AB_SIDE", 512))
    vol, _gt = synthetic_em_volume((n_slices, side, side),
                                   n_instances=100, seed=7)

    # int8 variants: full-model PTQ (bench.py's int8 mode) and
    # ENCODER-ONLY PTQ — the encoder is the ~17 ms half of the block and
    # is where the MXU's 2x int8 rate could bite without perturbing the
    # PointRend/postprocess numerics (VERDICT r3 item 4)
    import contextlib

    import jax

    from empanada_tpu.export import quantize_variables_int8
    from empanada_tpu.models.quantization import (
        Int8Module,
        calibrate_activations,
    )

    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        calib = [((vol[i][:256, :256].astype(np.float32) / 255.0 - 0.57)
                  / 0.12)[None, ..., None]
                 for i in (0, min(64, n_slices - 1))]
        act_scales = calibrate_activations(
            model, variables, calib,
            apply_kwargs={"train": False, "render_steps": 2,
                          "interpolate_ins": False})
    enc_scales = {k: v for k, v in act_scales.items()
                  if k.startswith("encoder_mod")}
    int8_pairs = {
        "int8": (Int8Module(model, act_scales),
                 quantize_variables_int8(variables, act_scales.keys())),
        "int8_enc": (Int8Module(model, enc_scales),
                     quantize_variables_int8(variables, enc_scales.keys())),
    }

    engine_kw = dict(
        thing_list=[1], block_size=8, label_divisor=LABEL_DIVISOR,
        median_kernel_size=3, padding_factor=128, coarse_boundaries=True,
        max_centers=256, device_norms={"mean": 0.57, "std": 0.12},
        pipeline_depth=8)

    # (env gates, engine_kw overrides, run mode). "resident1" is the
    # scan-free device-resident path: volume uploaded once to HBM,
    # dispatch-per-block (lax.scan length 1 — no cross-block barrier),
    # zero per-block image H2D (VERDICT r3 weak #5).
    # NOTE: approx top-k became the TPU DEFAULT (point_rend.py), so
    # "baseline" already includes it; "exact_topk" toggles it OFF.
    # "sentinel" is configured IDENTICALLY to baseline — its spread vs
    # baseline in any report IS the run's noise floor; treat variant
    # deltas below that spread as unresolved (the 2026-08-19 session
    # measured a same-config spread of ~10% through the shared tunnel).
    variants = {
        "baseline": ({}, {}, "stream"),
        "sentinel": ({}, {}, "stream"),
        "s2d_stem": ({"EMPANADA_S2D_STEM": "1"}, {}, "stream"),
        "exact_topk": ({"EMPANADA_APPROX_TOPK": "0"}, {}, "stream"),
        "s2d+exact": ({"EMPANADA_S2D_STEM": "1",
                       "EMPANADA_APPROX_TOPK": "0"}, {}, "stream"),
        "resident1": ({}, {"scan_blocks": 1}, "resident"),
        # packed-run D2H grouped 4 blocks/transfer: answers whether the
        # tunnel serializes the already-async per-block copies (if so,
        # grouping divides the op count and wins in high-latency weather)
        "d2h4": ({}, {"d2h_group": 4}, "stream"),
        "int8": ({}, {}, "stream"),
        "int8_enc": ({}, {}, "stream"),
    }
    gate_vars = ("EMPANADA_S2D_STEM", "EMPANADA_APPROX_TOPK")

    # EMPANADA_AB_VARIANTS=baseline,sentinel,s2d_stem runs a focused
    # subset — long sentinel-calibrated sessions on one question need
    # many reps, and skipping the other variants keeps every rep inside
    # the same weather window
    subset = os.environ.get("EMPANADA_AB_VARIANTS")
    if subset:
        keep = [v.strip() for v in subset.split(",") if v.strip()]
        unknown = sorted(set(keep) - set(variants))
        if unknown:
            raise SystemExit(f"unknown variants: {unknown}")
        if "baseline" not in keep:
            keep.insert(0, "baseline")
        variants = {k: variants[k] for k in keep}

    engines = {}
    for name, (env, kw, _mode) in variants.items():
        for v in gate_vars:
            os.environ.pop(v, None)
        os.environ.update(env)
        mod, var = int8_pairs.get(name, (model, variables))
        engines[name] = FusedStackEngine(mod, var,
                                         **{**engine_kw, **kw})
        # trace + compile under this env (env is read at trace time)
        run_stack_pass(engines[name], vol, variants[name][2])
    for v in gate_vars:
        os.environ.pop(v, None)

    times = {name: [] for name in variants}
    counts = {}
    for _ in range(reps):
        for name, engine in engines.items():
            env, _kw, mode = variants[name]
            for v in gate_vars:
                os.environ.pop(v, None)
            os.environ.update(env)
            t0 = time.perf_counter()
            _, overflow, n_inst = run_stack_pass(engine, vol, mode)
            times[name].append(time.perf_counter() - t0)
            counts[name] = n_inst
    for v in gate_vars:
        os.environ.pop(v, None)

    base = counts["baseline"]
    print(json.dumps({
        "slices_per_sec": {
            name: round(n_slices / min(ts), 2)
            for name, ts in times.items()},
        "slices_per_sec_median": {
            name: round(n_slices / float(np.median(ts)), 2)
            for name, ts in times.items()},
        "instances_matched": counts,
        "instance_count_rel_delta": {
            name: round(abs(c - base) / max(base, 1), 4)
            for name, c in counts.items()},
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
