"""Measure int8-vs-fp32 matched-instance drift at PRODUCT density with
the round-5 deployment default (encoder-only scope, grouped convs
excluded — export.py quantize_scope).

Round 4 measured 5-8% matched-instance drift for FULL-TREE int8 at
realistic density (docs/performance.md); round-4 VERDICT next #7 asks
for drift <= 2% or a loud gate. The gate is wired (infer3d --quantized
prints the descriptor's measured drift); this probe measures whether
the new default scope also CLOSES the drift. Run on the TPU:
python tools/probe_int8_drift_dense.py [n_slices]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def run(engine, vol, n):
    from empanada_tpu.inference import patterns

    class DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"index": i, "image": vol[i], "size": vol.shape[1:]}

    matchers = patterns.create_matchers([1], 20000, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], 20000, [1])
    for zi, pb, pk in engine.infer_blocks(DS()):
        fm.put_block(zi, pb, pk)
    stack = fm.finish()
    per_slice = [len(s[1]) for s in stack if 1 in s]
    return sum(per_slice), per_slice


def main():
    import contextlib

    import jax

    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import build_model
    from empanada_tpu.export import quantize_variables_int8
    from empanada_tpu.inference.fused import FusedStackEngine
    from empanada_tpu.models.quantization import (
        Int8Module,
        calibrate_activations,
    )
    from tools.probe_product_scale import get_slab

    model, variables, cpu = build_model()
    vol, _gt = get_slab(128, 512, 900)

    ctx = jax.default_device(cpu) if cpu else contextlib.nullcontext()
    with ctx:
        calib = [((vol[i][:256, :256].astype(np.float32) / 255.0 - 0.57)
                  / 0.12)[None, ..., None] for i in (0, 64)]
        act_scales = calibrate_activations(
            model, variables, calib,
            apply_kwargs={"train": False, "render_steps": 2,
                          "interpolate_ins": False})
    # deployment default for BiFPN-family artifacts: ENCODER-ONLY
    # (export.py quantize_scope; reference quantization/panoptic_bifpn
    # .py:36-57)
    enc_scales = {k: v for k, v in act_scales.items()
                  if k.split("/")[0].startswith("encoder")}
    qvars = quantize_variables_int8(variables, enc_scales.keys())

    kw = dict(thing_list=[1], block_size=8, label_divisor=20000,
              median_kernel_size=3, padding_factor=128,
              coarse_boundaries=True, max_centers=512,
              device_norms={"mean": 0.57, "std": 0.12}, pipeline_depth=8)
    eng_fp = FusedStackEngine(model, variables, **kw)
    eng_q = FusedStackEngine(Int8Module(model, enc_scales), qvars, **kw)

    run(eng_fp, vol, 16)  # warm
    run(eng_q, vol, 16)
    t0 = time.perf_counter()
    n_fp, ps_fp = run(eng_fp, vol, N)
    t_fp = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_q, ps_q = run(eng_q, vol, N)
    t_q = time.perf_counter() - t0

    drift = abs(n_q - n_fp) / max(n_fp, 1)
    per_slice_drift = float(np.mean(
        [abs(a - b) / max(a, 1) for a, b in zip(ps_fp, ps_q)]))
    import json

    print(json.dumps({
        "metric": "int8_dense_drift_encoder_scope",
        "slices": N,
        "instances_fp32": n_fp,
        "instances_int8": n_q,
        "count_drift": round(drift, 4),
        "mean_per_slice_drift": round(per_slice_drift, 4),
        "fp32_slices_per_sec": round(N / t_fp, 2),
        "int8_slices_per_sec": round(N / t_q, 2),
    }))


if __name__ == "__main__":
    main()
