"""Measure the reference pipeline's throughput on this host CPU.

Runs the ACTUAL reference implementation (/root/reference, imported, not
copied): MitoNet-class PanopticBiFPNPR (regnety_6p4gf) through the
reference's own PanopticDeepLabRenderEngine3d (forward + median queue +
center NMS + pixel grouping + panoptic merge) per 512x512 slice, exactly
the per-slice work of scripts/pdl_inference3d.py.

This is the measured anchor behind bench.py's vs_baseline denominator —
see BASELINE.md "Measured reference throughput" for the CPU->GPU
extrapolation chain.

Run: python tools/measure_baseline.py [n_slices]
     python tools/measure_baseline.py [n_slices] --realistic
     python tools/measure_baseline.py --ortho

--ortho: the like-for-like denominator for bench.py's orthoplane
HEADLINE — the reference's FULL orthoplane 3D flow (3 axes through its
own engine + matchers + trackers + cross-axis consensus + volume fill,
tools/reference_pipeline.py replaying scripts/pdl_inference3d.py:91-240)
with the realistic bench weights on bench.py's exact orthoplane volume
and thresholds. This includes the reference's host matcher/consensus
cost, unlike --realistic which is engine-only (conservative).

--realistic (round-2 VERDICT weak #5): instead of the content-free
negative-bias heads, load the SAME ridge-fitted bench weights bench.py
uses (tools/fit_bench_heads.py), inverse-converted to torch
(train/torch_weights.convert_flax_to_torch_state_dict), and run on the
same synthetic EM volume — so the reference pays its full per-slice
postprocess on ~30 instances/slice, exactly like the TPU side's
realistic-content headline.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np
import torch

torch.set_grad_enabled(False)

from empanada.inference.engines import (  # noqa: E402
    PanopticDeepLabRenderEngine3d,
)
from empanada.models.quantization.panoptic_bifpn import (  # noqa: E402
    QuantizablePanopticBiFPNPR,
)


def _load_bench_weights(model):
    """Fill the reference torch model with bench.py's ridge-fitted flax
    weights via the structural inverse converter."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import build_model

    from empanada_tpu.train.torch_weights import (
        convert_flax_to_torch_state_dict,
    )

    _module, variables, _cpu = build_model()
    sd, report = convert_flax_to_torch_state_dict(
        model.state_dict(), variables["params"],
        variables.get("batch_stats", {}))
    assert not report["leftover"], report["leftover"]
    model.load_state_dict(sd, strict=True)


def run_ortho():
    """Reference orthoplane 3D end-to-end on bench.py's exact headline
    volume + thresholds (see module docstring)."""
    from bench import LABEL_DIVISOR_3D, ortho_volume

    from tools.reference_pipeline import (
        fill_reference_consensus,
        run_reference_inference3d,
    )

    model = QuantizablePanopticBiFPNPR(
        encoder="regnety_6p4gf", num_classes=1, quantize=False)
    model.eval()
    _load_bench_weights(model)

    vol = ortho_volume()
    n_slices = sum(vol.shape)

    t0 = time.perf_counter()
    consensus = run_reference_inference3d(
        model, vol, labels=[1], thing_list=[1], mode="orthoplane",
        qlen=3, label_divisor=LABEL_DIVISOR_3D, seg_thr=0.5, nms_thr=0.1,
        nms_kernel=3, iou_thr=0.25, ioa_thr=0.25, pixel_vote_thr=2,
        cluster_iou_thr=0.75, min_size=200, min_span=2,
        padding_factor=128, norms={"mean": 0.57, "std": 0.12},
        progress=True)
    fill_reference_consensus(consensus[1], vol.shape)
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "metric": "reference_cpu_orthoplane3d_throughput",
        "value": round(n_slices / elapsed, 4),
        "unit": "slices/s",
        "n_slices": n_slices,
        "volume": list(vol.shape),
        "instances_3d": len(consensus[1].instances),
        "total_seconds": round(elapsed, 1),
        "torch_threads": torch.get_num_threads(),
        "host_cpus": __import__("os").cpu_count(),
    }))


def run_ortho_engine(n_slices=48):
    """Engine-only per-slice cost at the ortho slice shape (xy slices of
    the headline volume): the GPU-accelerable share of the reference's
    orthoplane flow. vs_est_gpu divides ONLY this share by the CPU->GPU
    factor; matcher/tracker/consensus stay host-side numpy either way."""
    from bench import ortho_volume

    model = QuantizablePanopticBiFPNPR(
        encoder="regnety_6p4gf", num_classes=1, quantize=False)
    model.eval()
    _load_bench_weights(model)

    engine = PanopticDeepLabRenderEngine3d(
        model, thing_list=[1], label_divisor=20000, stuff_area=64,
        median_kernel_size=3, nms_kernel=3, padding_factor=128,
        coarse_boundaries=True)

    vol = ortho_volume()
    H, W = vol.shape[1:]
    sl = ((vol[:n_slices].astype(np.float32) / 255.0 - 0.57) / 0.12)
    engine(torch.from_numpy(sl[0])[None, None], (H, W))  # warmup

    t0 = time.perf_counter()
    count = 0
    for z in range(n_slices):
        pan = engine(torch.from_numpy(sl[z])[None, None], (H, W))
        count += pan is not None
    for pan in engine.end():
        count += 1
    elapsed = time.perf_counter() - t0
    assert count == n_slices

    print(json.dumps({
        "metric": "reference_cpu_ortho_engine_only_throughput",
        "value": round(n_slices / elapsed, 4),
        "unit": "slices/s",
        "n_slices": n_slices,
        "slice_shape": [int(H), int(W)],
        "torch_threads": torch.get_num_threads(),
    }))


def main():
    if "--ortho" in sys.argv:
        run_ortho()
        return
    if "--ortho-engine" in sys.argv:
        run_ortho_engine()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    realistic = "--realistic" in sys.argv
    n_slices = int(args[0]) if args else 6
    H = W = 512

    # the deployed fp32 model family (scripts/export_model.py:113 builds
    # Quantizable* with quantize=False and torchscripts it)
    model = QuantizablePanopticBiFPNPR(
        encoder="regnety_6p4gf", num_classes=1, quantize=False)
    model.eval()

    if realistic:
        _load_bench_weights(model)
    else:
        # decisively-biased heads, mirroring bench.py's content-free
        # ceiling mode: deterministic sparse foreground so postprocess
        # cost is content-independent
        with torch.no_grad():
            for name, mod in model.named_modules():
                if hasattr(mod, "bias") and mod.bias is not None \
                        and getattr(mod.bias, "shape", (0,))[0] == 1:
                    if "semantic" in name or "sem" in name:
                        mod.bias -= 2.5
                    elif "ins_center" in name:
                        mod.bias -= 5.0

    engine = PanopticDeepLabRenderEngine3d(
        model, thing_list=[1], label_divisor=1000, stuff_area=64,
        median_kernel_size=3, nms_kernel=7, padding_factor=128,
        coarse_boundaries=True)

    if realistic:
        # bench.py's exact content + normalization (device_norms there).
        # Generate the FULL bench volume and take the first n_slices:
        # generating an (n_slices, H, W) volume with the same
        # n_instances packs ~100 instances into few slices — 2x the
        # bench's per-slice density — which was the round-3 "62 vs 30.5
        # instances/slice" divergence (same weights, different content)
        from bench import H as BH
        from bench import N_SLICES as BN
        from bench import W as BW
        from empanada_tpu.data.synthetic import synthetic_em_volume

        assert (H, W) == (BH, BW)
        vol_u8, _gt = synthetic_em_volume((BN, BH, BW),
                                          n_instances=100, seed=7)
        vol = ((vol_u8[:n_slices].astype(np.float32) / 255.0 - 0.57)
               / 0.12)
    else:
        rng = np.random.default_rng(0)
        vol = rng.normal(0.5, 0.1, (n_slices, H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W]
        for cy, cx, r in [(128, 128, 60), (300, 380, 90), (420, 100, 40)]:
            disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            vol[:, disk] -= 0.3

    # warmup one slice (allocations, conv algo selection)
    image = torch.from_numpy(vol[0])[None, None]
    engine(image, (H, W))

    t0 = time.perf_counter()
    count = 0
    instances = 0
    for z in range(n_slices):
        image = torch.from_numpy(vol[z])[None, None]
        pan = engine(image, (H, W))
        if pan is not None:
            count += 1
            p = np.asarray(pan.squeeze())
            instances += len(np.unique(p[p > 0]))
    for pan in engine.end():
        count += 1
        p = np.asarray(pan.squeeze())
        instances += len(np.unique(p[p > 0]))
    elapsed = time.perf_counter() - t0
    assert count == n_slices, (count, n_slices)

    result = {
        "metric": "reference_cpu_slice_throughput",
        "value": round(n_slices / elapsed, 4),
        "unit": "slices/s",
        "n_slices": n_slices,
        "content": "realistic" if realistic else "content-free",
        "instances_per_slice": round(instances / max(count, 1), 1),
        "torch_threads": torch.get_num_threads(),
        "host_cpus": __import__("os").cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
