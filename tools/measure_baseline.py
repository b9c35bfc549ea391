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


def main():
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
