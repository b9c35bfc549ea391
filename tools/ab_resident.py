"""Same-process A/B: streaming vs device-resident at scan_blocks 1/3/8.

Round-2 left the resident path's loss to streaming unexplained
("weather-dependent"); the structural suspect is that lax.scan over
scan_blocks serializes block compute INSIDE one dispatch, so D2H of
group k can't overlap compute of group k+1 the way the streaming path's
pipeline_depth deque does. Alternating all configs within one process
holds the tunnel weather constant and settles it.

Run from the repo root on the TPU: python tools/ab_resident.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from bench import LABEL_DIVISOR, N_SLICES, build_model, run_stack_pass
    from empanada_tpu.data.synthetic import synthetic_em_volume
    from empanada_tpu.inference.fused import FusedStackEngine
    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model, variables, _cpu = build_model()
    vol, _ = synthetic_em_volume((N_SLICES, 512, 512), n_instances=100,
                                 seed=7)

    kw = dict(thing_list=[1], block_size=8, label_divisor=LABEL_DIVISOR,
              median_kernel_size=3, padding_factor=128,
              coarse_boundaries=True, max_centers=256,
              device_norms={"mean": 0.57, "std": 0.12}, pipeline_depth=8)
    engines = {
        "stream": (FusedStackEngine(model, variables, **kw), "stream"),
        "res_scan1": (FusedStackEngine(model, variables, scan_blocks=1,
                                       **kw), "resident"),
        "res_scan3": (FusedStackEngine(model, variables, scan_blocks=3,
                                       **kw), "resident"),
        "res_scan8": (FusedStackEngine(model, variables, scan_blocks=8,
                                       **kw), "resident"),
    }
    for name, (engine, mode) in engines.items():
        t0 = time.perf_counter()
        run_stack_pass(engine, vol, mode)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s (compile)",
              flush=True)

    times = {n: [] for n in engines}
    for rep in range(4):
        for name, (engine, mode) in engines.items():
            t0 = time.perf_counter()
            run_stack_pass(engine, vol, mode)
            times[name].append(time.perf_counter() - t0)
        print(f"rep {rep}: " + "  ".join(
            f"{n}={N_SLICES / times[n][-1]:.1f}" for n in engines),
            flush=True)

    print("\nbest slices/s per config (same process, alternated):")
    for name, ts in times.items():
        print(f"  {name:10s} {N_SLICES / min(ts):7.1f}")


if __name__ == "__main__":
    main()
