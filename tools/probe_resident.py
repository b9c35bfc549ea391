"""Why is the resident path slower than streaming? Stage-isolated timing:
(a) producer loop only (block on last packed), (b) D2H consume per packed
after all ready, (c) full pass with matcher. Run on the axon TPU:
python tools/probe_resident.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax

    from tools.sweep_bench import build_workload
    from empanada_tpu.inference.fused import FusedStackEngine
    from empanada_tpu.inference import patterns

    model, variables, ds, n = build_workload()

    def make(mode):
        return FusedStackEngine(
            model, variables, thing_list=[1], block_size=16,
            label_divisor=1000, median_kernel_size=3, padding_factor=128,
            coarse_boundaries=True, max_centers=256,
            device_norms={"mean": 0.57, "std": 0.12}, pipeline_depth=2)

    engines = {m: make(m) for m in ("stream", "resident")}

    def blocks(mode):
        e = engines[mode]
        if mode == "resident":
            return e.infer_blocks_resident(ds.vol)
        return e.infer_blocks(ds)

    # warm both
    for m in engines:
        for _z, _p, pk in blocks(m):
            np.asarray(pk)

    for rep in range(2):
        for m in ("stream", "resident"):
            # (a) producer only
            t0 = time.perf_counter()
            handles = [pk for _z, _p, pk in blocks(m)]
            t_produce_async = time.perf_counter() - t0
            jax.block_until_ready(handles[-1])
            t_produce = time.perf_counter() - t0
            # (b) consume after ready
            jax.block_until_ready(handles)
            t1 = time.perf_counter()
            per = []
            for h in handles:
                ta = time.perf_counter()
                np.asarray(h)
                per.append(time.perf_counter() - ta)
            t_consume = time.perf_counter() - t1
            # (c) full pass
            matchers = patterns.create_matchers([1], 1000, 0.25, 0.25)
            fm = patterns.ForwardMatcher(matchers, [1], 1000, [1])
            t2 = time.perf_counter()
            for z, p, pk in blocks(m):
                fm.put_block(z, p, pk)
            out = fm.finish()
            t_full = time.perf_counter() - t2
            assert len(out) == n
            print(f"rep{rep} {m:9s} produce(async/bar)="
                  f"{t_produce_async:.3f}/{t_produce:.3f}s "
                  f"consume={t_consume:.3f}s "
                  f"per_d2h_ms={[round(x * 1e3) for x in per]} "
                  f"full={t_full:.3f}s ({n / t_full:.1f} sl/s)", flush=True)


if __name__ == "__main__":
    main()
