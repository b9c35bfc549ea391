"""Lane-padding A/B for the grouped 3x3 (round-4 VERDICT next #6).

MitoNet's regnety_6p4gf grouped convs have group width cw=72 — not a
multiple of the TPU's 128-lane register width — and docs/performance.md
argues this misalignment is the encoder's MFU ceiling. This probe tests
the one untested lever: ZERO-PAD the group width to 128 lanes (exact
outputs on the real channels, more FLOPs but aligned tiles), in three
variants at every stage's body-block shape:

- fgc72   : baseline NHWC feature_group_count conv (cw 72 -> 72)
- padin   : input group width padded 72->128 (contraction aligned;
            +78% conv FLOPs), output stays 72
- padout  : output group width padded 72->128 (output lanes aligned;
            +78% conv FLOPs), sliced back to 72 after
- padboth : both sides padded (fully aligned tiles; +216% conv FLOPs)

Chained lax.scan keeps the measured region pure conv work (+ the
pad/slice glue a wired version would pay). Equality of the real
channels is asserted in f32 before timing. Run on the TPU:
python tools/probe_lanepad.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("platform:", jax.devices()[0].platform, flush=True)

# (name, B, H, W, C, g) regnety_6p4gf stride-1 body blocks
SHAPES = [
    ("s1 128^2 C144 g2", 8, 128, 128, 144, 2),
    ("s2 64^2 C288 g4", 8, 64, 64, 288, 4),
    ("s3 32^2 C576 g8", 8, 32, 32, 576, 8),
    ("s4 16^2 C1296 g18", 8, 16, 16, 1296, 18),
]
N_ITER = 200
PAD = 128


def conv_fgc(x, w, g):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)


def pad_kernel_in(w, g, cw):
    """(3,3,cw,C) -> (3,3,PAD,C): zero rows for the padded input lanes."""
    return jnp.pad(w, ((0, 0), (0, 0), (0, PAD - cw), (0, 0)))


def pad_kernel_out(w, g, cw):
    """(3,3,cw,g*cw) -> (3,3,cw,g*PAD): zero output channels interleaved
    per group."""
    C = w.shape[-1]
    wg = w.reshape(3, 3, cw, g, cw)
    wg = jnp.pad(wg, ((0, 0),) * 3 + ((0, 0), (0, PAD - cw)))
    return wg.reshape(3, 3, cw, g * PAD)


def pad_kernel_out_from_in(w, g, cw):
    wi = pad_kernel_in(w, g, cw)           # (3,3,PAD,g*cw)
    wg = wi.reshape(3, 3, PAD, g, cw)
    wg = jnp.pad(wg, ((0, 0),) * 3 + ((0, 0), (0, PAD - cw)))
    return wg.reshape(3, 3, PAD, g * PAD)


def pad_x(x, g, cw):
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, g, cw)
    xg = jnp.pad(xg, ((0, 0),) * 3 + ((0, 0), (0, PAD - cw)))
    return xg.reshape(B, H, W, g * PAD)


def slice_x(y, g, cw):
    B, H, W, _ = y.shape
    return y.reshape(B, H, W, g, PAD)[..., :cw].reshape(B, H, W, g * cw)


def variant_fns(g, cw):
    return {
        "fgc72": lambda x, w: conv_fgc(x, w["base"], g),
        "padin": lambda x, w: conv_fgc(pad_x(x, g, cw), w["in"], g),
        "padout": lambda x, w: slice_x(conv_fgc(x, w["out"], g), g, cw),
        "padboth": lambda x, w: slice_x(
            conv_fgc(pad_x(x, g, cw), w["both"], g), g, cw),
    }


def chained(fn, x, w):
    def body(x2, _):
        y = fn(x2, w)
        return (y * jnp.bfloat16(0.5)).astype(x2.dtype), None

    y, _ = lax.scan(body, x, None, length=N_ITER)
    return y.astype(jnp.float32).sum()


def timeit(fn, *args, reps=3):
    f = jax.jit(fn)
    np.asarray(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITER


def main():
    rng = np.random.default_rng(0)

    # Correctness (measured 2026-08-20, docs/performance.md): on this
    # TPU the MISALIGNED fgc72 grouped conv accumulates in bf16 (it
    # does not ride the MXU), so its output deviates ~25% RMS from the
    # f32-accumulated result; the lane-padded variants ride the MXU and
    # match the CPU reference to bf16-rounding. Verify therefore runs
    # against the CPU reference and REPORTS each variant's deviation
    # instead of asserting fgc72 equality.
    B, H, W, C, g = 2, 16, 16, 144, 2
    cw = C // g
    w = rng.normal(0, 0.05, (3, 3, cw, C)).astype(np.float32)
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    wj = jnp.asarray(w, jnp.bfloat16)
    xj = jnp.asarray(x, jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        w_c = {"base": wj, "in": pad_kernel_in(wj, g, cw),
               "out": pad_kernel_out(wj, g, cw),
               "both": pad_kernel_out_from_in(wj, g, cw)}
        fns = variant_fns(g, cw)
        ref = np.asarray(fns["fgc72"](xj, w_c)).astype(np.float32)
        for name in ("padin", "padout", "padboth"):
            got = np.asarray(fns[name](xj, w_c)).astype(np.float32)
            np.testing.assert_allclose(got, ref, atol=1e-2)
    print("verify (CPU): padded variants == fgc baseline")
    dev = jax.devices()[0]
    weights = {k: jax.device_put(v, dev) for k, v in w_c.items()}
    xd = jax.device_put(xj, dev)
    for name, fn in variant_fns(g, cw).items():
        got = np.asarray(jax.jit(fn)(xd, weights)).astype(np.float32)
        d = float(np.abs(got - ref).max())
        print(f"device-vs-CPU maxdiff {name}: {d:.4f} "
              f"(output std {ref.std():.2f})")

    header = f"{'block':22s} {'GF':>6s}" + "".join(
        f" {n:>9s}" for n in ("fgc72", "padin", "padout", "padboth"))
    print(header + "   (TF/s of USEFUL flops; best speedup vs fgc72)")
    for name, B, H, W, C, g in SHAPES:
        cw = C // g
        flops = 2 * B * H * W * C * cw * 9  # useful (unpadded) FLOPs
        w = rng.normal(0, 0.05, (3, 3, cw, C)).astype(np.float32)
        wj = jnp.asarray(w, jnp.bfloat16)
        weights = {"base": wj, "in": pad_kernel_in(wj, g, cw),
                   "out": pad_kernel_out(wj, g, cw),
                   "both": pad_kernel_out_from_in(wj, g, cw)}
        xb = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
        fns = variant_fns(g, cw)
        ts = {}
        for vname, fn in fns.items():
            ts[vname] = timeit(lambda xx, ww, fn=fn: chained(fn, xx, ww),
                               xb, weights)
        base = ts["fgc72"]
        row = f"{name:22s} {flops / 1e9:6.1f}" + "".join(
            f" {flops / ts[v] / 1e12:9.2f}"
            for v in ("fgc72", "padin", "padout", "padboth"))
        best_v = min(ts, key=ts.get)
        print(row + f"   best={best_v} {base / ts[best_v]:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
