"""Does XLA:TPU actually hit the MXU's native int8 path, and at which
shapes does it beat bf16?

The round-2/3 benches show executing-int8 ~15% SLOWER end-to-end than
bf16. Hypothesis space:
  (a) int8 convs themselves are slower at MitoNet's shapes (XLA upcasts
      or the int8 conv path isn't 2x on this chip),
  (b) the convs win but the per-conv quant/requant elementwise chains
      (round/clip/convert on full activations) eat the win.
This probe separates them: times a bare conv at representative MitoNet
layer shapes in bf16 vs int8, then the quantize+conv+requant chain that
models/quantization.py traces.

Measurement per the axon-tunnel rules: N iterations CHAINED inside one
jit (each step's input perturbed by the previous output so XLA cannot
CSE or elide), one device->host pull of a scalar at the end, and a
known-FLOP bf16 matmul sanity op to calibrate the run.

Run on the TPU from the repo root: python tools/probe_int8_mxu.py
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

# (name, B, H, W, Cin, Cout, k, stride, groups) — regnety_6p4gf stages
# on a block of 8 512^2 slices (models/encoders/regnet.py: stem 32,
# stage widths (144, 288, 576, 1296) at strides (4, 8, 16, 32), depths
# (2, 7, 14, 2), group width 72). s3 (576ch, depth 14, 32^2) carries
# most encoder FLOPs... but at 512^2 input the strides halve once more:
# stages sit at 128^2/64^2/32^2/16^2.
SHAPES = [
    ("stem 512^2 1->32 s2", 8, 512, 512, 8, 32, 3, 2, 1),
    ("s1 g3x3 128^2 144", 8, 128, 128, 144, 144, 3, 1, 2),
    ("s2 g3x3 64^2 288", 8, 64, 64, 288, 288, 3, 1, 4),
    ("s3 g3x3 32^2 576", 8, 32, 32, 576, 576, 3, 1, 8),
    ("s3 1x1 32^2 288->576", 8, 32, 32, 288, 576, 1, 1, 1),
    ("s4 g3x3 16^2 1296", 8, 16, 16, 1296, 1296, 3, 1, 18),
    ("s4 1x1 16^2 576->1296", 8, 16, 16, 576, 1296, 1, 1, 1),
]
N_ITER = 300


def conv(x, w, stride, groups, pet=None):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        **({"preferred_element_type": pet} if pet is not None else {}))


def chained(step, x, w):
    """Run ``step(x, w) -> y`` N_ITER times with the weight perturbed by
    the previous output so iterations serialize and can't be CSE'd."""

    def body(carry, _):
        w2, acc = carry
        y = step(x, w2)
        m = y.astype(jnp.float32).sum()
        if w2.dtype == jnp.int8:
            bump = (m.astype(jnp.int32) & 1).astype(jnp.int8)
        else:
            bump = (m * 1e-12).astype(w2.dtype)
        return (w2 + bump, acc + m), None

    (_, acc), _ = lax.scan(body, (w, jnp.float32(0.0)), None,
                           length=N_ITER)
    return acc


def timeit(fn, *args, reps=3):
    f = jax.jit(fn)
    np.asarray(f(*args))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITER


def main():
    rng = np.random.default_rng(0)

    # sanity: 8192^3 bf16 matmul = 1.1 TFLOP, ~7 ms at 80% of v5e peak
    a = jnp.asarray(rng.normal(0, 1, (8192, 8192)), jnp.bfloat16)
    t = timeit(lambda x, w: chained(
        lambda x2, w2: x2 @ w2, x, w), a, a)
    sanity_tf = 2 * 8192**3 / t / 1e12
    print(f"sanity matmul: {t * 1e3:.2f} ms = {sanity_tf:.0f} TF/s "
          f"(v5e bf16 peak 197)")
    a8 = jnp.asarray(
        np.clip(rng.normal(0, 32, (8192, 8192)), -127, 127), jnp.int8)
    t = timeit(lambda x, w: chained(
        lambda x2, w2: lax.dot(x2, w2,
                               preferred_element_type=jnp.int32), x, w),
        a8, a8)
    print(f"sanity int8 matmul: {t * 1e3:.2f} ms = "
          f"{2 * 8192**3 / t / 1e12:.0f} TOP/s (v5e int8 peak 394)")

    rows = []
    for name, B, H, W, Ci, Co, k, s, g in SHAPES:
        x = rng.normal(0, 1, (B, H, W, Ci)).astype(np.float32)
        w = rng.normal(0, 0.05, (k, k, Ci // g, Co)).astype(np.float32)
        flops = 2 * B * (H // s) * (W // s) * k * k * (Ci // g) * Co

        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        t_bf16 = timeit(lambda xx, ww, s=s, g=g: chained(
            lambda x2, w2: conv(x2, w2, s, g), xx, ww), xb, wb)

        x8 = jnp.asarray(np.clip(np.round(x * 16), -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(np.round(w * 256), -127, 127), jnp.int8)
        t_int8 = timeit(lambda xx, ww, s=s, g=g: chained(
            lambda x2, w2: conv(x2, w2, s, g, pet=jnp.int32), xx, ww),
            x8, w8)

        # full chain models/quantization.py traces per conv: quantize
        # input (f32 math) -> int8 conv -> rescale -> bf16
        def step_chain(x2, w2, s=s, g=g):
            aq = jnp.clip(jnp.round(x2.astype(jnp.float32) / 0.0625),
                          -127, 127).astype(jnp.int8)
            y = conv(aq, w2, s, g, pet=jnp.int32)
            return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

        t_chain = timeit(lambda xx, ww: chained(step_chain, xx, ww),
                         xb, w8)

        rows.append((name, flops / 1e9, t_bf16 * 1e3, t_int8 * 1e3,
                     t_chain * 1e3, flops / t_bf16 / 1e12,
                     flops / t_int8 / 1e12))

    print(f"{'layer':28s} {'GF':>6s} {'bf16ms':>8s} {'int8ms':>8s} "
          f"{'chainms':>8s} {'bf16TF':>7s} {'int8TF':>7s}")
    for r in rows:
        print(f"{r[0]:28s} {r[1]:6.1f} {r[2]:8.3f} {r[3]:8.3f} "
              f"{r[4]:8.3f} {r[5]:7.1f} {r[6]:7.1f}")


if __name__ == "__main__":
    main()
