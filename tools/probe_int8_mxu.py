"""Does XLA:TPU actually hit the MXU's native int8 path, and at which
shapes does it beat bf16?

The round-2 bench showed executing-int8 ~15% SLOWER end-to-end than bf16
(BENCH_r02.json). Hypothesis space:
  (a) int8 convs themselves are slower at MitoNet's shapes (XLA upcasts
      or the int8 conv path isn't 2x on this chip),
  (b) the convs win but the per-conv quant/requant elementwise chains
      (round/clip/convert on full activations) eat the win.
This probe separates them: times a bare conv at representative MitoNet
layer shapes in bf16 vs int8 (same conv, preferred_element_type=int32),
then the quantize+conv+requant chain that models/quantization.py traces.

Run on the TPU: PYTHONPATH=. python tools/probe_int8_mxu.py
"""

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
# most encoder FLOPs.
SHAPES = [
    ("stem 512^2 1->32 s2", 8, 512, 512, 8, 32, 3, 2, 1),
    ("s1 g3x3 128^2 144", 8, 128, 128, 144, 144, 3, 1, 2),
    ("s2 g3x3 64^2 288", 8, 64, 64, 288, 288, 3, 1, 4),
    ("s3 g3x3 32^2 576", 8, 32, 32, 576, 576, 3, 1, 8),
    ("s3 1x1 32^2 288->576", 8, 32, 32, 288, 576, 1, 1, 1),
    ("s4 g3x3 16^2 1296", 8, 16, 16, 1296, 1296, 3, 1, 18),
    ("s4 1x1 16^2 576->1296", 8, 16, 16, 576, 1296, 1, 1, 1),
]


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def conv(x, w, stride, groups, pet=None):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        **({"preferred_element_type": pet} if pet else {}))


def main():
    rng = np.random.default_rng(0)
    rows = []
    for name, B, H, W, Ci, Co, k, s, g in SHAPES:
        x = rng.normal(0, 1, (B, H, W, Ci)).astype(np.float32)
        w = rng.normal(0, 0.05, (k, k, Ci // g, Co)).astype(np.float32)
        flops = 2 * B * (H // s) * (W // s) * k * k * (Ci // g) * Co

        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        f_bf16 = jax.jit(lambda a, b, s=s, g=g: conv(a, b, s, g))
        t_bf16 = timeit(f_bf16, xb, wb)

        x8 = jnp.asarray(np.clip(np.round(x * 16), -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(np.round(w * 256), -127, 127), jnp.int8)
        f_int8 = jax.jit(
            lambda a, b, s=s, g=g: conv(a, b, s, g, pet=jnp.int32))
        t_int8 = timeit(f_int8, x8, w8)

        # the full chain models/quantization.py traces per conv:
        # quantize input (f32 math) -> int8 conv -> rescale -> bf16
        def chain(a, b, s=s, g=g):
            aq = jnp.clip(jnp.round(a.astype(jnp.float32) / 0.0625),
                          -127, 127).astype(jnp.int8)
            y = conv(aq, b, s, g, pet=jnp.int32)
            return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

        t_chain = timeit(jax.jit(chain), xb, w8)

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
