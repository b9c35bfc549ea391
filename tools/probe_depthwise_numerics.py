"""Depthwise / separable conv device-vs-CPU numerics check.

Follow-up to the grouped-conv finding (tools/probe_lanepad.py,
docs/performance.md round 5): misaligned fgc convs accumulate in bf16
on this TPU. Depthwise convs (feature_group_count = C, group width 1 —
BiFPN SeparableConvBNAct, PDL 5x5 separable fuses) are maximally
misaligned but accumulate only k*k terms, so the expected deviation is
~sqrt(9)*0.4% ~ 1%. This probe MEASURES it at the shapes the models
use, plus the 1-channel stem conv, so the number is pinned instead of
assumed. Run on the TPU: python tools/probe_depthwise_numerics.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("platform:", jax.devices()[0].platform, flush=True)


def conv(x, w, g, k):
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    cases = [
        ("bifpn dw3x3 C160 128^2", 1, 128, 128, 160, 3, True),
        ("pdl sep5x5 C256 64^2", 1, 64, 64, 256, 5, True),
        ("stem 3x3 cin1->32 256^2", 1, 256, 256, 1, 3, False),
    ]
    for name, b, h, w_, c, k, depthwise in cases:
        if depthwise:
            g, cout = c, c
            ker = rng.normal(0, 0.2, (k, k, 1, cout)).astype(np.float32)
        else:
            g, cout = 1, 32
            ker = rng.normal(0, 0.2, (k, k, c, cout)).astype(np.float32)
        x = rng.normal(0, 1, (b, h, w_, c)).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        kb = jnp.asarray(ker, jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            ref = np.asarray(conv(xb, kb, g, k)).astype(np.float32)
        got = np.asarray(conv(jax.device_put(xb, dev),
                              jax.device_put(kb, dev), g, k)
                         ).astype(np.float32)
        d = np.abs(got - ref)
        rel = float(d.max()) / max(float(ref.std()), 1e-9)
        print(f"{name}: maxdiff {float(d.max()):.4f} "
              f"(std {ref.std():.2f}, max/std {rel:.3f})", flush=True)


if __name__ == "__main__":
    main()
