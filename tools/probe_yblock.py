"""Whole-Y-block A/B: NHWC fgc vs stage-resident group-major layout.

probe_grouped_conv.py showed the grouped 3x3 runs ~25-40% faster in a
group-major layout (groups folded into the batch dim: vmap/bgc), but
explicit NHWC<->group-major transposes around a LONE conv eat the win
(bgc_t ~= fgc). In the real RegNet Y-block the grouped conv sits
between two dense 1x1 convs (encoders/regnet.py Bottleneck) — and a
1x1 conv is a matmul whose OUTPUT (or input) layout change can fold
into the matmul itself instead of a separate transpose:

    b1:  out[g,b,h,w,c] = einsum('bhwk,kgc->gbhwc', x, W1)
    3x3: vmap over g of a dense conv            (the fast lowering)
    SE:  pool/scale per group (layout-neutral)
    b3:  y[b,h,w,k]    = einsum('gbhwc,gck->bhwk', out, W3)

This probe times the FULL block both ways at every stage's shape
(verified equal in f32 first), batch-8 512^2-input geometry, bf16.
Chains on activations (y -> next x) so the measured region contains
exactly the block work — no per-iter reduction overhead. Both variants
share the identical param values; TF/s counts the same useful FLOPs.

Run on the TPU: python tools/probe_yblock.py
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

# (name, B, H, W, C, g) stride-1 body blocks (depths 2/7/14/2)
SHAPES = [
    ("s1 128^2 C144 g2", 8, 128, 128, 144, 2),
    ("s2 64^2 C288 g4", 8, 64, 64, 288, 4),
    ("s3 32^2 C576 g8", 8, 32, 32, 576, 8),
    ("s4 16^2 C1296 g18", 8, 16, 16, 1296, 18),
]
N_ITER = 200


def make_params(rng, C, g):
    cw = C // g
    se_c = max(8, C // 4)
    return dict(
        w1=rng.normal(0, 0.05, (C, C)).astype(np.float32),
        w3x3=rng.normal(0, 0.05, (3, 3, cw, C)).astype(np.float32),
        wse1=rng.normal(0, 0.05, (C, se_c)).astype(np.float32),
        wse2=rng.normal(0, 0.05, (se_c, C)).astype(np.float32),
        w3=rng.normal(0, 0.05, (C, C)).astype(np.float32),
    )


def block_nhwc(x, p, g):
    """Reference layout: all NHWC, grouped conv via feature_group_count."""
    C = x.shape[-1]
    out = nn_relu(jnp.einsum("bhwk,kc->bhwc", x, p["w1"],
                             preferred_element_type=jnp.float32)
                  .astype(x.dtype))
    out = lax.conv_general_dilated(
        out, p["w3x3"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)
    out = nn_relu(out)
    se = out.mean(axis=(1, 2))  # (B,C)
    se = nn_relu((se @ p["wse1"]).astype(x.dtype))
    se = jax.nn.sigmoid((se @ p["wse2"]).astype(jnp.float32))
    out = out * se[:, None, None, :].astype(x.dtype)
    out = jnp.einsum("bhwc,ck->bhwk", out, p["w3"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return nn_relu(x + out)


def block_gmajor(x, p, g):
    """Group-major interior: 1x1s fold the layout change into their
    matmuls; the grouped 3x3 is a vmapped dense conv over g."""
    B, H, W, C = x.shape
    cw = C // g
    w1g = p["w1"].reshape(C, g, cw)
    # (g,B,H,W,cw): groups major — the layout the 3x3 wants
    out = nn_relu(jnp.einsum("bhwk,kgc->gbhwc", x, w1g,
                             preferred_element_type=jnp.float32)
                  .astype(x.dtype))
    wg = jnp.stack([p["w3x3"][:, :, :, i * cw:(i + 1) * cw]
                    for i in range(g)])  # (g,3,3,cw,cw)
    out = jax.vmap(
        lambda xx, ww: lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(out, wg)
    out = nn_relu(out)
    se = out.mean(axis=(2, 3))  # (g,B,cw)
    wse1g = p["wse1"].reshape(g, cw, -1)
    se = nn_relu(jnp.einsum("gbc,gcs->bs", se, wse1g,
                            preferred_element_type=jnp.float32)
                 .astype(x.dtype))
    wse2g = p["wse2"].reshape(-1, g, cw)
    se = jax.nn.sigmoid(jnp.einsum("bs,sgc->gbc", se, wse2g,
                                   preferred_element_type=jnp.float32))
    out = out * se[:, :, None, None, :].astype(x.dtype)
    w3g = p["w3"].reshape(g, cw, C)
    out = jnp.einsum("gbhwc,gck->bhwk", out, w3g,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return nn_relu(x + out)


def nn_relu(x):
    return jnp.maximum(x, 0)


def chained_act(block, x, p, g):
    """Feed y back as x; scale to keep magnitudes bounded."""

    def body(x2, _):
        y = block(x2, p, g)
        y = (y * jnp.bfloat16(0.5)).astype(x2.dtype)
        return y, None

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

    # verify equality in f32 at a small shape
    B, H, W, C, g = 2, 16, 16, 24, 3
    p = make_params(rng, C, g)
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    ref = np.asarray(block_nhwc(x, pj, g))
    got = np.asarray(block_gmajor(x, pj, g))
    np.testing.assert_allclose(got, ref, atol=2e-4)
    print("verify: block_gmajor == block_nhwc (f32, atol 2e-4)")

    print(f"{'block':22s} {'GF':>6s} {'nhwc':>9s} {'gmajor':>9s} "
          f"{'speedup':>8s}   (TF/s useful, full Y-block)")
    for name, B, H, W, C, g in SHAPES:
        cw = C // g
        se_c = max(8, C // 4)
        flops = 2 * B * H * W * (C * C * 2 + C * cw * 9) \
            + 2 * B * (C * se_c * 2)
        p = make_params(rng, C, g)
        pj = {k: jnp.asarray(v, jnp.bfloat16) for k, v in p.items()}
        xb = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)

        t_nhwc = timeit(lambda xx, pp, g=g: chained_act(
            block_nhwc, xx, pp, g), xb, pj)
        t_gm = timeit(lambda xx, pp, g=g: chained_act(
            block_gmajor, xx, pp, g), xb, pj)
        print(f"{name:22s} {flops / 1e9:6.1f} "
              f"{flops / t_nhwc / 1e12:9.1f} {flops / t_gm / 1e12:9.1f} "
              f"{t_nhwc / t_gm:8.2f}x", flush=True)


if __name__ == "__main__":
    main()
