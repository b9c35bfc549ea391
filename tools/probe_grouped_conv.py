"""Which lowering of MitoNet's grouped 3x3 convs is fastest on v5e?

docs/performance.md (round-4 int8 probe) showed the regnety_6p4gf
grouped 3x3 convs — the encoder's FLOPs — running at 10-25% MXU
utilization in either dtype: XLA's feature_group_count lowering tiles
the 72-wide groups poorly onto the 128-lane MXU. This probe A/Bs
alternative lowerings AT THE EXACT LAYER SHAPES, all computing the
same grouped convolution (verified against lax fgc in f32 first):

  fgc       lax.conv_general_dilated(feature_group_count=g)  [current]
  bd_dense  ONE dense conv with block-diagonal weights (g x the FLOPs,
            but dense-conv tiling; wins iff util gain > g)
  bgc       groups moved to the batch dim + batch_group_count=g
            (kept in group-major layout across iterations, i.e. the
            cost model for a whole-stage layout change; `bgc_t` adds
            the NHWC<->group-major transposes per conv)
  vmapg     vmap over groups of a dense per-group conv
  tap9      9 shifted batched matmuls in NHWC: einsum('bhwgc,gcd->bhwgd')
            per tap, accumulated (K=N=72: lane-starved but fusion-free)
  tap9_T    same, channels-first (g,c,b,h,w): spatial rides the 128
            lanes, cout rides sublanes — the 'layout surgery' candidate

Measurement per the axon-tunnel rules (probe_int8_mxu.py): N_ITER
iterations chained inside one jit with the weights perturbed by the
previous output (no CSE), one scalar D2H at the end, bf16 data with a
known-FLOP sanity matmul to calibrate the run. TF/s columns count
USEFUL (grouped) FLOPs only, so bd_dense's g x waste shows up as a
low number, comparable across rows.

Run on the TPU from the repo root: python tools/probe_grouped_conv.py
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

# (name, B, H, W, C, g) — every distinct grouped-3x3 shape in
# regnety_6p4gf on an 8x512^2 block (models/encoders/regnet.py: stage
# widths (144, 288, 576, 1296), group width 72, stages at
# 128^2/64^2/32^2/16^2), stride-1 bodies. Stride-2 transitions share
# the same tiling pathology; stride-1 dominates (depths 2/7/14/2).
SHAPES = [
    ("s1 128^2 C144 g2", 8, 128, 128, 144, 2),
    ("s2 64^2 C288 g4", 8, 64, 64, 288, 4),
    ("s3 32^2 C576 g8", 8, 32, 32, 576, 8),
    ("s4 16^2 C1296 g18", 8, 16, 16, 1296, 18),
]
N_ITER = 200


def chained(step, x, w):
    """step(x, w)->y run N_ITER times, weights perturbed per iter."""

    def body(carry, _):
        w2, acc = carry
        y = step(x, w2)
        m = y.astype(jnp.float32).sum()
        bump = (m * 1e-12).astype(w2.dtype)
        return (w2 + bump, acc + m), None

    (_, acc), _ = lax.scan(body, (w, jnp.float32(0.0)), None,
                           length=N_ITER)
    return acc


def timeit(fn, *args, reps=3):
    f = jax.jit(fn)
    np.asarray(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITER


# ---------------------------------------------------------------- #
# lowerings: all take NHWC x (B,H,W,C) or group-major forms, weights
# in the lowering's preferred layout, return the lowering's native
# output layout (conversion cost measured separately where relevant)
# ---------------------------------------------------------------- #

def fgc(x, w, g):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)


def make_blockdiag(w, g):
    """(3,3,cw,C) grouped -> (3,3,C,C) block-diagonal dense weights."""
    k, _, cw, C = w.shape
    cwo = C // g
    bd = np.zeros((k, k, C, C), w.dtype)
    for i in range(g):
        bd[:, :, i * cw:(i + 1) * cw, i * cwo:(i + 1) * cwo] = \
            w[:, :, :, i * cwo:(i + 1) * cwo]
    return bd


def bd_dense(x, w_bd):
    return lax.conv_general_dilated(
        x, w_bd, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def to_group_major(x, g):
    """(B,H,W,C) -> (g*B,H,W,cw), group-major batch."""
    B, H, W, C = x.shape
    cw = C // g
    return jnp.transpose(x.reshape(B, H, W, g, cw),
                         (3, 0, 1, 2, 4)).reshape(g * B, H, W, cw)


def from_group_major(y, g):
    gB, H, W, cwo = y.shape
    B = gB // g
    return jnp.transpose(y.reshape(g, B, H, W, cwo),
                         (1, 2, 3, 0, 4)).reshape(B, H, W, g * cwo)


def bgc_raw(xg, w, g):
    """xg already (g*B,H,W,cw); w (3,3,cw,C): batch_group_count conv.

    Output is (B,H,W,C) directly: XLA assigns output-feature group i to
    input-batch group i, which is exactly the grouped conv's
    group-blocked channel order."""
    return lax.conv_general_dilated(
        xg, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=g)


def vmapg_raw(xg5, wg, g):
    """xg5 (g,B,H,W,cw), wg (g,3,3,cw,cwo): per-group dense conv."""
    return jax.vmap(
        lambda xx, ww: lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(xg5, wg)


def tap9(x5, wtap, g):
    """x5 (B,H,W,g,cw); wtap (3,3,g,cw,cwo): 9 shifted einsums."""
    B, H, W, _, cw = x5.shape
    xp = jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + H, dx:dx + W]
            t = jnp.einsum("bhwgc,gcd->bhwgd", xs, wtap[dy, dx],
                           preferred_element_type=jnp.float32)
            y = t if y is None else y + t
    return y.astype(x5.dtype)


def tap9_T(xT, wtap, g):
    """xT (g,cw,B,Hp,Wp) pre-padded; wtap (3,3,g,cw,cwo).

    out (g,cwo,B,H,W): spatial (h,w) in the minor dims -> 128 lanes
    full; cout=72 in sublanes."""
    _, cw, B, Hp, Wp = xT.shape
    H, W = Hp - 2, Wp - 2
    y = None
    for dy in range(3):
        for dx in range(3):
            xs = xT[:, :, :, dy:dy + H, dx:dx + W]
            t = jnp.einsum("gcd,gcbhw->gdbhw", wtap[dy, dx], xs,
                           preferred_element_type=jnp.float32)
            y = t if y is None else y + t
    return y.astype(xT.dtype)


def verify():
    """All lowerings == fgc in f32 on a small shape."""
    rng = np.random.default_rng(1)
    B, H, W, C, g = 2, 16, 16, 24, 3
    cw = C // g
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    w = rng.normal(0, 0.1, (3, 3, cw, C)).astype(np.float32)
    ref = np.asarray(fgc(jnp.asarray(x), jnp.asarray(w), g))

    got = np.asarray(bd_dense(jnp.asarray(x),
                              jnp.asarray(make_blockdiag(w, g))))
    np.testing.assert_allclose(got, ref, atol=1e-4), "bd_dense"

    xg = to_group_major(jnp.asarray(x), g)
    got = np.asarray(bgc_raw(xg, jnp.asarray(w), g))
    np.testing.assert_allclose(got, ref, atol=1e-4), "bgc"

    wg = jnp.asarray(  # (g,3,3,cw,cwo): per-group dense weights
        np.stack([w[:, :, :, i * cw:(i + 1) * cw] for i in range(g)]))
    xg5 = xg.reshape(g, B, H, W, cw)
    got = np.asarray(from_group_major(
        vmapg_raw(xg5, wg, g).reshape(g * B, H, W, cw), g))
    np.testing.assert_allclose(got, ref, atol=1e-4), "vmapg"

    wtap = jnp.asarray(np.transpose(
        np.stack([w[:, :, :, i * cw:(i + 1) * cw] for i in range(g)]),
        (1, 2, 0, 3, 4)))  # (3,3,g,cw,cwo)
    x5 = jnp.asarray(x.reshape(B, H, W, g, cw))
    got = np.asarray(tap9(x5, wtap, g)).reshape(B, H, W, C)
    np.testing.assert_allclose(got, ref, atol=1e-4), "tap9"

    xT = jnp.pad(jnp.transpose(x5, (3, 4, 0, 1, 2)),
                 ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    got = np.asarray(tap9_T(xT, wtap, g))  # (g,cwo,B,H,W)
    got = np.transpose(got, (2, 3, 4, 0, 1)).reshape(B, H, W, C)
    np.testing.assert_allclose(got, ref, atol=1e-4), "tap9_T"
    print("verify: all lowerings match fgc (f32, atol 1e-4)")


def main():
    verify()
    rng = np.random.default_rng(0)

    a = jnp.asarray(rng.normal(0, 1, (8192, 8192)), jnp.bfloat16)
    t = timeit(lambda x, w: chained(lambda x2, w2: x2 @ w2, x, w), a, a)
    print(f"sanity matmul: {2 * 8192**3 / t / 1e12:.0f} TF/s "
          f"(v5e bf16 peak 197)", flush=True)

    hdr = ["fgc", "bd_dense", "bgc", "bgc_t", "vmapg", "tap9", "tap9_T"]
    print(f"{'layer':22s} {'GF':>6s} " +
          " ".join(f"{h:>9s}" for h in hdr) + "   (TF/s useful)")
    for name, B, H, W, C, g in SHAPES:
        cw = C // g
        flops = 2 * B * H * W * C * cw * 9
        x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
        w = rng.normal(0, 0.05, (3, 3, cw, C)).astype(np.float32)

        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        res = {}
        res["fgc"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: fgc(x2, w2, g), xx, ww), xb, wb)

        wbd = jnp.asarray(make_blockdiag(w, g), jnp.bfloat16)
        res["bd_dense"] = timeit(lambda xx, ww: chained(
            bd_dense, xx, ww), xb, wbd)

        xg = to_group_major(xb, g)
        res["bgc"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: bgc_raw(x2, w2, g), xx, ww), xg, wb)
        res["bgc_t"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: bgc_raw(to_group_major(x2, g), w2, g),
            xx, ww), xb, wb)

        wg = jnp.asarray(np.stack(
            [w[:, :, :, i * cw:(i + 1) * cw] for i in range(g)]),
            jnp.bfloat16)
        xg5 = xg.reshape(g, B, H, W, cw)
        res["vmapg"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: vmapg_raw(x2, w2, g), xx, ww), xg5, wg)

        wtap = jnp.asarray(np.transpose(np.stack(
            [w[:, :, :, i * cw:(i + 1) * cw] for i in range(g)]),
            (1, 2, 0, 3, 4)), jnp.bfloat16)
        x5 = xb.reshape(B, H, W, g, cw)
        res["tap9"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: tap9(x2, w2, g), xx, ww), x5, wtap)

        xT = jnp.pad(jnp.transpose(x5, (3, 4, 0, 1, 2)),
                     ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
        res["tap9_T"] = timeit(lambda xx, ww, g=g: chained(
            lambda x2, w2: tap9_T(x2, w2, g), xx, ww), xT, wtap)

        print(f"{name:22s} {flops / 1e9:6.1f} " +
              " ".join(f"{flops / res[h] / 1e12:9.1f}" for h in hdr),
              flush=True)

    # the sibling pathology: 1x1 convs probed at only 22-28 TF/s.
    # A/B conv vs explicit reshape-matmul at the s3 transition shape.
    B, H, W, Ci, Co = 8, 32, 32, 288, 576
    flops = 2 * B * H * W * Ci * Co
    xb = jnp.asarray(rng.normal(0, 1, (B, H, W, Ci)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (1, 1, Ci, Co)), jnp.bfloat16)
    t_conv = timeit(lambda xx, ww: chained(
        lambda x2, w2: lax.conv_general_dilated(
            x2, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), xx, ww),
        xb, w1)
    wm = w1.reshape(Ci, Co)
    t_mm = timeit(lambda xx, ww: chained(
        lambda x2, w2: (x2.reshape(-1, Ci) @ w2).reshape(B, H, W, Co),
        xx, ww), xb, wm)
    print(f"{'1x1 32^2 288->576':22s} {flops / 1e9:6.1f} "
          f"conv {flops / t_conv / 1e12:6.1f}  "
          f"matmul {flops / t_mm / 1e12:6.1f}")


if __name__ == "__main__":
    main()
