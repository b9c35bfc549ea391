"""Which point-gather formulation is cheapest on TPU?

The device trace shows PointRend's fine-feature sampling costs ~0.56 ms
PER CORNER gather (8K points, 256ch) — ~4.5 ms/block across 2 steps.
Candidates (all exact):
  a) current: 4 separate vmap corner gathers + lerp
  b) one take_along_axis of all 4 corners' flat indices concatenated
     (amortizes per-op overhead if that's what dominates)
  c) lax.gather with slice_sizes=(1,2,2,C): one op fetches each point's
     2x2 patch
Chained-iteration timing per the axon rules (one D2H, serialized reps).

Run from the repo root on the TPU: python tools/probe_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("platform:", jax.devices()[0].platform, flush=True)

B, H, W, C, P = 8, 128, 128, 256, 8192
N_ITER = 100


def corners(coords, h, w):
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    return x0, y0, (x - jnp.floor(x))[..., None], (y - jnp.floor(y))[..., None]


def variant_a(f, coords):
    from empanada_tpu.ops.sampling import point_sample
    return point_sample(f, coords)


def variant_b(f, coords):
    h, w = f.shape[1:3]
    x0, y0, wx, wy = corners(coords, h, w)
    flat = f.reshape(f.shape[0], h * w, f.shape[-1])

    def flat_idx(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        return idx, valid

    i00, v00 = flat_idx(y0, x0)
    i01, v01 = flat_idx(y0, x0 + 1)
    i10, v10 = flat_idx(y0 + 1, x0)
    i11, v11 = flat_idx(y0 + 1, x0 + 1)
    allidx = jnp.concatenate([i00, i01, i10, i11], axis=1)
    vals = jnp.take_along_axis(flat, allidx[..., None], axis=1)
    p = coords.shape[1]
    c00, c01, c10, c11 = (vals[:, i * p:(i + 1) * p] for i in range(4))
    c00 = c00 * v00[..., None]
    c01 = c01 * v01[..., None]
    c10 = c10 * v10[..., None]
    c11 = c11 * v11[..., None]
    top = c00 * (1 - wx) + c01 * wx
    bot = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def variant_c(f, coords):
    h, w = f.shape[1:3]
    c = f.shape[-1]
    x0, y0, wx, wy = corners(coords, h, w)
    # clamp to valid patch anchors; handle the zero-padding by padding
    # the source once (exact zeros semantics)
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def per_image(fi, yy, xx):
        starts = jnp.stack([yy + 1 - 0, xx + 1 - 0], axis=-1)  # into padded
        starts = jnp.clip(starts, 0, jnp.array([h, w]))
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        out = lax.gather(fi, starts, dnums, slice_sizes=(2, 2, c))
        return out  # (P, 2, 2, C)

    patches = jax.vmap(per_image)(fp, y0, x0)
    v00 = patches[:, :, 0, 0]
    v01 = patches[:, :, 0, 1]
    v10 = patches[:, :, 1, 0]
    v11 = patches[:, :, 1, 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def chained(step, f, coords):
    def body(carry, _):
        crd, acc = carry
        y = step(f, crd)
        m = y.astype(jnp.float32).sum()
        bump = (m * 1e-13).astype(crd.dtype)
        return (jnp.clip(crd + bump, 0.0, 1.0), acc + m), None

    (_, acc), _ = lax.scan(body, (coords, jnp.float32(0.0)), None,
                           length=N_ITER)
    return acc


def main():
    import sys
    sys.path.insert(0, ".")
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(0, 1, (B, P, 2)).astype(np.float32))

    # correctness cross-check first (CPU-precision tolerant)
    ra = variant_a(f, coords)
    for name, fn in (("b", variant_b), ("c", variant_c)):
        d = float(jnp.abs(ra.astype(jnp.float32)
                          - fn(f, coords).astype(jnp.float32)).max())
        print(f"variant {name} max|diff| vs a: {d:.2e}")

    for name, fn in (("a 4-gathers", variant_a),
                     ("b concat-take", variant_b),
                     ("c patch-gather", variant_c)):
        g = jax.jit(lambda ff, cc, fn=fn: chained(fn, ff, cc))
        np.asarray(g(f, coords))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(f, coords))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:16s} {best / N_ITER * 1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
