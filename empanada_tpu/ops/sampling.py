"""Point sampling of feature maps at normalized coordinates.

Equivalent of the reference's grid_sample-backed point_sample
(point_rend.py:35-60): coords live in [0, 1]^2 with torch
grid_sample(align_corners=False) pixel-edge semantics, i.e. source pixel
position = coord * size - 0.5. NHWC layout; gather-based, jit/vmap-safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["point_sample", "point_sample_full_grid"]


def point_sample_full_grid(features: jax.Array, scale: int) -> jax.Array:
    """``point_sample`` evaluated densely at EVERY output-grid point of
    an upsampled-by-``scale`` map: output pixel (i, j) samples the source
    at ((j + 0.5)/scale - 0.5, (i + 0.5)/scale - 0.5), i.e. exactly the
    coords ``get_uncertain_point_coords_on_grid`` produces.

    Because ``scale`` is static, every output phase p in [0, scale) has a
    CONSTANT source offset and lerp weight, so the whole map assembles
    from pads, slices and elementwise lerps — no gather at all. TPU
    gathers cost ~0.5-0.8 ms per 8K points per corner in the render loop
    (device trace); this is the zero-gather replacement for the
    coarse-logit side. Arithmetic matches point_sample exactly: x-lerp
    then y-lerp in f32, zero contribution outside the grid."""
    n, h, w, c = features.shape

    def lerp_axis(x, axis, size):
        # phase p: src = (p + 0.5)/scale - 0.5 + k, constant offset/weight
        parts = []
        for p in range(scale):
            src = (p + 0.5) / scale - 0.5
            lo = math.floor(src)
            t = jnp.float32(src - lo)

            def shifted(d):
                if d == 0:
                    return x
                pad = [(0, 0)] * x.ndim
                if d < 0:  # index k-1: zero-pad front, drop tail
                    pad[axis] = (-d, 0)
                    sl = [slice(None)] * x.ndim
                    sl[axis] = slice(0, size)
                else:  # index k+1: drop head, zero-pad back
                    pad[axis] = (0, d)
                    sl = [slice(None)] * x.ndim
                    sl[axis] = slice(d, size + d)
                return jnp.pad(x, pad)[tuple(sl)]

            v0 = shifted(lo)
            v1 = shifted(lo + 1)
            parts.append(v0 * (1 - t) + v1 * t)
        # interleave phases: out[..., k*scale + p, ...]
        stacked = jnp.stack(parts, axis=axis + 1)
        shape = list(x.shape)
        shape[axis] = size * scale
        return stacked.reshape(shape)

    x = features.astype(jnp.float32)
    x = lerp_axis(x, 2, w)   # x-lerp first (point_sample order)
    x = lerp_axis(x, 1, h)
    return x


def point_sample(features: jax.Array, point_coords: jax.Array,
                 mode: str = "bilinear") -> jax.Array:
    """Sample (N, H, W, C) features at (N, P, 2) coords given as (x, y) in
    [0, 1]. Returns (N, P, C).

    Coordinate convention follows the reference: the last dim of
    point_coords is (x, y) — matching grid_sample's (x, y) grid ordering.
    Bilinear mode reproduces grid_sample padding_mode='zeros': corners
    outside the grid contribute zero. This matters: PointRend's eval grid
    coords place the border ring at source -0.25, where zero-padding and
    clamping visibly differ.

    PRECONDITION: coords must lie in [0, 1] (every current caller's do).
    The single-patch gather zero-pads exactly one ring, so points up to
    half a cell outside the grid still see grid_sample zeros; points
    farther out (coords well outside [0, 1]) clamp to an edge patch
    instead of grid_sample's all-zeros — don't rely on zero padding
    outside the unit square.
    """
    n, h, w, c = features.shape

    x = point_coords[..., 0] * w - 0.5
    y = point_coords[..., 1] * h - 0.5

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        return jax.vmap(lambda f, yy, xx: f[yy, xx])(features, yi, xi)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - jnp.floor(x))[..., None]
    wy = (y - jnp.floor(y))[..., None]

    # ONE 2x2-patch gather per image instead of 4 corner gathers: TPU
    # gather cost is per-point overhead (~70-85 ns/point regardless of
    # payload), so fetching each point's 2x2 neighborhood in one op is
    # ~2x faster (tools/probe_gather.py: 1.7 vs 3.4 ms at 8x8192x256).
    # grid_sample zeros padding comes from the physical zero ring: for
    # in-range coords y0 in [-1, h-1], so patch starts y0+1 in [0, h]
    # always index the padded array in bounds; the clip only guards
    # out-of-range coords (clamping them like the old corner clamp).
    fp = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    limit = jnp.array([h, w], jnp.int32)

    def per_image(fi, yy, xx):
        starts = jnp.clip(jnp.stack([yy + 1, xx + 1], axis=-1), 0, limit)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(fi, starts, dnums, slice_sizes=(2, 2, c))

    patches = jax.vmap(per_image)(fp, y0, x0)  # (N, P, 2, 2, C)
    v00 = patches[:, :, 0, 0]
    v01 = patches[:, :, 0, 1]
    v10 = patches[:, :, 1, 0]
    v11 = patches[:, :, 1, 1]

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
