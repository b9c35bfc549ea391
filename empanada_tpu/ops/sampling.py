"""Point sampling of feature maps at normalized coordinates.

Equivalent of the reference's grid_sample-backed point_sample
(point_rend.py:35-60): coords live in [0, 1]^2 with torch
grid_sample(align_corners=False) pixel-edge semantics, i.e. source pixel
position = coord * size - 0.5. NHWC layout; gather-based, jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["point_sample"]


def point_sample(features: jax.Array, point_coords: jax.Array,
                 mode: str = "bilinear") -> jax.Array:
    """Sample (N, H, W, C) features at (N, P, 2) coords given as (x, y) in
    [0, 1]. Returns (N, P, C).

    Coordinate convention follows the reference: the last dim of
    point_coords is (x, y) — matching grid_sample's (x, y) grid ordering.
    Out-of-range coords clamp to the border (grid_sample padding_mode=zeros
    differs at the extreme edges, but PointRend only ever samples in-range).
    """
    n, h, w, c = features.shape

    x = point_coords[..., 0] * w - 0.5
    y = point_coords[..., 1] * h - 0.5

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        return jax.vmap(lambda f, yy, xx: f[yy, xx])(features, yi, xi)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    # clip each neighbor from the UNCLIPPED floor: clipping x0 first
    # would shift the +1 neighbor and corrupt border interpolation
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def gather(f, yy, xx):
        return f[yy, xx]

    g = jax.vmap(gather)
    v00 = g(features, y0i, x0i)
    v01 = g(features, y0i, x1i)
    v10 = g(features, y1i, x0i)
    v11 = g(features, y1i, x1i)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
