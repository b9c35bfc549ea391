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
    Bilinear mode reproduces grid_sample padding_mode='zeros': corners
    outside the grid contribute zero. This matters: PointRend's eval grid
    coords place the border ring at source -0.25, where zero-padding and
    clamping visibly differ.
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
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(yy, xx):
        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        vals = jax.vmap(lambda f, a, b: f[a, b])(features, yc, xc)
        return vals * valid[..., None].astype(vals.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x1)
    v10 = corner(y1, x0)
    v11 = corner(y1, x1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
