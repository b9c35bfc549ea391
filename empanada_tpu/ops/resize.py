"""Bilinear resizing with explicit align_corners semantics and factor padding.

jax.image.resize implements half-pixel (align_corners=False) sampling only;
the reference models rely on align_corners=True for decoder upsampling
(reference blocks.py:72-88, decoders/panoptic_deeplab.py:76), so we build
both from gather+lerp primitives. Everything is NHWC and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "interpolate_scale", "factor_pad"]


def _axis_coords(out_size: int, in_size: int, align_corners: bool):
    """Source (float) coordinates for each output index along one axis."""
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        coords = jnp.arange(out_size, dtype=jnp.float32) * scale
    else:
        scale = in_size / out_size
        coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    return jnp.clip(coords, 0.0, in_size - 1)


def resize_bilinear(x: jax.Array, size, align_corners: bool = True) -> jax.Array:
    """Resize NHWC (or HWC/HW) tensor to spatial `size` = (H', W')."""
    orig_ndim = x.ndim
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = size

    if (oh, ow) == (h, w):
        out = x
    else:
        dtype = x.dtype
        xf = x.astype(jnp.float32)

        ys = _axis_coords(oh, h, align_corners)
        xs = _axis_coords(ow, w, align_corners)

        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]

        # gather rows then columns (two 1D gathers instead of a 2D gather)
        top = xf[:, y0, :, :]
        bot = xf[:, y1, :, :]
        rows = top * (1 - wy) + bot * wy          # (n, oh, w, c)
        left = rows[:, :, x0, :]
        right = rows[:, :, x1, :]
        out = left * (1 - wx) + right * wx        # (n, oh, ow, c)
        out = out.astype(dtype)

    if orig_ndim == 2:
        return out[0, :, :, 0]
    if orig_ndim == 3:
        return out[0]
    return out


def interpolate_scale(x: jax.Array, scale: int, align_corners: bool = True) -> jax.Array:
    """Upsample NHWC by an integer scale factor."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (h * scale, w * scale), align_corners)


def factor_pad(x, factor: int = 128):
    """Zero-pad NHWC spatial dims up to a multiple of `factor`.

    Same role as reference postprocess.factor_pad (postprocess.py:25) but
    NHWC; returns (padded, (orig_h, orig_w)).

    Host numpy input pads with np.pad and STAYS on host: jnp.pad on a
    numpy array dispatches to the default device, which on a tunneled
    TPU runtime costs a full H2D+D2H round trip (~100 ms) — measured as
    a 2.4x end-to-end slowdown for every non-128-multiple slice shape
    when this ran inside the streaming loader's prefetch thread.
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % factor
    pw = (-w) % factor
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, ph)
    pad[-2] = (0, pw)
    if isinstance(x, np.ndarray):
        return np.pad(x, pad), (h, w)
    return jnp.pad(x, pad), (h, w)
